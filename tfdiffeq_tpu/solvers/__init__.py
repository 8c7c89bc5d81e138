from . import adaptive, base, fixed_grid  # noqa: F401
