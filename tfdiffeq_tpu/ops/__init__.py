from . import controller, norms, pytree, rk, tableaus  # noqa: F401
