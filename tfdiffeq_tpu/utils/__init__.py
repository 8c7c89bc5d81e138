from .device import cast_double, func_cast_double, move_to_device  # noqa: F401
