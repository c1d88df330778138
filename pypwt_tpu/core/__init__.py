from . import conv, shapes  # noqa: F401
