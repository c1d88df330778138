from . import batch, mesh, spatial  # noqa: F401
