from . import batch, mesh, spatial  # noqa: F401
from .api import BatchedWavelets  # noqa: F401
from .sharded import ShardedWavelets  # noqa: F401
