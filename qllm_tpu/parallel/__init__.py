from .mesh import make_mesh
from .sharding import shard_params, shard_cache, param_pspecs, cache_pspec

__all__ = [
    "make_mesh",
    "shard_params",
    "shard_cache",
    "param_pspecs",
    "cache_pspec",
]
