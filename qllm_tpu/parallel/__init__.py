from .mesh import make_mesh
from .sharding import shard_params, shard_cache, param_pspecs, cache_pspec
from .distributed import initialize_distributed, make_pod_mesh, is_multihost
from .sp_attention import sp_decode_attention, sp_cache_pspecs
from .tp_step import (
    make_tp_decode_loop,
    prepare_tp_params,
    place_tp,
    stacked_tp_pspecs,
    tp_cache_pspecs,
    tp_forward_stacked,
)

__all__ = [
    "make_mesh",
    "shard_params",
    "shard_cache",
    "param_pspecs",
    "cache_pspec",
    "initialize_distributed",
    "make_pod_mesh",
    "is_multihost",
    "sp_decode_attention",
    "sp_cache_pspecs",
    "make_tp_decode_loop",
    "prepare_tp_params",
    "place_tp",
    "stacked_tp_pspecs",
    "tp_cache_pspecs",
    "tp_forward_stacked",
]
