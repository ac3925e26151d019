"""vptq-package checkpoint dialect: uint16 indices stored as int16.

The reference packs VPTQ models through the external ``vptq`` package:
``pack_model(model, from_type=torch.uint16, to_type=torch.uint16,
as_type=torch.int16)`` (quant_vptq.py:207-211) — per-layer
``VQuantLinear`` state with codebook Parameters and index buffers whose
uint16 values are REINTERPRETED as int16 for storage (torch has no
uint16), plus a ``quantization_config.config_for_layers`` mapping each
layer to its ``VQuantLinear`` init args (quant_vptq.py:207-209).

This module writes/reads that dialect for our ``VPTQTensor``:

  per-layer tensors (prefix = layer name):
    ``{p}.centroids.weight``      f16 [group_num=1, C, vector_len]
    ``{p}.indices``               i16 (uint16 view) [1, N, Kq//v]
    ``{p}.res_centroids.weight``  f16 [1, Cr, v]        (optional)
    ``{p}.res_indices``           i16 [1, N, Kq//v]     (optional)
    ``{p}.outlier_centroids.weight`` f16 [1, Co, v]     (optional)
    ``{p}.outlier_indices``       i16 [1, N, n_out//v]  (optional)
    ``{p}.perm``                  i64 [K]               (optional)

  init args (config_for_layers entry):
    in_features / out_features / vector_lens [-1, v] / num_centroids
    [-1, C] / num_res_centroids [-1, Cr] / group_num / outlier_size /
    enable_perm / enable_norm / is_indice_packed

Our fp16 outlier region exports EXACTLY: its vectors become their own
codebook (centroids = the distinct outlier vectors, indices = inverse
map) — valid whenever the region holds <= 65536 distinct vectors, which
the 1%-npercent default always satisfies. ``weight_scale/weight_bias``
(enable_norm) are not produced by our solver and import as identity.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from .vptq import VPTQTensor

__all__ = ["export_vptq_layer", "import_vptq_layer", "vptq_init_args"]

_U16_MAX = 1 << 16


def _as_i16(ids: np.ndarray) -> np.ndarray:
    if ids.max(initial=0) >= _U16_MAX or ids.min(initial=0) < 0:
        raise ValueError("index out of uint16 range")
    return ids.astype(np.uint16).view(np.int16)


def _from_i16(ids: np.ndarray) -> np.ndarray:
    return ids.view(np.uint16).astype(np.int32)


def vptq_init_args(vt: VPTQTensor) -> Dict[str, Any]:
    """VQuantLinear init-args entry for config_for_layers
    (quant_vptq.py:207-209; shapes follow the vptq package's
    [-1, value] "outlier, main" pair convention)."""
    v = vt.vector_len
    C = int(vt.centroids.shape[0])
    Cr = 0 if vt.res_centroids is None else int(vt.res_centroids.shape[0])
    n_out = vt.n_outlier
    return {
        "in_features": vt.in_features,
        "out_features": vt.out_features,
        "vector_lens": [v if n_out else -1, v],
        "num_centroids": [-1, C],
        "num_res_centroids": [-1, Cr],
        "group_num": 1,
        "group_size": vt.in_features - n_out,
        "outlier_size": n_out,
        "enable_perm": vt.perm is not None,
        "enable_norm": False,
        "is_indice_packed": False,
        "bias": False,
        "indices_as_float": False,
    }


def export_vptq_layer(vt: VPTQTensor, prefix: str) -> Dict[str, np.ndarray]:
    """VPTQTensor -> vptq-dialect tensors (uint16-as-int16 indices)."""
    v = vt.vector_len
    N = vt.out_features
    out: Dict[str, np.ndarray] = {}
    ids = np.asarray(vt.indices)
    out[f"{prefix}.centroids.weight"] = np.asarray(vt.centroids).astype(
        np.float16
    )[None]
    out[f"{prefix}.indices"] = _as_i16(ids)[None]
    if vt.res_indices is not None:
        out[f"{prefix}.res_centroids.weight"] = np.asarray(
            vt.res_centroids
        ).astype(np.float16)[None]
        out[f"{prefix}.res_indices"] = _as_i16(np.asarray(vt.res_indices))[
            None
        ]
    if vt.n_outlier:
        # exact outlier codebook: unique vectors + inverse map
        ow = np.asarray(vt.outlier_weight, np.float16)  # [n_out, N]
        vecs = np.ascontiguousarray(ow.T).reshape(N * (vt.n_outlier // v), v)
        uniq, inv = np.unique(vecs, axis=0, return_inverse=True)
        if uniq.shape[0] >= _U16_MAX:
            raise ValueError(
                f"outlier region has {uniq.shape[0]} distinct vectors; "
                f"cannot index with uint16"
            )
        out[f"{prefix}.outlier_centroids.weight"] = uniq.astype(np.float16)[
            None
        ]
        out[f"{prefix}.outlier_indices"] = _as_i16(
            inv.reshape(N, vt.n_outlier // v)
        )[None]
    if vt.perm is not None:
        out[f"{prefix}.perm"] = np.asarray(vt.perm).astype(np.int64)
    return out


def import_vptq_layer(
    tensors: Dict[str, np.ndarray],
    prefix: str,
    init_args: Optional[Dict[str, Any]] = None,
) -> VPTQTensor:
    """vptq-dialect tensors -> VPTQTensor (outlier codebook re-expanded
    to the dense fp16 region our matmul consumes)."""
    import jax.numpy as jnp

    cent = np.asarray(tensors[f"{prefix}.centroids.weight"])
    if cent.ndim == 3:
        if cent.shape[0] != 1:
            raise NotImplementedError("group_num > 1 vptq checkpoints")
        cent = cent[0]
    C, v = cent.shape
    ids = np.asarray(tensors[f"{prefix}.indices"])
    if ids.ndim == 3:
        ids = ids[0]
    if ids.dtype == np.int16:
        ids = _from_i16(ids)
    N, nvec = ids.shape
    Kq = nvec * v

    res_c = tensors.get(f"{prefix}.res_centroids.weight")
    res_i = tensors.get(f"{prefix}.res_indices")
    if res_c is not None:
        res_c = np.asarray(res_c)
        if res_c.ndim == 3:
            res_c = res_c[0]
        res_i = np.asarray(res_i)
        if res_i.ndim == 3:
            res_i = res_i[0]
        if res_i.dtype == np.int16:
            res_i = _from_i16(res_i)

    out_c = tensors.get(f"{prefix}.outlier_centroids.weight")
    n_out = 0
    outlier_weight = None
    outlier_ids = None
    if out_c is not None:
        out_c = np.asarray(out_c)
        if out_c.ndim == 3:
            out_c = out_c[0]
        oi = np.asarray(tensors[f"{prefix}.outlier_indices"])
        if oi.ndim == 3:
            oi = oi[0]
        if oi.dtype == np.int16:
            oi = _from_i16(oi)
        n_out = oi.shape[1] * v
        ow = out_c[oi].reshape(N, n_out).T  # [n_out, N]
        outlier_weight = jnp.asarray(ow.astype(np.float16))
        outlier_ids = jnp.arange(n_out)

    perm = tensors.get(f"{prefix}.perm")
    K = n_out + Kq
    if init_args:
        K = int(init_args.get("in_features", K))
        N_cfg = int(init_args.get("out_features", N))
        if N_cfg != N or K != n_out + Kq:
            raise ValueError(
                f"init_args shapes ({K}, {N_cfg}) disagree with tensors "
                f"({n_out + Kq}, {N})"
            )
    return VPTQTensor(
        indices=jnp.asarray(ids.astype(np.int32)),
        centroids=jnp.asarray(cent.astype(np.float16)),
        res_indices=None if res_i is None else jnp.asarray(res_i.astype(np.int32)),
        res_centroids=None
        if res_c is None
        else jnp.asarray(res_c.astype(np.float16)),
        outlier_ids=outlier_ids,
        outlier_weight=outlier_weight,
        perm=None if perm is None else jnp.asarray(np.asarray(perm).astype(np.int32)),
        vector_len=v,
        in_features=K,
        out_features=N,
        n_outlier=n_out,
    )
