"""Packed-layout converters: canonical TPU layout ⇄ GPTQ / AWQ-GEMM /
AWQ-GEMV / ORT-MatMulNBits / Marlin.

The reference keeps five live kernel layouts and repacks between them
(auto_model_quantization.py:115-147 repack_to_new_mode); here foreign
layouts exist only at the checkpoint boundary — import converts to the
canonical layout once, export materializes the foreign layout once.
All conversions are host-side numpy (IO path, not compute path) and are
bit-exact inversions of the reference pack functions:

  * GPTQ:   qweight int32 [K·bits/32, N] K-packed (2/4/8: LSB-first
            fields, compress_weight.py:10-24; odd bits: straddling
            bitstream, :27-43), qzeros int32 [G, N·bits/32] N-packed,
            scales fp16 [G, N], g_idx int32 [K]. AutoGPTQ stores
            zeros-1 (pack_qzeros :156-172 COMPATIBLE_WITH_AUTOGPTQ).
  * AWQ-GEMM (AutoAWQ): 4-bit, qweight int32 [K, N/8] N-packed with
            interleave [0,2,4,6,1,3,5,7], qzeros int32 [G, N/8] same
            interleave, scales fp16 [G, N] (quant_linear_awq.py:95-140).
  * AWQ-GEMV: qweight int32 [N, K/8] K-packed sequential, padded
            scales/qzeros [N, ...] (quant_linear_awq.py:156-246).
  * ORT MatMulNBits: 4-bit, qweight uint8 [N, G, g/2] (low nibble =
            even k), qzeros uint8 [G·N/2] (low nibble = even n), scales
            flat [N·G] n-major (quant_linear_onnxruntime.py:115-150).
  * Marlin: 4-bit symmetric g∈{-1,128}, 16×16 tile permutation + lane
            perm + nibble pack (quant_linear_marlin.py:18-39, 95-134).
            The reference cannot unpack Marlin (:139-140); the importer
            here inverts it exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .qtensor import QuantizedTensor, pack_rows, unpack_rows

__all__ = [
    "export_layout",
    "import_layout",
    "PACK_MODES",
]

PACK_MODES = ("GPTQ", "GEMM", "GEMV", "ORT", "MARLIN", "HQQ")


# ---------------------------------------------------------------------------
# low-level reference-compatible packers (numpy)
# ---------------------------------------------------------------------------


def _pack_fields(q: np.ndarray, bits: int, axis: int) -> np.ndarray:
    """2/4/8-bit LSB-first field packing along ``axis``."""
    pf = 32 // bits
    q = np.moveaxis(q, axis, 0).astype(np.uint32)
    K = q.shape[0]
    out = np.zeros((K // pf,) + q.shape[1:], np.uint32)
    for j in range(pf):
        out |= q[j::pf] << (bits * j)
    return np.moveaxis(out, 0, axis)


def _unpack_fields(p: np.ndarray, bits: int, axis: int, size: int) -> np.ndarray:
    pf = 32 // bits
    p = np.moveaxis(p, axis, 0).astype(np.uint32)
    out = np.zeros((p.shape[0] * pf,) + p.shape[1:], np.uint32)
    for j in range(pf):
        out[j::pf] = (p >> (bits * j)) & ((1 << bits) - 1)
    return np.moveaxis(out[:size], 0, axis).astype(np.int32)


def _pack_bitstream(q: np.ndarray, bits: int) -> np.ndarray:
    """Reference any-bit pack along axis 0 (straddling bitstream,
    compress_weight.py pack_on_row_fast_anybit)."""
    K, N = q.shape
    bits_mat = ((q.astype(np.uint32)[:, :, None] >> np.arange(bits)) & 1).astype(
        np.uint32
    )  # [K, N, bits]
    stream = bits_mat.transpose(1, 0, 2).reshape(N, K * bits // 32, 32)
    words = (stream << np.arange(32, dtype=np.uint32)).sum(axis=-1, dtype=np.uint32)
    return words.T.astype(np.int32)  # [K*bits/32, N]


def _unpack_bitstream(p: np.ndarray, bits: int, K: int) -> np.ndarray:
    W, N = p.shape
    bitsv = ((p.astype(np.uint32).T[:, :, None] >> np.arange(32)) & 1).reshape(
        N, W * 32
    )
    vals = bitsv[:, : K * bits].reshape(N, K, bits)
    q = (vals << np.arange(bits)).sum(axis=-1)
    return q.T.astype(np.int32)  # [K, N]


def _pack_rows_ref(q: np.ndarray, bits: int) -> np.ndarray:
    from .. import native

    if bits in (2, 4, 8):
        out = native.pack_fields_rows(q, bits)
        return out if out is not None else _pack_fields(q, bits, axis=0)
    out = native.pack_bitstream_rows(q, bits)
    return out if out is not None else _pack_bitstream(q, bits)


def _unpack_rows_ref(p: np.ndarray, bits: int, K: int) -> np.ndarray:
    from .. import native

    if bits in (2, 4, 8):
        out = native.unpack_fields_rows(p, bits, K)
        return (
            out if out is not None else _unpack_fields(p, bits, axis=0, size=K)
        )
    out = native.unpack_bitstream_rows(p, bits, K)
    return out if out is not None else _unpack_bitstream(p, bits, K)


_AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])


def _awq_interleave(n_cols: int) -> np.ndarray:
    base = np.arange(0, n_cols, 8)[:, None]
    return (base + _AWQ_ORDER[None, :]).reshape(-1)


# ---------------------------------------------------------------------------
# canonical <-> integer grid
# ---------------------------------------------------------------------------


def _to_grid(qt: QuantizedTensor) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """-> (q int32 [K, N] in canonical row order, scales [G, N] fp16,
    int zeros [G, N], g_idx [K] in ORIGINAL feature order or None)."""
    q = np.asarray(unpack_rows(qt.qweight, qt.bits, qt.in_features))
    scales = np.asarray(qt.scales).astype(np.float16)
    zeros_f = np.asarray(qt.zeros, dtype=np.float32)
    zeros = np.round(zeros_f).astype(np.int32)
    if not np.allclose(zeros_f, zeros, atol=1e-3):
        raise ValueError(
            "fractional zero-points (HQQ-style) cannot be exported to an "
            "integer-zeros layout; use pack_mode HQQ"
        )
    g = qt.effective_group_size
    if qt.perm is not None:
        perm = np.asarray(qt.perm)
        g_idx = np.empty(qt.in_features, np.int32)
        g_idx[perm] = np.arange(qt.in_features) // g
    else:
        g_idx = None
    return q, scales, zeros, g_idx


def _from_grid(
    q: np.ndarray,
    scales: np.ndarray,
    zeros: np.ndarray,
    bits: int,
    group_size: int,
    g_idx: Optional[np.ndarray] = None,
    sym: bool = False,
) -> QuantizedTensor:
    """q [K, N] in ORIGINAL feature order (+ optional g_idx) -> canonical."""
    K, N = q.shape
    perm = None
    if g_idx is not None:
        default = np.arange(K) // (K if group_size == -1 else group_size)
        if not np.array_equal(g_idx, default):
            perm = np.argsort(g_idx, kind="stable").astype(np.int32)
            q = q[perm]
    return QuantizedTensor(
        qweight=pack_rows(jnp.asarray(q.astype(np.int32)), bits),
        scales=jnp.asarray(scales.astype(np.float16)),
        zeros=jnp.asarray(zeros.astype(np.float16)),
        perm=None if perm is None else jnp.asarray(perm),
        bits=bits,
        group_size=group_size,
        in_features=K,
        out_features=N,
        sym=sym,
    )


# ---------------------------------------------------------------------------
# GPTQ
# ---------------------------------------------------------------------------


def _export_gptq(qt: QuantizedTensor, autogptq: bool = False):
    q, scales, zeros, g_idx = _to_grid(qt)
    K = qt.in_features
    g = qt.effective_group_size
    if g_idx is not None:
        # canonical rows are permuted; GPTQ stores original order + g_idx
        perm = np.asarray(qt.perm)
        q_orig = np.empty_like(q)
        q_orig[perm] = q
        q = q_orig
    else:
        g_idx = (np.arange(K) // g).astype(np.int32)
    z = zeros - 1 if autogptq else zeros
    z = z.astype(np.uint32) & ((1 << qt.bits) - 1)
    return {
        "qweight": _pack_rows_ref(q, qt.bits).astype(np.int32),
        "qzeros": _pack_fields(z.astype(np.int32), qt.bits, axis=1).astype(np.int32)
        if qt.bits in (2, 4, 8)
        else _pack_bitstream(z.T.astype(np.int32), qt.bits).T.astype(np.int32),
        "scales": scales,
        "g_idx": g_idx,
    }


def _import_gptq(
    t: dict, bits: int, group_size: int, autogptq: bool = False, sym: bool = False
) -> QuantizedTensor:
    qweight = np.asarray(t["qweight"])
    scales = np.asarray(t["scales"])
    G, N = scales.shape
    K = group_size * G if group_size != -1 else _gptq_rows(qweight, bits)
    q = _unpack_rows_ref(qweight, bits, K)
    if bits in (2, 4, 8):
        zeros = _unpack_fields(np.asarray(t["qzeros"]), bits, axis=1, size=N)
    else:
        zeros = _unpack_bitstream(np.asarray(t["qzeros"]).T, bits, N).T
    if autogptq:
        zeros = (zeros + 1) & ((1 << bits) - 1)
    g_idx = np.asarray(t["g_idx"]) if t.get("g_idx") is not None else None
    return _from_grid(q, scales, zeros, bits, group_size, g_idx, sym)


def _gptq_rows(qweight: np.ndarray, bits: int) -> int:
    return qweight.shape[0] * 32 // bits


# ---------------------------------------------------------------------------
# AWQ GEMM / GEMV (4-bit)
# ---------------------------------------------------------------------------


def _export_awq_gemm(qt: QuantizedTensor):
    if qt.bits != 4:
        raise ValueError("AWQ GEMM layout is 4-bit only")
    if qt.perm is not None:
        raise ValueError("AWQ GEMM layout does not support act_order")
    q, scales, zeros, _ = _to_grid(qt)
    order = _awq_interleave(qt.out_features)
    return {
        "qweight": _pack_fields(q[:, order], 4, axis=1).astype(np.int32),
        "qzeros": _pack_fields(zeros[:, order], 4, axis=1).astype(np.int32),
        "scales": scales,
    }


def _import_awq_gemm(t: dict, group_size: int) -> QuantizedTensor:
    scales = np.asarray(t["scales"])
    G, N = scales.shape
    qweight = np.asarray(t["qweight"])
    K = qweight.shape[0]
    order = _awq_interleave(N)
    inv = np.argsort(order)
    q = _unpack_fields(qweight, 4, axis=1, size=N)[:, inv]
    zeros = _unpack_fields(np.asarray(t["qzeros"]), 4, axis=1, size=N)[:, inv]
    return _from_grid(q, scales, zeros, 4, group_size)


def _gemv_zeros_width(K: int, g: int) -> int:
    mult = {128: 1, 64: 2, 32: 4}.get(min(g, 128), 1)
    base = -(-(K // g) // 8)
    return -(-base // mult) * mult


def _export_awq_gemv(qt: QuantizedTensor):
    if qt.bits != 4 or qt.perm is not None:
        raise ValueError("AWQ GEMV layout: 4-bit, no act_order")
    q, scales, zeros, _ = _to_grid(qt)
    K, N = qt.in_features, qt.out_features
    g = qt.effective_group_size
    width = _gemv_zeros_width(K, g)
    qz = np.zeros((N, width), np.uint32)
    sc = np.zeros((N, width * 8), np.float16)
    G = K // g
    qweight = _pack_fields(q.T.astype(np.int32), 4, axis=1).astype(np.int32)
    zT = zeros.T.astype(np.uint32)  # [N, G]
    for col in range(-(-G // 8)):
        for i in range(8):
            src = col * 8 + i
            if src < G:
                qz[:, col] |= zT[:, src] << (4 * i)
    sc[:, :G] = scales.T
    return {
        "qweight": qweight,
        "qzeros": qz.astype(np.int32),
        "scales": sc,
    }


def _import_awq_gemv(t: dict, group_size: int) -> QuantizedTensor:
    qweight = np.asarray(t["qweight"])  # [N, K/8]
    N = qweight.shape[0]
    K = qweight.shape[1] * 8
    g = K if group_size == -1 else group_size
    G = K // g
    q = _unpack_fields(qweight, 4, axis=1, size=K).T  # [K, N]
    qz = np.asarray(t["qzeros"]).astype(np.uint32)
    zeros = np.zeros((G, N), np.int32)
    for src in range(G):
        zeros[src] = (qz[:, src // 8] >> (4 * (src % 8))) & 0xF
    scales = np.asarray(t["scales"])[:, :G].T.astype(np.float16)
    return _from_grid(q, scales, zeros, 4, group_size)


# ---------------------------------------------------------------------------
# ORT MatMulNBits (4-bit)
# ---------------------------------------------------------------------------


def _export_ort(qt: QuantizedTensor):
    if qt.bits != 4:
        raise ValueError("ORT MatMulNBits export is 4-bit only")
    q, scales, zeros, g_idx = _to_grid(qt)
    if qt.perm is not None:
        perm = np.asarray(qt.perm)
        q_orig = np.empty_like(q)
        q_orig[perm] = q
        q = q_orig
    K, N = qt.in_features, qt.out_features
    g = qt.effective_group_size
    G = K // g
    qT = q.T.astype(np.uint8)  # [N, K]
    qw = (qT[:, 0::2] | (qT[:, 1::2] << 4)).reshape(N, G, g // 2)
    # zero_points: n-major, adjacent-G pairs packed low-nibble-first —
    # exactly onnxruntime's MatMulNBits layout and the reference's
    # pack_on_device (quant_linear_onnxruntime.py:115-136: zeros.T to
    # [N, G], pad G to even, z[:,0::2] | z[:,1::2]<<4, flatten)
    zT = zeros.astype(np.uint8).T  # [N, G]
    if G % 2:
        zT = np.pad(zT, ((0, 0), (0, 1)))
    qz = (zT[:, 0::2] | (zT[:, 1::2] << 4)).reshape(-1)
    return {
        "qweight": qw,
        "qzeros": qz,
        "scales": scales.T.reshape(-1),  # n-major flat
        "g_idx": (np.arange(K) // g).astype(np.int32)
        if g_idx is None
        else g_idx,
    }


def _import_ort(t: dict, bits: int, group_size: int) -> QuantizedTensor:
    qw = np.asarray(t["qweight"])  # [N, G, g/2] uint8
    N, G, half_g = qw.shape
    g = half_g * 2
    K = G * g
    qT = np.zeros((N, K), np.int32)
    qT[:, 0::2] = qw.reshape(N, -1) & 0xF
    qT[:, 1::2] = (qw.reshape(N, -1) >> 4) & 0xF
    qz = np.asarray(t["qzeros"]).reshape(N, -1)  # [N, ceil_even(G)/2]
    zpad = np.zeros((N, qz.shape[1] * 2), np.int32)
    zpad[:, 0::2] = qz & 0xF
    zpad[:, 1::2] = (qz >> 4) & 0xF
    zeros = zpad[:, :G].T  # [G, N]
    scales = np.asarray(t["scales"]).reshape(N, G).T.astype(np.float16)
    g_idx = np.asarray(t["g_idx"]) if t.get("g_idx") is not None else None
    return _from_grid(qT.T, scales, zeros, 4, group_size, g_idx)


# ---------------------------------------------------------------------------
# Marlin (4-bit symmetric, g in {-1, 128})
# ---------------------------------------------------------------------------


def _marlin_perms():
    perm = []
    for i in range(32):
        perm1 = []
        col = i // 4
        for block in (0, 1):
            for row in (
                2 * (i % 4),
                2 * (i % 4) + 1,
                2 * (i % 4 + 4),
                2 * (i % 4 + 4) + 1,
            ):
                perm1.append(16 * row + col + 8 * block)
        for j in range(4):
            perm.extend(p + 256 * j for p in perm1)
    perm = np.array(perm)
    interleave = np.array([0, 2, 4, 6, 1, 3, 5, 7])
    perm = perm.reshape(-1, 8)[:, interleave].ravel()
    scale_perm = [i + 8 * j for i in range(8) for j in range(8)]
    scale_perm = np.array(
        [i + 8 * j for i in range(8) for j in range(8)]
    )
    scale_perm_single = np.array(
        [2 * i + j for i in range(4) for j in (0, 1, 8, 9, 16, 17, 24, 25)]
    )
    return perm, scale_perm, scale_perm_single


_MARLIN_PERM, _MARLIN_SCALE_PERM, _MARLIN_SCALE_PERM_SINGLE = _marlin_perms()


def _export_marlin(qt: QuantizedTensor):
    if qt.bits != 4:
        raise ValueError("Marlin is 4-bit only")
    if not qt.sym:
        raise ValueError("Marlin requires symmetric quantization (zeros == 8)")
    if qt.perm is not None:
        raise ValueError("Marlin does not support act_order")
    K, N = qt.in_features, qt.out_features
    g = qt.effective_group_size
    if g not in (128, K):
        raise ValueError("Marlin supports group_size -1 or 128 only")
    if K % 128 or N % 256:
        raise ValueError("Marlin needs K % 128 == 0 and N % 256 == 0")
    q, scales, zeros, _ = _to_grid(qt)
    if not np.all(zeros == 8):
        raise ValueError("Marlin requires zeros == 8")
    tile = 16
    w = q.reshape(K // tile, tile, N // tile, tile).transpose(0, 2, 1, 3)
    w = w.reshape(K // tile, N * tile)
    w = w.reshape(-1, _MARLIN_PERM.size)[:, _MARLIN_PERM].reshape(w.shape)
    qw = np.zeros((w.shape[0], w.shape[1] // 8), np.uint32)
    for i in range(8):
        qw |= w[:, i::8].astype(np.uint32) << (4 * i)
    if g != K:
        s = scales.reshape(-1, _MARLIN_SCALE_PERM.size)[:, _MARLIN_SCALE_PERM]
    else:
        s = scales.reshape(-1, _MARLIN_SCALE_PERM_SINGLE.size)[
            :, _MARLIN_SCALE_PERM_SINGLE
        ]
    return {
        "qweight": qw.astype(np.int32),
        "scales": s.reshape(-1, N).astype(np.float16),
    }


def _import_marlin(t: dict, group_size: int) -> QuantizedTensor:
    """Exact inversion of the Marlin pack (the reference cannot do this,
    quant_linear_marlin.py:139-140)."""
    qw = np.asarray(t["qweight"]).astype(np.uint32)  # [K/16, N*16/8]
    tile = 16
    Kt, cols = qw.shape
    K = Kt * tile
    N = cols * 8 // tile
    w = np.zeros((Kt, cols * 8), np.int32)
    for i in range(8):
        w[:, i::8] = (qw >> (4 * i)) & 0xF
    inv_perm = np.argsort(_MARLIN_PERM)
    w = w.reshape(-1, _MARLIN_PERM.size)[:, inv_perm].reshape(Kt, N * tile)
    q = (
        w.reshape(Kt, N // tile, tile, tile)
        .transpose(0, 2, 1, 3)
        .reshape(K, N)
    )
    s = np.asarray(t["scales"])  # [G, N] permuted
    g = K if group_size == -1 else group_size
    if g != K:
        inv_s = np.argsort(_MARLIN_SCALE_PERM)
        scales = s.reshape(-1, _MARLIN_SCALE_PERM.size)[:, inv_s].reshape(
            K // g, N
        )
    else:
        inv_s = np.argsort(_MARLIN_SCALE_PERM_SINGLE)
        scales = s.reshape(-1, _MARLIN_SCALE_PERM_SINGLE.size)[:, inv_s].reshape(
            1, N
        )
    zeros = np.full_like(scales, 8.0, dtype=np.float16).astype(np.int32)
    return _from_grid(q, scales.astype(np.float16), zeros, 4, group_size, sym=True)


# ---------------------------------------------------------------------------
# HQQ (GPTQ-style qweight + unpacked float scales/zeros)
# ---------------------------------------------------------------------------


def _export_hqq(qt: QuantizedTensor):
    q = np.asarray(unpack_rows(qt.qweight, qt.bits, qt.in_features))
    if qt.perm is not None:
        perm = np.asarray(qt.perm)
        q_orig = np.empty_like(q)
        q_orig[perm] = q
        q = q_orig
    return {
        "qweight": _pack_rows_ref(q, qt.bits).astype(np.int32),
        "scales": np.asarray(qt.scales).astype(np.float16),
        "zeros": np.asarray(qt.zeros).astype(np.float16),
    }


def _import_hqq(t: dict, bits: int, group_size: int) -> QuantizedTensor:
    scales = np.asarray(t["scales"])
    G, N = scales.shape
    K = G * (group_size if group_size != -1 else _gptq_rows(
        np.asarray(t["qweight"]), bits
    ))
    q = _unpack_rows_ref(np.asarray(t["qweight"]), bits, K)
    return QuantizedTensor(
        qweight=pack_rows(jnp.asarray(q), bits),
        scales=jnp.asarray(scales.astype(np.float16)),
        zeros=jnp.asarray(np.asarray(t["zeros"]).astype(np.float16)),
        perm=None,
        bits=bits,
        group_size=group_size,
        in_features=K,
        out_features=N,
        sym=False,
    )


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def export_layout(qt: QuantizedTensor, pack_mode: str, autogptq: bool = False):
    """Canonical -> foreign tensor dict (numpy arrays, checkpoint-ready)."""
    pack_mode = pack_mode.upper()
    if pack_mode == "GPTQ":
        return _export_gptq(qt, autogptq=autogptq)
    if pack_mode == "GEMM":
        return _export_awq_gemm(qt)
    if pack_mode == "GEMV":
        return _export_awq_gemv(qt)
    if pack_mode == "ORT":
        return _export_ort(qt)
    if pack_mode == "MARLIN":
        return _export_marlin(qt)
    if pack_mode == "HQQ":
        return _export_hqq(qt)
    raise ValueError(f"unknown pack_mode {pack_mode}; use one of {PACK_MODES}")


def import_layout(
    tensors: dict,
    pack_mode: str,
    bits: int,
    group_size: int,
    autogptq: bool = False,
    sym: bool = False,
) -> QuantizedTensor:
    """Foreign tensor dict -> canonical QuantizedTensor."""
    pack_mode = pack_mode.upper()
    if pack_mode == "GPTQ":
        return _import_gptq(tensors, bits, group_size, autogptq=autogptq, sym=sym)
    if pack_mode == "GEMM":
        return _import_awq_gemm(tensors, group_size)
    if pack_mode == "GEMV":
        return _import_awq_gemv(tensors, group_size)
    if pack_mode == "ORT":
        return _import_ort(tensors, bits, group_size)
    if pack_mode == "MARLIN":
        return _import_marlin(tensors, group_size)
    if pack_mode == "HQQ":
        return _import_hqq(tensors, bits, group_size)
    raise ValueError(f"unknown pack_mode {pack_mode}; use one of {PACK_MODES}")
