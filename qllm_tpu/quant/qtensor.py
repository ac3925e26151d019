"""Canonical TPU packed quantized-tensor format.

The single internal layout every algorithm targets and every kernel
consumes. Foreign layouts (GPTQ / AWQ-GEMM / Marlin / ORT / HQQ — the
five live layouts of the reference, qllm/modeling/q_layers/*) are
converted to/from this one in layouts.py.

Layout ("tpu.v1"):
  * ``qweight``: ``uint32 [K // (32 // bits), N]`` for bits in {2, 4, 8}
    — row-major K-packed little-endian fields, identical bit order to the
    reference GPTQ fast path (compress_weight.py:10-24), so GPTQ-layout
    import is a reinterpret.  For bits in {3, 5, 6, 7} a bit-plane
    layout ``uint32 [bits * K // 32, N]`` (plane-major) — the TPU-friendly
    rework of the reference "any-bit" bit-matrix trick
    (compress_weight.py:27-43): every plane unpacks with one shift+mask,
    fully vectorized on the VPU with no cross-word straddle.
  * ``scales`` / ``zeros``: ``[G, N]`` float — **zeros are kept unpacked
    and in float** (unlike the reference's int-packed qzeros,
    compress_weight.py:125-135): they are <1% of weight bytes at g=128
    and a float zero-point unifies GPTQ integer zeros with HQQ
    fractional zeros in one dequant formula.
  * ``perm``: optional ``int32 [K]`` for act_order — instead of a g_idx
    gather inside the kernel (the reference ships a whole ``_g`` CUDA
    kernel family for this, csrc/ort_cuda/dq_gemv.cu:189-244), rows are
    pre-permuted group-contiguous at pack time and the activation is
    gathered once outside the kernel: ``y = x[:, perm] @ W_packed``.

Dequant semantics (matches reference _quant_weight/_dequant_weight,
compress_weight.py:98-111)::

    w[k, n] = (q[k, n] - zeros[g(k), n]) * scales[g(k), n]
    g(k) = k // group_size            (group_size == -1 -> one group)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "QuantizedTensor",
    "pack_rows",
    "unpack_rows",
    "quantize_tensor",
    "dequantize_tensor",
    "compute_scale_zero",
]

LAYOUT_VERSION = "tpu.v1"
SUPPORTED_BITS = (2, 3, 4, 5, 6, 7, 8)


def _is_pow2_field(bits: int) -> bool:
    return bits in (2, 4, 8)


# ---------------------------------------------------------------------------
# bit packing / unpacking (pure jnp; works on CPU and TPU, jit-safe)
# ---------------------------------------------------------------------------


def pack_rows(q: jax.Array, bits: int) -> jax.Array:
    """Pack int values q[K, N] in [0, 2**bits) into uint32 words along K.

    bits in {2,4,8}: field packing, 32//bits values per word, value k at
    bit offset (k % pf) * bits  (bit-order identical to reference
    pack_on_row_fast_248bit, compress_weight.py:10-24).
    bits in {3,5,6,7}: bit-plane packing -> [bits * K//32, N], plane-major
    (plane b occupies rows [b*K//32, (b+1)*K//32)).
    """
    if bits not in SUPPORTED_BITS:
        raise ValueError(f"bits must be in {SUPPORTED_BITS}, got {bits}")
    K, N = q.shape
    q = q.astype(jnp.uint32)
    if _is_pow2_field(bits):
        pf = 32 // bits
        if K % pf:
            raise ValueError(f"K={K} not divisible by pack factor {pf}")
        qr = q.reshape(K // pf, pf, N)
        shifts = (jnp.arange(pf, dtype=jnp.uint32) * bits)[None, :, None]
        return jnp.bitwise_or.reduce(qr << shifts, axis=1)
    # bit-plane path
    if K % 32:
        raise ValueError(f"K={K} must be divisible by 32 for {bits}-bit packing")
    planes = []
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, :, None]
    for b in range(bits):
        bit = (q >> np.uint32(b)) & np.uint32(1)
        words = jnp.bitwise_or.reduce(bit.reshape(K // 32, 32, N) << shifts, axis=1)
        planes.append(words)
    return jnp.concatenate(planes, axis=0)


def unpack_rows(packed: jax.Array, bits: int, rows: int) -> jax.Array:
    """Inverse of pack_rows -> int32 [rows, N]."""
    if bits not in SUPPORTED_BITS:
        raise ValueError(f"bits must be in {SUPPORTED_BITS}, got {bits}")
    packed = packed.astype(jnp.uint32)
    n_words, N = packed.shape
    if _is_pow2_field(bits):
        pf = 32 // bits
        mask = np.uint32((1 << bits) - 1)
        shifts = (jnp.arange(pf, dtype=jnp.uint32) * bits)[None, :, None]
        vals = (packed[:, None, :] >> shifts) & mask
        return vals.reshape(n_words * pf, N)[:rows].astype(jnp.int32)
    words_per_plane = rows // 32
    out = jnp.zeros((rows, N), dtype=jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, :, None]
    for b in range(bits):
        plane = packed[b * words_per_plane : (b + 1) * words_per_plane]
        bitvals = (plane[:, None, :] >> shifts) & np.uint32(1)
        out = out | (bitvals.reshape(rows, N) << np.uint32(b))
    return out.astype(jnp.int32)


# ---------------------------------------------------------------------------
# QuantizedTensor pytree
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["qweight", "scales", "zeros", "perm"],
    meta_fields=[
        "bits",
        "group_size",
        "in_features",
        "out_features",
        "sym",
        "planar",
        "zeros_prefolded",
    ],
)
@dataclasses.dataclass(frozen=True)
class QuantizedTensor:
    """Packed weight-only-quantized matrix in the canonical TPU layout.

    Represents the weight of ``y = x @ W`` with ``W: [in_features(K),
    out_features(N)]`` (note: K-major like the reference's qweight, the
    transpose of torch nn.Linear storage).
    """

    qweight: jax.Array  # uint32, see pack_rows
    scales: jax.Array  # [G, N] float
    zeros: jax.Array  # [G, N] float
    perm: Optional[jax.Array]  # int32 [K] or None (act_order input permutation)
    bits: int
    group_size: int  # -1 => one group covering all of K
    in_features: int
    out_features: int
    sym: bool = False
    # planar (4-bit runtime-only relayout, see planarize_packed): word r
    # byte j holds k = 4r+j in the low nibble and k = K/2+4r+j in the
    # high nibble, so a bitcast to int8 yields k-contiguous rows and the
    # activation needs NO pre-split. Kernel-facing; never serialized.
    planar: bool = False
    # zeros_prefolded (runtime-only, set by models.stacked): the zeros
    # field holds zs = zeros * scales so the decode-loop zero-point
    # correction reads ONE array instead of re-reading + multiplying
    # zeros and scales every token (profiled at ~0.4 ms/token on 7B).
    zeros_prefolded: bool = False

    @property
    def n_groups(self) -> int:
        if self.group_size == -1:
            return 1
        return self.in_features // self.group_size

    @property
    def effective_group_size(self) -> int:
        return self.in_features if self.group_size == -1 else self.group_size

    def nbytes(self) -> int:
        total = self.qweight.size * 4 + self.scales.size * self.scales.dtype.itemsize
        total += self.zeros.size * self.zeros.dtype.itemsize
        if self.perm is not None:
            total += self.perm.size * 4
        return total

    def astype_scales(self, dtype) -> "QuantizedTensor":
        return dataclasses.replace(
            self, scales=self.scales.astype(dtype), zeros=self.zeros.astype(dtype)
        )


def compute_scale_zero(
    w: jax.Array,
    bits: int,
    group_size: int,
    sym: bool = False,
    eps: float = 1e-8,
    scale_dtype=jnp.float16,
):
    """Min/max affine scale+zero per (group, out_channel).

    Matches the reference GPTQ scalar quantizer semantics
    (_gptq_quantizer.py:44-72): asym maps [min, max] onto [0, maxq];
    sym uses max-abs with the zero pinned at (maxq+1)/2.

    w: [K, N].  Returns scales [G, N], zeros [G, N] float32.
    """
    K, N = w.shape
    g = K if group_size == -1 else group_size
    maxq = (1 << bits) - 1
    wg = w.reshape(K // g, g, N).astype(jnp.float32)
    if sym:
        mabs = jnp.max(jnp.abs(wg), axis=1)
        scale = jnp.maximum(2.0 * mabs / maxq, eps)
        scale = scale.astype(scale_dtype).astype(jnp.float32)
        zero = jnp.full_like(scale, (maxq + 1) / 2.0)
    else:
        wmin = jnp.minimum(jnp.min(wg, axis=1), 0.0)
        wmax = jnp.maximum(jnp.max(wg, axis=1), 0.0)
        scale = jnp.maximum((wmax - wmin) / maxq, eps)
        # derive the zero from the scale AS STORED (storage-dtype
        # rounded) so clipping at 0/maxq stays consistent
        scale = scale.astype(scale_dtype).astype(jnp.float32)
        zero = jnp.round(-wmin / scale)
    return scale, zero


def quantize_tensor(
    w: jax.Array,
    bits: int = 4,
    group_size: int = 128,
    sym: bool = False,
    scales: Optional[jax.Array] = None,
    zeros: Optional[jax.Array] = None,
    perm: Optional[jax.Array] = None,
    scale_dtype=jnp.float16,
) -> QuantizedTensor:
    """RTN-quantize w[K, N] into the canonical packed layout.

    If scales/zeros are given they are used verbatim (algorithms like
    GPTQ/HQQ compute their own); otherwise min/max affine per group.
    If ``perm`` is given, ``w`` must ALREADY be row-permuted by it
    (w_permuted[k] = w_original[perm[k]]).
    """
    K, N = w.shape
    g = K if group_size == -1 else group_size
    if K % g:
        raise ValueError(f"in_features={K} not divisible by group_size={g}")
    if scales is None or zeros is None:
        scales, zeros = compute_scale_zero(w, bits, group_size, sym)
    # Round-trip through the storage dtype BEFORE quantizing so the
    # stored scales are exactly the ones the integer grid was built on
    # (otherwise fp16 storage shifts dequant by up to maxq * dscale).
    scales = scales.astype(scale_dtype).astype(jnp.float32)
    zeros = zeros.astype(scale_dtype).astype(jnp.float32)
    maxq = (1 << bits) - 1
    ws = w.astype(jnp.float32).reshape(K // g, g, N)
    # round(w/s + z): when z is integral (GPTQ/RTN) this equals
    # round(w/s) + z; when fractional (HQQ) it is the HQQ forward map.
    q = jnp.clip(jnp.round(ws / scales[:, None, :] + zeros[:, None, :]), 0, maxq)
    q = q.reshape(K, N).astype(jnp.int32)
    return QuantizedTensor(
        qweight=pack_rows(q, bits),
        scales=scales.astype(scale_dtype),
        zeros=zeros.astype(scale_dtype),
        perm=None if perm is None else perm.astype(jnp.int32),
        bits=bits,
        group_size=group_size,
        in_features=K,
        out_features=N,
        sym=sym,
    )


def dequantize_tensor(qt: QuantizedTensor, dtype=jnp.float32) -> jax.Array:
    """Unpack to dense [K, N] in the *permuted* row order (i.e. the order
    the kernel consumes; apply qt.perm to activations, not here)."""
    q = unpack_rows(qt.qweight, qt.bits, qt.in_features)
    g = qt.effective_group_size
    K, N = qt.in_features, qt.out_features
    qg = q.reshape(K // g, g, N).astype(jnp.float32)
    w = (qg - qt.zeros.astype(jnp.float32)[:, None, :]) * qt.scales.astype(
        jnp.float32
    )[:, None, :]
    return w.reshape(K, N).astype(dtype)


def planarize_packed(qweight: jax.Array, K: int) -> jax.Array:
    """4-bit GPTQ-order packed rows -> planar layout (see
    QuantizedTensor.planar). Works on [..., K//8, N]; pure jnp, run once
    at load/stack time."""
    lead = qweight.shape[:-2]
    N = qweight.shape[-1]
    q = qweight.reshape((-1, K // 8, N))
    # unpack the 8 interleaved fields
    shifts = (jnp.arange(8, dtype=jnp.uint32) * 4)[None, None, :, None]
    vals = (q.astype(jnp.uint32)[:, :, None, :] >> shifts) & jnp.uint32(0xF)
    vals = vals.reshape(-1, K, N)  # k-order values
    lo = vals[:, : K // 2].reshape(-1, K // 8, 4, N)
    hi = vals[:, K // 2 :].reshape(-1, K // 8, 4, N)
    byte_shift = (jnp.arange(4, dtype=jnp.uint32) * 8)[None, None, :, None]
    words = jnp.bitwise_or.reduce(
        (lo << byte_shift) | (hi << (byte_shift + 4)), axis=2
    )
    return words.reshape(*lead, K // 8, N)


def unplanarize_packed(qweight: jax.Array, K: int) -> jax.Array:
    """Inverse of planarize_packed."""
    lead = qweight.shape[:-2]
    N = qweight.shape[-1]
    q = qweight.reshape((-1, K // 8, N)).astype(jnp.uint32)
    byte_shift = (jnp.arange(4, dtype=jnp.uint32) * 8)[None, None, :, None]
    lo = (q[:, :, None, :] >> byte_shift) & jnp.uint32(0xF)
    hi = (q[:, :, None, :] >> (byte_shift + 4)) & jnp.uint32(0xF)
    vals = jnp.concatenate(
        [lo.reshape(-1, K // 2, N), hi.reshape(-1, K // 2, N)], axis=1
    )  # k-order
    vr = vals.reshape(-1, K // 8, 8, N)
    shifts = (jnp.arange(8, dtype=jnp.uint32) * 4)[None, None, :, None]
    words = jnp.bitwise_or.reduce(vr << shifts, axis=2)
    return words.reshape(*lead, K // 8, N)


def promote_bits(qt: QuantizedTensor) -> QuantizedTensor:
    """Repack an odd-bit tensor at the next power-of-two width (3->4,
    5/6/7->8) so it can ride the fused Pallas kernels. The integer grid,
    scales and zeros are untouched — only the storage widens (3->4 bit
    costs +33% weight bytes; still well below bf16). Even widths return
    unchanged."""
    if qt.bits in (2, 4, 8):
        return qt
    new_bits = 4 if qt.bits == 3 else 8
    q = unpack_rows(qt.qweight, qt.bits, qt.in_features)
    return dataclasses.replace(
        qt, qweight=pack_rows(q, new_bits), bits=new_bits
    )


def take_columns(qt: QuantizedTensor, idx) -> QuantizedTensor:
    """Select output columns ``idx`` — exact for every bit width because
    qweight, scales and zeros are all column-indexed in the canonical
    layout (and the act_order perm lives on the K axis, untouched).

    This is how fused-qkv checkpoints (bloom/neox/falcon
    ``query_key_value``, baichuan ``W_pack``, ... — modeling.archs) are
    split into canonical q/k/v *without dequantizing*."""
    if qt.planar or qt.zeros_prefolded:
        raise ValueError("take_columns on a runtime-relayout tensor")
    idx = jnp.asarray(np.asarray(idx), jnp.int32)
    return dataclasses.replace(
        qt,
        qweight=qt.qweight[:, idx],
        scales=qt.scales[:, idx],
        zeros=qt.zeros[:, idx],
        out_features=int(idx.shape[0]),
    )


def concat_columns(parts, col_indices, out_features: int) -> QuantizedTensor:
    """Inverse of take_columns: scatter each part's columns back into a
    fused [., out_features] tensor (save-side re-fusion for ecosystem
    checkpoints).  Requires identical (bits, group_size, sym,
    in_features) and no act_order perm (a per-part K permutation cannot
    be represented in one fused tensor)."""
    p0 = parts[0]
    for p in parts:
        if (p.bits, p.group_size, p.sym, p.in_features) != (
            p0.bits,
            p0.group_size,
            p0.sym,
            p0.in_features,
        ):
            raise ValueError("concat_columns: mismatched quantization params")
        if p.perm is not None:
            raise ValueError("concat_columns: act_order tensors cannot fuse")
        if p.planar or p.zeros_prefolded:
            raise ValueError("concat_columns on a runtime-relayout tensor")
    rows = p0.qweight.shape[0]
    qw = jnp.zeros((rows, out_features), p0.qweight.dtype)
    sc = jnp.ones((p0.scales.shape[0], out_features), p0.scales.dtype)
    zr = jnp.zeros((p0.zeros.shape[0], out_features), p0.zeros.dtype)
    for p, idx in zip(parts, col_indices):
        idx = jnp.asarray(np.asarray(idx), jnp.int32)
        qw = qw.at[:, idx].set(p.qweight)
        sc = sc.at[:, idx].set(p.scales)
        zr = zr.at[:, idx].set(p.zeros)
    return dataclasses.replace(
        p0, qweight=qw, scales=sc, zeros=zr, out_features=out_features
    )


def pad_out_features(qt: QuantizedTensor, n_new: int) -> QuantizedTensor:
    """Zero-pad the N axis to ``n_new`` (pad columns dequantize to 0 and
    are treated as logical by consumers that can absorb zeros — see
    parallel.tp_step, which pads gate/up so each tensor-parallel shard
    is lane-aligned)."""
    N = qt.out_features
    if n_new == N:
        return qt
    if qt.planar or qt.zeros_prefolded:
        raise ValueError("pad_out_features on a runtime-relayout tensor")
    if n_new < N:
        raise ValueError(f"n_new={n_new} < out_features={N}")
    pad = n_new - N
    return dataclasses.replace(
        qt,
        qweight=jnp.pad(qt.qweight, ((0, 0), (0, pad))),
        scales=jnp.pad(qt.scales, ((0, 0), (0, pad)), constant_values=1.0),
        zeros=jnp.pad(qt.zeros, ((0, 0), (0, pad))),
        out_features=n_new,
    )


def pad_in_features(qt: QuantizedTensor, k_new: int) -> QuantizedTensor:
    """Zero-pad the K axis to ``k_new`` (must be a group_size multiple).

    Pad rows dequantize to (0 - 0) * 1 = 0, so ``x_padded @ W_padded ==
    x @ W`` exactly when the activation pad is also zero — used by
    tensor-parallel serving to align a row-sharded weight's K with its
    column-sharded producer's padded N (parallel.tp_step)."""
    K = qt.in_features
    if k_new == K:
        return qt
    if qt.planar or qt.zeros_prefolded:
        raise ValueError("pad_in_features on a runtime-relayout tensor")
    if qt.perm is not None:
        raise ValueError("pad_in_features with act_order perm")
    g = qt.effective_group_size
    if k_new % g or k_new < K:
        raise ValueError(f"k_new={k_new} must be a group multiple >= K={K}")
    if qt.group_size == -1:
        raise ValueError("pad_in_features requires grouped quantization")
    rows_old = qt.qweight.shape[0]
    rows_new = (
        k_new // (32 // qt.bits)
        if _is_pow2_field(qt.bits)
        else qt.bits * k_new // 32
    )
    if not _is_pow2_field(qt.bits) and K % 32:
        raise ValueError("bit-plane padding requires K % 32 == 0")
    qw = jnp.zeros((rows_new, qt.qweight.shape[1]), qt.qweight.dtype)
    if _is_pow2_field(qt.bits):
        qw = qw.at[:rows_old].set(qt.qweight)
    else:
        # bit-plane layout: planes are contiguous [K//32] row blocks
        wpp_old, wpp_new = K // 32, k_new // 32
        for b in range(qt.bits):
            qw = qw.at[b * wpp_new : b * wpp_new + wpp_old].set(
                qt.qweight[b * wpp_old : (b + 1) * wpp_old]
            )
    G_new = k_new // g
    G_old = qt.n_groups
    sc = jnp.ones((G_new, qt.scales.shape[1]), qt.scales.dtype)
    sc = sc.at[:G_old].set(qt.scales)
    zr = jnp.zeros((G_new, qt.zeros.shape[1]), qt.zeros.dtype)
    zr = zr.at[:G_old].set(qt.zeros)
    return dataclasses.replace(
        qt, qweight=qw, scales=sc, zeros=zr, in_features=k_new
    )


def unpermute_dense(qt: QuantizedTensor, w: jax.Array) -> jax.Array:
    """Undo the act_order permutation, returning rows in original feature order."""
    if qt.perm is None:
        return w
    inv = jnp.zeros_like(qt.perm).at[qt.perm].set(jnp.arange(qt.in_features))
    return w[inv]
