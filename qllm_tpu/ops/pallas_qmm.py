"""Pallas fused unpack → dequant → MXU matmul (W2/W4/W8, grouped scales).

The TPU replacement for the reference's CUDA dequant+GEMM/GEMV family
(csrc/ort_cuda/dq_gemv.cu:189-544, awq gemm_cuda_gen.cu) — ONE kernel
covers prefill (M large) and decode (M small), per SURVEY.md §2.2's
rebuild note.

Design (bandwidth-bound at W4: qweight bytes dominate):
  * qweight stays packed in HBM; blocks [bk/pf, bn] uint32 stream
    through VMEM (Pallas double-buffers automatically).
  * Unpacking avoids any sublane relayout: a K-packed word holds fields
    s = 0..pf-1 of rows k = r·pf+s, so the contraction is split into pf
    sub-matmuls — field s is extracted with one shift+mask (VPU),
    dequantized in place, and contributes dot(x[:, s::pf], w_s) on the
    MXU. The activation is pre-split OUTSIDE the kernel into
    xt[pf, M, K/pf] (one cheap XLA transpose of the small operand) so
    every in-kernel operand is contiguous.
  * Grouped scale/zero: blocks reshape [gpb, g/pf, bn] — sublane-only
    reshape, lanes untouched.
  * fp32 accumulator scratch across the k grid axis.

Odd bit-widths (3/5/6/7) use the bit-plane layout and fall back to the
XLA reference path (dequant fuses into the dot there); they are not on
the serving hot path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.qtensor import QuantizedTensor

__all__ = ["qmatmul_pallas"]


def _pick_block(dim: int, quantum: int, target: int) -> int:
    """Largest multiple of ``quantum`` that divides ``dim`` and is <= target
    (falls back to ``dim`` itself)."""
    best = None
    b = quantum
    while b <= min(dim, target):
        if dim % b == 0:
            best = b
        b += quantum
    return best if best is not None else dim


def _choose_bk(K: int, g: int, pf: int, target: int) -> int:
    """k-block: multiple of 8*pf (sublane alignment of the packed block),
    divides K, and group-aligned (bk % g == 0 or g % bk == 0)."""
    base = 8 * pf
    best = None
    for bk in range(base, K + 1, base):
        if K % bk:
            continue
        if bk % g and g % bk:
            continue
        if bk <= target:
            best = bk
    if best is None:
        best = K  # K itself always satisfies divisibility/group alignment
    return best


def _qmm_kernel(
    xt_ref,  # [pf, bm, bk/pf] bf16
    qw_ref,  # [bk/pf, bn] uint32
    scale_ref,  # [G, bn] f32 (full G axis)
    zero_ref,  # [G, bn] f32
    out_ref,  # [bm, bn]
    acc_ref,  # scratch [bm, bn] f32
    *,
    bits: int,
    bk: int,
    g: int,
):
    pf = 32 // bits
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # groups covered by this k-block
    gpb = max(1, bk // g)  # groups per block
    span = min(g, bk) // pf  # packed rows per group within the block
    first_group = k * bk // g
    scales = scale_ref[pl.ds(first_group, gpb), :]  # [gpb, bn]
    zeros = zero_ref[pl.ds(first_group, gpb), :]

    # Mosaic lacks a uint32->f32 cast; masked fields are < 2**bits so a
    # bitcast to int32 is value-preserving and int32->f32 is supported.
    qw = pltpu.bitcast(qw_ref[:], jnp.int32)  # [bk/pf, bn]
    acc = acc_ref[:]
    for s in range(pf):
        vals = (
            jax.lax.shift_right_logical(qw, jnp.int32(bits * s))
            & jnp.int32((1 << bits) - 1)
        ).astype(jnp.float32)
        vals = vals.reshape(gpb, span, vals.shape[-1])
        w_s = (vals - zeros[:, None, :]) * scales[:, None, :]
        w_s = w_s.reshape(gpb * span, -1).astype(jnp.bfloat16)
        acc = acc + jnp.dot(
            xt_ref[s], w_s, preferred_element_type=jnp.float32
        )
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("bits", "group_size", "in_features", "out_features")
)
def _qmm_2d(
    x: jax.Array,  # [M, K] — M already padded to a multiple of 8
    qweight: jax.Array,
    scales: jax.Array,
    zeros: jax.Array,
    bits: int,
    group_size: int,
    in_features: int,
    out_features: int,
) -> jax.Array:
    K, N = in_features, out_features
    M = x.shape[0]
    pf = 32 // bits
    g = K if group_size == -1 else group_size
    G = K // g

    bk = _choose_bk(K, g, pf, 2048 if M <= 8 else 512)
    bn = _pick_block(N, 128, 512)
    bm = M if M <= 256 else _pick_block(M, 8, 256)

    xt = (
        x.astype(jnp.bfloat16)
        .reshape(M, K // pf, pf)
        .transpose(2, 0, 1)  # [pf, M, K/pf]
    )
    scales = scales.astype(jnp.float32)
    zeros = zeros.astype(jnp.float32)

    grid = (M // bm, N // bn, K // bk)
    kernel = functools.partial(_qmm_kernel, bits=bits, bk=bk, g=g)
    flops = 2 * M * N * K
    bytes_accessed = (
        qweight.size * 4 + scales.size * 8 + xt.size * 2 + M * N * 2
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (pf, bm, bk // pf),
                lambda i, j, k: (0, i, k),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bk // pf, bn),
                lambda i, j, k: (k, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (G, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (G, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        # interpreter mode keeps the kernel testable on the CPU mesh
        interpret=jax.default_backend() == "cpu",
    )(xt, qweight, scales, zeros)
    return out


def qmatmul_pallas(x: jax.Array, qt: QuantizedTensor) -> jax.Array:
    """y = x @ dequant(qt). x: [..., K] (perm already applied by caller)."""
    if qt.bits not in (2, 4, 8):
        raise NotImplementedError(f"pallas path supports 2/4/8 bits, got {qt.bits}")
    K, N = qt.in_features, qt.out_features
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)
    Mp = max(8, ((M + 7) // 8) * 8)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    y = _qmm_2d(
        x2,
        qt.qweight,
        qt.scales,
        qt.zeros,
        qt.bits,
        qt.group_size,
        K,
        N,
    )
    if Mp != M:
        y = y[:M]
    return y.reshape(*lead, N).astype(x.dtype)
