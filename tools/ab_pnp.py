#!/usr/bin/env python
"""A/B the fused proj->residual+norm->proj kernel (o_proj + gateup in
one launch, ops/pallas_qmm.qmatmul_pnp_stacked) vs the shipping
separate launches at the 7B decode shape, on the real chip.

Ship gate: the fused launch must beat [o kernel + XLA residual/norm +
gateup fused-norm kernel] wall time AND match numerics."""

import dataclasses
import faulthandler
import os
import sys
import time

faulthandler.dump_traceback_later(2400, exit=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import jax.tree_util as tu

from qllm_tpu.ops import pallas_qmm as pq
from qllm_tpu.quant.qtensor import planarize_packed, quantize_tensor


def log(*a):
    print(*a, flush=True)


L, g = 4, 128
K1, D, N2 = 4096, 4096, 22528
eps = 1e-6


def build(K, N):
    rng = np.random.default_rng(hash((K, N)) % 2**31)
    qt = quantize_tensor(
        jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05),
        bits=4,
        group_size=g,
    )
    st = tu.tree_map(lambda a: jnp.stack([a] * L), qt)
    zs = st.zeros * st.scales
    pqw = jnp.stack([planarize_packed(st.qweight[i], K) for i in range(L)])
    return qt, dataclasses.replace(
        st,
        qweight=pqw,
        scales=st.scales.astype(jnp.bfloat16),
        zeros=zs.astype(jnp.bfloat16),
        planar=True,
        zeros_prefolded=True,
    )


def slope_time(fn, *args, reps=5, n_lo=32, n_hi=1600):
    fetch = lambda y: float(jnp.sum(y))  # noqa: E731
    fetch(fn(jnp.int32(n_hi), *args))
    per = []
    for _ in range(reps):
        t0 = time.time()
        fetch(fn(jnp.int32(n_lo), *args))
        t_lo = time.time() - t0
        t0 = time.time()
        fetch(fn(jnp.int32(n_hi), *args))
        t_hi = time.time() - t0
        per.append((t_hi - t_lo) / (n_hi - n_lo))
    per.sort()
    return max(per[len(per) // 2], 1e-9)


def main():
    log(f"backend={jax.default_backend()}")
    qt1, st1 = build(K1, D)
    qt2, st2 = build(D, N2)
    assert pq.pnp_stacked_ok(st1, st2), "pnp not eligible?!"
    rng = np.random.default_rng(1)
    nw = jnp.asarray(rng.normal(size=(L, D)).astype(np.float32) * 0.1 + 1.0)
    x1 = jnp.asarray(rng.normal(size=(1, K1)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(1, D)).astype(np.float32))

    # parity on-chip
    from qllm_tpu.ops.ref_matmul import qmatmul

    hn, y2 = pq.qmatmul_pnp_stacked(x1, h, st1, st2, nw, jnp.int32(1), eps)
    hn_ref = np.asarray(h) + np.asarray(qmatmul(x1, qt1))
    v = (hn_ref**2).mean(-1, keepdims=True)
    x2 = hn_ref / np.sqrt(v + eps) * np.asarray(nw[1])[None]
    y2_ref = np.asarray(qmatmul(jnp.asarray(x2), qt2))
    e1 = np.abs(np.asarray(hn) - hn_ref).max() / (np.abs(hn_ref).max())
    e2 = np.abs(np.asarray(y2, np.float32) - y2_ref).max() / (
        np.abs(y2_ref).max()
    )
    log(f"parity: hn rel {e1:.4g}  y2 rel {e2:.4g}")
    assert e1 < 2e-2 and e2 < 3e-2

    # fused timing
    def body_fused(n, x1, h, qw1, s1, z1, qw2, s2, z2, nw):
        a = dataclasses.replace(st1, qweight=qw1, scales=s1, zeros=z1)
        b = dataclasses.replace(st2, qweight=qw2, scales=s2, zeros=z2)

        def one(i, acc):
            hn, y2 = pq.qmatmul_pnp_stacked(
                x1 + acc[:, :1], h, a, b, nw, (i % L).astype(jnp.int32), eps
            )
            return acc + 1e-9 * (
                jnp.sum(y2.astype(jnp.float32)) + jnp.sum(hn)
            )[None, None]

        return jax.lax.fori_loop(0, n, one, jnp.zeros((1, 1), jnp.float32))

    fused = jax.jit(body_fused)
    args_f = (x1, h, st1.qweight, st1.scales, st1.zeros,
              st2.qweight, st2.scales, st2.zeros, nw)
    sec_f = slope_time(lambda n, *a: fused(n, *a), *args_f)

    # separate: o kernel + XLA residual/norm + gateup fused-norm kernel
    def body_sep(n, x1, h, qw1, s1, z1, qw2, s2, z2, nw):
        a = dataclasses.replace(st1, qweight=qw1, scales=s1, zeros=z1)
        b = dataclasses.replace(st2, qweight=qw2, scales=s2, zeros=z2)

        def one(i, acc):
            l = (i % L).astype(jnp.int32)
            o = pq.qmatmul_pallas_stacked(x1 + acc[:, :1], a, l)
            hn = h + o.astype(jnp.float32)
            y2 = pq.qmatmul_pallas_stacked(
                hn, b, l, norm_w=nw, norm_eps=eps
            )
            return acc + 1e-9 * (
                jnp.sum(y2.astype(jnp.float32)) + jnp.sum(hn)
            )[None, None]

        return jax.lax.fori_loop(0, n, one, jnp.zeros((1, 1), jnp.float32))

    sep = jax.jit(body_sep)
    sec_s = slope_time(lambda n, *a: sep(n, *a), *args_f)

    bytes_tot = (
        st1.qweight.nbytes + st1.scales.nbytes + st1.zeros.nbytes
        + st2.qweight.nbytes + st2.scales.nbytes + st2.zeros.nbytes
    ) / L
    log(
        f"fused   : {sec_f * 1e6:7.1f} us  ({bytes_tot / sec_f / 1e9:.0f} GB/s)"
    )
    log(
        f"separate: {sec_s * 1e6:7.1f} us  ({bytes_tot / sec_s / 1e9:.0f} GB/s)"
    )
    log(f"delta: {(sec_s - sec_f) * 1e6:+.1f} us/layer-pair")


if __name__ == "__main__":
    main()
