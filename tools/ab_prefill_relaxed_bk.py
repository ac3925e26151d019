#!/usr/bin/env python
"""A/B the relaxed-quantum blocked planar kernel for llama down-proj
prefill (K=11008, the 16g-quantum-rejected geometry) vs the shipping
full-K variant, on the real chip.

Modes per (M, bn):
  fullk   : full-K planar kernel with VMEM-shrunk bm/bn (the shipping
            prefill path for this shape)
  relaxed : bk=256 blocked planar kernel (gpbh=1 scale blocks), forced
            by QLLM_TPU_QMM_FULLK_MAX=0 (full-K ineligible -> fallback)

RESULT 2026-08-19 (v5e): fullk wins — 149 TFLOP/s at both M=512/2048 vs
relaxed's best 131/140 (bn=2048). The relaxed path ships only as the
fallback for geometries where full-K is ineligible.

Prints TFLOP/s per candidate (prefill is MXU-bound) + a parity check.
Slope-timed (tunnel-RTT immune). Run on the TPU.
"""

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


L = 4
g = 128
bits = 4
K, N = 11008, 4096


def build():
    rng = np.random.default_rng(0)
    qt = quantize_tensor(
        jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05),
        bits=bits,
        group_size=g,
    )
    stacked = tu.tree_map(lambda a: jnp.stack([a] * L), qt)
    zs = stacked.zeros * stacked.scales
    pqw = jnp.stack([planarize_packed(stacked.qweight[i], K) for i in range(L)])
    stacked = dataclasses.replace(
        stacked,
        qweight=pqw,
        scales=stacked.scales.astype(jnp.bfloat16),
        zeros=zs.astype(jnp.bfloat16),
        planar=True,
        zeros_prefolded=True,
    )
    return qt, stacked


def run_once(stacked, x, bn, bk):
    return pq._qmm_2d_stacked(
        x,
        jnp.int32(0),
        stacked.qweight,
        stacked.scales,
        stacked.zeros,
        bits,
        g,
        K,
        N,
        planar=True,
        prefolded=True,
        fuse_corr=True,
        bn_opt=bn,
        bk_opt=bk,
    )


def time_mode(stacked, x, M, bn, bk):
    flops_per = 2.0 * M * K * N
    n_lo = 8
    # target >= 250 ms of device time in the long run
    n_hi = n_lo + max(64, int(0.30 / (flops_per / 80e12)))

    def body(x0, n, qw, sc, zs):
        def one(i, acc):
            y = pq._qmm_2d_stacked(
                x0 + acc[:, :1],
                (i % L).astype(jnp.int32),
                qw,
                sc,
                zs,
                bits,
                g,
                K,
                N,
                planar=True,
                prefolded=True,
                fuse_corr=True,
                bn_opt=bn,
                bk_opt=bk,
            )
            return acc + 1e-9 * jnp.sum(y)[None, None]

        return jax.lax.fori_loop(0, n, one, jnp.zeros((1, 1), jnp.float32))

    fn = jax.jit(body)
    args = (stacked.qweight, stacked.scales, stacked.zeros)
    fetch = lambda y: float(jnp.sum(y))  # noqa: E731
    fetch(fn(x, jnp.int32(n_hi), *args))
    per = []
    for _ in range(5):
        t0 = time.time()
        fetch(fn(x, jnp.int32(n_lo), *args))
        t_lo = time.time() - t0
        t0 = time.time()
        fetch(fn(x, jnp.int32(n_hi), *args))
        t_hi = time.time() - t0
        per.append((t_hi - t_lo) / (n_hi - n_lo))
    per.sort()
    sec = max(per[len(per) // 2], 1e-9)
    return flops_per / sec / 1e12, sec


def main():
    log(f"backend={jax.default_backend()}")
    qt, stacked = build()
    rng = np.random.default_rng(1)

    # parity first (relaxed path forced via FULLK_MAX=0), small M
    os.environ["QLLM_TPU_QMM_FULLK_MAX"] = "0"
    x64 = jnp.asarray(rng.normal(size=(64, K)).astype(np.float32))
    y_k = np.asarray(run_once(stacked, x64, 512, 256))
    from qllm_tpu.ops.ref_matmul import qmatmul

    y_ref = np.asarray(qmatmul(x64, qt))
    rel = np.abs(y_k - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    log(f"parity relaxed-bk M=64: max rel err {rel:.4g}")
    assert rel < 2e-2, "parity failure"

    for M in (512, 2048):
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        for mode, fullk_max, bk in (
            ("fullk  ", str(4 << 20), 0),
            ("relax256", "0", 256),
        ):
            os.environ["QLLM_TPU_QMM_FULLK_MAX"] = fullk_max
            for bn in (512, 1024, 2048):
                pq._qmm_2d_stacked.clear_cache()
                try:
                    tf, sec = time_mode(stacked, x, M, bn, bk)
                    log(
                        f"M={M} {mode} bn={bn}: {tf:7.2f} TFLOP/s"
                        f"  ({sec * 1e3:.2f} ms/call)"
                    )
                except Exception as e:
                    log(f"M={M} {mode} bn={bn}: FAIL {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
