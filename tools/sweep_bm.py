#!/usr/bin/env python
"""Sweep the x row-block (bm) for the planar fused-correction stacked
kernel: serving pads M=1 -> 8 rows (sublane quantum), and profiling
suggests x is RE-FETCHED on every grid step (commit 6dd53a6: casting x
to bf16 recovered ~170 us/tok), so 7/8 of that traffic is padding
waste. If bm=1 compiles and wins, drop the row padding in
qmatmul_pallas_stacked.

Slope-timed like ops.autotune (tunnel-RTT immune).
"""

import dataclasses
import faulthandler
import os
import sys
import time

faulthandler.dump_traceback_later(3000, exit=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("QLLM_TPU_QMM_FULLK_MAX", str(8 << 20))

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


def build(K, N, N_pad, L=L):
    rng = np.random.default_rng(0)
    qt = quantize_tensor(
        jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05),
        bits=bits,
        group_size=g,
    )
    stacked = tu.tree_map(lambda a: jnp.stack([a] * L), qt)
    zs = stacked.zeros * stacked.scales
    qw, sc, zsp = stacked.qweight, stacked.scales, zs
    if N_pad != N:
        qw = jnp.pad(qw, ((0, 0), (0, 0), (0, N_pad - N)))
        sc = jnp.pad(sc, ((0, 0), (0, 0), (0, N_pad - N)))
        zsp = jnp.pad(zsp, ((0, 0), (0, 0), (0, N_pad - N)))
    pqw = jnp.stack([planarize_packed(qw[i], K) for i in range(L)])
    stacked = dataclasses.replace(
        stacked,
        qweight=pqw,
        scales=sc.astype(jnp.bfloat16),
        zeros=zsp.astype(jnp.bfloat16),
        planar=True,
        zeros_prefolded=True,
    )
    return stacked


def time_case(stacked, M, K, N_buf, bn):
    bytes_per = K * N_buf * bits / 8
    n_lo = 64
    n_hi = n_lo + max(256, int(0.4 / (bytes_per / 500e9)))
    L_act = stacked.qweight.shape[0]
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))

    def body(x0, n, qw, sc, zs):
        def one(i, acc):
            y = pq._qmm_2d_stacked(
                x0 + acc[:, :1],
                (i % L_act).astype(jnp.int32),
                qw,
                sc,
                zs,
                bits,
                g,
                K,
                N_buf,
                planar=True,
                prefolded=True,
                fuse_corr=True,
                bn_opt=bn,
                bk_opt=0,
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
    return max(per[len(per) // 2], 1e-9), bytes_per


CASES = [
    # (K, N, N_pad, tuned bn[, L]) — the five 7B serving shapes
    (4096, 12288, 12288, 1024),
    (4096, 22016, 22528, 1024),
    (11008, 4096, 4096, 256),
    (4096, 4096, 4096, 512),
    (4096, 32000, 32768, 1024, 1),
]

if __name__ == "__main__":
    log("backend:", jax.default_backend())
    only_n = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    for case in CASES:
        K, N, N_pad, bn = case[:4]
        if only_n and N != only_n:
            continue
        stacked = build(K, N, N_pad, *case[4:])
        for M in (8, 4, 1):
            try:
                dt, bp = time_case(stacked, M, K, N_pad, bn)
                true_bp = K * N * bits / 8
                log(
                    f"K={K} N={N} pad={N_pad} bn={bn} M={M}: {dt*1e6:7.1f} us  "
                    f"{bp/dt/1e9:6.0f} GB/s raw  "
                    f"{true_bp/dt/1e9:6.0f} GB/s effective"
                )
            except Exception as e:
                log(
                    f"K={K} N={N} pad={N_pad} bn={bn} M={M}: "
                    f"FAIL {type(e).__name__}: {e}"
                )
