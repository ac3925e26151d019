#!/usr/bin/env python
"""Sweep bn (and N lane padding) for the planar fused-correction stacked
kernel on the real chip — slope-timed like ops.autotune (tunnel-RTT
immune). Prints GB/s per candidate so tuned_defaults.json picks can be
updated with evidence.

Cases target the 7B serving shapes (profile 2026-08-18: gateup 646 GB/s
and down 590 GB/s lag qkv's 738 GB/s):
  4096x12288 (qkv fused)      bn 512/1024/2048
  4096x22016 (gateup fused)   bn 256/512; padded 22528 -> bn 1024/2048
  11008x4096 (down)           bn 256/512; 1024 with FULLK_MAX raised
  4096x4096  (o)              bn 512/1024/2048
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
M = 8
g = 128
bits = 4


def build(K, N, N_pad):
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
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    return stacked, x


def time_bn(stacked, x, K, N_buf, bn, bk):
    bytes_per = K * N_buf * bits / 8
    n_lo = 64
    n_hi = n_lo + max(256, int(0.4 / (bytes_per / 500e9)))

    def one(i, acc):
        y = pq._qmm_2d_stacked(
            x + acc[:, :1],
            (i % L).astype(jnp.int32),
            stacked.qweight,
            stacked.scales,
            stacked.zeros,
            bits,
            g,
            K,
            N_buf,
            planar=True,
            prefolded=True,
            fuse_corr=True,
            bn_opt=bn,
            bk_opt=bk,
        )
        return acc + 1e-9 * jnp.sum(y)[None, None]

    fn = jax.jit(
        lambda x0, n: jax.lax.fori_loop(0, n, one, jnp.zeros((1, 1), jnp.float32))
    )
    fetch = lambda y: float(jnp.sum(y))  # noqa: E731
    fetch(fn(x, jnp.int32(n_hi)))
    per = []
    for _ in range(5):
        t0 = time.time()
        fetch(fn(x, jnp.int32(n_lo)))
        t_lo = time.time() - t0
        t0 = time.time()
        fetch(fn(x, jnp.int32(n_hi)))
        t_hi = time.time() - t0
        per.append((t_hi - t_lo) / (n_hi - n_lo))
    per.sort()
    return max(per[len(per) // 2], 1e-9), bytes_per


CASES = [
    # (K, N, N_pad, bn list)
    (4096, 12288, 12288, [512, 1024, 2048]),
    (4096, 22016, 22016, [256, 512]),
    (4096, 22016, 22528, [1024, 2048]),  # pad to enable wide bn
    (11008, 4096, 4096, [256, 512, 1024]),
    (4096, 4096, 4096, [512, 1024, 2048]),
    (4096, 32000, 32768, [512, 1024, 2048]),  # lm_head (L=1 in serving)
]

if __name__ == "__main__":
    log("backend:", jax.default_backend())
    for K, N, N_pad, bns in CASES:
        stacked, x = build(K, N, N_pad)
        for bn in bns:
            if N_pad % bn:
                continue
            try:
                dt, bp = time_bn(stacked, x, K, N_pad, bn, 0)
                # GB/s over the TRUE (unpadded) weight bytes: what serving pays
                true_bp = K * N * bits / 8
                log(
                    f"K={K} N={N} pad={N_pad} bn={bn}: {dt*1e6:7.1f} us  "
                    f"{bp/dt/1e9:6.0f} GB/s raw  {true_bp/dt/1e9:6.0f} GB/s effective"
                )
            except Exception as e:
                log(f"K={K} N={N} pad={N_pad} bn={bn}: FAIL {type(e).__name__}: {e}")
