#!/usr/bin/env python
"""Aggregated-stack ceiling experiment for the decode o/down kernels
(VERDICT r3 item 7): is o's 633 GB/s (down's 699) pipeline-FILL bound —
i.e. would the same weights stream faster as part of a wider launch —
or is the tall/narrow pattern itself the ceiling?

Method: duplicate the layer's packed columns W -> [W | W | W | W]
(4x N) and run the SAME serving kernel at M=1 over the wide stack. The
wide launch amortizes pipeline fill/drain over 4x the grid steps; the
per-copy GB/s it achieves is the rate o/down would reach if their
weight reads rode a bigger schedule (e.g. o fused into the attention
epilogue or co-scheduled with a neighbor's stream). If per-copy GB/s
~= the single-width kernel, the pattern is the ceiling and no
aggregated schedule can beat it.

Run on the TPU: python tools/ab_width_ceiling.py
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
M = 1


def build(K, N, dup):
    rng = np.random.default_rng(0)
    qt = quantize_tensor(
        jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05),
        bits=bits,
        group_size=g,
    )
    if dup > 1:
        qt = dataclasses.replace(
            qt,
            qweight=jnp.concatenate([qt.qweight] * dup, axis=-1),
            scales=jnp.concatenate([qt.scales] * dup, axis=-1),
            zeros=jnp.concatenate([qt.zeros] * dup, axis=-1),
            out_features=N * dup,
        )
    stacked = tu.tree_map(lambda a: jnp.stack([a] * L), qt)
    zs = stacked.zeros * stacked.scales
    pqw = jnp.stack(
        [planarize_packed(stacked.qweight[i], K) for i in range(L)]
    )
    return dataclasses.replace(
        stacked,
        qweight=pqw,
        scales=stacked.scales.astype(jnp.bfloat16),
        zeros=zs.astype(jnp.bfloat16),
        planar=True,
        zeros_prefolded=True,
    )


def time_kernel(stacked, x, K, N_tot):
    bytes_per = (
        stacked.qweight.nbytes + stacked.scales.nbytes + stacked.zeros.nbytes
    ) / L
    n_lo = 32
    n_hi = n_lo + max(512, int(0.3 / (bytes_per / 700e9)))

    def body(x0, n, qw, sc, zs):
        def one(i, acc):
            y = pq.qmatmul_pallas_stacked(
                x0 + acc[:, :1],
                dataclasses.replace(
                    stacked, qweight=qw, scales=sc, zeros=zs
                ),
                (i % L).astype(jnp.int32),
            )
            return acc + 1e-9 * jnp.sum(y.astype(jnp.float32))[None, None]

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
    return bytes_per / sec / 1e9, sec


def main():
    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(1)
    for K, N, tag in ((4096, 4096, "o"), (11008, 4096, "down")):
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        for dup in (1, 2, 4):
            st = build(K, N, dup)
            gbps, sec = time_kernel(st, x, K, N * dup)
            log(
                f"{tag} dup={dup} (N={N * dup}): {gbps:6.1f} GB/s "
                f"({sec * 1e6:.1f} us total, {sec / dup * 1e6:.1f} us "
                f"per copy)"
            )


if __name__ == "__main__":
    main()
