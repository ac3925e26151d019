#!/usr/bin/env python
"""A/B: does sorting MoE selections by expert id dedup the weight
stream in qmatmul_grouped_experts?

The grouped kernel's selection index is the MINOR grid dim and the
weight index map depends only on (ids[i], j); Pallas skips an operand
copy when consecutive grid steps map to the same block. So n=64
selections over E=8 experts should stream ~8 experts' bytes when ids
are sorted (duplicates consecutive) vs ~64 when shuffled round-robin.
This tool measures all three regimes on the real chip (slope timing —
see ops/autotune.py for why wall-clock deltas are the only reliable
timer over the axon tunnel).

Usage: python tools/ab_moe_dedup.py  (env: QLLM_AB_K/N/E/NSEL)
"""

import faulthandler
import os
import sys
import time

faulthandler.dump_traceback_later(2400, exit=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import dataclasses

    from qllm_tpu.ops import pallas_qmm as pq
    from qllm_tpu.quant.qtensor import planarize_packed, quantize_tensor

    K = int(os.environ.get("QLLM_AB_K", "4096"))
    N = int(os.environ.get("QLLM_AB_N", "14336"))
    E = int(os.environ.get("QLLM_AB_E", "8"))
    n_sel = int(os.environ.get("QLLM_AB_NSEL", "64"))

    rng = np.random.default_rng(0)
    qt = quantize_tensor(
        jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05),
        bits=4,
        group_size=128,
    )
    import jax.tree_util as tu

    stacked = tu.tree_map(lambda a: jnp.stack([a] * E), qt)
    pqw = jnp.stack([planarize_packed(stacked.qweight[i], K) for i in range(E)])
    stacked = dataclasses.replace(
        stacked,
        qweight=pqw,
        scales=(stacked.scales).astype(jnp.bfloat16),
        zeros=(stacked.zeros * stacked.scales).astype(jnp.bfloat16),
        planar=True,
        zeros_prefolded=True,
    )
    jax.block_until_ready(stacked.qweight)
    assert pq.grouped_experts_ok(stacked), "kernel ineligible for this shape"
    bytes_per_expert = K * N // 2
    log(
        f"K={K} N={N} E={E} n_sel={n_sel} "
        f"expert={bytes_per_expert/1e6:.1f} MB "
        f"all-read={n_sel*bytes_per_expert/1e6:.0f} MB"
    )

    x_rows = jnp.asarray(
        rng.normal(size=(n_sel, K)).astype(np.float32) * 0.1
    )
    cases = {
        # worst case: no two consecutive selections share an expert
        "roundrobin": np.tile(np.arange(E), n_sel // E + 1)[:n_sel],
        # the serving case after _moe_sparse's sort: duplicates adjacent
        "sorted": np.sort(np.tile(np.arange(E), n_sel // E + 1)[:n_sel]),
        # maximum reuse bound
        "allsame": np.zeros(n_sel, np.int64),
    }

    def make_loop(ids_np):
        ids = jnp.asarray(ids_np, jnp.int32)

        def one(i, acc):
            y = pq.qmatmul_grouped_experts(x_rows + acc[:, :1], stacked, ids)
            return acc + 1e-9 * jnp.sum(y.astype(jnp.float32))[None, None]

        return jax.jit(
            lambda n: jax.lax.fori_loop(
                0, n, one, jnp.zeros((1, 1), jnp.float32)
            )
        )

    n_lo, n_hi = 16, 80
    for name, ids_np in cases.items():
        fn = make_loop(ids_np)
        fetch = lambda y: float(jnp.sum(y))  # noqa: E731
        fetch(fn(jnp.int32(n_lo)))  # compile + warm
        per = []
        for _ in range(5):
            t0 = time.time()
            fetch(fn(jnp.int32(n_lo)))
            t_lo = time.time() - t0
            t0 = time.time()
            fetch(fn(jnp.int32(n_hi)))
            t_hi = time.time() - t0
            per.append((t_hi - t_lo) / (n_hi - n_lo))
        per.sort()
        dt = per[len(per) // 2]
        naive = n_sel * bytes_per_expert
        log(
            f"{name:10s}: {dt*1e6:8.1f} us/launch  "
            f"({naive/dt/1e9:6.0f} GB/s vs all-selection bytes)"
        )


if __name__ == "__main__":
    main()
