#!/usr/bin/env python
"""Sweep the decode-attention head-block (hb) on the real chip.

Profiled 2026-08-18: ring attention reads 2.36 MB/layer in 8.65 us =
273 GB/s — far under the ~740 GB/s practical stream ceiling. hb sets
programs-per-launch (grid = (B, Hkv/hb)); bigger blocks mean fewer,
larger DMAs. Slope-timed like tools/sweep_bn.py (tunnel-RTT immune).
"""

import faulthandler
import os
import sys
import time

faulthandler.dump_traceback_later(3000, exit=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


L, B, Hkv, S, d = 32, 1, 32, 256, 128
n_rep = 1


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Hkv * n_rep, d)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, Hkv, d)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, Hkv, d)), jnp.float32)
    k8 = jnp.asarray(
        rng.integers(-127, 128, (L, B, Hkv, S, d)), jnp.int8
    )
    v8 = jnp.asarray(
        rng.integers(-127, 128, (L, B, Hkv, S, d)), jnp.int8
    )
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (L, B, Hkv, S)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (L, B, Hkv, S)), jnp.float32)
    rk = jnp.asarray(rng.normal(size=(L, B, Hkv, 8, d)) * 0.5, jnp.bfloat16)
    rv = jnp.asarray(rng.normal(size=(L, B, Hkv, 8, d)) * 0.5, jnp.bfloat16)
    lengths = jnp.full((B,), 200, jnp.int32)

    bytes_per = 2 * Hkv * S * d + 2 * 4 * Hkv * S  # K+V int8 + scales

    for hb in (8, 16, 32):
        os.environ["QLLM_TPU_ATTN_HB"] = str(hb)
        jax.clear_caches()
        from qllm_tpu.ops import pallas_attention as pa

        def one(i, acc):
            out, rk2, rv2 = pa.decode_attention_ring(
                q + acc[:, :1],
                kn,
                vn,
                k8,
                v8,
                ks,
                vs,
                rk,
                rv,
                lengths,
                (i % L).astype(jnp.int32),
            )
            return acc + 1e-9 * jnp.sum(out)[None, None]

        fn = jax.jit(
            lambda q0, n: jax.lax.fori_loop(
                0, n, one, jnp.zeros((1, 1), jnp.float32)
            )
        )
        fetch = lambda y: float(jnp.sum(y))  # noqa: E731
        n_lo, n_hi = 64, 2064
        try:
            fetch(fn(q, jnp.int32(n_hi)))
            per = []
            for _ in range(5):
                t0 = time.time()
                fetch(fn(q, jnp.int32(n_lo)))
                t_lo = time.time() - t0
                t0 = time.time()
                fetch(fn(q, jnp.int32(n_hi)))
                t_hi = time.time() - t0
                per.append((t_hi - t_lo) / (n_hi - n_lo))
            per.sort()
            dt = max(per[len(per) // 2], 1e-9)
            log(
                f"hb={hb:3d}: {dt*1e6:6.2f} us/layer  "
                f"{bytes_per/dt/1e9:5.0f} GB/s  "
                f"(-> {dt*32*1e6:.0f} us/token over 32 layers)"
            )
        except Exception as e:
            log(f"hb={hb}: FAIL {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    log("backend:", jax.default_backend())
    main()
