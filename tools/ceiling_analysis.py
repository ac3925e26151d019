#!/usr/bin/env python
"""Per-layer streaming-ceiling analysis for the serving decode kernels.

For each 7B serving shape (the fused stacks the decode step actually
runs), measures on the real chip:

  * stream@bn  — a read-only Pallas pass over the SAME full-K weight
    blocks the serving kernel reads ([1, K/8, bn], grid (1, N/bn)):
    the shape-specific practical HBM ceiling for that access pattern,
    swept over bn ∈ {256, 512, 1024}.
  * kernel     — the shipping full-K planar fused kernel (bf16 scales,
    prefolded zs — the serving configuration) slope-timed per call.

The gap between the GLOBAL best stream number (wide-block gateup reads,
~740 GB/s) and a given layer's kernel GB/s decomposes into
  (a) the layer's own pattern ceiling (narrower N, smaller blocks,
      fewer grid steps to pipeline) — stream@bn shows it, and
  (b) kernel compute/overheads on top — kernel vs stream@same-bn.
Only (b) is addressable by kernel work; (a) is a property of the
layout. This tool exists to separate the two (VERDICT r2 item 3).

Usage: python tools/ceiling_analysis.py [> report]
Env: QLLM_CA_M (default 1). Iterations auto-sized per shape.
"""

import dataclasses
import faulthandler
import functools
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


M = int(os.environ.get("QLLM_CA_M", "1"))
L = 4


def iters_for(nbytes: int) -> int:
    """Size the long run to >= ~250 ms of device time at ~700 GB/s —
    smaller totals drown in tunnel jitter (a 26 us kernel at 384 iters
    is ~10 ms total, and the first cut of this tool printed physically
    impossible numbers like 921 GB/s for down_proj because of it)."""
    est = nbytes / 700e9
    n = max(512, int(0.25 / est))
    return min(n, 32768)

# 7B serving shapes: (name, K, N_padded, g, serving bn from tuned_defaults)
SHAPES = [
    ("qkv", 4096, 12288, 128, 1024),
    ("gateup", 4096, 22528, 128, 1024),
    ("down", 11008, 4096, 128, 256),
    ("o", 4096, 4096, 128, 512),
]


def kernel_seconds(fn, x, iters):
    """Slope-timed per-call seconds for fn(x) (RTT-immune)."""

    def one(c, _):
        y = fn(c)
        # additive 1e-30 dependency: a `0 * y` factor gets algebraically
        # simplified away and the kernel DCE'd (see ops.stream_bench)
        return c + (1e-30 * y[:, :1]).astype(c.dtype), None

    def loop(x0, n):
        xx, _ = jax.lax.scan(one, x0, None, length=n)
        return xx

    lo_n, hi_n = iters // 8, iters
    lo = jax.jit(functools.partial(loop, n=lo_n))
    hi = jax.jit(functools.partial(loop, n=hi_n))
    np.asarray(lo(x))
    np.asarray(hi(x))
    per = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(lo(x))
        t_lo = time.time() - t0
        t0 = time.time()
        np.asarray(hi(x))
        t_hi = time.time() - t0
        per.append((t_hi - t_lo) / (hi_n - lo_n))
    per.sort()
    return max(per[1], 1e-12)


def main():
    from qllm_tpu.ops.stream_bench import stream_pass_seconds
    from qllm_tpu.ops.pallas_qmm import qmatmul_pallas_stacked
    from qllm_tpu.quant.qtensor import quantize_tensor, planarize_packed

    rng = np.random.default_rng(0)
    rows = []
    for name, K, N, g, bn_serve in SHAPES:
        w = rng.normal(size=(K, N)).astype(np.float32) * 0.02
        qt = quantize_tensor(jnp.asarray(w), bits=4, group_size=g)
        zs = qt.zeros * qt.scales
        st = dataclasses.replace(
            qt,
            qweight=jnp.stack([planarize_packed(qt.qweight, K)] * L),
            scales=jnp.stack([qt.scales.astype(jnp.bfloat16)] * L),
            zeros=jnp.stack([zs.astype(jnp.bfloat16)] * L),
            planar=True,
            zeros_prefolded=True,
        )
        # un-planarized packed stack for the stream pass (same bytes,
        # same [1, K/8, bn] block walk as the serving kernel)
        qw_raw = jnp.stack([qt.qweight.astype(jnp.int32)] * L)
        x = jnp.asarray(
            rng.normal(size=(max(8, M), K)).astype(np.float32)
        ).astype(jnp.bfloat16)
        layer = jnp.int32(1)

        wbytes = K * N // 2
        sbytes = 2 * qt.scales.size * 2  # bf16 scales + zs
        stream = {}
        for bn in (256, 512, 1024):
            if N % bn:
                continue
            try:
                sec = stream_pass_seconds(
                    qw_raw, bk=K, bn=bn, pf=8, iters=iters_for(wbytes)
                )
                stream[bn] = wbytes / sec / 1e9
                log(f"[{name} {K}x{N}] stream bn={bn}: {stream[bn]:.0f} GB/s")
            except Exception as e:
                log(f"[{name} {K}x{N}] stream bn={bn} failed: {e}")
        sec_k = kernel_seconds(
            lambda xx: qmatmul_pallas_stacked(xx, st, layer),
            x,
            iters_for(wbytes + sbytes),
        )
        gbps_k = (wbytes + sbytes) / sec_k / 1e9
        log(
            f"[{name} {K}x{N}] kernel (serving bn={bn_serve}): "
            f"{sec_k*1e6:.1f} us = {gbps_k:.0f} GB/s"
        )
        rows.append((name, K, N, stream, bn_serve, gbps_k))

    log("\n== Ceiling decomposition ==")
    log(f"{'layer':8} {'K x N':>14} {'stream@serve-bn':>16} "
        f"{'stream-best':>12} {'kernel':>8} {'kernel/stream':>14}")
    for name, K, N, stream, bn_serve, gbps_k in rows:
        s_at = stream.get(bn_serve, float("nan"))
        s_best = max(stream.values()) if stream else float("nan")
        log(
            f"{name:8} {K:>6}x{N:<7} {s_at:>13.0f} GB/s {s_best:>9.0f} GB/s"
            f" {gbps_k:>5.0f} GB/s {gbps_k / s_at:>13.2f}"
        )


if __name__ == "__main__":
    log("backend:", jax.default_backend())
    main()
