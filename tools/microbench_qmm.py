#!/usr/bin/env python
"""Microbenchmark the stacked decode qmm kernel vs the streaming ceiling.

Times, per (K, N) geometry at decode M:
  * stream : a read-only Pallas kernel over the SAME qweight blocks —
             the practical HBM streaming ceiling for that access pattern
  * v3     : the shipping stacked kernel (env-tunable bk/bn)
  * planar : the planar stacked kernel (when geometry admits it)

Each timing runs ITERS chained kernel calls inside one jit (output feeds
a dummy dependency into the next call) so the ~30 ms tunnel RTT
amortizes away.

Usage: python tools/microbench_qmm.py [case ...]
  case = K,N[,g]   (default cases: 4096,4096 4096,11264 11264,4096)
Env: QLLM_TPU_QMM_BK / QLLM_TPU_QMM_BN (kernel block sizes),
     QLLM_MB_ITERS (default 512), QLLM_MB_M (default 8).
"""

import functools
import os
import sys
import time

import faulthandler

faulthandler.dump_traceback_later(3000, exit=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


ITERS = int(os.environ.get("QLLM_MB_ITERS", "512"))
M = int(os.environ.get("QLLM_MB_M", "8"))
L = 4  # stacked depth (any small value; kernel reads one layer)


def stream_time(qweight, bk, bn, pf=8):
    """Read-only streaming ceiling for this block pattern (delegates to
    qllm_tpu.ops.stream_bench — one shared implementation with bench.py)."""
    from qllm_tpu.ops.stream_bench import stream_pass_seconds

    return stream_pass_seconds(qweight, bk, bn, pf=pf, iters=ITERS), {}


def kernel_time(fn, x, *args):
    """Chain ITERS dependent calls of fn(x, *args) in one jit; report
    (wall_per_call, traced_kernel_us): the trace-derived number is the
    on-device duration of the Pallas op itself (per call), immune to the
    harness's per-iteration overhead."""

    def one(c, _):
        y = fn(c, *args)
        c2 = c * (1 + 0 * y[0, 0]).astype(c.dtype)
        return c2, None

    @jax.jit
    def loop(x0):
        xx, _ = jax.lax.scan(one, x0, None, length=ITERS)
        return xx

    np.asarray(loop(x))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(x))
        best = min(best, time.time() - t0)
    traced = trace_op_us(lambda: np.asarray(loop(x)))
    return best / ITERS, traced


def trace_op_us(run):
    """Run ``run()`` under the JAX profiler; return {op: us_per_iter}
    for the top TPU ops (keyed by cleaned op name)."""
    import glob
    import gzip
    import json
    import re

    trace_dir = "/tmp/qllm_mb_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        run()
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        return {}
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    ev = trace["traceEvents"]
    tpu_pids = {
        e["pid"]
        for e in ev
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "tpu" in e.get("args", {}).get("name", "").lower()
    }
    agg = {}
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        key = re.sub(r"[.\d]+$", "", e.get("name", ""))
        agg[key] = agg.get(key, 0.0) + e.get("dur", 0)
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    return {k: v / ITERS for k, v in rows[:6]}


def main():
    from qllm_tpu.quant.qtensor import quantize_tensor, planarize_packed
    from qllm_tpu.ops.pallas_qmm import (
        qmatmul_pallas_stacked,
        planar_bk,
        _choose_bk,
        _pick_block,
    )
    import dataclasses

    cases = sys.argv[1:] or ["4096,4096", "4096,11264", "11264,4096"]
    rng = np.random.default_rng(0)
    for case in cases:
        parts = [int(v) for v in case.split(",")]
        K, N = parts[0], parts[1]
        g = parts[2] if len(parts) > 2 else 128
        w = rng.normal(size=(K, N)).astype(np.float32) * 0.02
        qt = quantize_tensor(jnp.asarray(w), bits=4, group_size=g)
        # stack L copies + f32 scales + prefold (mirrors models.stacked)
        qw_st = jnp.broadcast_to(qt.qweight[None], (L, *qt.qweight.shape))
        sc = qt.scales.astype(jnp.float32)
        zr = qt.zeros.astype(jnp.float32)
        sc_st = jnp.broadcast_to(sc[None], (L, *sc.shape))
        zs_st = jnp.broadcast_to((zr * sc)[None], (L, *zr.shape))
        qt_st = dataclasses.replace(
            qt,
            qweight=qw_st,
            scales=sc_st,
            zeros=zs_st,
            zeros_prefolded=True,
        )
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        layer = jnp.int32(1)

        wbytes = qt.qweight.size * 4
        sbytes = sc.size * 4 * 2
        bk_env = int(os.environ.get("QLLM_TPU_QMM_BK", "2048"))
        bn = _pick_block(N, 128, int(os.environ.get("QLLM_TPU_QMM_BN", "512")))
        bk = _choose_bk(K, g, 8, bk_env)
        try:
            dt_s, tr_s = stream_time(qw_st, bk, bn)
            log(
                f"[{K}x{N} g{g}] stream bk={bk} bn={bn}: {dt_s*1e6:.1f} us "
                f"wall = {wbytes/dt_s/1e9:.0f} GB/s; traced: "
                + ", ".join(f"{k}={v:.1f}us" for k, v in tr_s.items())
            )
        except Exception as e:
            log(f"[{K}x{N} g{g}] stream bk={bk} bn={bn}: FAILED ({e})")

        dt, tr = kernel_time(lambda xx: qmatmul_pallas_stacked(xx, qt_st, layer), x)
        log(
            f"[{K}x{N} g{g}] v3     bk={bk} bn={bn}: {dt*1e6:.1f} us wall"
            f" = {(wbytes+sbytes)/dt/1e9:.0f} GB/s; traced: "
            + ", ".join(f"{k}={v:.1f}us" for k, v in tr.items())
        )

        # fused-correction variants (in-kernel zero-point subtract)
        os.environ["QLLM_TPU_FUSED_CORR"] = "1"
        dt4, tr4 = kernel_time(
            lambda xx: qmatmul_pallas_stacked(xx, qt_st, layer), x
        )
        log(
            f"[{K}x{N} g{g}] v4fuse bk={bk} bn={bn}: traced: "
            + ", ".join(f"{k}={v:.1f}us" for k, v in tr4.items())
        )
        qt_bf = dataclasses.replace(
            qt_st,
            scales=sc_st.astype(jnp.bfloat16),
            zeros=zs_st.astype(jnp.bfloat16),
        )
        dt4b, tr4b = kernel_time(
            lambda xx: qmatmul_pallas_stacked(xx, qt_bf, layer), x
        )
        log(
            f"[{K}x{N} g{g}] v4bf16 bk={bk} bn={bn}: traced: "
            + ", ".join(f"{k}={v:.1f}us" for k, v in tr4b.items())
        )
        del os.environ["QLLM_TPU_FUSED_CORR"]

        pbk = planar_bk(K, g, bk_env)
        if pbk is not None:
            qw_pl = jnp.stack(
                [planarize_packed(qw_st[i], K) for i in range(L)]
            )
            qt_pl = dataclasses.replace(qt_st, qweight=qw_pl, planar=True)
            dtp, trp = kernel_time(
                lambda xx: qmatmul_pallas_stacked(xx, qt_pl, layer), x
            )
            log(
                f"[{K}x{N} g{g}] planar bk={pbk} bn={bn}: {dtp*1e6:.1f} us wall"
                f" = {(wbytes+sbytes)/dtp/1e9:.0f} GB/s; traced: "
                + ", ".join(f"{k}={v:.1f}us" for k, v in trp.items())
            )
            os.environ["QLLM_TPU_FUSED_CORR"] = "1"
            _, trpf = kernel_time(
                lambda xx: qmatmul_pallas_stacked(xx, qt_pl, layer), x
            )
            log(
                f"[{K}x{N} g{g}] plfuse bk={pbk} bn={bn}: traced: "
                + ", ".join(f"{k}={v:.1f}us" for k, v in trpf.items())
            )
            qt_plb = dataclasses.replace(
                qt_pl,
                scales=qt_pl.scales.astype(jnp.bfloat16),
                zeros=qt_pl.zeros.astype(jnp.bfloat16),
            )
            _, trpb = kernel_time(
                lambda xx: qmatmul_pallas_stacked(xx, qt_plb, layer), x
            )
            log(
                f"[{K}x{N} g{g}] plbf16 bk={pbk} bn={bn}: traced: "
                + ", ".join(f"{k}={v:.1f}us" for k, v in trpb.items())
            )
            del os.environ["QLLM_TPU_FUSED_CORR"]


if __name__ == "__main__":
    main()
