#!/usr/bin/env python
"""A/B the W4A8 int8-activation kernel in the PREFILL regime (M=512/
2048) vs the shipping W4A16 paths, on the real chip (VERDICT r3 item 5:
"wire w4a8 into prefill ... or a committed negative result with
measurements").

Physics under test: int8 MXU rate is 2x bf16 on v5e, but the a8 kernel
must dot per GROUP (g=128-deep contractions — scales vary per group),
while the a16 big-dot branch dequantizes once and runs K/2-deep bf16
dots. Candidates per shape:

  a16-blocked : blocked planar kernel (shipping prefill path, K=4096)
  a16-fullk   : full-K big-dot branch (shipping prefill path, K=11008)
  a8-fullk    : full-K kernel with QLLM_TPU_W4A8=1 (per-group int8 dots)

x int8 quantization cost (per-token absmax) is INCLUDED in the a8
timing — the serving path pays it.

Run on the TPU: python tools/ab_a8_prefill.py
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


def build(K, N):
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


def time_mode(stacked, x, M, K, N, bn, bk, fullk_max):
    flops_per = 2.0 * M * K * N
    n_lo = 8
    n_hi = n_lo + max(64, int(0.25 / (flops_per / 80e12)))
    os.environ["QLLM_TPU_QMM_FULLK_MAX"] = fullk_max
    pq._qmm_2d_stacked.clear_cache()

    def body(x0, n, qw, sc, zs):
        def one(i, acc):
            y = pq.qmatmul_pallas_stacked(
                x0 + acc[:, :1], _qt(qw, sc, zs), (i % L).astype(jnp.int32)
            )
            return acc + 1e-9 * jnp.sum(y.astype(jnp.float32))[None, None]

        return jax.lax.fori_loop(0, n, one, jnp.zeros((1, 1), jnp.float32))

    def _qt(qw, sc, zs):
        return dataclasses.replace(stacked, qweight=qw, scales=sc, zeros=zs)

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
    rng = np.random.default_rng(1)
    full = str(4 << 20)
    for K, N, tag in ((4096, 22528, "gateup"), (11008, 4096, "down")):
        qt, stacked = build(K, N)
        # parity: a8 full-K vs the reference matmul
        from qllm_tpu.ops.ref_matmul import qmatmul

        x64 = jnp.asarray(rng.normal(size=(64, K)).astype(np.float32))
        os.environ["QLLM_TPU_W4A8"] = "1"
        os.environ["QLLM_TPU_QMM_FULLK_MAX"] = full
        os.environ["QLLM_TPU_QMM_PREFILL_FULLK_A8"] = "1"
        pq._qmm_2d_stacked.clear_cache()
        y8 = np.asarray(
            pq.qmatmul_pallas_stacked(x64, stacked, jnp.int32(0))
        ).astype(np.float32)
        os.environ.pop("QLLM_TPU_W4A8", None)
        y_ref = np.asarray(qmatmul(x64, qt))
        rel = np.abs(y8 - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
        log(f"{tag}: a8 parity M=64 rel {rel:.4g}")

        for M in (512,):
            x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
            cands = [("a16-ship", "", full)]
            for name, a8, fmax in cands:
                if a8:
                    os.environ["QLLM_TPU_W4A8"] = "1"
                else:
                    os.environ.pop("QLLM_TPU_W4A8", None)
                tf, sec = time_mode(stacked, x, M, K, N, 0, 0, fmax)
                log(
                    f"{tag} M={M} {name}: {tf:7.2f} TFLOP/s "
                    f"({sec * 1e3:.2f} ms)"
                )
            os.environ["QLLM_TPU_W4A8"] = "1"
            os.environ["QLLM_TPU_QMM_PREFILL_FULLK_A8"] = "1"
            tf, sec = time_mode(stacked, x, M, K, N, 0, 0, full)
            os.environ.pop("QLLM_TPU_W4A8", None)
            log(
                f"{tag} M={M} a8-fullk : {tf:7.2f} TFLOP/s "
                f"({sec * 1e3:.2f} ms)"
            )


if __name__ == "__main__":
    main()
