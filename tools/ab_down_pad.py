#!/usr/bin/env python
"""A/B: pad llama down-proj K 11008 -> 11264 (2^10*11) so the blocked
planar prefill kernel gets bk in {512, 1024} (relaxed quantum), vs the
shipping full-K variant at K=11008 (149 TFLOP/s, the r3 ceiling for
this shape — tools/ab_prefill_relaxed_bk.py).

Effective TFLOP/s uses the LOGICAL flops (2*M*11008*N): the +2.3% pad
rows count against the padded candidates, so a win here is a real
prefill win. Context row: mistral's K=14336 (bk=2048 regular quantum),
the geometry that proves 0.77 MFU on the same kernels.

Run on the TPU: python tools/ab_down_pad.py
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
from qllm_tpu.quant.qtensor import (
    pad_in_features,
    planarize_packed,
    quantize_tensor,
)


def log(*a):
    print(*a, flush=True)


L = 4
g = 128
bits = 4
K_LOG, N = 11008, 4096


def build(K_pad):
    rng = np.random.default_rng(0)
    qt = quantize_tensor(
        jnp.asarray(rng.normal(size=(K_LOG, N)).astype(np.float32) * 0.05),
        bits=bits,
        group_size=g,
    )
    if K_pad != K_LOG:
        qt = pad_in_features(qt, K_pad)
    stacked = tu.tree_map(lambda a: jnp.stack([a] * L), qt)
    zs = stacked.zeros * stacked.scales
    pqw = jnp.stack(
        [planarize_packed(stacked.qweight[i], K_pad) for i in range(L)]
    )
    stacked = dataclasses.replace(
        stacked,
        qweight=pqw,
        scales=stacked.scales.astype(jnp.bfloat16),
        zeros=zs.astype(jnp.bfloat16),
        planar=True,
        zeros_prefolded=True,
    )
    return qt, stacked


def time_mode(stacked, x, M, K, bn, bk):
    flops_per = 2.0 * M * K_LOG * N  # logical work only
    n_lo = 8
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
    rng = np.random.default_rng(1)

    # parity: padded blocked kernel vs unpadded reference matmul
    qt_pad, st_pad = build(11264)
    from qllm_tpu.quant.qtensor import QuantizedTensor
    from qllm_tpu.ops.ref_matmul import qmatmul

    qt_ref, st_ref = build(K_LOG)
    x64 = jnp.asarray(rng.normal(size=(64, K_LOG)).astype(np.float32))
    x64p = jnp.pad(x64, ((0, 0), (0, 11264 - K_LOG)))
    os.environ["QLLM_TPU_QMM_FULLK_MAX"] = "0"
    y_k = np.asarray(
        pq._qmm_2d_stacked(
            x64p, jnp.int32(0), st_pad.qweight, st_pad.scales, st_pad.zeros,
            bits, g, 11264, N, planar=True, prefolded=True, fuse_corr=True,
            bn_opt=512, bk_opt=1024,
        )
    )
    y_ref = np.asarray(qmatmul(x64, qt_ref))
    rel = np.abs(y_k - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    log(f"parity padded-bk1024 M=64: max rel err {rel:.4g}")
    assert rel < 2e-2, "parity failure"
    os.environ["QLLM_TPU_QMM_FULLK_MAX"] = str(4 << 20)

    for M in (512, 2048):
        x = jnp.asarray(rng.normal(size=(M, K_LOG)).astype(np.float32))
        xp = jnp.pad(x, ((0, 0), (0, 11264 - K_LOG)))
        cands = [
            ("fullk-11008   ", st_ref, x, K_LOG, 0, str(4 << 20)),
            ("pad11264-bk512 ", st_pad, xp, 11264, 512, "0"),
            ("pad11264-bk1024", st_pad, xp, 11264, 1024, "0"),
        ]
        for name, st, xx, K, bk, fmax in cands:
            os.environ["QLLM_TPU_QMM_FULLK_MAX"] = fmax
            for bn in (512, 1024, 2048):
                pq._qmm_2d_stacked.clear_cache()
                try:
                    tf, sec = time_mode(st, xx, M, K, bn, bk)
                    log(
                        f"M={M} {name} bn={bn}: {tf:7.2f} eff-TFLOP/s"
                        f"  ({sec * 1e3:.2f} ms/call)"
                    )
                except Exception as e:
                    log(f"M={M} {name} bn={bn}: FAIL {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
