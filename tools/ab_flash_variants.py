#!/usr/bin/env python
"""Compare prefill attention variants at the 7B shape on the real chip:
ours (current blocks), ours with bigger blocks (env), and splash
attention. Causal, B=1, H=32, d=128."""

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
    print(*a, flush=True)


def timeit(fn, q, *args):
    def body(n, q0, *a):
        def one(i, acc):
            y = fn(q0 + acc.astype(q0.dtype), *a)
            return acc + 1e-9 * jnp.sum(y[0, 0, :1]).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, one, jnp.float32(0.0))

    jf = jax.jit(body)
    n_lo, n_hi = 8, 72
    float(jf(jnp.int32(n_hi), q, *args))
    per = []
    for _ in range(5):
        t0 = time.time()
        float(jf(jnp.int32(n_lo), q, *args))
        t_lo = time.time() - t0
        t0 = time.time()
        float(jf(jnp.int32(n_hi), q, *args))
        t_hi = time.time() - t0
        per.append((t_hi - t_lo) / (n_hi - n_lo))
    per.sort()
    return max(per[len(per) // 2], 1e-9)


def main():
    log(f"backend={jax.default_backend()}")
    B, H, d = 1, 32, 128
    from qllm_tpu.ops.pallas_attention import prefill_attention_flash

    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    rng = np.random.default_rng(0)
    for T in (512, 2048):
        S = T
        flops = 2.0 * T * S * H * d * 2 / 2
        q = jnp.asarray(rng.normal(size=(B, T, H, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, S, H, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, S, H, d)).astype(np.float32))

        ours = lambda q, k, v: prefill_attention_flash(  # noqa: E731
            q, k, v, jnp.int32(0), 1
        )
        sec = timeit(ours, q, k, v)
        log(f"T={T} ours        : {sec*1e3:7.2f} ms  {flops/sec/1e12:6.1f} TF/s")
        y0 = np.asarray(ours(q, k, v))

        # splash: [H, T, d] per batch, bf16
        mask = sm.MultiHeadMask(
            [sm.CausalMask((T, S)) for _ in range(H)]
        )
        kernel = sk.make_splash_mha(
            mask, head_shards=1, q_seq_shards=1
        )
        qh = jnp.swapaxes(q, 1, 2).astype(jnp.bfloat16) * (d**-0.5)
        kh = jnp.swapaxes(k, 1, 2).astype(jnp.bfloat16)
        vh = jnp.swapaxes(v, 1, 2).astype(jnp.bfloat16)

        def splash(qx, kx, vx):
            return jax.vmap(kernel)(qx, kx, vx)

        try:
            sec = timeit(splash, qh, kh, vh)
            log(
                f"T={T} splash      : {sec*1e3:7.2f} ms  "
                f"{flops/sec/1e12:6.1f} TF/s"
            )
            y1 = np.asarray(splash(qh, kh, vh))
            rel = np.abs(
                y0 - np.swapaxes(y1.astype(np.float32), 1, 2)
            ).max() / (np.abs(y0).max() + 1e-9)
            log(f"T={T} parity ours-vs-splash: rel {rel:.4g}")
        except Exception as e:
            log(f"T={T} splash FAIL: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
