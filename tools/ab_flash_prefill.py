#!/usr/bin/env python
"""A/B our prefill_attention_flash vs jax.experimental pallas
flash_attention at the 7B prefill shape (B=1, H=32, d=128, causal),
on the real chip. Prints effective TFLOP/s (causal-half flops)."""

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
    # thread the accumulator into q so the loop body is NOT
    # loop-invariant (XLA hoists invariant bodies out of fori_loop)
    def body(n, q0, *a):
        def one(i, acc):
            y = fn(q0 + acc.astype(q0.dtype), *a)
            return acc + 1e-9 * jnp.sum(y[0, 0, :1]).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, one, jnp.float32(0.0))

    jf = jax.jit(body, static_argnums=())
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

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as jax_flash,
    )

    rng = np.random.default_rng(0)
    for T in (512, 2048):
        S = T
        flops = 2.0 * T * S * H * d * 2 / 2  # causal half, QK+PV
        q = jnp.asarray(rng.normal(size=(B, T, H, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, S, H, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, S, H, d)).astype(np.float32))

        ours = lambda q, k, v: prefill_attention_flash(  # noqa: E731
            q, k, v, jnp.int32(0), 1
        )
        sec = timeit(ours, q, k, v)
        log(f"T={T} ours      : {sec*1e3:7.2f} ms  {flops/sec/1e12:6.1f} TF/s")

        qh = jnp.swapaxes(q, 1, 2).astype(jnp.bfloat16)  # [B, H, T, d]
        kh = jnp.swapaxes(k, 1, 2).astype(jnp.bfloat16)
        vh = jnp.swapaxes(v, 1, 2).astype(jnp.bfloat16)
        jfa = lambda a, b, c: jax_flash(  # noqa: E731
            a, b, c, causal=True, sm_scale=d**-0.5
        )
        sec = timeit(jfa, qh, kh, vh)
        log(f"T={T} jax-flash : {sec*1e3:7.2f} ms  {flops/sec/1e12:6.1f} TF/s")

        # parity sanity
        y0 = np.asarray(ours(q, k, v))  # [B, T, H, d]
        y1 = np.asarray(jfa(qh, kh, vh))  # [B, H, T, d]
        rel = np.abs(
            y0 - np.swapaxes(y1.astype(np.float32), 1, 2)
        ).max() / (np.abs(y0).max() + 1e-9)
        log(f"T={T} parity ours-vs-jax: rel {rel:.4g}")


if __name__ == "__main__":
    main()
