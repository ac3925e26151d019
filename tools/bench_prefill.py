#!/usr/bin/env python
"""7B prefill throughput on the real chip (flash prefill attention path).

Measures tokens/s for a single [1, T] prefill through the stacked
quantized model — the serving admission cost. Slope-timed over two T
values of the same compiled shape via batched repeats is not possible
(prefill is one-shot), so we amortize: run the SAME compiled prefill N
times back-to-back with a D2H sync and subtract the fetch RTT.
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


def main():
    from bench import MODEL_SHAPES

    from qllm_tpu.models.generate import make_cache, prefill
    from qllm_tpu.models.llama import ModelConfig
    from qllm_tpu.models.stacked import stack_layer_params
    from qllm_tpu.utils.testing import random_quantized_params

    model = os.environ.get("QLLM_PREFILL_MODEL", "7b")
    T = int(os.environ.get("QLLM_PREFILL_T", "2048"))
    cfg = ModelConfig(max_position_embeddings=4096, **MODEL_SHAPES[model])
    t0 = time.time()
    params = random_quantized_params(
        cfg, jax.random.key(0), bits=4, group_size=128, quantize_lm_head=True
    )
    params = stack_layer_params(
        params,
        scale_store_dtype=jnp.bfloat16,
        sync_per_leaf=True,
        consume=True,
    )
    from qllm_tpu.models.stacked import prepare_lm_head
    from qllm_tpu.quant.qtensor import QuantizedTensor

    if isinstance(params.get("lm_head"), QuantizedTensor):
        params["lm_head"] = prepare_lm_head(
            params["lm_head"], scale_store_dtype=jnp.bfloat16
        )
    for leaf in jax.tree_util.tree_leaves(params):
        if hasattr(leaf, "block_until_ready") and leaf.ndim:
            np.asarray(jax.device_get(leaf[(0,) * (leaf.ndim - 1)][:1]))
    log(f"[prefill-bench] params ready in {time.time() - t0:.1f}s")

    cache = make_cache(cfg, 1, T, quantized_kv=True)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (1, T)), jnp.int32)

    def run_once():
        t0 = time.time()
        logits, _ = prefill(params, cfg, tokens, cache)
        np.asarray(logits[0, :1])
        return time.time() - t0

    t0 = time.time()
    run_once()
    log(f"[prefill-bench] compile+first {time.time() - t0:.1f}s")
    tiny = jax.jit(lambda t: t + 1)
    np.asarray(tiny(tokens[:, :1]))
    rtts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(tiny(tokens[:, :1]))
        rtts.append(time.time() - t0)
    rtt = min(rtts)
    best = min(max(run_once() - rtt, 1e-9) for _ in range(5))
    log(
        f"[prefill-bench] T={T}: {best * 1e3:.1f} ms -> "
        f"{T / best:.0f} tok/s prefill"
    )


if __name__ == "__main__":
    log("backend:", jax.default_backend())
    main()
