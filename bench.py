#!/usr/bin/env python
"""Headline benchmark: Llama-2-7B-shaped W4 g128 greedy decode on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": tokens/s, "unit": "tokens/s", "vs_baseline": ...}

vs_baseline = achieved / (0.8 * roofline) — BASELINE.md's target is decode
at >=80% of the HBM-bandwidth roofline, so vs_baseline >= 1.0 means the
target is met. roofline = HBM_BW / bytes_touched_per_token (packed weights
+ scales/zeros + dense embed/lm_head + KV-cache read at the measured
sequence position).

Env knobs: QLLM_BENCH_MODEL=7b|1b|tiny, QLLM_BENCH_STEPS, QLLM_BENCH_BATCH.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# per-chip HBM bandwidth (bytes/s) by TPU generation
HBM_BW = {
    "v5 lite": 819e9,  # v5e
    "v5e": 819e9,
    "v4": 1228e9,
    "v5": 2765e9,  # v5p
    "v5p": 2765e9,
    "v6 lite": 1640e9,  # v6e (Trillium)
    "v6e": 1640e9,
}

# per-chip peak bf16 FLOPs/s by TPU generation (for prefill MFU)
PEAK_FLOPS = {
    "v5 lite": 197e12,  # v5e
    "v5e": 197e12,
    "v4": 275e12,
    "v5": 459e12,  # v5p
    "v5p": 459e12,
    "v6 lite": 918e12,  # v6e (Trillium)
    "v6e": 918e12,
}


def _chip_lookup(table, default):
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return default
    for key, val in table.items():
        if key in kind:
            return val
    return default


def chip_bw() -> float:
    return _chip_lookup(HBM_BW, 819e9)


def chip_peak_flops() -> float:
    return _chip_lookup(PEAK_FLOPS, 197e12)


def model_flops_per_token(cfg) -> int:
    """Dense matmul FLOPs per decoded token (2 * weight elements of all
    linears + lm_head); attention scores/values added separately since
    they scale with context."""
    h, i = cfg.hidden_size, cfg.intermediate_size
    nh, kvh, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.hd
    per_layer = (
        h * nh * hd  # q
        + 2 * h * kvh * hd  # k, v
        + nh * hd * h  # o
        + 3 * h * i  # gate, up, down
    )
    n = cfg.num_hidden_layers * per_layer + h * cfg.vocab_size  # + lm_head
    return 2 * n


MODEL_SHAPES = {
    # llama-2-7b
    "7b": dict(
        vocab_size=32000,
        hidden_size=4096,
        intermediate_size=11008,
        num_hidden_layers=32,
        num_attention_heads=32,
        num_key_value_heads=32,
    ),
    # mistral-7b-v0.1: GQA + sliding-window attention — exercises the
    # windowed decode kernel (QLLM_BENCH_MODEL=mistral7b; not the
    # headline metric)
    "mistral7b": dict(
        vocab_size=32000,
        hidden_size=4096,
        intermediate_size=14336,
        num_hidden_layers=32,
        num_attention_heads=32,
        num_key_value_heads=8,
        sliding_window=4096,
    ),
    # mixtral-8x7b layer geometry, 8-layer slab (full 32-layer 8x7B is
    # ~23 GB at W4 — beyond one 16 GB chip; the slab keeps every
    # per-layer shape exact so the top-k roofline comparison is honest).
    # Exercises the sparse [E]-stacked decode path (models.moe):
    # QLLM_BENCH_MODEL=mixtral; not the headline metric
    "mixtral": dict(
        vocab_size=32000,
        hidden_size=4096,
        intermediate_size=14336,
        num_hidden_layers=8,
        num_attention_heads=32,
        num_key_value_heads=8,
        arch="mixtral",
        num_local_experts=8,
        num_experts_per_tok=2,
    ),
    # qwen3-moe-30b-a3b layer geometry, 8-layer slab: the BIG-E regime
    # (E=128, k=8 — a 16x dense-vs-sparse weight-traffic ratio) that the
    # grouped expert GEMV kernel exists for (3 launches per MoE block
    # regardless of E). deepseek-style router with top-k renorm.
    # QLLM_BENCH_MODEL=qwen3moe; not the headline metric
    "qwen3moe": dict(
        vocab_size=32000,
        hidden_size=2048,
        intermediate_size=768,  # per-expert (moe_intermediate_size)
        num_hidden_layers=8,
        num_attention_heads=32,
        num_key_value_heads=4,
        head_dim=128,
        arch="qwen3_moe",
        num_local_experts=128,
        num_experts_per_tok=8,
        moe_router="deepseek",
        norm_topk_prob=True,
    ),
    # tinyllama-1.1b
    "1b": dict(
        vocab_size=32000,
        hidden_size=2048,
        intermediate_size=5632,
        num_hidden_layers=22,
        num_attention_heads=32,
        num_key_value_heads=4,
        head_dim=64,
    ),
    "tiny": dict(
        vocab_size=512,
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
    ),
    # CPU-runnable smoke shape for the MoE bench path
    "tinymoe": dict(
        vocab_size=512,
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        arch="mixtral",
        num_local_experts=4,
        num_experts_per_tok=2,
    ),
}


def model_bytes_per_token(params, cfg, seq_pos, batch) -> int:
    """HBM bytes that must be touched to decode one token (per batch-1;
    weight reads amortize across batch). MoE layers count only the
    TOP-K experts' bytes — the sparse decode path reads exactly those
    (models.moe); counting all E would credit a 4x-too-easy roofline."""
    from qllm_tpu.quant.qtensor import QuantizedTensor

    def _nbytes(w):
        if isinstance(w, QuantizedTensor):
            return w.nbytes()
        if hasattr(w, "nbytes"):
            return int(w.nbytes)
        return 0

    total = 0
    for lp in params["layers"]:
        for name, w in lp.items():
            if name == "experts":
                k = min(cfg.num_experts_per_tok, len(w))
                per_expert = sum(_nbytes(x) for x in w[0].values())
                # each of batch tokens reads its own k experts (may
                # overlap; roofline assumes the worst case, capped at E)
                total += min(k * batch, len(w)) * per_expert // max(batch, 1)
            elif name == "experts_stacked" and isinstance(w, dict):
                # raw [E]-leading stacks (experts_prestacked params):
                # same top-k accounting, per-expert = total / E
                E = next(iter(w.values())).qweight.shape[0]
                per_expert = sum(_nbytes(x) for x in w.values()) // E
                k = min(cfg.num_experts_per_tok, E)
                total += min(k * batch, E) * per_expert // max(batch, 1)
            elif name == "shared_experts":
                total += sum(_nbytes(x) for x in w.values())
            else:
                total += _nbytes(w)
    # lm_head read fully; embed: one row per token
    lm = params["lm_head"]
    total += lm.nbytes() if isinstance(lm, QuantizedTensor) else int(lm.nbytes)
    total += cfg.hidden_size * params["embed_tokens"].dtype.itemsize
    # KV read: int8 k+v over current seq per layer (per sequence => *batch)
    kv = (
        cfg.num_hidden_layers
        * seq_pos
        * cfg.num_key_value_heads
        * cfg.hd
        * 2
        * batch
    )
    total += kv
    return total


def bench_moe_slab(name, steps, rtt, with_batch8=False):
    """Decode the 8-layer MoE slab geometry ``name`` and return detail
    fields: tok/s and the achieved fraction of the TOP-K roofline (bpt
    counts only the top-k experts' bytes — the sparse decode path reads
    exactly those; models.moe). Run inside the default bench so the
    driver-captured artifact carries the MoE numbers (VERDICT r4 #1).

    ``with_batch8``: also measure batch-8 continuous-batching-style
    decode, with the expert-id-sort weight-stream dedup ON and OFF
    (VERDICT r4 #6 — the engine-level number for the dedup delta)."""
    from qllm_tpu.models.decode_loop import decode_loop
    from qllm_tpu.models.generate import make_cache
    from qllm_tpu.models.llama import ModelConfig
    from qllm_tpu.models.stacked import (
        prepare_lm_head,
        stack_layer_params_hybrid,
    )
    from qllm_tpu.quant.qtensor import QuantizedTensor
    from qllm_tpu.utils.testing import random_quantized_params

    cfg = ModelConfig(max_position_embeddings=2048, **MODEL_SHAPES[name])
    # max_seq covers the slope-timing long loop (prefill + 4*steps)
    prefill_len, max_seq = 128, 512
    t0 = time.time()
    params = random_quantized_params(
        cfg,
        jax.random.key(0),
        bits=4,
        group_size=128,
        quantize_lm_head=True,
        experts_prestacked=True,  # 2 RNG calls/layer, not 3*E
    )
    jax.block_until_ready(
        params["layers"][-1]["experts_stacked"]["down_proj"].qweight
    )
    log(f"[bench] {name}: params in {time.time() - t0:.1f}s")
    # KV accounting at the midpoint of the slope-timing window
    # (steps..4*steps past prefill)
    bpt = model_bytes_per_token(params, cfg, prefill_len + steps * 5 // 2, 1)
    t0 = time.time()
    params = stack_layer_params_hybrid(
        params,
        scale_store_dtype=jnp.bfloat16,
        sync_per_leaf=True,
        consume=True,
    )
    if isinstance(params.get("lm_head"), QuantizedTensor):
        params["lm_head"] = prepare_lm_head(
            params["lm_head"], scale_store_dtype=jnp.bfloat16
        )
    for leaf in jax.tree_util.tree_leaves(params):
        if hasattr(leaf, "block_until_ready") and leaf.ndim:
            np.asarray(jax.device_get(leaf[(0,) * (leaf.ndim - 1)][:1]))
    log(f"[bench] {name}: hybrid-stacked in {time.time() - t0:.1f}s")
    detail = {}
    roofline = chip_bw() / bpt
    for b in (1, 8) if with_batch8 else (1,):
        ring = b == 1 and steps % 8 == 0 and jax.default_backend() != "cpu"
        cache = make_cache(cfg, b, max_seq, quantized_kv=True, ring=ring)
        token = jnp.ones((b, 1), jnp.int32)
        pos0 = jnp.int32(prefill_len)

        def run_once(n):
            t0 = time.time()
            toks, _ = decode_loop(params, cfg, token, cache, pos0, n)
            np.asarray(toks[:, -1])
            return time.time() - t0

        t0 = time.time()
        run_once(steps)
        log(f"[bench] {name} b{b} compile+first {time.time() - t0:.1f}s")
        if b == 1 and jax.default_backend() != "cpu":
            # slope timing (RTT-immune): an 8-layer MoE slab decodes a
            # 64-step loop in ~30 ms — the same order as the tunnel
            # round trip, so single-length timing swings +-10% run to
            # run. Time TWO traced loop lengths and take the slope
            # (the autotuner's method, ops.autotune).
            steps2 = steps * 4
            run_once(steps2)  # compile the second length
            best1 = min(run_once(steps) for _ in range(3))
            best2 = min(run_once(steps2) for _ in range(3))
            best = max(best2 - best1, 1e-9) / (steps2 - steps) * steps
        else:
            best = min(max(run_once(steps) - rtt, 1e-9) for _ in range(3))
        tok_s = steps * b / best
        if b == 1:
            detail[f"{name}_tokens_per_s"] = round(tok_s, 1)
            detail[f"{name}_topk_roofline_frac"] = round(tok_s / roofline, 4)
            log(
                f"[bench] {name}: {tok_s:.1f} tok/s = "
                f"{tok_s / roofline:.1%} of top-k roofline {roofline:.0f}"
            )
        else:
            detail[f"{name}_batch{b}_tokens_per_s"] = round(tok_s, 1)
            log(f"[bench] {name} batch{b}: {tok_s:.1f} tok/s/chip")
            # A/B: expert-id-sort dedup OFF (weight stream reverts to
            # once-per-selection) — flag is read at trace time. Only
            # meaningful in the SPARSE regime (B*k < E); above it the
            # dense all-experts path runs and ignores the sort.
            if b * cfg.num_experts_per_tok >= cfg.num_local_experts:
                del cache
                continue
            try:
                os.environ["QLLM_TPU_MOE_SORT"] = "0"
                decode_loop.clear_cache()
                t0 = time.time()
                run_once(steps)
                log(
                    f"[bench] {name} b{b} nosort compile+first "
                    f"{time.time() - t0:.1f}s"
                )
                best_ns = min(
                    max(run_once(steps) - rtt, 1e-9) for _ in range(3)
                )
                detail[f"{name}_batch{b}_nosort_tokens_per_s"] = round(
                    steps * b / best_ns, 1
                )
                log(
                    f"[bench] {name} batch{b} dedup-off: "
                    f"{steps * b / best_ns:.1f} tok/s/chip"
                )
            except Exception as e:  # pragma: no cover
                # partial failure must not discard the slab's numbers
                log(f"[bench] {name} b{b} nosort A/B failed: {e}")
            finally:
                os.environ.pop("QLLM_TPU_MOE_SORT", None)
                decode_loop.clear_cache()
        del cache
    del params
    return detail


def main():
    t_start = time.time()
    # honor JAX_PLATFORMS=cpu even though the image's sitecustomize
    # eagerly registers the axon/TPU backend (same workaround as
    # tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    model = os.environ.get("QLLM_BENCH_MODEL", "7b")
    steps = int(os.environ.get("QLLM_BENCH_STEPS", "64"))
    batch = int(os.environ.get("QLLM_BENCH_BATCH", "1"))
    backend = jax.default_backend()
    if backend == "cpu" and "QLLM_BENCH_MODEL" not in os.environ:
        model = "tiny"
    log(f"[bench] backend={backend} model={model} steps={steps} batch={batch}")

    import faulthandler

    # watchdog: the remote-TPU tunnel's compile latency varies from ~1 min
    # (cached) to >30 min when the link degrades; leave generous headroom
    faulthandler.dump_traceback_later(
        int(os.environ.get("QLLM_BENCH_TIMEOUT", "3300")), exit=True
    )

    from qllm_tpu.models.decode_loop import decode_loop
    from qllm_tpu.models.generate import make_cache
    from qllm_tpu.models.llama import ModelConfig
    from qllm_tpu.models.stacked import stack_layer_params
    from qllm_tpu.utils.testing import random_quantized_params

    cfg = ModelConfig(max_position_embeddings=2048, **MODEL_SHAPES[model])
    t0 = time.time()
    # quantized lm_head (default on): the dense head costs ~0.37 ms/token
    # of pure HBM read on 7B — packing it is a straight serving win
    q_head = os.environ.get("QLLM_BENCH_QLMHEAD", "1") != "0"
    max_seq = 256
    prefill_len = 128
    params = random_quantized_params(
        cfg, jax.random.key(0), bits=4, group_size=128, quantize_lm_head=q_head
    )
    _last = params["layers"][-1]
    _last_w = (
        _last["experts"][-1]["down_proj"]
        if "experts" in _last
        else _last["down_proj"]
    )
    jax.block_until_ready(_last_w.qweight)
    log(f"[bench] params materialized in {time.time() - t0:.1f}s")
    # byte accounting BEFORE stacking (the stacked copies are padded;
    # the roofline counts logical checkpoint bytes) — and compute it NOW
    # so the original per-layer list can be dropped: keeping it alive
    # through the first decode dispatch doubles params-resident HBM and
    # has OOM'd 7B when stacking transients peak on top of it
    bpt = model_bytes_per_token(params, cfg, prefill_len + steps // 2, batch)
    # scan-over-layers: one compiled layer body instead of L unrolled.
    # bf16 scale storage (default on): halves scale/zs bytes; requires
    # the fused-correction kernels, which are the serving default.
    scales_bf16 = os.environ.get("QLLM_TPU_SCALES_BF16", "1") != "0"
    is_moe = cfg.num_local_experts > 0
    if is_moe:
        # MoE: hybrid stacking — [L]-stacked attention (tuned kernels +
        # fused qkv) with per-layer [E]-stacked experts (top-k-only
        # decode reads); python-loop forward
        from qllm_tpu.models.stacked import stack_layer_params_hybrid

        params = stack_layer_params_hybrid(
            params,
            scale_store_dtype=jnp.bfloat16 if scales_bf16 else jnp.float32,
            sync_per_leaf=backend != "cpu",
            consume=True,  # free original per-layer buffers progressively
        )
    else:
        params = stack_layer_params(
            params,
            scale_store_dtype=jnp.bfloat16 if scales_bf16 else jnp.float32,
            sync_per_leaf=backend != "cpu",  # bound stacking transients
            consume=True,  # free original per-layer buffers progressively
        )
    if q_head:
        # serve the head through the planar stacked kernel too (L=1
        # stack): ~740 vs ~650 GB/s, plus lane padding to a tuned width
        from qllm_tpu.models.stacked import prepare_lm_head
        from qllm_tpu.quant.qtensor import QuantizedTensor

        if isinstance(params.get("lm_head"), QuantizedTensor):
            params["lm_head"] = prepare_lm_head(
                params["lm_head"],
                scale_store_dtype=(
                    jnp.bfloat16 if scales_bf16 else jnp.float32
                ),
            )

    if is_moe:
        # MoE run: decode-vs-topk-roofline is the story; the secondary
        # sweeps (prefill MFU formula, spec, w4a8, batch sweeps) default
        # off — each would recompile the 8-layer unrolled body over the
        # tunnel, and their dense-model interpretations don't transfer
        for knob in (
            "QLLM_BENCH_BATCH_SWEEP",
            "QLLM_BENCH_PREFILL",
            "QLLM_BENCH_SPEC",
            "QLLM_BENCH_W4A8",
        ):
            os.environ.setdefault(knob, "0")

    if not is_moe and os.environ.get("QLLM_TPU_AUTOTUNE") == "1":
        from qllm_tpu.ops.autotune import tune_for_stacked_params

        t0 = time.time()
        tune_for_stacked_params(params, Ms=(batch,))
        log(f"[bench] autotune sweep done in {time.time() - t0:.1f}s")

    # force the (lazy) stacking/padding/planarization pipeline to run
    # NOW, leaf by leaf — interleaving it with the decode compile keeps
    # original + stacked + transient copies alive simultaneously
    t0 = time.time()
    for leaf in jax.tree_util.tree_leaves(params):
        if hasattr(leaf, "block_until_ready") and leaf.ndim:
            # fetch ONE element (no .ravel(): reshaping a multi-GB leaf
            # materializes a full copy — observed OOM on 7B)
            np.asarray(jax.device_get(leaf[(0,) * (leaf.ndim - 1)][:1]))
    log(f"[bench] stacked params materialized in {time.time() - t0:.1f}s")

    # ring-fused KV (default on): the per-token write rides inside the
    # attention kernel; full rings flush once per 8 steps in ONE
    # all-layers launch (saves the ~2.4 us/layer write launch)
    # SWA models: the ring-fused kernel has no window semantics
    ring_default = (
        "1" if backend != "cpu" and cfg.sliding_window <= 0 else "0"
    )
    ring = os.environ.get("QLLM_BENCH_RING", ring_default) != "0"
    cache = make_cache(cfg, batch, max_seq, quantized_kv=True, ring=ring)
    token = jnp.ones((batch, 1), jnp.int32)
    pos0 = jnp.int32(prefill_len)

    def run_once():
        """Dispatch + force completion via a small D2H fetch —
        block_until_ready does not reliably block on remote backends."""
        t0 = time.time()
        toks, _ = decode_loop(params, cfg, token, cache, pos0, steps)
        np.asarray(toks[:, -1])
        return time.time() - t0

    # warmup (compile)
    t0 = time.time()
    run_once()
    log(f"[bench] compile+first run {time.time() - t0:.1f}s")

    # fetch-RTT baseline to subtract (tiny computation, same sync path)
    tiny = jax.jit(lambda t: t + 1)
    np.asarray(tiny(token))
    rtts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(tiny(token))
        rtts.append(time.time() - t0)
    rtt = min(rtts)
    log(f"[bench] fetch RTT baseline {rtt * 1e3:.1f} ms")

    best = float("inf")
    for i in range(3):
        dt = max(run_once() - rtt, 1e-9)
        best = min(best, dt)
        log(f"[bench] run {i}: {dt:.3f}s -> {steps * batch / dt:.1f} tok/s")

    tokens_per_s = steps * batch / best

    # secondary: batch-8 serving throughput (continuous-batching regime) —
    # recorded in detail so the driver captures it (VERDICT weak #5)
    batch8_tok_s = None
    if batch == 1 and os.environ.get("QLLM_BENCH_BATCH_SWEEP", "1") != "0":
        try:
            b8 = 8
            cache8 = make_cache(cfg, b8, max_seq, quantized_kv=True)
            token8 = jnp.ones((b8, 1), jnp.int32)

            def run8():
                t0 = time.time()
                toks, _ = decode_loop(params, cfg, token8, cache8, pos0, steps)
                np.asarray(toks[:, -1])
                return time.time() - t0

            t0 = time.time()
            run8()
            log(f"[bench] batch8 compile+first {time.time() - t0:.1f}s")
            best8 = min(max(run8() - rtt, 1e-9) for _ in range(3))
            batch8_tok_s = round(steps * b8 / best8, 1)
            log(f"[bench] batch8: {batch8_tok_s} tok/s/chip")
            del cache8, run8
        except Exception as e:  # pragma: no cover
            log(f"[bench] batch8 sweep failed: {e}")

    # prefill throughput + MFU at 512/2048 ctx (flash prefill kernel
    # path) — recorded in detail so the driver regression-checks the
    # prefill half of the serving story (VERDICT r2 item 5)
    prefill_detail = {}
    if batch == 1 and os.environ.get("QLLM_BENCH_PREFILL", "1") != "0":
        from qllm_tpu.models.generate import prefill

        peak = chip_peak_flops()
        rng = np.random.default_rng(0)
        for T in (512, 2048):
            if T > cfg.max_position_embeddings:
                continue
            try:
                cache_p = make_cache(cfg, 1, T, quantized_kv=True)
                toks_p = jnp.asarray(
                    rng.integers(1, cfg.vocab_size, (1, T)), jnp.int32
                )

                # slope timing (RTT-immune): a T=512 prefill is ~45 ms
                # — the same order as the tunnel round trip, and
                # single-shot MFU numbers swung 0.65<->0.77 run to run.
                # Chain n SERIALLY-DEPENDENT prefill reps in one jit
                # (params as ARGUMENTS — closure consts lower to HLO
                # literals and hit the remote-compile body limit).
                @jax.jit
                def prefill_reps(p, toks, cache, n):
                    def body(i, acc):
                        t2 = toks + (acc * 0.0).astype(jnp.int32)
                        lg, _ = prefill(p, cfg, t2, cache)
                        return acc + 1e-9 * jnp.sum(lg[:, :1])

                    return jax.lax.fori_loop(
                        0, n, body, jnp.zeros((), jnp.float32)
                    )

                def run_p(n):
                    t0 = time.time()
                    np.asarray(
                        prefill_reps(params, toks_p, cache_p, jnp.int32(n))
                    )
                    return time.time() - t0

                t0 = time.time()
                run_p(3)
                log(f"[bench] prefill T={T} compile+first {time.time() - t0:.1f}s")
                t1 = min(run_p(1) for _ in range(3))
                t3 = min(run_p(3) for _ in range(3))
                best_p = max(t3 - t1, 1e-9) / 2
                tok_s_p = T / best_p
                # matmul flops (2N per token) + causal attention
                # (QK^T + PV: 2 * T^2/2 * nh*hd * 2 per layer)
                flops = model_flops_per_token(cfg) * T + (
                    2
                    * T
                    * T
                    * cfg.num_attention_heads
                    * cfg.hd
                    * cfg.num_hidden_layers
                )
                mfu = flops / best_p / peak
                prefill_detail[f"prefill_{T}_tokens_per_s"] = round(tok_s_p, 1)
                prefill_detail[f"prefill_{T}_mfu"] = round(mfu, 4)
                log(
                    f"[bench] prefill T={T}: {best_p * 1e3:.1f} ms = "
                    f"{tok_s_p:.0f} tok/s, MFU {mfu:.3f}"
                )
                del cache_p
            except Exception as e:  # pragma: no cover
                log(f"[bench] prefill T={T} failed: {e}")

    # speculative decoding: accepted tokens per verify forward on a
    # repetitive prompt (the prompt-lookup drafter's favorable regime) —
    # exact-greedy speedup factor for HBM-bound decode (VERDICT r2 item 5)
    spec_detail = {}
    if batch == 1 and os.environ.get("QLLM_BENCH_SPEC", "1") != "0":
        try:
            from qllm_tpu.models.speculative import speculative_generate

            prompt_s = jnp.asarray([[7, 8, 9, 10] * 16], jnp.int32)  # [1,64]
            n_new = 48
            t0 = time.time()
            out_s, fwds = speculative_generate(
                params, cfg, prompt_s, n_new, max_seq=192, gamma=4
            )
            np.asarray(out_s[:, -1])
            log(f"[bench] spec compile+first {time.time() - t0:.1f}s")
            t0 = time.time()
            out_s, fwds = speculative_generate(
                params, cfg, prompt_s, n_new, max_seq=192, gamma=4
            )
            np.asarray(out_s[:, -1])
            wall_s = max(time.time() - t0 - rtt, 1e-9)
            spec_detail["spec_tokens_per_forward"] = round(n_new / fwds, 2)
            spec_detail["spec_tokens_per_s"] = round(n_new / wall_s, 1)
            log(
                f"[bench] spec: {fwds} forwards for {n_new} tokens = "
                f"{n_new / fwds:.2f} tok/fwd, {n_new / wall_s:.1f} tok/s wall"
            )
        except Exception as e:  # pragma: no cover
            log(f"[bench] spec sweep failed: {e}")

    # W4A8 at batch 32: the compute-bound regime the int8-activation
    # kernel targets (ServeConfig.w4a8 / --w4a8; VERDICT r2 item 10).
    # Runs LAST among decode sweeps: the env flag is read at kernel
    # trace time, so enabling it clears the decode_loop jit cache.
    w4a8_detail = {}
    if batch == 1 and os.environ.get("QLLM_BENCH_W4A8", "1") != "0":
        try:
            b32 = 32
            cache32 = make_cache(cfg, b32, max_seq, quantized_kv=True)
            token32 = jnp.ones((b32, 1), jnp.int32)

            def run32():
                t0 = time.time()
                toks, _ = decode_loop(params, cfg, token32, cache32, pos0, steps)
                np.asarray(toks[:, -1])
                return time.time() - t0

            t0 = time.time()
            run32()
            log(f"[bench] batch32 w4a16 compile+first {time.time() - t0:.1f}s")
            best16 = min(max(run32() - rtt, 1e-9) for _ in range(3))
            w4a8_detail["batch32_tokens_per_s"] = round(steps * b32 / best16, 1)
            os.environ["QLLM_TPU_W4A8"] = "1"
            decode_loop.clear_cache()
            t0 = time.time()
            run32()
            log(f"[bench] batch32 w4a8 compile+first {time.time() - t0:.1f}s")
            best8a = min(max(run32() - rtt, 1e-9) for _ in range(3))
            w4a8_detail["batch32_w4a8_tokens_per_s"] = round(
                steps * b32 / best8a, 1
            )
            log(
                f"[bench] batch32: w4a16 {steps * b32 / best16:.1f} vs "
                f"w4a8 {steps * b32 / best8a:.1f} tok/s/chip"
            )
        except Exception as e:  # pragma: no cover
            log(f"[bench] w4a8 sweep failed: {e}")
        finally:
            os.environ.pop("QLLM_TPU_W4A8", None)
            decode_loop.clear_cache()
            cache32 = run32 = None

    # practical streaming ceiling: the paper HBM number is not reachable
    # for this access pattern — measure a read-only pass over the byte-
    # dominant shape's blocks live, so achieved/practical is reproducible
    # (VERDICT r1: self-reported ceilings don't count)
    stream_gbps = None
    if backend != "cpu" and os.environ.get("QLLM_BENCH_STREAM", "1") != "0":
        try:
            from qllm_tpu.ops.stream_bench import measure_stream_gbps

            t0 = time.time()
            stream_gbps = round(measure_stream_gbps(), 1)
            log(
                f"[bench] practical stream {stream_gbps} GB/s "
                f"(measured in {time.time() - t0:.1f}s)"
            )
        except Exception as e:  # pragma: no cover
            log(f"[bench] stream ceiling measurement failed: {e}")

    # MoE slab suite inside the DEFAULT run (VERDICT r4 #1/#6): the
    # driver's fixed `python bench.py` must capture the mixtral/qwen3moe
    # top-k decode numbers, not just builder sessions with
    # QLLM_BENCH_MODEL set. Free the dense-model state first — the
    # mixtral slab is ~6 GB and both would not co-reside on a 16 GB chip.
    moe_detail = {}
    if (
        not is_moe
        and model == "7b"
        and batch == 1
        and backend != "cpu"
        and os.environ.get("QLLM_BENCH_MOE", "1") != "0"
    ):
        import gc

        from qllm_tpu.models.decode_loop import decode_loop as _dl

        del params, cache
        _dl.clear_cache()
        gc.collect()
        for moe_name, with_b8 in (("mixtral", True), ("qwen3moe", True)):
            try:
                moe_detail.update(
                    bench_moe_slab(moe_name, steps, rtt, with_batch8=with_b8)
                )
            except Exception as e:  # pragma: no cover
                log(f"[bench] {moe_name} slab failed: {e}")
            _dl.clear_cache()
            gc.collect()

    roofline = chip_bw() / bpt * batch  # batch amortizes weight reads
    target = 0.8 * roofline
    result = {
        "metric": (
            f"decode_tokens_per_sec_per_chip_llama2_{model}_w4g128"
            if model in ("7b", "1b", "tiny")
            else f"decode_tokens_per_sec_per_chip_{model}_w4g128"
        ),
        "value": round(tokens_per_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tokens_per_s / target, 4),
        "detail": {
            "backend": backend,
            "batch": batch,
            "steps": steps,
            "bytes_per_token": bpt,
            "roofline_tokens_per_s": round(roofline, 1),
            "hbm_bw_GBps": chip_bw() / 1e9,
            "batch8_tokens_per_s": batch8_tok_s,
            **prefill_detail,
            **spec_detail,
            **w4a8_detail,
            "quantized_lm_head": q_head,
            "moe_topk_roofline": is_moe or None,
            **moe_detail,
            "practical_stream_GBps": stream_gbps,
            "practical_ceiling_tokens_per_s": (
                round(stream_gbps * 1e9 / bpt * batch, 1) if stream_gbps else None
            ),
            "vs_practical": (
                round(tokens_per_s / (stream_gbps * 1e9 / bpt * batch), 4)
                if stream_gbps
                else None
            ),
            "wall_s": round(time.time() - t_start, 1),
        },
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
