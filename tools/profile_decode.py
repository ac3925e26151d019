#!/usr/bin/env python
"""Profile the 7B decode loop on the TPU and print a per-op time table.

Usage: python tools/profile_decode.py [out_json]
Env: QLLM_PROF_MODEL (default 7b), QLLM_PROF_STEPS (default 64).

Parses the jax.profiler trace (works over the axon tunnel — see
NOTES.md) and sums op durations on TPU-side pids, grouped by a cleaned
op name. This is the tool that found round-1's decode-path copies.
"""

import faulthandler
import glob
import gzip
import json
import os
import re
import sys
import time

faulthandler.dump_traceback_later(3000, exit=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    model = os.environ.get("QLLM_PROF_MODEL", "7b")
    steps = int(os.environ.get("QLLM_PROF_STEPS", "64"))
    from bench import MODEL_SHAPES

    from qllm_tpu.models.decode_loop import decode_loop
    from qllm_tpu.models.generate import make_cache
    from qllm_tpu.models.llama import ModelConfig
    from qllm_tpu.models.stacked import stack_layer_params
    from qllm_tpu.utils.testing import random_quantized_params

    cfg = ModelConfig(max_position_embeddings=2048, **MODEL_SHAPES[model])
    t0 = time.time()
    params = random_quantized_params(
        cfg,
        jax.random.key(0),
        bits=4,
        group_size=128,
        quantize_lm_head=os.environ.get("QLLM_PROF_QLMHEAD", "1") != "0",
        experts_prestacked=cfg.num_local_experts > 0,
    )
    _last = params["layers"][-1]
    _last_w = (
        _last["experts_stacked"]["down_proj"]
        if "experts_stacked" in _last
        else _last["down_proj"]
    )
    jax.block_until_ready(_last_w.qweight)
    log(f"params in {time.time()-t0:.1f}s")
    # match the serving/bench defaults (bf16 scale storage enables the
    # fused-correction kernels) so the profile reflects the real path
    scales_bf16 = os.environ.get("QLLM_TPU_SCALES_BF16", "1") != "0"
    if cfg.num_local_experts > 0:
        # MoE: same hybrid prep the bench/engine use ([L]-stacked
        # attention over per-layer [E]-expert stacks)
        from qllm_tpu.models.stacked import stack_layer_params_hybrid

        params = stack_layer_params_hybrid(
            params,
            scale_store_dtype=jnp.bfloat16 if scales_bf16 else jnp.float32,
            sync_per_leaf=True,
            consume=True,
        )
    else:
        params = stack_layer_params(
            params,
            scale_store_dtype=jnp.bfloat16 if scales_bf16 else jnp.float32,
            sync_per_leaf=True,
            consume=True,
        )
    from qllm_tpu.models.stacked import prepare_lm_head
    from qllm_tpu.quant.qtensor import QuantizedTensor

    if isinstance(params.get("lm_head"), QuantizedTensor):
        params["lm_head"] = prepare_lm_head(
            params["lm_head"],
            jnp.bfloat16 if scales_bf16 else jnp.float32,
        )

    ring = os.environ.get("QLLM_PROF_RING", "1") != "0"
    cache = make_cache(cfg, 1, 256, quantized_kv=True, ring=ring)
    token = jnp.ones((1, 1), jnp.int32)
    pos0 = jnp.int32(128)

    def run_once():
        t0 = time.time()
        toks, _ = decode_loop(params, cfg, token, cache, pos0, steps)
        np.asarray(toks[:, -1])
        return time.time() - t0

    t0 = time.time()
    run_once()
    log(f"compile+first {time.time()-t0:.1f}s")
    log(f"steady: {run_once():.3f}s")

    trace_dir = "/tmp/qllm_prof"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        dt = run_once()
    log(f"traced run {dt:.3f}s -> {steps/dt:.1f} tok/s")

    # parse
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace under {trace_dir}"
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    ev = trace["traceEvents"]
    # find TPU pids
    tpu_pids = set()
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "tpu" in nm:
                tpu_pids.add(e["pid"])
    agg = {}
    full = {}
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0)  # us
        total += dur
        key = re.sub(r"[.\d]+$", "", name)
        agg[key] = agg.get(key, 0.0) + dur
        full[name] = full.get(name, 0.0) + dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    frows = sorted(full.items(), key=lambda kv: -kv[1])
    log(f"\nTPU op time total {total/1e3:.1f} ms over {steps} steps "
        f"({total/1e3/steps:.3f} ms/token)")
    log(f"{'op':60s} {'ms':>9s} {'us/tok':>8s} {'%':>5s}")
    for k, v in rows[:40]:
        log(f"{k[:60]:60s} {v/1e3:9.2f} {v/steps:8.1f} {100*v/total:5.1f}")
    log("\ntop individual ops (full names):")
    for k, v in frows[:30]:
        log(f"{k[:70]:70s} {v/steps:8.1f} us/tok")
    out = {
        "steps": steps,
        "tokens_per_s": steps / dt,
        "ms_per_token_traced": total / 1e3 / steps,
        "ops": {k: v / steps for k, v in rows},
        "ops_full": {k: v / steps for k, v in frows[:60]},
    }
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_decode.json"
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
