#!/usr/bin/env python
"""Profile a 7B prefill on the TPU and print a per-op time table.

Usage: python tools/profile_prefill.py [out_json]
Env: QLLM_PROF_MODEL (default 7b), QLLM_PROF_T (default 2048),
     QLLM_PROF_REPS (default 4 prefills per traced run).

Same trace parsing as profile_decode.py; answers "where does the
prefill MFU go" (bench 2026-08-19: llama MFU 0.53 at T=512 while the
down-proj full-K kernel microbenches at 0.76 in isolation).
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
    T = int(os.environ.get("QLLM_PROF_T", "2048"))
    reps = int(os.environ.get("QLLM_PROF_REPS", "4"))
    from bench import MODEL_SHAPES, chip_peak_flops, model_flops_per_token

    from qllm_tpu.models.generate import make_cache, prefill
    from qllm_tpu.models.llama import ModelConfig
    from qllm_tpu.models.stacked import stack_layer_params
    from qllm_tpu.utils.testing import random_quantized_params

    cfg = ModelConfig(max_position_embeddings=max(2048, T), **MODEL_SHAPES[model])
    t0 = time.time()
    params = random_quantized_params(
        cfg,
        jax.random.key(0),
        bits=4,
        group_size=128,
        quantize_lm_head=os.environ.get("QLLM_PROF_QLMHEAD", "1") != "0",
    )
    jax.block_until_ready(params["layers"][-1]["down_proj"].qweight)
    log(f"params in {time.time()-t0:.1f}s")
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
    log("stacked params ready")

    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(1, cfg.vocab_size, (1, T)), jnp.int32)
    cache = make_cache(cfg, 1, T, quantized_kv=True)

    def run_once():
        t0 = time.time()
        for _ in range(reps):
            lg, _ = prefill(params, cfg, toks, cache)
        np.asarray(lg[0, :1])
        return time.time() - t0

    t0 = time.time()
    run_once()
    log(f"compile+first {time.time()-t0:.1f}s")
    log(f"steady: {run_once():.3f}s / {reps} prefills")

    trace_dir = "/tmp/qllm_prof_prefill"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        dt = run_once()
    log(f"traced run {dt:.3f}s -> {T*reps/dt:.0f} tok/s")

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace under {trace_dir}"
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    ev = trace["traceEvents"]
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
    flops = model_flops_per_token(cfg) * T + (
        2 * T * T * cfg.num_attention_heads * cfg.hd * cfg.num_hidden_layers
    )
    per_prefill_ms = total / 1e3 / reps
    mfu = flops / (per_prefill_ms / 1e3) / chip_peak_flops()
    log(
        f"\nTPU op time total {total/1e3:.1f} ms over {reps} prefills "
        f"({per_prefill_ms:.1f} ms/prefill, traced-MFU {mfu:.3f})"
    )
    log(f"{'op':60s} {'ms/prefill':>10s} {'%':>5s}")
    for k, v in rows[:40]:
        log(f"{k[:60]:60s} {v/1e3/reps:10.2f} {100*v/total:5.1f}")
    log("\ntop individual ops (full names):")
    for k, v in frows[:30]:
        log(f"{k[:70]:70s} {v/1e3/reps:8.2f} ms/prefill")
    out = {
        "T": T,
        "reps": reps,
        "ms_per_prefill_traced": per_prefill_ms,
        "traced_mfu": mfu,
        "ops": {k: v / 1e3 / reps for k, v in rows},
        "ops_full": {k: v / 1e3 / reps for k, v in frows[:60]},
    }
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_prefill.json"
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
