#!/usr/bin/env python
"""One-shot on-chip sweep of the TP-LOCAL serving shapes.

Tunes the v3/v4 (non-planar — TP shards cannot planarize) stacked
kernel on the local shard shapes a tp∈{4,8} llama-7B/13B serving mesh
hands the kernels, and prints a JSON fragment to merge into
ops/tuned_defaults.json (keys: "stacked_v3:KxN:w4g128:decode").

Run on ONE real chip: the kernels see identical local shapes
single-chip (VERDICT r2 weak #5 / item 6).
"""

import faulthandler
import json
import os
import sys

faulthandler.dump_traceback_later(5400, exit=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from qllm_tpu.ops.autotune import tune_stacked, _key

# (K_local, N_local) for llama-7B/13B W4 g128 under tp=4/8
# (prepare_tp_params geometry: col shards N/tp with gate/up padded to
# lcm(512,128tp,g*tp); row shards K/tp; lm_head padded vocab / tp)
SHAPES_7B = {
    4: [(4096, 1024), (4096, 2816), (2816, 4096), (1024, 4096), (4096, 8064)],
    8: [(4096, 512), (4096, 1408), (1408, 4096), (512, 4096), (4096, 4096)],
}
SHAPES_13B = {
    4: [(5120, 1280), (5120, 3456), (3456, 4096 + 1024), (1280, 5120), (5120, 8064)],
    8: [(5120, 640), (5120, 1792), (1792, 5120), (640, 5120), (5120, 4096)],
}
# fix 13B tp=4 down: K=13824/4=3456, N=5120
SHAPES_13B[4][2] = (3456, 5120)


def main():
    models = (sys.argv[1:] or ["7b"])
    out = {}
    shapes = []
    if "7b" in models:
        shapes += SHAPES_7B[4] + SHAPES_7B[8]
    if "13b" in models:
        shapes += SHAPES_13B[4] + SHAPES_13B[8]
    seen = set()
    for K, N in shapes:
        if (K, N) in seen:
            continue
        seen.add((K, N))
        key = _key("stacked_v3", K, N, 4, 128, 8)
        print(f"[tune-tp] {key} ...", flush=True)
        bn, bk = tune_stacked(K, N, 4, 128, 8, planar=False)
        out[key] = [bn, bk]
        print(f"[tune-tp] {key} -> {(bn, bk)}", flush=True)
    dev = jax.devices()[0].device_kind.replace(" ", "_")
    print(json.dumps({dev: out}, indent=1), flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    os.environ.setdefault("QLLM_TPU_AUTOTUNE_VERBOSE", "1")
    main()
