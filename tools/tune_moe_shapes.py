#!/usr/bin/env python
"""One-shot on-chip sweep of the qwen3-moe / mistral / mixtral
attention + lm_head stacked shapes (planar family, decode regime).

The shipped tuned_defaults only covered llama-7B shapes; the MoE bench
models' [L]-stacked attention matmuls (hybrid stacking) and lm_head run
heuristic blocks. Prints a JSON fragment for ops/tuned_defaults.json.
"""

import faulthandler
import json
import os
import sys

faulthandler.dump_traceback_later(5400, exit=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from qllm_tpu.ops.autotune import _key, tune_stacked

# (K, N_padded) decode shapes:
#   qwen3moe (D=2048, 32q+2*4kv heads @128): qkv 2048x5120, o 4096x2048,
#     lm_head 2048x32768 (vocab 32000 lane-padded)
#   mistral/mixtral (D=4096, 32q+2*8kv @128): qkv 4096x6144
#   mistral dense mlp: gateup 4096x28672, down 14336x4096
SHAPES = [
    (2048, 5120),
    (4096, 2048),
    (2048, 32768),
    (4096, 6144),
    (4096, 28672),
    (14336, 4096),
]


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    os.environ.setdefault("QLLM_TPU_AUTOTUNE_VERBOSE", "1")
    out = {}
    for K, N in SHAPES:
        key = _key("stacked", K, N, 4, 128, 8)
        try:
            bn, bk = tune_stacked(K, N, 4, 128, M=8, L=4, planar=True)
        except Exception as e:
            print(f"{key}: FAIL {e}", file=sys.stderr, flush=True)
            continue
        out[key] = [bn, bk]
        print(f"{key}: {[bn, bk]}", file=sys.stderr, flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
