"""CLI: ``python -m qllm_tpu`` — flag surface mirrors reference
qllm/run.py:22-70."""

from __future__ import annotations

import argparse

from .auto_quant import AutoModelQuantization

__all__ = ["define_basic_args", "main"]


def define_basic_args() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description=(
            "A TPU-native x-bit quantization engine for LLMs, [2-8] bits, "
            "awq/gptq/hqq/vptq"
        ),
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument(
        "--quant_method",
        choices=["gptq", "awq", "hqq", "vptq"],
        default="gptq",
        help="quantization algorithm",
    )
    p.add_argument("--model", type=str, default="", help="float model dir")
    p.add_argument("--tokenizer", type=str, default="", help="tokenizer dir")
    p.add_argument(
        "--dataset",
        type=str,
        default="wikitext2",
        choices=["wikitext2", "ptb", "c4", "ptb-new", "c4-new", "pileval", "synthetic"],
        help="calibration dataset",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--nsamples", type=int, default=128)
    p.add_argument("--seqlen", type=int, default=2048)
    p.add_argument("--percdamp", type=float, default=0.01)
    p.add_argument("--sym", action="store_true")
    p.add_argument("--act-order", dest="act_order", action="store_true")
    p.add_argument(
        "--true-sequential", dest="true_sequential", action="store_true"
    )
    p.add_argument("--static-groups", dest="static_groups", action="store_true")
    p.add_argument(
        "--mse",
        action="store_true",
        help="GPTQ scale/zero MSE grid search (reference "
        "_gptq_quantizer.py:74-91; maxshrink=0.8 grid=100 norm=2.4)",
    )
    p.add_argument("--allow_mix_bits", action="store_true")
    p.add_argument("--mix_qlayer_conf", type=str, default=None)
    p.add_argument(
        "--quant_config", type=str, default=None, help="VPTQ json config"
    )
    p.add_argument("--wbits", type=int, default=16, choices=[2, 3, 4, 5, 6, 7, 8, 16])
    p.add_argument("--groupsize", type=int, default=-1)
    p.add_argument("--eval", action="store_true")
    p.add_argument(
        "--allow_synthetic",
        action="store_true",
        help="permit SYNTHETIC token fallback for calibration/eval "
        "(smoke tests only; accuracy runs must use real data)",
    )
    p.add_argument("--save", type=str, default="")
    p.add_argument("--save_safetensors", action="store_true", default=True)
    p.add_argument("--load", type=str, default="")
    p.add_argument("--export_onnx", type=str, default="")
    p.add_argument("--use_plugin", action="store_true")
    p.add_argument(
        "--pack_mode",
        type=str,
        default="AUTO",
        choices=["AUTO", "GEMM", "GEMV", "GPTQ", "ORT", "HQQ", "MARLIN"],
        help=(
            "checkpoint layout. AUTO resolves per method; all layouts run "
            "through the same canonical TPU kernels"
        ),
    )
    p.add_argument("--no-kv-quant", dest="kv_quant", action="store_false")
    p.add_argument("--max_new_tokens", type=int, default=50)
    # sampling for --use_plugin chat / --eval generation (beyond the
    # reference, whose chat loop is greedy-only: chatcli/generation.py)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top_k", type=int, default=0)
    p.add_argument("--top_p", type=float, default=1.0)
    p.add_argument(
        "--w4a8",
        action="store_true",
        help=(
            "EXPERIMENTAL: serve with per-token int8 activations "
            "(integer-rate MXU dots). Isolated-kernel decode win "
            "(-19%% at M=32) has not translated end-to-end anywhere "
            "measured: batch-32 decode is attention/KV-bound (w4a16 "
            "1353 vs w4a8 1354 tok/s) and prefill measured 7x SLOWER "
            "on gateup (gated decode-only). ~1%% extra relative error "
            "vs W4A16"
        ),
    )
    p.add_argument(
        "--quant_cache_dir",
        type=str,
        default=None,
        help=(
            "per-layer quantization cache for crash resume (idempotent: "
            "rerunning skips finished layers)"
        ),
    )
    p.add_argument(
        "--hessian_dir",
        type=str,
        default=None,
        help=(
            "VPTQ: offline proxy-Hessian artifacts "
            "(quant.hessian_pipeline.collect_proxy_hessians) instead of "
            "inline collection — reference quant_vptq.py:93-125"
        ),
    )
    p.add_argument(
        "--layer_parallel",
        action="store_true",
        help=(
            "VPTQ: partition layers across hosts (jax.process_index); "
            "needs --hessian_dir and a shared --quant_cache_dir — the "
            "TPU role of reference quant_vptq.py:127-171's per-GPU pool"
        ),
    )
    return p


def main(argv=None) -> None:
    parser = define_basic_args()
    args = parser.parse_args(argv)
    if not args.model and not args.load:
        parser.error("one of --model / --load is required")
    AutoModelQuantization().run(args)


if __name__ == "__main__":
    main()
