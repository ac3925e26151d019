#!/usr/bin/env bash
# BASELINE config 1: HQQ W4 g128 TinyLlama-1.1B — data-free quantize +
# wikitext-2 PPL eval (CPU-runnable).
source "$(dirname "$0")/_common.sh"
MODEL="${QLLM_TPU_MODEL_TINYLLAMA:-}"
DATASET=wikitext2
OUT="${OUT:-out/config1-hqq-w4g128-tinyllama}"
run_recipe --quant_method hqq --wbits 4 --groupsize 128
