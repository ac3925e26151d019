#!/usr/bin/env bash
# BASELINE config 4: GPTQ mixed-bits Llama-2-13B — 2-8 bit per-layer
# auto-promotion (--allow_mix_bits).
source "$(dirname "$0")/_common.sh"
MODEL="${QLLM_TPU_MODEL_13B:-}"
DATASET=c4
OUT="${OUT:-out/config4-gptq-mixbits-13b}"
run_recipe --quant_method gptq --wbits 4 --groupsize 128 --allow_mix_bits
