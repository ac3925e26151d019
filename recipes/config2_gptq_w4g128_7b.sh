#!/usr/bin/env bash
# BASELINE config 2: GPTQ W4 g128 Llama-2-7B — C4 calibration,
# act_order, wikitext-2 PPL eval.
source "$(dirname "$0")/_common.sh"
MODEL="${QLLM_TPU_MODEL_7B:-}"
DATASET=c4
OUT="${OUT:-out/config2-gptq-w4g128-7b}"
run_recipe --quant_method gptq --wbits 4 --groupsize 128 --act-order
