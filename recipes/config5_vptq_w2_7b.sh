#!/usr/bin/env bash
# BASELINE config 5: VPTQ W2 Llama-2-7B — vector quantized + INT8
# KV-cache decode (kv quant is on by default in eval generation).
source "$(dirname "$0")/_common.sh"
MODEL="${QLLM_TPU_MODEL_7B:-}"
DATASET=wikitext2
OUT="${OUT:-out/config5-vptq-w2-7b}"
run_recipe --quant_method vptq --wbits 2 --groupsize 128
