#!/usr/bin/env bash
# BASELINE config 3: AWQ W4 g128 Llama-2-7B — pileval scale search,
# GEMM pack, then pack-mode conversion to the GPTQ layout.
source "$(dirname "$0")/_common.sh"
MODEL="${QLLM_TPU_MODEL_7B:-}"
DATASET=pileval
OUT="${OUT:-out/config3-awq-w4g128-7b}"
run_recipe --quant_method awq --wbits 4 --groupsize 128 --pack_mode GEMM
# pack-mode conversion: reload the GEMM checkpoint, re-save as GPTQ
python - "$OUT" <<'PY'
import sys

from qllm_tpu.modeling import AutoQuantizedModelForCausalLM as AutoQ

src = sys.argv[1]
params, cfg = AutoQ.from_quantized(src)
AutoQ.save_pretrained(params, cfg, src + "-gptq-layout", pack_mode="GPTQ",
                      quant_method="awq")
print("converted ->", src + "-gptq-layout")
PY
