# shared recipe plumbing (sourced, not executed)
set -euo pipefail
cd "$(dirname "${BASH_SOURCE[1]}")/.."

smoke_mode() { [ "${QLLM_RECIPE_SMOKE:-0}" = "1" ]; }

# In smoke mode substitute a tiny synthetic checkpoint + synthetic data
# so every recipe is executable with zero assets (the contract numbers
# then obviously do not apply).
prepare_smoke_model() {
  SMOKE_DIR="${OUT}_smoke_model"
  python - "$SMOKE_DIR" <<'PY'
import sys

import jax

from qllm_tpu.modeling import AutoQuantizedModelForCausalLM as AutoQ
from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG, init_params

path = sys.argv[1]
params = init_params(TINY_LLAMA_TEST_CONFIG, jax.random.key(0))
AutoQ.save_pretrained(params, TINY_LLAMA_TEST_CONFIG, path, pack_mode="GPTQ")
import os

for n in ("quant_config.json", "quantize_config.json"):
    p = os.path.join(path, n)
    if os.path.exists(p):
        os.remove(p)
print(path)
PY
}

run_recipe() {
  if smoke_mode; then
    prepare_smoke_model
    MODEL="$SMOKE_DIR"
    DATASET="synthetic"
    EXTRA_ARGS=(--nsamples 2 --seqlen 64 --max_new_tokens 4 --allow_synthetic)
  else
    EXTRA_ARGS=()
  fi
  echo "[recipe] model=$MODEL dataset=$DATASET out=$OUT"
  python -m qllm_tpu.run --model "$MODEL" --dataset "$DATASET" \
    --save "$OUT" --eval "${EXTRA_ARGS[@]}" "$@"
}
