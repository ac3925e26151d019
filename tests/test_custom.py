"""The custom-model hook carries an UNKNOWN-to-the-registry artifact
end-to-end: out-of-tree MPT+LoRA checkpoint -> get_torch_model override
(LoRA fold + pytree mapping) -> quantize -> save -> reload -> serve,
with logits parity against the merged torch oracle.

Reference role: /root/reference/qllm/custom/run.py:23-160 (the ADS-MPT
+ loralib example wired through AutoModelQuantization)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from qllm_tpu.args_config import FakeArgs
from qllm_tpu.custom.example_mpt_lora import (
    MptLoraCustomModel,
    make_tiny_mpt_lora_checkpoint,
)


def test_custom_mpt_lora_end_to_end(tmp_path):
    src = str(tmp_path / "mpt-lora")
    out = str(tmp_path / "mpt-lora-q")
    oracle = make_tiny_mpt_lora_checkpoint(src)

    ids = np.array([[3, 17, 42, 99, 5, 77, 23, 11]], dtype=np.int32)
    with torch.no_grad():
        ref = oracle(torch.tensor(ids)).logits.numpy()

    cm = MptLoraCustomModel()
    args = FakeArgs(
        model=src,
        quant_method="hqq",
        wbits=8,
        groupsize=16,
        nsamples=2,
        seqlen=32,
        save=out,
    )

    # 1) the override loads + folds LoRA; float parity vs merged torch
    params, cfg = cm.get_torch_model(args)
    from qllm_tpu.models import forward

    float_logits, _ = forward(params, cfg, jnp.asarray(ids))
    err = float(np.max(np.abs(np.asarray(float_logits) - ref)))
    assert err < 2e-2, f"LoRA-merged float parity broke: {err}"

    # the fold must actually matter: base-only weights diverge
    import transformers

    base = transformers.MptForCausalLM.from_pretrained(src).eval()
    with torch.no_grad():
        base_logits = base(torch.tensor(ids)).logits.numpy()
    assert np.max(np.abs(base_logits - ref)) > 1e-3

    # 2) full pipeline via the hook: quantize + save
    cm.run(args)

    # 3) the saved artifact is a PLAIN quantized MPT dir (adapters
    #    folded) — reloadable by the standard loader, servable
    from qllm_tpu.modeling.auto import AutoQuantizedModelForCausalLM as AutoQ

    qparams, qcfg = AutoQ.from_quantized(out, dtype=jnp.float32)
    q_logits, _ = forward(qparams, qcfg, jnp.asarray(ids))
    scale = float(np.max(np.abs(ref)))
    qerr = float(np.max(np.abs(np.asarray(q_logits) - ref)))
    assert qerr < 0.1 * scale + 5e-2, qerr
    assert np.argmax(np.asarray(q_logits)[0, -1]) == np.argmax(ref[0, -1])

    # 4) serve: greedy decode through the engine
    from qllm_tpu.serve import ContinuousBatchingEngine, ServeConfig

    eng = ContinuousBatchingEngine(
        qparams, qcfg, ServeConfig(max_batch=1, max_seq=32)
    )
    eng.submit([3, 17, 42], max_new_tokens=4)
    done = eng.run()
    assert len(done) == 1 and len(done[0].output) == 4


def test_custom_requires_adapters(tmp_path):
    """Without the out-of-tree artifact the override refuses loudly."""
    import transformers

    src = str(tmp_path / "plain-mpt")
    cfg = transformers.MptConfig(
        vocab_size=128, d_model=64, n_heads=4, n_layers=2, max_seq_len=128
    )
    transformers.MptForCausalLM(cfg).save_pretrained(
        src, safe_serialization=True
    )
    with pytest.raises(FileNotFoundError):
        MptLoraCustomModel().get_torch_model(FakeArgs(model=src))
