"""Library-mode default args (reference qllm/args_config.py FakeArgs)."""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class FakeArgs:
    model: str = ""
    tokenizer: str = ""
    quant_method: str = "gptq"
    dataset: str = "wikitext2"
    seed: int = 0
    nsamples: int = 128
    seqlen: int = 2048
    percdamp: float = 0.01
    sym: bool = False
    act_order: bool = False
    true_sequential: bool = False
    static_groups: bool = False
    mse: bool = False
    allow_mix_bits: bool = False
    mix_qlayer_conf: Optional[str] = None
    quant_config: Optional[str] = None
    wbits: int = 4
    groupsize: int = 128
    eval: bool = False
    allow_synthetic: bool = False
    save: str = ""
    save_safetensors: bool = True
    load: str = ""
    export_onnx: str = ""
    use_plugin: bool = False
    pack_mode: str = "AUTO"
    kv_quant: bool = True
    max_new_tokens: int = 50
    quant_cache_dir: Optional[str] = None
    hessian_dir: Optional[str] = None
    layer_parallel: bool = False

    def __post_init__(self):
        if not self.tokenizer:
            self.tokenizer = self.model
