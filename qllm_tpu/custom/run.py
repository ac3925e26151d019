"""Out-of-tree model hook (reference qllm/custom/run.py:23 CustomModel).

Subclass AutoModelQuantization and override the load/dataset hooks to
quantize models that are not in the built-in registry — the same
extension pattern the reference demonstrates with its ADS-MPT+LoRA
example. Run with ``python -m qllm_tpu.custom <args>``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

from ..auto_quant import AutoModelQuantization
from ..models.llama import ModelConfig

__all__ = ["CustomModel", "main"]


class CustomModel(AutoModelQuantization):
    """Override points:

    * ``get_torch_model(args)``       -> (params pytree, ModelConfig)
    * ``get_datasets(args)``          -> calibration token array
    * ``save_model / eval_model``     -> inherit or specialize

    The params pytree must follow the qllm_tpu layout ("embed_tokens",
    "layers" list with q/k/v/o/gate/up/down + norms, "norm", optional
    "lm_head"); any custom architecture that can be phrased that way
    quantizes with zero further changes.
    """

    def get_torch_model(self, args) -> Tuple[Dict[str, Any], ModelConfig]:
        raise NotImplementedError(
            "subclass CustomModel and return (params, ModelConfig) for "
            "your out-of-tree architecture"
        )


_IMPLS = {
    # the worked out-of-tree example (MPT + LoRA fold); users register
    # their own CustomModel subclass here or call .run() directly
    "mpt_lora": "qllm_tpu.custom.example_mpt_lora:MptLoraCustomModel",
}


def main(argv=None) -> None:
    import importlib

    from ..run import define_basic_args

    p = define_basic_args()
    p.add_argument(
        "--impl",
        default="",
        choices=[""] + sorted(_IMPLS),
        help="custom-model implementation to run (e.g. the shipped "
        "mpt_lora example); empty = the abstract base (subclass it)",
    )
    args = p.parse_args(argv)
    if args.impl:
        mod, cls = _IMPLS[args.impl].split(":")
        impl = getattr(importlib.import_module(mod), cls)()
    else:
        impl = CustomModel()
    impl.run(args)


if __name__ == "__main__":
    main()
