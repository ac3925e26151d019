"""End-to-end orchestrator (reference qllm/auto_model_quantization.py).

Pipeline: load float model -> calibration data -> quantize -> save in a
pack mode / eval / export / chat. Notable reference behaviors kept:
  * AWQ caps nsamples at 64 (auto_model_quantization.py:211-213 — done
    in config_builder here)
  * allow_mix_bits forces the GPTQ pack mode (:203-207): mixed-bit
    checkpoints only round-trip through the per-layer table
  * pack_mode AUTO resolves per method (GEMM for awq, HQQ for hqq,
    GPTQ otherwise; the reference's SM75 probe is CUDA-specific)
  * ROUNDTRIP_CHECK env re-verifies pack->unpack equality on save (:17)
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .args_config import FakeArgs
from .modeling import AutoQuantizedModelForCausalLM
from .models.llama import ModelConfig
from .quant import build_config, get_quantizer
from .utils.logger import get_logger

logger = get_logger()

__all__ = ["AutoModelQuantization"]


class AutoModelQuantization:
    def __init__(self):
        self.tokenizer = None

    # ---------------------------------------------------------------- load

    def get_torch_model(self, args) -> Tuple[Dict[str, Any], ModelConfig]:
        """Name kept for API parity; loads the float JAX params."""
        params, cfg = AutoQuantizedModelForCausalLM.from_pretrained(args.load or args.model)
        self._try_load_tokenizer(args)
        return params, cfg

    def _try_load_tokenizer(self, args):
        path = args.tokenizer or args.model or args.load
        try:
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(
                path, use_fast=True, trust_remote_code=True
            )
        except Exception as e:
            logger.warning(f"tokenizer unavailable ({e}); text APIs disabled")
            self.tokenizer = None

    def get_datasets(self, args):
        from .data import get_sample_datas_for_quantization

        train, _ = get_sample_datas_for_quantization(
            args, self.tokenizer, seqlen=args.seqlen
        )
        return jnp.asarray(train, jnp.int32)

    @staticmethod
    def _clamp_vocab(tokens, cfg: ModelConfig):
        """Synthetic/foreign-tokenizer ids can exceed the model vocab;
        out-of-range ids would hit jnp.take's NaN fill mode."""
        mx = int(jnp.max(tokens))
        if mx >= cfg.vocab_size:
            logger.warning(
                f"calibration ids up to {mx} exceed vocab {cfg.vocab_size}; "
                "taking ids modulo vocab"
            )
            tokens = tokens % cfg.vocab_size
        return tokens

    # ------------------------------------------------------------ quantize

    def api_quantize(
        self,
        params: Dict[str, Any],
        cfg: ModelConfig,
        args=None,
        calib_tokens=None,
        **kwargs,
    ) -> Dict[str, Any]:
        """Library entry (reference .api_quantize :174-190)."""
        args = args or FakeArgs(**kwargs)
        qconfig = build_config(args)
        quantizer = get_quantizer(qconfig)
        if calib_tokens is None and args.quant_method != "hqq":
            calib_tokens = self.get_datasets(args)
        if calib_tokens is not None:
            calib_tokens = self._clamp_vocab(calib_tokens, cfg)
        layer_overrides = getattr(qconfig, "mix_qlayer_conf", None)
        qkwargs = dict(layer_overrides=layer_overrides)
        import inspect

        sig = inspect.signature(quantizer.quantize).parameters
        cache_dir = getattr(args, "quant_cache_dir", None)
        if cache_dir and "cache_dir" in sig:
            qkwargs["cache_dir"] = cache_dir
        hess_dir = getattr(args, "hessian_dir", None)
        if hess_dir and "proxy_hessian_dir" in sig:
            qkwargs["proxy_hessian_dir"] = hess_dir
        if getattr(args, "layer_parallel", False) and "partition" in sig:
            qkwargs["partition"] = "auto"
        qparams = quantizer.quantize(params, cfg, calib_tokens, **qkwargs)
        self._last_quantizer = quantizer
        self._last_config = qconfig
        return qparams

    def resolve_pack_mode(self, args) -> str:
        if getattr(args, "allow_mix_bits", False):
            if args.pack_mode not in ("AUTO", "GPTQ"):
                logger.warning(
                    "allow_mix_bits only round-trips through the GPTQ pack "
                    "mode; forcing GPTQ (reference behavior)"
                )
            return "GPTQ"
        if args.pack_mode != "AUTO":
            return args.pack_mode
        return {"awq": "GEMM", "hqq": "HQQ"}.get(args.quant_method, "GPTQ")

    # ---------------------------------------------------------------- save

    def save_model(self, qparams, cfg, args, path: str):
        pack_mode = self.resolve_pack_mode(args)
        layer_configs = getattr(
            getattr(self, "_last_quantizer", None), "quant_config_by_layer", None
        )
        AutoQuantizedModelForCausalLM.save_pretrained(
            qparams,
            cfg,
            path,
            pack_mode=pack_mode,
            quant_method=args.quant_method,
            layer_configs=layer_configs,
        )
        if self.tokenizer is not None:
            try:
                self.tokenizer.save_pretrained(path)
            except Exception:
                pass
        if os.environ.get("ROUNDTRIP_CHECK"):
            p2, _ = AutoQuantizedModelForCausalLM.from_quantized(path)
            from .quant.qtensor import QuantizedTensor, dequantize_tensor

            for i, lp in enumerate(qparams["layers"]):
                for n, w in lp.items():
                    if isinstance(w, QuantizedTensor):
                        a = np.asarray(dequantize_tensor(w))
                        b = np.asarray(dequantize_tensor(p2["layers"][i][n]))
                        assert np.allclose(a, b, atol=1e-3), (i, n)
            logger.info("ROUNDTRIP_CHECK passed")
        logger.info(f"saved quantized model ({pack_mode}) to {path}")

    def repack_to_new_mode(self, path_in: str, path_out: str, new_mode: str):
        """Checkpoint-level layout conversion
        (reference repack_to_new_mode :115-147)."""
        params, cfg = AutoQuantizedModelForCausalLM.from_quantized(path_in)
        from .modeling.qconfig_io import BaseQuantizeConfig

        conf = BaseQuantizeConfig.from_pretrained(path_in)
        AutoQuantizedModelForCausalLM.save_pretrained(
            params,
            cfg,
            path_out,
            pack_mode=new_mode,
            quant_method=conf.quant_method,
            layer_configs=conf.layer_configs or None,
        )
        logger.info(f"repacked {path_in} ({conf.pack_mode}) -> {path_out} ({new_mode})")

    # ---------------------------------------------------------------- eval

    def eval_model(self, params, cfg, args):
        """50-token smoke generation (+ wikitext PPL when data available)
        (reference eval_model :43-76)."""
        from .models import greedy_generate

        if self.tokenizer is not None:
            prompt_ids = self.tokenizer(
                "compared with awq, gptq is", return_tensors="np"
            ).input_ids.astype(np.int32)
        else:
            prompt_ids = np.array([[1, 2, 3, 4]], np.int32)
        out = greedy_generate(
            params,
            cfg,
            jnp.asarray(prompt_ids),
            max_new_tokens=args.max_new_tokens,
            quantized_kv=getattr(args, "kv_quant", True),
        )
        if self.tokenizer is not None:
            logger.info(self.tokenizer.decode(np.asarray(out)[0]))
        else:
            logger.info(f"generated ids: {np.asarray(out)[0].tolist()}")
        from .data import get_loaders
        from .eval.perplexity import perplexity_from_ids

        allow_synth = getattr(args, "allow_synthetic", False) or (
            args.dataset == "synthetic"
        )
        try:
            _, test = get_loaders(
                args.dataset,
                self.tokenizer,
                seqlen=2048,
                allow_synthetic=allow_synth,
            )
        except Exception as e:
            # an explicit --eval on a real dataset must NOT silently
            # degrade into "no number" or a synthetic number
            if not allow_synth:
                raise RuntimeError(
                    f"--eval requested but dataset '{args.dataset}' is "
                    f"unavailable ({e}); pass --allow_synthetic for a "
                    "smoke-test run"
                ) from e
            logger.info(f"ppl eval skipped: {e}")
            return
        if test is not None:
            ppl = perplexity_from_ids(
                params, cfg, test, n_ctx=512, progress=True
            )
            logger.info(f"{args.dataset} perplexity: {ppl:.4f}")

    # --------------------------------------------------------------- export

    def export_onnx(self, params, cfg, args, path: str):
        """Full merged ONNX decoder (reference artifact: decoder_model_
        merged.onnx, utils/onnx/exporter.py:11-128) verified by
        executing the serialized bytes against the numpy forward, plus
        the StableHLO prefill/decode pair (the TPU-native artifact)."""
        from .export import export_model

        try:
            from .export.onnx_decoder import export_onnx_decoder
            from .export.onnx_verify import verify_onnx_decoder

            paths = export_onnx_decoder(params, cfg, path)
            logger.info(f"exported ONNX decoder: {sorted(paths)}")
            err = verify_onnx_decoder(params, cfg, paths)
            logger.info(f"ONNX decoder verified: rel err {err:.4g}")
        except NotImplementedError as e:
            logger.warning(
                f"full ONNX decoder unsupported for this arch ({e}); "
                "falling back to per-block MatMulNBits subgraphs"
            )
            from .export.onnx_matmulnbits import export_linears_onnx

            written = export_linears_onnx(params, os.path.join(path, "blocks"))
            logger.info(f"exported {len(written)} MatMulNBits block graphs")
        export_model(params, cfg, path, tokenizer=self.tokenizer)

    # ----------------------------------------------------------------- run

    def run(self, args) -> None:
        """CLI pipeline (reference .run :192-247)."""
        from .utils.misc import set_seed

        set_seed(args.seed)
        if args.load:
            params, cfg = AutoQuantizedModelForCausalLM.from_quantized(
                args.load
            )
            self._try_load_tokenizer(args)
        else:
            params, cfg = self.get_torch_model(args)
            params = self.api_quantize(params, cfg, args=args)
        if args.save:
            self.save_model(params, cfg, args, args.save)
        if args.eval:
            self.eval_model(params, cfg, args)
        if args.export_onnx:
            self.export_onnx(params, cfg, args, args.export_onnx)
        if args.use_plugin:
            from .plugin.chat import loop_in_chat_completion

            loop_in_chat_completion(params, cfg, self.tokenizer, args)
