"""Load the reference's pure-torch GPTQ core for parity tests.

Satisfies qllm/quantization/gptq/gptq.py's imports (texttable,
...utils.logger, relative _gptq_quantizer) via stub modules so it runs
standalone from the read-only reference checkout.
"""

import importlib.util
import os
import sys
import types

REF_GPTQ = "/root/reference/qllm/quantization/gptq/gptq.py"
REF_QUANTIZER = "/root/reference/qllm/quantization/gptq/_gptq_quantizer.py"


def reference_available() -> bool:
    return os.path.exists(REF_GPTQ)


def load_reference_gptq():
    """Returns (gptq_module, torch). Raises ImportError without torch."""
    import torch

    torch.cuda.synchronize = lambda *a, **k: None  # CPU-only torch

    if "texttable" not in sys.modules:
        tt = types.ModuleType("texttable")

        class Texttable:
            def __init__(self, *a, **k):
                pass

            def header(self, *a):
                return self

            def set_cols_dtype(self, *a):
                return self

            def add_row(self, *a):
                return self

            def draw(self):
                return "\n"

        tt.Texttable = Texttable
        sys.modules["texttable"] = tt

    if "refq" not in sys.modules:
        for name in (
            "refq",
            "refq.utils",
            "refq.utils.logger",
            "refq.quantization",
            "refq.quantization.gptq",
        ):
            m = types.ModuleType(name)
            m.__path__ = []
            sys.modules[name] = m
        sys.modules["refq.utils"].torch_snr_error = (
            lambda a, b: torch.tensor(0.0)
        )

        class _L:
            def debug(self, *a, **k):
                pass

            info = warning = error = debug

        sys.modules["refq.utils.logger"].get_logger = lambda *a, **k: _L()
        sys.modules["refq.utils"].logger = sys.modules["refq.utils.logger"]

    def load(name, path):
        full = f"refq.quantization.gptq.{name}"
        if full in sys.modules:
            return sys.modules[full]
        spec = importlib.util.spec_from_file_location(full, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
        return mod

    load("_gptq_quantizer", REF_QUANTIZER)
    return load("gptq", REF_GPTQ), torch


def reference_fasterquant_dense(
    mod, torch, w_np, H_np, bits=4, groupsize=128, actorder=False,
    static_groups=False, mse=False,
):
    """Run the reference GPTQ on w [K, N] with Hessian H [K, K];
    returns the dequantized dense weight [K, N] (float32 numpy)."""
    import numpy as np

    K, N = w_np.shape
    layer = torch.nn.Linear(K, N, bias=False)
    layer.weight.data = torch.from_numpy(np.ascontiguousarray(w_np.T))
    g = mod.GPTQ(layer)
    g.inp1 = None
    g.out1 = None
    g.H = torch.from_numpy(np.ascontiguousarray(H_np, np.float32))
    g.quantizer.configure(bits, perchannel=True, sym=False, mse=mse)
    g.fasterquant(
        blocksize=128,
        percdamp=0.01,
        groupsize=groupsize,
        actorder=actorder,
        static_groups=static_groups,
    )
    return layer.weight.data.numpy().T.astype(np.float32)


def reference_quantize_params(params, cfg, calib_tokens, bits=4, groupsize=128):
    """Quantize every linear of a params pytree with the REFERENCE GPTQ
    (same sequential pipeline / Hessians as our GPTQQuantizer), leaving
    dense dequantized leaves. For parity baselines."""
    import jax.numpy as jnp
    import numpy as np

    from qllm_tpu.models.llama import ALL_LINEAR_NAMES
    from qllm_tpu.quant.frame import embed_inputs, run_block
    from qllm_tpu.quant.hessian import collect_block_hessians

    mod, torch = load_reference_gptq()
    h, cos, sin, mask = embed_inputs(params, cfg, jnp.asarray(calib_tokens))
    ref_layers = []
    for lp in params["layers"]:
        nlp = dict(lp)
        Hs = collect_block_hessians(nlp, cfg, h, cos, sin, mask)
        for name in ALL_LINEAR_NAMES:
            if name not in lp or name not in Hs:
                continue
            w = np.asarray(lp[name], np.float32)
            nlp[name] = jnp.asarray(
                reference_fasterquant_dense(
                    mod, torch, w, np.asarray(Hs[name], np.float32),
                    bits=bits, groupsize=groupsize,
                )
            )
        h = run_block(nlp, cfg, h, cos, sin, mask)
        ref_layers.append(nlp)
    out = dict(params)
    out["layers"] = ref_layers
    return out
