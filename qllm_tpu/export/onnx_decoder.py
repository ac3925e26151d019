"""Full-model ONNX decoder export (the reference's headline artifact).

Reference contract being matched: qllm exports the WHOLE causal LM as
`decoder_model.onnx` (prefill) + `decoder_with_past_model.onnx`
(single-token decode with KV-cache inputs) and fuses them into
`decoder_model_merged.onnx` via an If node on ``use_cache_branch``
(qllm/utils/onnx/exporter.py:11-128, merge_encoder_decoder.py:325+).
Every quantized linear lowers to ``com.microsoft::MatMulNBits``
(quant_linear_gptq.py:57-68, quant_linear_onnxruntime.py:17-29); the
rest of the graph (embedding Gather, RMS/LayerNorm, rotary, attention,
gated MLP, logits) is standard ONNX opset-17 ops.

The reference leans on torch.onnx tracing; here the graph is built
directly from the params pytree — no torch in the path, no ``onnx``
package needed (export/onnx_proto.py writes the wire format). The
artifacts load with ``onnx.load`` and run under onnxruntime unchanged;
offline they are verified by executing the merged graph with the
pure-numpy evaluator (export/onnx_exec.py) against eval/numpy_ref.py.

I/O signature (optimum/ORT decoder convention):
  inputs : input_ids [B,T] int64, attention_mask [B,S] int64,
           position_ids [B,T] int64,
           past_key_values.{i}.key/value [B,Hkv,P,hd] (with_past only)
  outputs: logits [B,T,V], present.{i}.key/value [B,Hkv,S,hd]
The with_past graph follows the reference's single-new-token contract
(T==1: no intra-block causal mask, exactly like the torch-exported
decoder_with_past).

Coverage: the llama shape family — rope neox/gptj (incl. partial
rotary), rms/layer norm (+gemma "+1" variant), gated/plain MLP, GQA,
biases, tied or quantized lm_head, gemma2 softcaps — PLUS sparse MoE
(mixtral top-k router, deepseek softmax-all/group-limited routing,
shared experts, qwen2-moe sigmoid shared gate), MLA (deepseek-v2
latent attention incl. q-lora), and ALiBi (+ bloom embed layernorm).
Configs outside it (parallel-residual, learned positions, qk-norm)
raise NotImplementedError and the CLI falls back to per-block
MatMulNBits subgraphs with a warning.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from ..quant.qtensor import QuantizedTensor
from .onnx_matmulnbits import matmulnbits_node
from .onnx_merge import merge_decoders
from .onnx_proto import (
    DT,
    AttributeProto,
    GraphProto,
    ModelProto,
    NodeProto,
    TensorProto,
    ValueInfoProto,
)

__all__ = ["build_decoder_graph", "export_onnx_decoder"]

_INT_MAX = 2**31 - 1


def _np_dt(dt: int):
    return {DT.FLOAT: np.float32, DT.FLOAT16: np.float16}[dt]


class _GB:
    """Tiny graph-builder: names, nodes, initializers."""

    def __init__(self, act_dtype: int, prefix: str):
        self.act = act_dtype
        self.prefix = prefix
        self.nodes: List[NodeProto] = []
        self.inits: List[TensorProto] = []
        self._n = 0

    def fresh(self, hint: str) -> str:
        self._n += 1
        return f"{self.prefix}/{hint}_{self._n}"

    def init(self, hint: str, array: np.ndarray, fresh: bool = True) -> str:
        name = self.fresh(hint) if fresh else hint
        self.inits.append(TensorProto(name, np.ascontiguousarray(array)))
        return name

    def add(
        self,
        op: str,
        inputs: Sequence[str],
        n_out: int = 1,
        domain: str = "",
        out_names: Optional[List[str]] = None,
        **attrs,
    ) -> Union[str, List[str]]:
        outs = out_names or [self.fresh(op.lower()) for _ in range(n_out)]
        alist = []
        for k, v in attrs.items():
            if isinstance(v, bool):
                alist.append(AttributeProto(k, i=int(v)))
            elif isinstance(v, int):
                alist.append(AttributeProto(k, i=v))
            elif isinstance(v, float):
                alist.append(AttributeProto(k, f=v))
            elif isinstance(v, str):
                alist.append(AttributeProto(k, s=v))
            elif isinstance(v, (list, tuple)):
                alist.append(AttributeProto(k, ints=list(v)))
            elif isinstance(v, TensorProto):
                alist.append(AttributeProto(k, t=v))
            elif isinstance(v, GraphProto):
                alist.append(AttributeProto(k, g=v))
            else:
                raise TypeError(f"attr {k}: {type(v)}")
        self.nodes.append(
            NodeProto(
                op_type=op,
                inputs=list(inputs),
                outputs=outs,
                name=outs[0],
                domain=domain,
                attributes=alist,
            )
        )
        return outs[0] if len(outs) == 1 else outs

    # ---- common composites ------------------------------------------

    def constf(self, hint: str, value) -> str:
        return self.init(hint, np.asarray(value, _np_dt(self.act)))

    def consti(self, hint: str, value) -> str:
        return self.init(hint, np.asarray(value, np.int64))

    def slice(self, x, starts, ends, axes, steps=None) -> str:
        ins = [
            x,
            self.consti("starts", starts),
            self.consti("ends", ends),
            self.consti("axes", axes),
        ]
        if steps is not None:
            ins.append(self.consti("steps", steps))
        return self.add("Slice", ins)

    def unsqueeze(self, x, axes) -> str:
        return self.add("Unsqueeze", [x, self.consti("axes", axes)])

    def reshape(self, x, shape) -> str:
        return self.add("Reshape", [x, self.consti("shape", shape)])

    def mul(self, a, b) -> str:
        return self.add("Mul", [a, b])

    def addn(self, a, b) -> str:
        return self.add("Add", [a, b])


def _as_np(x, dtype=np.float32) -> np.ndarray:
    """Pytree leaf (possibly bf16 jax array) -> numpy."""
    try:
        import jax.numpy as jnp

        return np.asarray(jnp.asarray(x, jnp.float32)).astype(dtype)
    except Exception:
        return np.asarray(x, np.float32).astype(dtype)


def _check_supported(cfg) -> None:
    bad = []
    if cfg.pos_embedding not in ("rope", "alibi", "learned"):
        bad.append(f"pos_embedding={cfg.pos_embedding}")
    if getattr(cfg, "attn_type", "mha") not in ("mha", "mla"):
        bad.append(f"attn_type={cfg.attn_type}")
    if bad:
        raise NotImplementedError(
            f"ONNX decoder export does not cover: {', '.join(bad)}"
        )


class _DecoderBuilder:
    def __init__(self, params, cfg, with_past: bool, act_dtype: int):
        _check_supported(cfg)
        self.p = params
        self.cfg = cfg
        self.with_past = with_past
        self.act = act_dtype
        self.g = _GB(act_dtype, "wp" if with_past else "np")
        self.big_neg = 65000.0 if act_dtype == DT.FLOAT16 else 1e9

    # ---- building blocks --------------------------------------------

    def linear(self, x: str, w, name: str, bias=None) -> str:
        g = self.g
        if isinstance(w, QuantizedTensor) and w.bits == 4 and not w.planar:
            node, inits = matmulnbits_node(
                w, name, x, f"{name}.mm_out", act_dtype=self.act
            )
            g.nodes.append(node)
            g.inits.extend(inits)
            out = f"{name}.mm_out"
        else:
            if isinstance(w, QuantizedTensor):
                from ..eval.numpy_ref import np_dequantize

                arr = np_dequantize(w).astype(_np_dt(self.act))
            else:
                arr = _as_np(w, _np_dt(self.act))
            wn = g.init(f"{name}.weight", arr, fresh=False)
            out = g.add("MatMul", [x, wn])
        if bias is not None:
            bn = g.init(
                f"{name}.bias", _as_np(bias, _np_dt(self.act)), fresh=False
            )
            out = g.addn(out, bn)
        return out

    def norm(self, x: str, weight, bias, name: str) -> str:
        cfg, g = self.cfg, self.g
        w = _as_np(weight, _np_dt(self.act))
        eps = g.constf("eps", cfg.rms_norm_eps)
        if cfg.norm_type == "layernorm":
            mu = g.add("ReduceMean", [x], axes=[-1], keepdims=1)
            xc = g.add("Sub", [x, mu])
            var = g.add(
                "ReduceMean", [g.mul(xc, xc)], axes=[-1], keepdims=1
            )
            xn = g.add("Div", [xc, g.add("Sqrt", [g.addn(var, eps)])])
            out = g.mul(xn, g.init(f"{name}.weight", w, fresh=False))
            if bias is not None:
                out = g.addn(
                    out,
                    g.init(
                        f"{name}.bias",
                        _as_np(bias, _np_dt(self.act)),
                        fresh=False,
                    ),
                )
            return out
        if cfg.norm_type == "rmsnorm_plus1":
            w = w + 1.0
        var = g.add("ReduceMean", [g.mul(x, x)], axes=[-1], keepdims=1)
        xn = g.add("Div", [x, g.add("Sqrt", [g.addn(var, eps)])])
        return g.mul(xn, g.init(f"{name}.weight", w, fresh=False))

    def act_fn(self, x: str) -> str:
        g = self.g
        name = self.cfg.hidden_act
        if name == "silu":
            return g.mul(x, g.add("Sigmoid", [x]))
        if name in ("gelu", "gelu_python", "gelu_new", "gelu_pytorch_tanh"):
            # tanh approximation (matches eval/numpy_ref.py _act)
            x3 = g.mul(g.mul(x, x), x)
            inner = g.mul(
                g.addn(x, g.mul(x3, g.constf("c0", 0.044715))),
                g.constf("c1", 0.7978845608028654),
            )
            t = g.add("Tanh", [inner])
            return g.mul(
                g.mul(x, g.constf("half", 0.5)),
                g.addn(t, g.constf("one", 1.0)),
            )
        if name == "relu":
            return g.add("Relu", [x])
        raise NotImplementedError(f"hidden_act {name}")

    def rope_tables(self, position_ids: str):
        """cos/sin [B,T,1,rd/2] in act dtype (angles in f32)."""
        from ..models.llama import rope_inv_freq_mscale

        cfg, g = self.cfg, self.g
        inv, msc = rope_inv_freq_mscale(cfg)
        posf = g.add("Cast", [position_ids], to=DT.FLOAT)
        ang = g.mul(
            g.unsqueeze(posf, [2]),
            g.init("inv_freq", inv.astype(np.float32)[None, None]),
        )  # [B,T,rd/2]
        cosf = g.add("Cos", [ang])
        sinf = g.add("Sin", [ang])
        if msc != 1.0:
            mc = g.init("rope_mscale", np.asarray(msc, np.float32))
            cosf, sinf = g.mul(cosf, mc), g.mul(sinf, mc)
        cos = g.add("Cast", [cosf], to=self.act)
        sin = g.add("Cast", [sinf], to=self.act)
        return g.unsqueeze(cos, [2]), g.unsqueeze(sin, [2])

    def rope(
        self,
        x: str,
        cos: str,
        sin: str,
        rd: Optional[int] = None,
        hd: Optional[int] = None,
        style: Optional[str] = None,
    ) -> str:
        """Apply rotary to x [B,T,H,hd] (broadcast cos/sin over H).
        ``rd``/``hd``/``style`` override the config values — MLA rotates
        a dr-wide tail slice with the gptj interleave."""
        cfg, g = self.cfg, self.g
        hd = hd if hd is not None else cfg.hd
        rd = rd if rd is not None else cfg.rot_dim
        style = style or cfg.rope_style
        if rd < hd:
            xr = g.slice(x, [0], [rd], [3])
            xp = g.slice(x, [rd], [_INT_MAX], [3])
        else:
            xr, xp = x, None
        if style == "gptj":
            x1 = g.slice(xr, [0], [_INT_MAX], [3], steps=[2])
            x2 = g.slice(xr, [1], [_INT_MAX], [3], steps=[2])
            r1 = g.add("Sub", [g.mul(x1, cos), g.mul(x2, sin)])
            r2 = g.addn(g.mul(x2, cos), g.mul(x1, sin))
            st = g.add(
                "Concat",
                [g.unsqueeze(r1, [4]), g.unsqueeze(r2, [4])],
                axis=4,
            )
            out = g.reshape(st, [0, 0, 0, rd])
        else:  # neox rotate-half
            half = rd // 2
            x1 = g.slice(xr, [0], [half], [3])
            x2 = g.slice(xr, [half], [rd], [3])
            cc = g.add("Concat", [cos, cos], axis=3)
            ss = g.add("Concat", [sin, sin], axis=3)
            rot = g.add("Concat", [g.add("Neg", [x2]), x1], axis=3)
            out = g.addn(g.mul(xr, cc), g.mul(rot, ss))
        if xp is not None:
            out = g.add("Concat", [out, xp], axis=3)
        return out

    def alibi_bias(self, attention_mask: str, Hkv: int, rep: int) -> str:
        """[Hkv,rep,1,S] additive score bias: slopes * key-index (the
        absolute form models.llama.build_mask uses; softmax shift-
        invariance makes it equal to the relative one)."""
        from ..models.llama import alibi_slopes

        cfg, g = self.cfg, self.g
        sl = np.asarray(
            alibi_slopes(cfg.num_attention_heads, cfg.alibi_style),
            _np_dt(self.act),
        ).reshape(Hkv, rep, 1, 1)
        sln = g.init("alibi_slopes", sl)
        shp = g.add("Shape", [attention_mask])  # [2]
        s_len = g.add(
            "Squeeze", [g.add("Gather", [shp, g.consti("i1", [1])], axis=0),
                        g.consti("ax0", [0])]
        )
        r = g.add(
            "Range",
            [
                g.init("r_start", np.asarray(0, np.int64)),
                s_len,
                g.init("r_delta", np.asarray(1, np.int64)),
            ],
        )
        rf = g.add("Cast", [r], to=self.act)  # [S]
        return g.mul(sln, rf)  # [Hkv,rep,1,S]

    def build_mask(self, input_ids: str, attention_mask: str) -> str:
        """Additive mask broadcastable to [B,Hkv,rep,T,S]."""
        g = self.g
        am = g.add("Cast", [attention_mask], to=self.act)  # [B,S]
        pad = g.mul(
            g.add("Sub", [am, g.constf("one", 1.0)]),
            g.constf("big", self.big_neg),
        )
        pad5 = g.unsqueeze(pad, [1, 2, 3])  # [B,1,1,1,S]
        if self.with_past:
            # reference decoder_with_past contract: T==1 (one new token
            # attends to everything the padding mask allows)
            return pad5
        shp = g.add("Shape", [input_ids])  # [2]
        t = g.add("Gather", [shp, g.consti("idx1", [1])], axis=0)  # [1]
        tt = g.add("Concat", [t, t], axis=0)  # [2]
        ones = g.add(
            "ConstantOfShape",
            [tt],
            value=TensorProto("v", np.ones((1,), _np_dt(self.act))),
        )
        tril = g.add("Trilu", [ones], upper=0)  # [T,T]
        causal = g.mul(
            g.add("Sub", [tril, g.constf("one", 1.0)]),
            g.constf("big", self.big_neg),
        )
        return g.addn(pad5, g.unsqueeze(causal, [0, 1, 2]))

    def qk_head_norm(self, x: str, weight, name: str) -> str:
        """Per-head q/k norm on [B,T,H,hd] (models.llama.qk_head_norm):
        rms = shared [hd] RMSNorm (qwen3); cohere = per-head layernorm
        with [H, hd] weight."""
        cfg, g = self.cfg, self.g
        w = _as_np(weight, _np_dt(self.act))
        eps = g.constf("qk_eps", cfg.rms_norm_eps)
        if cfg.qk_norm == "rms":
            ms = g.add(
                "ReduceMean", [g.mul(x, x)], axes=[-1], keepdims=1
            )
            xn = g.add("Div", [x, g.add("Sqrt", [g.addn(ms, eps)])])
            return g.mul(xn, g.init(f"{name}.weight", w, fresh=False))
        mu = g.add("ReduceMean", [x], axes=[-1], keepdims=1)
        xc = g.add("Sub", [x, mu])
        var = g.add("ReduceMean", [g.mul(xc, xc)], axes=[-1], keepdims=1)
        xn = g.add("Div", [xc, g.add("Sqrt", [g.addn(var, eps)])])
        return g.mul(
            xn, g.init(f"{name}.weight", w[None, None], fresh=False)
        )

    def qkv_mla(self, lp, pre: str, x1: str, cos: str, sin: str):
        """Multi-head latent attention projections (deepseek-v2; mirrors
        models.llama._mla_projections / eval.numpy_ref._np_mla).
        Returns (q [B,T,H,qk_hd], k [B,T,H,qk_hd], v [B,T,H,dv])."""
        cfg, g = self.cfg, self.g
        H = cfg.num_attention_heads
        dn, dr, dv = (
            cfg.qk_nope_head_dim,
            cfg.qk_rope_head_dim,
            cfg.v_head_dim,
        )
        qk_hd = dn + dr
        if cfg.q_lora_rank:
            qa = self.linear(x1, lp["q_a_proj"], f"{pre}.self_attn.q_a_proj")
            qa = self.norm(
                qa, lp["q_a_layernorm"], None, f"{pre}.self_attn.q_a_layernorm"
            )
            q = self.linear(qa, lp["q_b_proj"], f"{pre}.self_attn.q_b_proj")
        else:
            q = self.linear(x1, lp["q_proj"], f"{pre}.self_attn.q_proj")
        q = g.reshape(q, [0, 0, H, qk_hd])
        q_nope = g.slice(q, [0], [dn], [3])
        q_pe = g.slice(q, [dn], [_INT_MAX], [3])
        ckv = self.linear(
            x1,
            lp["kv_a_proj_with_mqa"],
            f"{pre}.self_attn.kv_a_proj_with_mqa",
        )
        c_kv = g.slice(ckv, [0], [cfg.kv_lora_rank], [2])
        k_pe = g.slice(ckv, [cfg.kv_lora_rank], [_INT_MAX], [2])
        kv = self.linear(
            self.norm(
                c_kv,
                lp["kv_a_layernorm"],
                None,
                f"{pre}.self_attn.kv_a_layernorm",
            ),
            lp["kv_b_proj"],
            f"{pre}.self_attn.kv_b_proj",
        )
        kv = g.reshape(kv, [0, 0, H, dn + dv])
        k_nope = g.slice(kv, [0], [dn], [3])
        v = g.slice(kv, [dn], [_INT_MAX], [3])
        # rope on the dr-wide tails only, gptj interleave; the single
        # k_pe head broadcasts across all H heads
        q_pe = self.rope(q_pe, cos, sin, rd=dr, hd=dr, style="gptj")
        k_pe4 = self.rope(
            g.unsqueeze(k_pe, [2]), cos, sin, rd=dr, hd=dr, style="gptj"
        )  # [B,T,1,dr]
        shp = g.add("Shape", [k_nope])  # [B,T,H,dn]
        tgt = g.add(
            "Concat",
            [g.slice(shp, [0], [3], [0]), g.consti("dr_dim", [dr])],
            axis=0,
        )
        k_pe_b = g.add("Expand", [k_pe4, tgt])  # [B,T,H,dr]
        q_full = g.add("Concat", [q_nope, q_pe], axis=3)
        k_full = g.add("Concat", [k_nope, k_pe_b], axis=3)
        return q_full, k_full, v

    def moe_mlp(self, lp, pre: str, x2: str) -> str:
        """Sparse MoE block: router top-k scattered to dense [B,T,E]
        weights, every expert's MatMulNBits branch weighted-summed
        (mirrors models.llama._moe_forward; the reference quantizes
        through HF's MixtralSparseMoeBlock / DeepseekV2MoEGate —
        sequential_layes_gptq_config.py:70-101)."""
        cfg, g = self.cfg, self.g
        np_dt = _np_dt(self.act)
        router = _as_np(lp["router"], np_dt)  # [D, E]
        E = router.shape[-1]
        k = min(cfg.num_experts_per_tok, E)
        rn = g.init(f"{pre}.mlp.gate.weight", router, fresh=False)
        rl = g.add("MatMul", [x2, rn])  # [B,T,E]
        kk = g.init("topk_k", np.asarray([k], np.int64))
        if cfg.moe_router == "deepseek":
            sc = g.add("Softmax", [rl], axis=-1)
            if cfg.topk_method == "group_limited_greedy":
                G = cfg.n_group
                gs = g.reshape(sc, [0, 0, G, E // G])
                gmax = g.add(
                    "ReduceMax",
                    [gs, g.init("ax3", np.asarray([3], np.int64))],
                    keepdims=0,
                )  # [B,T,G]
                kg = g.init(
                    "topk_group", np.asarray([cfg.topk_group], np.int64)
                )
                gvals, gidx = g.add(
                    "TopK", [gmax, kg], n_out=2, axis=-1, largest=1,
                    sorted=1,
                )
                gones = g.addn(
                    g.mul(gvals, g.constf("zero", 0.0)),
                    g.constf("one", 1.0),
                )
                gmask = g.add(
                    "ScatterElements",
                    [g.mul(gmax, g.constf("zero", 0.0)), gidx, gones],
                    axis=-1,
                )
                sc = g.reshape(
                    g.mul(gs, g.unsqueeze(gmask, [3])), [0, 0, E]
                )
            vals, idx = g.add(
                "TopK", [sc, kk], n_out=2, axis=-1, largest=1, sorted=1
            )
            renorm = cfg.norm_topk_prob and (
                k > 1 or cfg.arch != "deepseek_v2"
            )
            if renorm:
                denom = g.addn(
                    g.add(
                        "ReduceSum",
                        [vals, g.init("axm1", np.asarray([-1], np.int64))],
                        keepdims=1,
                    ),
                    g.constf("eps", 1e-20),
                )
                vals = g.add("Div", [vals, denom])
            elif cfg.routed_scaling_factor != 1.0:
                vals = g.mul(
                    vals, g.constf("rsf", cfg.routed_scaling_factor)
                )
            base = sc
        else:  # mixtral: top-k of logits, softmax over the selected k
            vals, idx = g.add(
                "TopK", [rl, kk], n_out=2, axis=-1, largest=1, sorted=1
            )
            vals = g.add("Softmax", [vals], axis=-1)
            base = rl
        wdense = g.add(
            "ScatterElements",
            [g.mul(base, g.constf("zero", 0.0)), idx, vals],
            axis=-1,
        )  # [B,T,E], zero for unselected
        out = None
        for e, ep in enumerate(lp["experts"]):
            ebase = f"{pre}.mlp.experts.{e}"
            gate = self.act_fn(
                self.linear(x2, ep["gate_proj"], f"{ebase}.gate_proj")
            )
            up = self.linear(x2, ep["up_proj"], f"{ebase}.up_proj")
            ye = self.linear(
                g.mul(gate, up), ep["down_proj"], f"{ebase}.down_proj"
            )
            term = g.mul(ye, g.slice(wdense, [e], [e + 1], [2]))
            out = term if out is None else g.addn(out, term)
        se = lp.get("shared_experts")
        if se is not None:
            sbase = f"{pre}.mlp.shared_experts"
            gate = self.act_fn(
                self.linear(x2, se["gate_proj"], f"{sbase}.gate_proj")
            )
            seo = self.linear(
                g.mul(gate, self.linear(x2, se["up_proj"], f"{sbase}.up_proj")),
                se["down_proj"],
                f"{sbase}.down_proj",
            )
            sg = lp.get("shared_expert_gate")
            if sg is not None:  # qwen2-moe sigmoid shared gate
                sgn = g.init(
                    f"{pre}.mlp.shared_expert_gate.weight",
                    _as_np(sg, np_dt),
                    fresh=False,
                )
                seo = g.mul(
                    seo, g.add("Sigmoid", [g.add("MatMul", [x2, sgn])])
                )
            out = g.addn(out, seo)
        return out

    # ---- the graph ---------------------------------------------------

    def build(self) -> GraphProto:
        cfg, g, p = self.cfg, self.g, self.p
        H, Hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.hd
        mla = getattr(cfg, "attn_type", "mha") == "mla"
        if mla:
            # latent attention: H kv heads, k is (nope|rope)-wide, v is
            # v_head_dim-wide; cfg.hd == qk_nope+qk_rope for deepseek
            Hkv, rep = H, 1
            hd_k, hd_v = hd, cfg.v_head_dim
        else:
            rep = H // Hkv
            hd_k = hd_v = hd
        np_dt = _np_dt(self.act)

        emb = _as_np(p["embed_tokens"], np_dt)
        emb_name = g.init("model.embed_tokens.weight", emb, fresh=False)
        h = g.add("Gather", [emb_name, "input_ids"], axis=0)
        if cfg.embedding_multiplier != 1.0:
            h = g.mul(h, g.constf("emb_mult", cfg.embedding_multiplier))
        if cfg.pos_embedding == "learned":
            pe = _as_np(p["pos_embed"], np_dt)
            pe_name = g.init("model.pos_embed.weight", pe, fresh=False)
            pos_ids = "position_ids"
            if cfg.learned_pos_offset:
                pos_ids = g.addn(
                    "position_ids",
                    g.init(
                        "pos_offset",
                        np.asarray(cfg.learned_pos_offset, np.int64),
                    ),
                )
            h = g.addn(h, g.add("Gather", [pe_name, pos_ids], axis=0))
        if getattr(cfg, "embed_layernorm", False):
            h = self.norm(
                h,
                p["embed_layernorm"],
                p.get("embed_layernorm_bias"),
                "model.embed_layernorm",
            )

        if cfg.pos_embedding == "rope":
            cos, sin = self.rope_tables("position_ids")
        else:
            cos = sin = None
        mask = self.build_mask("input_ids", "attention_mask")
        if cfg.pos_embedding == "alibi":
            mask = g.addn(
                mask, self.alibi_bias("attention_mask", Hkv, rep)
            )
        scale = (
            cfg.attn_scale if getattr(cfg, "attn_scale", 0.0) else hd**-0.5
        )
        resid_mult = (
            g.constf("resid_mult", cfg.residual_multiplier)
            if cfg.residual_multiplier != 1.0
            else None
        )

        outputs = [ValueInfoProto("logits", self.act, ["batch", "seq", cfg.vocab_size])]
        present: List[ValueInfoProto] = []

        for i, lp in enumerate(p["layers"]):
            pre = f"model.layers.{i}"
            x1 = self.norm(
                h,
                lp["input_layernorm"],
                lp.get("input_layernorm_bias"),
                f"{pre}.input_layernorm",
            )
            if mla:
                q, k, v = self.qkv_mla(lp, pre, x1, cos, sin)
            else:
                q = self.linear(x1, lp["q_proj"], f"{pre}.self_attn.q_proj", lp.get("q_proj_bias"))
                k = self.linear(x1, lp["k_proj"], f"{pre}.self_attn.k_proj", lp.get("k_proj_bias"))
                v = self.linear(x1, lp["v_proj"], f"{pre}.self_attn.v_proj", lp.get("v_proj_bias"))
                q = g.reshape(q, [0, 0, H, hd])
                k = g.reshape(k, [0, 0, Hkv, hd])
                v = g.reshape(v, [0, 0, Hkv, hd])
                if getattr(cfg, "qk_norm", ""):
                    q = self.qk_head_norm(
                        q, lp["q_norm"], f"{pre}.self_attn.q_norm"
                    )
                    k = self.qk_head_norm(
                        k, lp["k_norm"], f"{pre}.self_attn.k_norm"
                    )
                if cos is not None:
                    q = self.rope(q, cos, sin)
                    k = self.rope(k, cos, sin)
            kT = g.add("Transpose", [k], perm=[0, 2, 1, 3])  # [B,Hkv,T,hd_k]
            vT = g.add("Transpose", [v], perm=[0, 2, 1, 3])
            if self.with_past:
                k_full = g.add(
                    "Concat",
                    [f"past_key_values.{i}.key", kT],
                    axis=2,
                    out_names=[f"present.{i}.key"],
                )
                v_full = g.add(
                    "Concat",
                    [f"past_key_values.{i}.value", vT],
                    axis=2,
                    out_names=[f"present.{i}.value"],
                )
            else:
                k_full = g.add(
                    "Identity", [kT], out_names=[f"present.{i}.key"]
                )
                v_full = g.add(
                    "Identity", [vT], out_names=[f"present.{i}.value"]
                )
            present += [
                ValueInfoProto(
                    f"present.{i}.key",
                    self.act,
                    ["batch", Hkv, "total_seq", hd_k],
                ),
                ValueInfoProto(
                    f"present.{i}.value",
                    self.act,
                    ["batch", Hkv, "total_seq", hd_v],
                ),
            ]
            # GQA without Expand: group q to [B,Hkv,rep,T,hd], k/v get a
            # broadcast axis -> batched MatMul broadcasts over `rep`
            qg = g.add(
                "Transpose",
                [g.reshape(q, [0, 0, Hkv, rep, hd_k])],
                perm=[0, 2, 3, 1, 4],
            )
            k5 = g.add(
                "Transpose",
                [g.unsqueeze(k_full, [2])],
                perm=[0, 1, 2, 4, 3],
            )  # [B,Hkv,1,hd,S]
            scores = g.mul(
                g.add("MatMul", [qg, k5]), g.constf("attn_scale", scale)
            )
            if getattr(cfg, "attn_logit_softcap", 0.0):
                cap = cfg.attn_logit_softcap
                scores = g.mul(
                    g.add(
                        "Tanh",
                        [g.mul(scores, g.constf("icap", 1.0 / cap))],
                    ),
                    g.constf("cap", cap),
                )
            probs = g.add("Softmax", [g.addn(scores, mask)], axis=-1)
            ctx = g.add("MatMul", [probs, g.unsqueeze(v_full, [2])])
            ctx = g.add("Transpose", [ctx], perm=[0, 3, 1, 2, 4])
            ctx = g.reshape(ctx, [0, 0, H * hd_v])
            o = self.linear(
                ctx, lp["o_proj"], f"{pre}.self_attn.o_proj", lp.get("o_proj_bias")
            )
            if getattr(cfg, "post_norms", False):
                o = self.norm(
                    o,
                    lp["post_attn_norm"],
                    None,
                    f"{pre}.post_attn_norm",
                )
            if resid_mult is not None:
                o = g.mul(o, resid_mult)
            if getattr(cfg, "parallel_residual", False):
                # h_out = h + attn(x1) + mlp(x2), x2 = x1 (shared norm:
                # gptj/falcon/cohere) or a second norm of the INPUT h
                # (gpt-neox) — mirror models.llama._block_attn_mlp
                x2 = (
                    x1
                    if cfg.shared_input_norm
                    else self.norm(
                        h,
                        lp["post_attention_layernorm"],
                        lp.get("post_attention_layernorm_bias"),
                        f"{pre}.post_attention_layernorm",
                    )
                )
                h = g.addn(h, o)
            else:
                h = g.addn(h, o)
                x2 = self.norm(
                    h,
                    lp["post_attention_layernorm"],
                    lp.get("post_attention_layernorm_bias"),
                    f"{pre}.post_attention_layernorm",
                )
            if "experts" in lp:
                h = g.addn(h, self.moe_mlp(lp, pre, x2))
                continue
            if "gate_proj" in lp:
                gate = self.act_fn(
                    self.linear(
                        x2, lp["gate_proj"], f"{pre}.mlp.gate_proj", lp.get("gate_proj_bias")
                    )
                )
                up = self.linear(
                    x2, lp["up_proj"], f"{pre}.mlp.up_proj", lp.get("up_proj_bias")
                )
                mid = g.mul(gate, up)
            else:
                mid = self.act_fn(
                    self.linear(
                        x2, lp["up_proj"], f"{pre}.mlp.up_proj", lp.get("up_proj_bias")
                    )
                )
                asc = lp.get("down_proj_act_scale")
                if asc is not None:
                    mid = g.add(
                        "Div",
                        [
                            mid,
                            g.init(
                                f"{pre}.mlp.act_scale",
                                _as_np(asc, np_dt),
                                fresh=False,
                            ),
                        ],
                    )
            mlp = self.linear(
                mid, lp["down_proj"], f"{pre}.mlp.down_proj", lp.get("down_proj_bias")
            )
            if getattr(cfg, "post_norms", False):
                mlp = self.norm(
                    mlp, lp["post_mlp_norm"], None, f"{pre}.post_mlp_norm"
                )
            if resid_mult is not None:
                mlp = g.mul(mlp, resid_mult)
            h = g.addn(h, mlp)

        h = self.norm(h, p["norm"], p.get("norm_bias"), "model.norm")
        lm = p.get("lm_head")
        if cfg.tie_word_embeddings or lm is None:
            lmw = g.init("lm_head.weight_t", np.ascontiguousarray(emb.T), fresh=False)
            logits = g.add("MatMul", [h, lmw])
        else:
            logits = self.linear(h, lm, "lm_head", p.get("lm_head_bias"))
        if getattr(cfg, "final_logit_softcap", 0.0):
            cap = cfg.final_logit_softcap
            logits = g.mul(
                g.add("Tanh", [g.mul(logits, g.constf("icap", 1.0 / cap))]),
                g.constf("cap", cap),
            )
        if cfg.logit_scale != 1.0:
            logits = g.mul(logits, g.constf("logit_scale", cfg.logit_scale))
        g.add("Identity", [logits], out_names=["logits"])

        inputs = [
            ValueInfoProto("input_ids", DT.INT64, ["batch", "seq"]),
            ValueInfoProto("attention_mask", DT.INT64, ["batch", "total_seq"]),
            ValueInfoProto("position_ids", DT.INT64, ["batch", "seq"]),
        ]
        if self.with_past:
            for i in range(len(p["layers"])):
                inputs += [
                    ValueInfoProto(
                        f"past_key_values.{i}.key",
                        self.act,
                        ["batch", Hkv, "past_seq", hd_k],
                    ),
                    ValueInfoProto(
                        f"past_key_values.{i}.value",
                        self.act,
                        ["batch", Hkv, "past_seq", hd_v],
                    ),
                ]
        return GraphProto(
            name="decoder_with_past" if self.with_past else "decoder",
            nodes=g.nodes,
            inputs=inputs,
            outputs=outputs + present,
            initializers=g.inits,
        )


def build_decoder_graph(
    params, cfg, with_past: bool, act_dtype: int = DT.FLOAT
) -> GraphProto:
    return _DecoderBuilder(params, cfg, with_past, act_dtype).build()


def export_onnx_decoder(
    params,
    cfg,
    out_dir: str,
    act_dtype: int = DT.FLOAT,
    merge: bool = True,
) -> Dict[str, str]:
    """Write decoder_model.onnx / decoder_with_past_model.onnx /
    decoder_model_merged.onnx (reference artifact names). Returns the
    path map."""
    os.makedirs(out_dir, exist_ok=True)
    paths: Dict[str, str] = {}
    g1 = build_decoder_graph(params, cfg, with_past=False, act_dtype=act_dtype)
    g2 = build_decoder_graph(params, cfg, with_past=True, act_dtype=act_dtype)
    for name, graph in (
        ("decoder_model.onnx", g1),
        ("decoder_with_past_model.onnx", g2),
    ):
        path = os.path.join(out_dir, name)
        with open(path, "wb") as f:
            f.write(ModelProto(graph).encode())
        paths[name] = path
    if merge:
        # merge mutates its inputs; rebuild fresh graphs for the merge
        m = merge_decoders(
            build_decoder_graph(params, cfg, False, act_dtype),
            build_decoder_graph(params, cfg, True, act_dtype),
            graph_name="decoder_model_merged",
        )
        path = os.path.join(out_dir, "decoder_model_merged.onnx")
        with open(path, "wb") as f:
            f.write(m)
        paths["decoder_model_merged.onnx"] = path
    return paths
