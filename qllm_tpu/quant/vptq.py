"""VPTQ: vector post-training quantization.

The reference outsources the per-layer solver to the external ``vptq``
package (quant_vptq.py:176-181) and contributes the Hessian pipeline +
multi-GPU orchestration around it. Here the solver itself is
implemented from scratch, TPU-native:

  * weights are split into length-``vector_len`` vectors along the
    input dim; a codebook of ``num_centroids`` vectors is learned by
    **Hessian-weighted k-means** (importance = diag(H), the proxy
    second-order sensitivity), fully on-device: assignment via two
    matmuls (no pairwise subtract), centroid update via segment-sum.
  * optional **residual codebook** (``num_res_centroids``) on the
    quantization residuals (QuIP#/VPTQ two-stage quantization).
  * optional **outlier columns**: the ``npercent``% most sensitive
    input features are kept in fp16 (the reference routes them to a
    separate wider codebook; fp16 is a strictly-more-accurate variant
    at ~equal bytes for the default 1%).
  * optional input permutation (``enable_perm``) sorting features by
    importance (descending diag(H)), stored like act_order.

Storage: ``VPTQTensor`` pytree (indices + codebooks + outliers), with a
dense dequant path for the XLA matmul and checkpoint (de)serialization
in modeling/auto.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import time

import jax
import jax.numpy as jnp
import numpy as np

from .config import VPTQConfig

__all__ = ["VPTQTensor", "vptq_quantize_weight", "VPTQQuantizer", "vptq_dequant"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "indices",
        "centroids",
        "res_indices",
        "res_centroids",
        "outlier_ids",
        "outlier_weight",
        "perm",
    ],
    meta_fields=["vector_len", "in_features", "out_features", "n_outlier"],
)
@dataclasses.dataclass(frozen=True)
class VPTQTensor:
    """Vector-quantized weight for y = x @ W, W [K, N]."""

    indices: jax.Array  # int32 [N, Kq // v] main codebook ids
    centroids: jax.Array  # f16 [C, v]
    res_indices: Optional[jax.Array]  # int32 [N, Kq // v] or None
    res_centroids: Optional[jax.Array]  # f16 [Cr, v] or None
    outlier_ids: Optional[jax.Array]  # int32 [n_out] positions in PERMUTED order
    outlier_weight: Optional[jax.Array]  # f16 [n_out, N]
    perm: Optional[jax.Array]  # int32 [K] permuted->original feature map
    vector_len: int
    in_features: int
    out_features: int
    n_outlier: int

    @property
    def bits_per_weight(self) -> float:
        v = self.vector_len
        bits = np.ceil(np.log2(max(2, self.centroids.shape[0]))) / v
        if self.res_centroids is not None:
            bits += np.ceil(np.log2(max(2, self.res_centroids.shape[0]))) / v
        return float(bits)

    def nbytes(self) -> int:
        total = self.indices.size * 2 + self.centroids.size * 2
        if self.res_indices is not None:
            total += self.res_indices.size * 1 + self.res_centroids.size * 2
        if self.outlier_weight is not None:
            total += self.outlier_weight.size * 2 + self.outlier_ids.size * 4
        return total


def _weighted_kmeans(
    vecs: jax.Array,  # [V, v]
    wts: jax.Array,  # [V, v] per-coordinate importance
    n_centroids: int,
    iters: int,
    seed: int = 0,
    chunk: int = 65536,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (centroids [C, v], assignment [V])."""
    V, v = vecs.shape
    C = min(n_centroids, V)
    key = jax.random.key(seed)
    if C <= 1024:
        # farthest-point (greedy k-means++) init: avoids duplicate
        # centroids collapsing distinct clusters
        first = jax.random.randint(key, (), 0, V)
        centroids0 = jnp.zeros((C, v), vecs.dtype).at[0].set(vecs[first])

        def body(i, carry):
            cents, min_d = carry
            d = jnp.sum(wts * (vecs - cents[i - 1]) ** 2, axis=1)
            min_d = jnp.minimum(min_d, d)
            nxt = jnp.argmax(min_d)
            return cents.at[i].set(vecs[nxt]), min_d

        centroids, _ = jax.lax.fori_loop(
            1, C, body, (centroids0, jnp.full((V,), jnp.inf))
        )
    else:
        init_ids = jax.random.choice(key, V, shape=(C,), replace=False)
        centroids = vecs[init_ids]

    @jax.jit
    def assign(centroids, vecs, wts):
        # argmin_c sum_j w_j (x_j - c_j)^2 = argmin_c [ c^2·w - 2 (w⊙x)·c ]
        wx = wts * vecs  # [V, v]
        a = wx @ centroids.T  # [V, C]
        b = wts @ (centroids.T**2)  # [V, C]
        return jnp.argmin(b - 2.0 * a, axis=1)

    @jax.jit
    def update(assign_ids, vecs, wts, centroids):
        num = jax.ops.segment_sum(wts * vecs, assign_ids, num_segments=C)
        den = jax.ops.segment_sum(wts, assign_ids, num_segments=C)
        upd = num / jnp.maximum(den, 1e-10)
        # reseed empty clusters onto the currently worst-quantized vectors
        nonempty = (den > 0).any(axis=1)
        d = jnp.sum(wts * (vecs - upd[assign_ids]) ** 2, axis=1)
        _, worst = jax.lax.top_k(d, k=min(C, 64))
        n_empty_slots = jnp.cumsum(~nonempty) - 1  # rank among empties
        reseed = vecs[worst[jnp.clip(n_empty_slots, 0, worst.shape[0] - 1)]]
        return jnp.where(nonempty[:, None], upd, reseed)

    ids = None
    for _ in range(max(1, iters)):
        parts = [
            assign(centroids, vecs[s : s + chunk], wts[s : s + chunk])
            for s in range(0, V, chunk)
        ]
        ids = jnp.concatenate(parts)
        centroids = update(ids, vecs, wts, centroids)
    parts = [
        assign(centroids, vecs[s : s + chunk], wts[s : s + chunk])
        for s in range(0, V, chunk)
    ]
    ids = jnp.concatenate(parts)
    return centroids, ids


def vptq_quantize_weight(
    w: jax.Array,  # [K, N]
    H: jax.Array,  # [K, K] (only the diagonal is used)
    config: Optional[VPTQConfig] = None,
    seed: int = 0,
) -> VPTQTensor:
    cfg = config or VPTQConfig()
    K, N = w.shape
    v = cfg.vector_len
    if K % v:
        raise ValueError(f"in_features={K} not divisible by vector_len={v}")
    w = w.astype(jnp.float32)
    imp = jnp.clip(jnp.diag(H).astype(jnp.float32), 1e-10, None)  # [K]

    # permutation by importance (enable_perm)
    if cfg.enable_perm:
        perm = jnp.argsort(-imp)
    else:
        perm = jnp.arange(K)
    wp = w[perm]
    impp = imp[perm]

    # outliers: most-important npercent input features kept fp16
    n_out = int(round(K * cfg.npercent / 100.0))
    n_out -= n_out % v  # keep the VQ region vector-aligned
    if n_out > 0:
        outlier_ids = jnp.arange(n_out)  # top of the permuted order
        outlier_weight = wp[:n_out].astype(jnp.float16)
        wq_region = wp[n_out:]
        imp_region = impp[n_out:]
    else:
        outlier_ids = None
        outlier_weight = None
        wq_region = wp
        imp_region = impp
    Kq = K - n_out

    # vectors along the input dim: [N, Kq/v, v]
    vecs = wq_region.T.reshape(N * (Kq // v), v)
    wts = jnp.broadcast_to(
        imp_region.reshape(1, Kq // v, v), (N, Kq // v, v)
    ).reshape(N * (Kq // v), v)

    centroids, ids = _weighted_kmeans(
        vecs, wts, cfg.num_centroids, cfg.kmeans_iters, seed=seed
    )
    res_indices = None
    res_centroids = None
    if cfg.num_res_centroids and cfg.num_res_centroids > 1:
        resid = vecs - centroids[ids]
        res_centroids, res_ids = _weighted_kmeans(
            resid, wts, cfg.num_res_centroids, cfg.kmeans_iters, seed=seed + 1
        )
        res_indices = res_ids.reshape(N, Kq // v).astype(jnp.int32)

    return VPTQTensor(
        indices=ids.reshape(N, Kq // v).astype(jnp.int32),
        centroids=centroids.astype(jnp.float16),
        res_indices=res_indices,
        res_centroids=None
        if res_centroids is None
        else res_centroids.astype(jnp.float16),
        outlier_ids=outlier_ids,
        outlier_weight=outlier_weight,
        perm=perm.astype(jnp.int32) if cfg.enable_perm else None,
        vector_len=v,
        in_features=K,
        out_features=N,
        n_outlier=n_out,
    )


def vptq_dequant(vt: VPTQTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Dense [K, N] in PERMUTED row order (apply vt.perm to activations)."""
    N = vt.out_features
    Kq = vt.in_features - vt.n_outlier
    v = vt.vector_len
    wq = vt.centroids.astype(jnp.float32)[vt.indices]  # [N, Kq/v, v]
    if vt.res_indices is not None:
        wq = wq + vt.res_centroids.astype(jnp.float32)[vt.res_indices]
    wq = wq.reshape(N, Kq).T  # [Kq, N]
    if vt.n_outlier:
        wq = jnp.concatenate([vt.outlier_weight.astype(jnp.float32), wq], axis=0)
    return wq.astype(dtype)


def vptq_matmul(x: jax.Array, vt: VPTQTensor, bias=None) -> jax.Array:
    """y = x @ W. x [..., K] in original feature order."""
    if vt.perm is not None:
        x = jnp.take(x, vt.perm, axis=-1)
    w = vptq_dequant(vt, dtype=jnp.bfloat16)
    y = jnp.dot(
        x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias
    return y


class VPTQQuantizer:
    """Model-level driver (reference quant_vptq.py): collect Hessians
    per block, vector-quantize each linear, propagate quantized
    activations. Per-layer configs come from
    VPTQConfig.config_for_layers keyed by layer name (reference
    VPTQInferConfig.config_for_layers)."""

    def __init__(self, config: VPTQConfig):
        self.config = config
        self.quant_config_by_layer: Dict[str, Dict[str, Any]] = {}

    def _layer_cfg(self, name: str) -> VPTQConfig:
        overrides = self.config.config_for_layers or {}
        for key, conf in overrides.items():
            if key == name or key in name:
                fields = {f.name for f in dataclasses.fields(VPTQConfig)}
                return dataclasses.replace(
                    self.config,
                    **{k: w for k, w in conf.items() if k in fields},
                )
        return self.config

    def quantize(
        self,
        params: Dict[str, Any],
        model_cfg,
        calib_tokens: jax.Array,
        layer_overrides=None,
        progress: bool = True,
        cache_dir: Optional[str] = None,
        proxy_hessian_dir: Optional[str] = None,
        partition=None,
    ) -> Dict[str, Any]:
        """``proxy_hessian_dir``: stage-1/2 artifacts from
        quant.hessian_pipeline.collect_proxy_hessians — when given,
        per-layer Hessians load from disk (the reference's offline
        RedPajama proxy pipeline, quant_vptq.py:93-125) instead of
        being collected inline from ``calib_tokens``.

        ``partition``: layer-parallel quantization across hosts — the
        TPU-native role of the reference's per-GPU ProcessPoolExecutor
        (quant_vptq.py:127-171: GPU free-list queue, one transformer
        layer per process, per-layer .pt cache). ``"auto"`` partitions
        over ``jax.process_index()/process_count()`` (pod slice);
        ``(rank, world)`` is explicit (tests / external launchers).
        Host ``rank`` quantizes layers ``i % world == rank``, writes
        them to the shared ``cache_dir``, then collects peer layers by
        polling the cache (the atomic per-layer files double as the
        completion markers, like the reference's done.txt). Requires
        ``proxy_hessian_dir`` — offline Hessians are what make layers
        independent — and a shared ``cache_dir``."""
        from ..models.llama import ALL_LINEAR_NAMES as LINEAR_NAMES
        from .frame import embed_inputs, run_block
        from .hessian import _share_key, collect_block_hessians

        from .frame import load_layer_cache, save_layer_cache

        def block_hessians(lp_, i_):
            if proxy_hessian_dir is None:
                return collect_block_hessians(
                    lp_, model_cfg, h, cos, sin, mask
                )
            from .hessian_pipeline import load_proxy_hessian

            names = [n for n in LINEAR_NAMES if n in lp_]
            if "experts" in lp_:
                for e, ep in enumerate(lp_["experts"]):
                    names += [
                        f"experts.{e}.{n}"
                        for n in ("gate_proj", "up_proj", "down_proj")
                        if n in ep
                    ]
            if "shared_experts" in lp_:  # deepseek always-on experts
                names += [
                    f"shared_experts.{n}"
                    for n in ("gate_proj", "up_proj", "down_proj")
                    if n in lp_["shared_experts"]
                ]
            return {
                n: jnp.asarray(
                    load_proxy_hessian(
                        proxy_hessian_dir, i_, _share_key(n, names)
                    )
                )
                for n in names
            }

        proxy = proxy_hessian_dir is not None
        if partition == "auto":
            rank, world = jax.process_index(), jax.process_count()
        else:
            rank, world = partition or (0, 1)
        if world > 1:
            if not proxy:
                raise ValueError(
                    "layer-parallel VPTQ needs proxy_hessian_dir: offline "
                    "Hessians are what make layers independent (reference "
                    "quant_vptq.py:127-171 likewise runs off saved Hessians)"
                )
            if not cache_dir:
                raise ValueError(
                    "layer-parallel VPTQ needs a shared cache_dir "
                    "(--quant_cache_dir) to exchange per-layer results"
                )
        if proxy:
            # Hessians come from disk: no activation propagation needed,
            # and with none, layers are order-independent (partitionable)
            h = cos = sin = mask = None
        else:
            h, cos, sin, mask = embed_inputs(params, model_cfg, calib_tokens)
        n_layers = len(params["layers"])
        new_layers: List[Optional[Dict[str, Any]]] = [None] * n_layers
        deferred: List[int] = []
        for i, lp in enumerate(params["layers"]):
            t_layer = time.time()
            cached = load_layer_cache(cache_dir, i)
            if cached is not None:
                if not proxy:
                    h = run_block(cached, model_cfg, h, cos, sin, mask)
                self._merge_layer_qconf(cache_dir, i)
                new_layers[i] = cached
                if progress:
                    print(f"[vptq] layer {i + 1} from cache", flush=True)
                continue
            if world > 1 and i % world != rank:
                deferred.append(i)
                continue
            Hs = block_hessians(lp, i)
            nlp = dict(lp)
            for name in LINEAR_NAMES:
                if name not in lp:
                    continue
                full = f"model.layers.{i}.{name}"
                lcfg = self._layer_cfg(full)
                vt = vptq_quantize_weight(
                    lp[name].astype(jnp.float32), Hs[name], lcfg, seed=i
                )
                nlp[name] = vt
                self.quant_config_by_layer[full] = {
                    "vector_len": lcfg.vector_len,
                    "num_centroids": int(vt.centroids.shape[0]),
                    "num_res_centroids": 0
                    if vt.res_centroids is None
                    else int(vt.res_centroids.shape[0]),
                    "npercent": lcfg.npercent,
                    "bits_per_weight": vt.bits_per_weight,
                }
            if "experts" in lp:
                # MoE: router-weighted Hessians per expert, re-collected
                # after the attention projections are quantized (mirrors
                # the GPTQ driver's expert branch — the reference VPTQ
                # driver lacks one, quant_vptq.py:29-82 only walks plain
                # linears)
                Hs = block_hessians(nlp, i)
                nexp = []
                for e, ep in enumerate(lp["experts"]):
                    nep = dict(ep)
                    for name in ("gate_proj", "up_proj", "down_proj"):
                        if name not in ep:
                            continue
                        full = f"model.layers.{i}.experts.{e}.{name}"
                        lcfg = self._layer_cfg(full)
                        vt = vptq_quantize_weight(
                            ep[name].astype(jnp.float32),
                            Hs[f"experts.{e}.{name}"],
                            lcfg,
                            seed=i * 1000 + e,
                        )
                        nep[name] = vt
                        self.quant_config_by_layer[full] = {
                            "vector_len": lcfg.vector_len,
                            "num_centroids": int(vt.centroids.shape[0]),
                            "num_res_centroids": 0
                            if vt.res_centroids is None
                            else int(vt.res_centroids.shape[0]),
                            "npercent": lcfg.npercent,
                            "bits_per_weight": vt.bits_per_weight,
                        }
                    nexp.append(nep)
                nlp["experts"] = nexp
            if "shared_experts" in lp:
                # deepseek shared experts are always-on — quantize them
                # like AWQ/GPTQ do (ADVICE r2: they silently stayed fp16)
                if "experts" not in lp:
                    Hs = block_hessians(nlp, i)
                nse = dict(lp["shared_experts"])
                for name in ("gate_proj", "up_proj", "down_proj"):
                    if name not in nse:
                        continue
                    full = f"model.layers.{i}.shared_experts.{name}"
                    lcfg = self._layer_cfg(full)
                    vt = vptq_quantize_weight(
                        nse[name].astype(jnp.float32),
                        Hs[f"shared_experts.{name}"],
                        lcfg,
                        seed=i * 1000 + 999,
                    )
                    nse[name] = vt
                    self.quant_config_by_layer[full] = {
                        "vector_len": lcfg.vector_len,
                        "num_centroids": int(vt.centroids.shape[0]),
                        "num_res_centroids": 0
                        if vt.res_centroids is None
                        else int(vt.res_centroids.shape[0]),
                        "npercent": lcfg.npercent,
                        "bits_per_weight": vt.bits_per_weight,
                    }
                nlp["shared_experts"] = nse
            save_layer_cache(cache_dir, i, nlp)
            self._save_layer_qconf(cache_dir, i)
            if not proxy:
                h = run_block(nlp, model_cfg, h, cos, sin, mask)
            new_layers[i] = nlp
            if progress:
                print(
                    f"[vptq] layer {i + 1}/{n_layers} "
                    f"({time.time() - t_layer:.1f}s)",
                    flush=True,
                )
        for i in deferred:
            new_layers[i] = self._wait_peer_layer(cache_dir, i, progress)
            self._merge_layer_qconf(cache_dir, i)
        out = dict(params)
        out["layers"] = new_layers
        return out

    # -- layer-parallel plumbing ------------------------------------

    def _save_layer_qconf(self, cache_dir: Optional[str], i: int) -> None:
        """Sidecar with layer i's quantize-config entries so peer hosts
        (and crash-resumed runs) reconstruct the full
        quant_config_by_layer table, not just their own shard's."""
        if not cache_dir:
            return
        import json
        import os

        prefix = f"model.layers.{i}."
        entries = {
            k: v
            for k, v in self.quant_config_by_layer.items()
            if k.startswith(prefix)
        }
        tmp = f"{cache_dir}/layer_{i}.qconf.json.tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(entries, f)
        os.replace(tmp, f"{cache_dir}/layer_{i}.qconf.json")

    def _merge_layer_qconf(self, cache_dir: Optional[str], i: int) -> None:
        if not cache_dir:
            return
        import json
        import os

        p = f"{cache_dir}/layer_{i}.qconf.json"
        if os.path.exists(p):
            with open(p) as f:
                self.quant_config_by_layer.update(json.load(f))

    @staticmethod
    def _wait_peer_layer(cache_dir: str, i: int, progress: bool):
        """Poll the shared cache until a peer host publishes layer i
        (its atomic rename is the completion marker)."""
        import os

        from .frame import load_layer_cache

        timeout = float(os.environ.get("QLLM_TPU_PARTITION_TIMEOUT", "3600"))
        t0 = time.time()
        logged = False
        while True:
            nlp = load_layer_cache(cache_dir, i)
            if nlp is not None:
                return nlp
            if time.time() - t0 > timeout:
                raise TimeoutError(
                    f"peer layer {i} never appeared in {cache_dir} within "
                    f"{timeout:.0f}s (QLLM_TPU_PARTITION_TIMEOUT)"
                )
            if progress and not logged:
                print(f"[vptq] waiting for peer layer {i + 1}", flush=True)
                logged = True
            time.sleep(0.2)
