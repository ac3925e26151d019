"""QuIP-style quantization preprocessing (reference quantization/method.py).

Optional transforms applied to (W, H) before any quantizer runs, and
inverted afterwards (the reference ships this as an unused-by-the-main-
flow research path; kept for API parity and experimentation):

  * ``rescale``        — diagonal scaling balancing diag(H) against the
    per-input-feature weight norms (method.py:150-167)
  * ``project``        — random orthogonal butterfly rotation
    W' = V·W·Uᵀ (our [in, out] convention), H' = V·H·Vᵀ
    (method.py:168-191; butterfly generation :13-88) — incoherence
    processing that spreads outliers before low-bit quantization
  * ``error_compute``  — trace((W−Ŵ)ᵀ·H·(W−Ŵ)) proxy loss (:239-244)

GPTQ damping (preproc_gptqH) lives inside gptq._gptq_core here.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "butterfly_factors",
    "rand_ortho_butterfly",
    "QuantPreproc",
]


def _primefac(n: int) -> List[int]:
    out = []
    d = 2
    while d * d <= n:
        while n % d == 0:
            out.append(d)
            n //= d
        d += 1
    if n > 1:
        out.append(n)
    return out


def butterfly_factors(n: int) -> Tuple[int, int]:
    """Split n's prime factors into two interleaved products
    (reference butterfly_factors :13-15)."""
    pf = _primefac(n)
    return (math.prod(pf[0::2]), math.prod(pf[1::2]))


def _rand_orthos(m: int, p: int, rng: np.random.Generator) -> np.ndarray:
    """m random p×p orthogonal blocks (reference gen_rand_orthos)."""
    if p == 1:
        return np.ones((m, 1, 1), np.float32)
    if p == 2:
        t = rng.uniform(0, 2 * math.pi, size=m)
        X = np.zeros((m, 2, 2), np.float32)
        X[:, 0, 0] = np.cos(t)
        X[:, 1, 1] = np.cos(t)
        X[:, 0, 1] = np.sin(t)
        X[:, 1, 0] = -np.sin(t)
        return X
    try:
        from scipy.stats import special_ortho_group

        X = special_ortho_group.rvs(p, size=m, random_state=rng)
        return X.reshape(m, p, p).astype(np.float32)
    except Exception:  # scipy-free fallback: QR of gaussians
        A = rng.normal(size=(m, p, p)).astype(np.float32)
        Q = np.stack([np.linalg.qr(a)[0] for a in A])
        return Q.astype(np.float32)


def rand_ortho_butterfly(
    n: int, seed: int = 0, block: bool = True, permute: bool = True
) -> jax.Array:
    """Dense random orthogonal butterfly matrix of dimension n
    (reference rand_ortho_butterfly* :34-88, materialized on eye)."""
    rng = np.random.default_rng(seed)
    factors = butterfly_factors(n)
    blocks = [
        _rand_orthos(n // p if block else 1, p, rng) for p in factors
    ]
    p_in = rng.permutation(n) if permute else np.arange(n)
    p_out = rng.permutation(n) if permute else np.arange(n)

    x = np.eye(n, dtype=np.float32)[p_in, :]
    q = n
    for i, p in enumerate(factors):
        mpfx = math.prod(factors[:i])
        msfx = math.prod(factors[i + 1 :])
        x = (
            x.reshape(mpfx, p, msfx, q)
            .transpose(0, 2, 1, 3)
            .reshape(mpfx * msfx, p, q)
        )
        B = blocks[i]
        if B.shape[0] == 1:
            B = np.broadcast_to(B, (mpfx * msfx, p, p))
        x = np.einsum("bij,bjq->biq", B, x)
        x = (
            x.reshape(mpfx, msfx, p, q)
            .transpose(0, 2, 1, 3)
            .reshape(n, q)
        )
    return jnp.asarray(x[p_out, :])


@dataclasses.dataclass
class QuantPreproc:
    """Holds the transforms so they can be inverted (reference
    QuantMethod.preproc/postproc). W convention here is [in(K), out(N)]."""

    rescale: bool = False
    project: bool = False
    proj_mode: int = 0  # 0: blocked+permute, 1: no blocking, 2: no permute
    seed: int = 0
    scaleWH: Optional[jax.Array] = None
    U: Optional[jax.Array] = None  # [N, N]
    V: Optional[jax.Array] = None  # [K, K]

    def apply(self, w: jax.Array, H: jax.Array):
        """(W, H) -> preprocessed (W', H'). Run before a quantizer."""
        w = w.astype(jnp.float32)
        H = H.astype(jnp.float32)
        if self.rescale:
            Hn = H / jnp.maximum(jnp.max(jnp.abs(H)), 1e-12)
            diagH = jnp.clip(jnp.diag(Hn), 1e-8, None)
            diagW2 = jnp.clip(jnp.sum(w * w, axis=1), 1e-8, None)  # per-K
            s = jnp.clip(jnp.sqrt(jnp.sqrt(diagH / diagW2)), 1e-8, None)
            w = w * s[:, None]
            H = Hn / s[:, None] / s[None, :]
            self.scaleWH = s
        if self.project:
            K, N = w.shape
            block = self.proj_mode != 1
            permute = self.proj_mode != 2
            self.U = rand_ortho_butterfly(
                N, seed=self.seed, block=block, permute=permute
            )
            self.V = rand_ortho_butterfly(
                K, seed=self.seed + 1, block=block, permute=permute
            )
            # trace-normalized damping (method.py:184-186)
            H = H * (H.shape[0] / (jnp.trace(H) + 1e-8)) + 1e-2 * jnp.eye(
                H.shape[0]
            )
            w = self.V @ w @ self.U.T
            H = self.V @ H @ self.V.T
        return w, H

    def invert(self, w: jax.Array) -> jax.Array:
        """Undo the transforms on a (dequantized) dense weight."""
        w = w.astype(jnp.float32)
        if self.project:
            w = self.V.T @ w @ self.U
        if self.rescale:
            w = w / self.scaleWH[:, None]
        return w

    @staticmethod
    def error_compute(w: jax.Array, w_hat: jax.Array, H: jax.Array) -> float:
        """trace((W−Ŵ)ᵀ H (W−Ŵ)) (reference error_compute :239-244,
        transposed to our [K, N] convention)."""
        d = (w - w_hat).astype(jnp.float32)
        return float(jnp.trace(d.T @ H.astype(jnp.float32) @ d))
