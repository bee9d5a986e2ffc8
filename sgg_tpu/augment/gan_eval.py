"""Generated-feature quality metrics: FID and precision/recall/density/coverage.

Rebuild of ``/root/reference/augment/gan_eval.py`` (itself from
instance_selection_for_gans / prdc): Fréchet distance between Gaussian fits
of real vs generated feature banks, and the PRDC manifold metrics over
k-NN radii. The distance matrices run on device (JAX) — the reference loops
in numpy/torch on the host; the final sqrtm stays in scipy (tiny, host).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(C1 + C2 - 2 sqrt(C1 C2)) (gan_eval.py:9-60)."""
    from scipy import linalg
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError("large imaginary component in sqrtm")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def compute_fid(fake: np.ndarray, real: np.ndarray,
                truncate: int = None) -> float:
    """FID over (N, D) feature banks (gan_eval.py:63-74)."""
    if truncate is None:
        truncate = real.shape[-1]
    f = np.asarray(fake, np.float64)[:, :truncate]
    r = np.asarray(real, np.float64)[:, :truncate]
    return frechet_distance(f.mean(0), np.cov(f, rowvar=False),
                            r.mean(0), np.cov(r, rowvar=False))


def _pairwise_distance(a: np.ndarray, b: np.ndarray = None) -> np.ndarray:
    """Euclidean distance matrix on device (replaces sklearn
    pairwise_distances in the reference)."""
    import jax.numpy as jnp
    if b is None:
        b = a
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    d2 = (jnp.sum(a * a, 1)[:, None] + jnp.sum(b * b, 1)[None]
          - 2.0 * a @ b.T)
    return np.asarray(jnp.sqrt(jnp.clip(d2, 0.0)))


def _knn_radii(feats: np.ndarray, k: int) -> np.ndarray:
    """Distance to the k-th nearest neighbour (excluding self)."""
    d = _pairwise_distance(feats)
    return np.partition(d, k, axis=-1)[:, k]


def compute_prdc(real: np.ndarray, fake: np.ndarray,
                 nearest_k: int = 5) -> Dict[str, float]:
    """Precision/recall/density/coverage (gan_eval.py:265-309)."""
    real_r = _knn_radii(real, nearest_k)
    fake_r = _knn_radii(fake, nearest_k)
    d_rf = _pairwise_distance(real, fake)
    precision = float((d_rf < real_r[:, None]).any(axis=0).mean())
    recall = float((d_rf < fake_r[None]).any(axis=1).mean())
    density = float((1.0 / nearest_k)
                    * (d_rf < real_r[:, None]).sum(axis=0).mean())
    coverage = float((d_rf.min(axis=1) < real_r).mean())
    return dict(precision=precision, recall=recall, density=density,
                coverage=coverage)
