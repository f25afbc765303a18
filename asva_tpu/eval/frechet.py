"""Fréchet distance between two feature sets (FID / FVD reducer).

Same math as the reference (avgen/evaluations/dists.py:56-119): sample
means/covariances, scipy sqrtm of the covariance product with the epsilon
fallback for near-singular products.
"""
from __future__ import annotations

import numpy as np
from scipy import linalg


def frechet_distance(x1, x2, eps: float = 1e-6) -> float:
    x1 = np.asarray(x1, np.float64)
    x2 = np.asarray(x2, np.float64)
    mu1, mu2 = x1.mean(axis=0), x2.mean(axis=0)
    sigma1 = np.cov(x1, rowvar=False)
    sigma2 = np.cov(x2, rowvar=False)

    diff = mu1 - mu2

    def _sqrtm(m):
        out = linalg.sqrtm(m)
        return out[0] if isinstance(out, tuple) else out

    covmean = _sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError("non-trivial imaginary component "
                             f"{np.max(np.abs(covmean.imag))}")
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))
