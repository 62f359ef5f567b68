"""SVCCA — canonical correlation similarity between activation matrices.

Device-side replacement for the vendored Google SVCCA code the reference
carries at ``utils/cca.py`` (call sites: ``misc_scripts/rc_vision.py:88``,
``rc_rl.py:276`` — always ``get_cca_similarity(A, B, epsilon)[1]``, i.e.
the mean correlation coefficient). Same algorithm, re-written from the
math: covariance of the stacked activations, prune near-zero-variance
directions, regularize, whiten with inverse matrix square roots (eigh),
SVD of the whitened cross-covariance; singular values are the CCA
correlation coefficients. The heavy linear algebra (eigh/SVD/solve) runs
as XLA ops; orchestration is eager because pruning changes shapes.

Activations are ``(num_neurons, num_datapoints)`` with
``num_neurons < num_datapoints``, as in the reference.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _inv_sqrt_psd(mat: np.ndarray) -> np.ndarray:
    """Inverse matrix square root of a PSD matrix via eigendecomposition,
    pseudo-inverting (zeroing) tiny eigenvalues like ``np.linalg.pinv``.

    Runs in float64 on host: the matrices are only (neurons, neurons) and
    the decomposition is precision-critical; the O(neurons^2 * datapoints)
    covariance matmul above it stays on device.
    """
    w, v = np.linalg.eigh(mat)
    cutoff = np.max(np.abs(w)) * mat.shape[0] * np.finfo(mat.dtype).eps
    inv_sqrt_w = np.where(w > cutoff, 1.0 / np.sqrt(np.maximum(w, cutoff)), 0.0)
    return (v * inv_sqrt_w[None, :]) @ v.T


def get_cca_similarity(acts1, acts2, epsilon: float = 0.0, threshold: float = 0.98):
    """Compute CCA similarity between two activation sets.

    Returns ``(info_dict, mean_cca)`` like the reference API. ``info_dict``
    holds ``cca_coef1`` (all coefficients), ``mean`` (thresholded mean,
    2-tuple), ``sum``, and the pruning masks ``x_idxs``/``y_idxs``.
    """
    acts1 = jnp.asarray(acts1, dtype=jnp.float32)
    acts2 = jnp.asarray(acts2, dtype=acts1.dtype)
    assert acts1.shape[1] == acts2.shape[1], "datapoint counts must match"
    assert acts1.shape[0] < acts1.shape[1], "inputs must be (neurons, datapoints)"

    nx = acts1.shape[0]
    stacked = jnp.concatenate([acts1, acts2], axis=0)
    # Device-side covariance (the large matmul), then float64 on host for
    # the small, conditioning-sensitive decompositions.
    cov = np.asarray(jnp.cov(stacked), dtype=np.float64)
    sxx, sxy = cov[:nx, :nx], cov[:nx, nx:]
    syy = cov[nx:, nx:]

    # Rescale for numerical stability, then drop near-dead directions.
    xmax = np.max(np.abs(sxx))
    ymax = np.max(np.abs(syy))
    sxx = sxx / xmax
    syy = syy / ymax
    sxy = sxy / np.sqrt(xmax * ymax)

    x_keep = np.abs(np.diagonal(sxx)) >= epsilon
    y_keep = np.abs(np.diagonal(syy)) >= epsilon
    if not x_keep.any() or not y_keep.any():
        zeros = np.zeros((min(acts1.shape[0], acts2.shape[0]),))
        info = {"cca_coef1": zeros, "cca_coef2": zeros,
                "mean": (0.0, 0.0), "sum": (0.0, 0.0),
                "x_idxs": x_keep, "y_idxs": y_keep}
        return info, 0.0

    sxx = sxx[np.ix_(x_keep, x_keep)]
    syy = syy[np.ix_(y_keep, y_keep)]
    sxy = sxy[np.ix_(x_keep, y_keep)]

    sxx = sxx + epsilon * np.eye(sxx.shape[0], dtype=sxx.dtype)
    syy = syy + epsilon * np.eye(syy.shape[0], dtype=syy.dtype)

    whitened = _inv_sqrt_psd(sxx) @ sxy @ _inv_sqrt_psd(syy)
    s = np.abs(np.linalg.svd(whitened, compute_uv=False))

    # Mean over the leading coefficients that carry `threshold` of the mass.
    cumulative = np.cumsum(s)
    total = cumulative[-1]
    idx = int(np.searchsorted(cumulative, total * threshold)) + 1
    idx = max(1, min(idx, s.shape[0]))

    info = {
        "cca_coef1": s,
        "cca_coef2": s,
        "mean": (float(np.mean(s[:idx])), float(np.mean(s[:idx]))),
        "sum": (float(np.sum(s)), float(np.sum(s))),
        "x_idxs": x_keep,
        "y_idxs": y_keep,
    }
    return info, float(np.mean(s))


def robust_cca_similarity(acts1, acts2, epsilon: float = 1e-6,
                          threshold: float = 0.98, num_trials: int = 5):
    """Retry CCA with added jitter if the decomposition fails
    (reference ``utils/cca.py:365-413``)."""
    rng = np.random.default_rng(0)
    a1, a2 = np.asarray(acts1), np.asarray(acts2)
    for trial in range(num_trials):
        try:
            return get_cca_similarity(a1, a2, epsilon=epsilon, threshold=threshold)
        except np.linalg.LinAlgError:
            # Only numerical failures get the jitter-and-retry treatment
            # (the reference retries LinAlgError, utils/cca.py:365-413);
            # misuse like wrong input orientation must surface immediately.
            if trial + 1 == num_trials:
                raise
            a1 = a1 * 1e-1 + rng.normal(size=a1.shape) * epsilon
            a2 = a2 * 1e-1 + rng.normal(size=a2.shape) * epsilon
