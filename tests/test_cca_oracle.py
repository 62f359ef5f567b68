"""CCA mean-semantics oracle test (VERDICT round-1 weak item 6).

Vendors the REFERENCE implementation's numerics
(``/root/reference/utils/cca.py:52-196,226-362``: covariance -> rescale ->
remove_small -> pinv -> positive-def matrix sqrt -> SVD) into this test as
an oracle — NOT into the package — and checks that
``exploring_meta_tpu.ops.cca.get_cca_similarity`` returns the same
coefficients, the same ``[1]`` scalar (mean over ALL coefficients — what
the RC probes consume, rc_vision.py:88 / rc_rl.py:276), and the same
thresholded ``info["mean"]``.
"""

import numpy as np
import pytest

from exploring_meta_tpu.ops.cca import get_cca_similarity


# --- reference oracle (numerics verbatim from utils/cca.py, condensed) ----

def _ref_positivedef_matrix_sqrt(array):
    w, v = np.linalg.eigh(array)
    return v @ np.diag(np.sqrt(w)) @ np.conj(v).T


def _ref_sum_threshold(array, threshold):
    for i in range(len(array)):
        if np.sum(array[:i]) / np.sum(array) >= threshold:
            return i
    return len(array)


def _ref_get_cca_similarity(acts1, acts2, epsilon=0.0, threshold=0.98):
    numx = acts1.shape[0]
    covariance = np.cov(acts1, acts2)
    sigmaxx = covariance[:numx, :numx]
    sigmaxy = covariance[:numx, numx:]
    sigmayx = covariance[numx:, :numx]
    sigmayy = covariance[numx:, numx:]

    xmax = np.max(np.abs(sigmaxx))
    ymax = np.max(np.abs(sigmayy))
    sigmaxx /= xmax
    sigmayy /= ymax
    sigmaxy /= np.sqrt(xmax * ymax)
    sigmayx /= np.sqrt(xmax * ymax)

    x_idxs = np.abs(np.diagonal(sigmaxx)) >= epsilon
    y_idxs = np.abs(np.diagonal(sigmayy)) >= epsilon
    sigmaxx = sigmaxx[x_idxs][:, x_idxs]
    sigmaxy = sigmaxy[x_idxs][:, y_idxs]
    sigmayy = sigmayy[y_idxs][:, y_idxs]

    sigmaxx += epsilon * np.eye(sigmaxx.shape[0])
    sigmayy += epsilon * np.eye(sigmayy.shape[0])
    inv_xx = np.linalg.pinv(sigmaxx)
    inv_yy = np.linalg.pinv(sigmayy)
    invsqrt_xx = _ref_positivedef_matrix_sqrt(inv_xx)
    invsqrt_yy = _ref_positivedef_matrix_sqrt(inv_yy)
    arr = invsqrt_xx @ sigmaxy @ invsqrt_yy
    s = np.abs(np.linalg.svd(arr, compute_uv=False))

    idx = _ref_sum_threshold(s, threshold)
    return {"cca_coef1": s, "mean": (np.mean(s[:idx]), np.mean(s[:idx])),
            "sum": (np.sum(s), np.sum(s))}, np.mean(s)


# --- tests -----------------------------------------------------------------

def _random_acts(key, nx, ny, m, correlated=False):
    rng = np.random.default_rng(key)
    a1 = rng.standard_normal((nx, m))
    if correlated:
        mix = rng.standard_normal((ny, nx))
        a2 = mix @ a1 + 0.05 * rng.standard_normal((ny, m))
    else:
        a2 = rng.standard_normal((ny, m))
    return a1, a2


@pytest.mark.parametrize("nx,ny,m,correlated,epsilon", [
    (10, 10, 64, False, 1e-10),
    (10, 10, 64, True, 1e-10),
    (8, 14, 50, True, 1e-10),   # different neuron counts
    (20, 20, 200, True, 1e-6),  # the robust_cca epsilon
    (6, 6, 40, False, 0.0),     # reference default epsilon
])
def test_matches_reference_oracle(nx, ny, m, correlated, epsilon):
    a1, a2 = _random_acts(nx * 1000 + ny, nx, ny, m, correlated)
    ref_info, ref_scalar = _ref_get_cca_similarity(
        a1.copy(), a2.copy(), epsilon=epsilon)
    info, scalar = get_cca_similarity(a1, a2, epsilon=epsilon)

    # The consumed value: [1] = mean over ALL coefficients (cca.py:362).
    assert scalar == pytest.approx(ref_scalar, abs=2e-4)
    # Full coefficient spectra agree (fp32 covariance on device vs fp64).
    np.testing.assert_allclose(np.sort(info["cca_coef1"]),
                               np.sort(ref_info["cca_coef1"]), atol=2e-4)
    # Thresholded summary mean agrees (sum_threshold semantics).
    assert info["mean"][0] == pytest.approx(float(ref_info["mean"][0]),
                                            abs=2e-4)
    assert info["sum"][0] == pytest.approx(float(ref_info["sum"][0]),
                                           abs=1e-3)


def test_correlated_acts_score_high():
    a1, a2 = _random_acts(7, 12, 12, 96, correlated=True)
    _, scalar = get_cca_similarity(a1, a2, epsilon=1e-10)
    assert scalar > 0.9


def test_orientation_assertion():
    # (datapoints, neurons) orientation must assert (reference cca.py:277)
    with pytest.raises(AssertionError):
        get_cca_similarity(np.ones((64, 10)), np.ones((64, 10)))
