"""MXU/Pallas min-distance vs the broadcast-diff reference."""

import numpy as np

from tropical.ops.chamfer_tpu import min_nn_distance as fast
from tropical.utils.chamfer import min_nn_distance_scan


def test_self_distance_is_exactly_zero():
    """Regression: the |x|^2+|y|^2-2xy expansion has a ~1e-3 cancellation
    noise floor; the argmin+exact-recompute must return literal zeros."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2000, 3)).astype(np.float32)
    d = fast(x, x, use_pallas=False)
    assert d.max() == 0.0


def test_matmul_min_dist_matches_scan():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(777, 3)).astype(np.float32)
    y = rng.normal(size=(4321, 3)).astype(np.float32)
    a = min_nn_distance_scan(x, y)
    b = fast(x, y, use_pallas=False)
    np.testing.assert_allclose(a, b, atol=5e-5)


def test_pallas_path_matches(tmp_path):
    # on CPU the pallas call raises and falls back to XLA — same numbers
    rng = np.random.default_rng(4)
    x = rng.normal(size=(100, 3)).astype(np.float32)
    y = rng.normal(size=(900, 3)).astype(np.float32)
    a = fast(x, y, use_pallas=True)
    b = fast(x, y, use_pallas=False)
    np.testing.assert_allclose(a, b, atol=5e-5)
