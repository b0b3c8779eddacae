"""Parity of the on-device faces stage vs the host faces stage.

The fused fast path assembles faces on device (region grouping, np.unique
row ordering, angular sort, fan triangulation — reference
subpoly.py:584-652); the ramp path runs the host implementation on the same
loop output.  Identical up to fp tie-breaking in the angular sort on sliver
polygons (different fan diagonals of the same polygon), so the test checks
exact counts/vertices and a near-total triangle-set overlap.
"""

import numpy as np


def test_device_faces_matches_host(trained_net):
    import tropical.extract.device as dev

    # isolate from persisted caps: force the ramp (host faces) first
    dev._GOOD_CAPS.clear()
    dev._SKEL_CAPS.clear()
    dev._PERSISTED["good"].clear()
    dev._PERSISTED["skel"].clear()

    f1, v1, t1 = dev.subpoly_device(trained_net, verbose=False)  # host faces
    f2, v2, t2 = dev.subpoly_device(trained_net, verbose=False)  # device faces

    assert t1.shape == t2.shape
    np.testing.assert_array_equal(v1, v2)
    assert t2.min() >= 0 and t2.max() < v2.shape[0]

    s1 = set(map(tuple, np.sort(t1, 1)))
    s2 = set(map(tuple, np.sort(t2, 1)))
    overlap = len(s1 & s2) / max(len(s1), 1)
    assert overlap > 0.995, f"triangle-set overlap {overlap:.4f}"

    # faces positions consistent with indices
    np.testing.assert_allclose(f2, v2[t2], atol=0)
