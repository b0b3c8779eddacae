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

    # ---- quantified divergence bound (round-5, VERDICT task 7) ----------
    # The residual divergence must be EXACTLY the documented kind: fp
    # tie-breaks in the angular sort picking a different fan diagonal of
    # the same polygon.  Diagonal flips preserve (a) the triangle count,
    # (b) the vertex set, and (c) the summed surface area of the divergent
    # triangles — so the symmetric difference is pinned on all three, plus
    # a hard fraction bound.  Anything else (a dropped polygon, a wrong
    # vertex, an overlapping fan) breaks one of these.
    d1 = s1 - s2
    d2 = s2 - s1
    assert len(d1) == len(d2), (len(d1), len(d2))
    frac = len(d1) / max(len(s1), 1)
    assert frac <= 0.005, f"divergent-triangle fraction {frac:.5f}"
    assert ({i for t in d1 for i in t} == {i for t in d2 for i in t})

    def tri_area(tris):
        if not tris:
            return 0.0
        p = v1[np.asarray(sorted(tris))]
        cr = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
        return float(0.5 * np.linalg.norm(cr, axis=1).sum())

    a1, a2 = tri_area(d1), tri_area(d2)
    assert abs(a1 - a2) <= 1e-6 * max(tri_area(s1), 1e-30) + 1e-12, (a1, a2)

    # faces positions consistent with indices
    np.testing.assert_allclose(f2, v2[t2], atol=0)
