"""Tests for half-space polygon clipping and legacy plane bookkeeping."""

import numpy as np

from tropical.core.polygons import (find_polygon, plane_to_vertices,
                                    sort_polygon_vertices)


def test_find_polygon_unit_cube_midplane():
    # cube [-1,1]^3 as 6 half-spaces (inside positive), query plane z = 0
    planes = np.array([
        [1, 0, 0, 1], [-1, 0, 0, 1],
        [0, 1, 0, 1], [0, -1, 0, 1],
        [0, 0, 1, 1], [0, 0, -1, 1],
    ], float)
    q = np.array([0, 0, 1, 0], float)
    poly = find_polygon(q, planes)
    # the section is the square [-1,1]^2 at z=0
    assert poly.shape[0] == 4
    np.testing.assert_allclose(np.abs(poly[:, :2]), 1.0, atol=1e-6)
    np.testing.assert_allclose(poly[:, 2], 0.0, atol=1e-6)
    # vertices are angularly sorted: consecutive ones differ in one coord
    d = np.abs(np.diff(np.vstack([poly, poly[:1]]), axis=0))
    assert ((d[:, :2] > 1.9).sum(axis=1) == 1).all()


def test_sort_polygon_vertices_square():
    pts = np.array([[1, 1, 0], [-1, -1, 0], [1, -1, 0], [-1, 1, 0]], float)
    out = sort_polygon_vertices(pts, np.array([0, 0, 1.0]))
    # consecutive vertices share an edge of the square (no diagonals)
    ring = np.vstack([out, out[:1]])
    d = np.linalg.norm(np.diff(ring, axis=0), axis=1)
    np.testing.assert_allclose(d, 2.0, atol=1e-6)


def test_plane_to_vertices():
    m = np.array([
        [1, 0, 1, 0, 1],
        [1, 1, 1, 0, 0],
    ])
    off = np.array([[3, 7, 9], [3, 7, 9]])
    pv = plane_to_vertices(m, off, L=10)
    # neural plane col 0 (key 30+0) hosts both vertices... col 3 of m is
    # neural col 0: key base=10*3=30
    assert pv[30] == [0, 1]
    assert pv[31] == [1]
    # grid plane: vertex 0 has zero on axis 1 -> key offset[0,1] + 10*1 = 17
    assert pv[17] == [0]
