"""Unit tests for sign-vector region bookkeeping."""

import numpy as np

from tropical.core.regions import (edge_vertices, region_table,
                                   regions_to_vertices, row_unique_inverse)


def test_regions_to_vertices_expansion_counts():
    # rows: 0 zeros -> 1 replica, 2 zeros -> 4 replicas
    m = np.array([
        [1, 1, 1, 1, -1],
        [1, 1, 0, 0, -1],
    ])
    off = np.array([[3, 4, 5], [3, 4, 5]])
    r_idx, idx_org = regions_to_vertices(m, off)
    assert len(idx_org) == 1 + 4
    assert (idx_org == 0).sum() == 1
    assert (idx_org == 1).sum() == 4
    # all 4 replicas of row 1 land in distinct regions
    assert len(np.unique(r_idx[idx_org == 1])) == 4


def test_regions_to_vertices_grid_offset_mapping():
    # one row, zero in grid column 0 -> two replicas with cell offset-1/offset
    m = np.array([[0, 1, 1, 1]])
    off = np.array([[5, 7, 9]])
    r_idx, idx_org = regions_to_vertices(m, off)
    assert len(idx_org) == 2
    # regions differ (cells 4 and 5 on either side of the grid plane)
    assert r_idx[0] != r_idx[1]


def test_shared_region_gets_same_id():
    # two vertices on the same plane (col 3 zero), same grid cell: their
    # replicas must share both adjacent region ids
    m = np.array([
        [1, 1, 1, 0, 1],
        [1, 1, 1, 0, 1],
    ])
    off = np.array([[2, 2, 2], [2, 2, 2]])
    r_idx, idx_org = regions_to_vertices(m, off)
    r0 = set(r_idx[idx_org == 0])
    r1 = set(r_idx[idx_org == 1])
    assert r0 == r1 and len(r0) == 2


def test_region_table_left_aligned():
    r_idx = np.array([0, 1, 0, 2, 0])
    idx_org = np.array([10, 11, 12, 13, 14])
    t = region_table(r_idx, idx_org)
    assert t.shape == (3, 3)
    assert set(t[0]) == {10, 12, 14}
    assert (t[1] == [11, -1, -1]).all()
    assert (t[2] == [13, -1, -1]).all()


def test_edge_vertices_connects_coplanar_same_region():
    # three vertices on plane col 3 in the same cell; all pairs share that
    # plane and a region -> three edges
    m = np.array([
        [1, 1, 1, 0, 1],
        [1, 1, 1, 0, 1],
        [1, 1, 1, 0, 1],
    ])
    off = np.tile([[2, 2, 2]], (3, 1))
    pairs = edge_vertices(m, off)
    assert pairs.shape == (3, 2)
    assert set(map(tuple, pairs)) == {(0, 1), (0, 2), (1, 2)}


def test_edge_vertices_grid_plane_offset_mismatch():
    # both vertices on grid plane 0 but in different cells along that axis:
    # the shared zero must be discounted -> no edge
    m = np.array([
        [0, 1, 1, 0, 1],
        [0, 1, 1, 1, 1],
    ])
    off = np.array([[2, 5, 5], [4, 5, 5]])
    pairs = edge_vertices(m, off)
    assert pairs.shape[0] == 0


def test_row_unique_inverse():
    m = np.array([[1, 2], [3, 4], [1, 2]])
    inv = row_unique_inverse(m)
    assert inv[0] == inv[2] != inv[1]
