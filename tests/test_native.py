# -*- coding: utf-8 -*-
"""Native (C++) neighbor engine: exact parity with the scipy fallbacks."""

import numpy as np
import pytest

from george_tpu.native import kdtree
from george_tpu import neighbors

pytestmark = pytest.mark.skipif(
    not kdtree.available(), reason="no C++ toolchain available"
)


def _points(n=300, d=2, seed=0):
    return np.random.default_rng(seed).uniform(0, 10, (n, d))


def test_radius_csr_matches_scipy():
    from scipy.spatial import cKDTree

    x = _points()
    r = 1.5
    nbr, ptr = kdtree.radius_neighbors_csr(x, r)
    tree = cKDTree(x)
    for i in range(len(x)):
        mine = nbr[ptr[i]:ptr[i + 1]]
        ref = np.sort(tree.query_ball_point(x[i], r))
        assert np.array_equal(mine, ref)


def test_knn_matches_scipy():
    from scipy.spatial import cKDTree

    x = _points(n=250, d=3, seed=1)
    k = 8
    mine = kdtree.knn(x, k)
    _, ref = cKDTree(x).query(x, k=k)
    # identical distance sets (ties may reorder equal-distance neighbors)
    for i in range(len(x)):
        d_mine = np.sort(np.linalg.norm(x[mine[i]] - x[i], axis=1))
        d_ref = np.sort(np.linalg.norm(x[ref[i]] - x[i], axis=1))
        assert np.allclose(d_mine, d_ref)


def test_nd_sort_is_distance_order():
    x = _points(n=200, d=2, seed=2)
    perm = kdtree.nd_sort(x)
    assert np.array_equal(np.sort(perm), np.arange(len(x)))
    d = np.linalg.norm(x - x[0], axis=1)
    assert np.all(np.diff(d[perm]) >= -1e-12)


def test_morton_sort_is_permutation_and_local():
    x = _points(n=500, d=2, seed=3)
    perm = kdtree.morton_sort(x)
    assert np.array_equal(np.sort(perm), np.arange(len(x)))
    # locality: mean consecutive distance far below random ordering's
    sorted_step = np.linalg.norm(np.diff(x[perm], axis=0), axis=1).mean()
    rand_step = np.linalg.norm(np.diff(x, axis=0), axis=1).mean()
    assert sorted_step < 0.5 * rand_step


def test_neighbors_module_prefers_native():
    x = _points(n=100, d=2, seed=4)
    nbr_n, ptr_n = neighbors.radius_neighbors_csr(x, 2.0)
    # force the scipy path for comparison
    from scipy.spatial import cKDTree

    tree = cKDTree(x)
    for i in range(len(x)):
        ref = np.sort(tree.query_ball_point(x[i], 2.0))
        assert np.array_equal(nbr_n[ptr_n[i]:ptr_n[i + 1]], ref)
