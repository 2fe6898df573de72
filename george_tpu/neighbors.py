# -*- coding: utf-8 -*-
"""Host-side neighbor search and data-ordering preprocessing.

The reference leans on out-of-tree tree structures for two things:

* compact-support sparsity — ``sklearn.neighbors.BallTree.query_radius``
  feeding CSR neighbor lists into sparse covariance assembly
  (``kernels.py:131-144``) and the HODLR solver's kNN skeleton
  (``_hodlr.cpp:121-128``);
* locality ordering — ``scipy.spatial.cKDTree`` 1-NN ordering
  (``utils.py:36-56``) so hierarchical off-diagonal blocks compress well.

Here both are host-side *preprocessing*: they run once per dataset and only
static index structures (CSR arrays, permutations) cross to the device.  The
default implementation uses the in-tree C++ kd-tree (``george_tpu/native``)
when built, falling back to ``scipy.spatial.cKDTree``.
"""

import numpy as np

__all__ = [
    "radius_neighbors_csr",
    "ragged_to_csr",
    "knn_matrix_to_csr",
    "normalize_nns",
    "knn_indices",
    "nd_sort_samples",
    "morton_sort_samples",
]


def _native():
    try:
        from .native import kdtree as _kd

        return _kd if _kd.available() else None
    except Exception:
        return None


def ragged_to_csr(neighbors):
    """Flatten a ragged per-row neighbor listing (``BallTree.query_radius``
    style: one index array per point) into ``(nbr_idx, row_ptr)`` CSR
    index arrays (reference surface: ``kernels.py:107-123``)."""
    lengths = np.fromiter(
        (np.size(row) for row in neighbors),
        count=len(neighbors), dtype=np.int64,
    )
    row_ptr = np.zeros(len(neighbors) + 1, dtype=np.int64)
    np.cumsum(lengths, out=row_ptr[1:])
    nbr_idx = (
        np.concatenate([np.ravel(row) for row in neighbors])
        if len(neighbors) else np.empty(0)
    ).astype(np.int64)
    return nbr_idx, row_ptr


def knn_matrix_to_csr(arr, n):
    """Symmetrized CSR pattern from a rectangular kNN matrix (one
    fixed-size neighbor list per row, ``-1`` = missing).  kNN relations
    are not symmetric, but symmetric operators (CG/SLQ, covariance
    evaluation) need a symmetric pattern — use the union
    ``{(i,j)} ∪ {(j,i)} ∪ {(i,i)}``, deduplicated."""
    arr = np.asarray(arr, dtype=np.int64)
    i0 = np.repeat(np.arange(n, dtype=np.int64), arr.shape[1])
    j0 = arr.ravel()
    keep = (j0 >= 0) & (j0 < n)
    i0, j0 = i0[keep], j0[keep]
    eye = np.arange(n, dtype=np.int64)  # self-pairs: the diagonal must
    ii = np.concatenate([i0, j0, eye])  # always be in the pattern
    jj = np.concatenate([j0, i0, eye])
    order = np.lexsort((jj, ii))
    ii, jj = ii[order], jj[order]
    uniq = np.ones(len(ii), dtype=bool)
    uniq[1:] = (ii[1:] != ii[:-1]) | (jj[1:] != jj[:-1])
    ii, jj = ii[uniq], jj[uniq]
    row_ptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(ii, minlength=n), out=row_ptr[1:])
    return jj, row_ptr


def normalize_nns(nns):
    """Canonicalize a user-supplied ``nns`` neighbor structure.

    Accepted forms, mirroring everything the reference's call sites take:
    ``None`` / a bare truthy trigger (pass through), a ``(nbr_idx,
    row_ptr)`` CSR pair (pass through), a rectangular integer kNN matrix
    (pass through — the hierarchical solver's format), or a ragged
    per-row listing which is flattened to the CSR pair."""
    if nns is None or np.isscalar(nns):
        return nns
    if isinstance(nns, tuple) and len(nns) == 2:
        return nns
    arr = np.asarray(nns)
    if arr.dtype == object or (
        arr.ndim == 1 and len(arr) and np.ndim(arr[0]) > 0
    ):
        return ragged_to_csr(nns)
    return nns


def radius_neighbors_csr(x, radius, include_self=True):
    """All neighbors within ``radius`` of each point, as CSR arrays.

    Returns ``(nbr_idx, row_ptr)`` with ``nbr_idx[row_ptr[i]:row_ptr[i+1]]``
    the neighbor indices of point ``i`` (self included), matching the
    layout the reference builds from BallTree output
    (``kernels.py:107-123``).
    """
    x = np.ascontiguousarray(np.atleast_2d(x), dtype=np.float64)
    if not np.isfinite(radius) or radius <= 0:
        # Dense fallback: everything neighbors everything.
        n = len(x)
        row_ptr = np.arange(0, n * n + 1, n, dtype=np.int64)
        nbr_idx = np.tile(np.arange(n, dtype=np.int64), n)
        return nbr_idx, row_ptr

    native = _native()
    if native is not None:
        return native.radius_neighbors_csr(x, float(radius))

    from scipy.spatial import cKDTree

    tree = cKDTree(x)
    neighbors = tree.query_ball_point(x, r=float(radius))
    lengths = np.fromiter(
        (len(a) for a in neighbors), count=len(x), dtype=np.int64
    )
    row_ptr = np.zeros(len(x) + 1, dtype=np.int64)
    np.cumsum(lengths, out=row_ptr[1:])
    nbr_idx = np.empty(int(row_ptr[-1]), dtype=np.int64)
    pos = 0
    for a in neighbors:
        m = len(a)
        nbr_idx[pos : pos + m] = np.sort(a)
        pos += m
    return nbr_idx, row_ptr


def knn_indices(x, k):
    """Indices of the ``k`` nearest neighbors of each point (self included)."""
    x = np.ascontiguousarray(np.atleast_2d(x), dtype=np.float64)
    native = _native()
    if native is not None:
        return native.knn(x, int(k))
    from scipy.spatial import cKDTree

    tree = cKDTree(x)
    _, idx = tree.query(x, k=int(k))
    return np.atleast_2d(idx).astype(np.int64)


def nd_sort_samples(samples):
    """Distance-from-first-sample ordering (reference ``utils.py:36-56``).

    Returns the permutation that sorts the samples by distance from
    ``samples[0]`` in kd-tree query order.
    """
    samples = np.ascontiguousarray(samples, dtype=np.float64)
    assert samples.ndim == 2
    native = _native()
    if native is not None:
        return native.nd_sort(samples)
    from scipy.spatial import cKDTree

    tree = cKDTree(samples)
    _, i = tree.query(samples[0], k=len(samples))
    return i


def morton_sort_samples(samples, bits=21):
    """Z-order (Morton) curve ordering for hierarchical-solver locality.

    A space-filling-curve sort keeps near points in near leaf blocks, which
    is what makes HODLR off-diagonal blocks low-rank in ndim > 1. O(n log n),
    host-side, returns a permutation. For 1-D input this reduces to argsort.
    """
    samples = np.ascontiguousarray(np.atleast_2d(samples), dtype=np.float64)
    n, d = samples.shape
    if d == 1:
        return np.argsort(samples[:, 0], kind="stable")
    native = _native()
    if native is not None:
        return native.morton_sort(samples, bits=bits)
    lo = samples.min(axis=0)
    hi = samples.max(axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    # Quantize each axis to `bits` bits and interleave bitwise into one code.
    q = np.minimum(
        ((samples - lo) / span * ((1 << bits) - 1)).astype(np.uint64),
        (1 << bits) - 1,
    )
    if bits * d > 63:
        # Interleaved code would overflow uint64; lexsort is a reasonable
        # locality ordering fallback for high-dimensional input.
        return np.lexsort(tuple(samples[:, ax] for ax in range(d - 1, -1, -1)))
    code = np.zeros(n, dtype=np.uint64)
    for b in range(bits):
        for ax in range(d):
            bit = (q[:, ax] >> np.uint64(b)) & np.uint64(1)
            code |= bit << np.uint64(b * d + ax)
    return np.argsort(code, kind="stable")
