# -*- coding: utf-8 -*-
"""Pallas banded (DIA) sparse matvec for the compact-support solver.

The XLA formulation of ``dia_apply`` (``solvers/sparse.py``) is a sum of
D shifted elementwise products: correct, but each of the D terms streams
its own shifted copy of ``y`` from HBM, so a multi-RHS application reads
``y`` up to D times. This kernel keeps the WHOLE right-hand-side block
resident in VMEM (a banded system's y is small: n x r f32 at n=1e5,
r=16 is 6.4 MB against ~16 MB of VMEM) and performs the D shifted
fused-multiply-adds on-chip, so HBM traffic drops to one read of the
value table + one read of y + one write of the output — the bandwidth
floor. Every slice start is ``block_row * bm + d`` with static ``d``:
scalar-dynamic sublane slices, the access pattern Mosaic supports
natively (no gathers anywhere — that is the point of the DIA layout).

The reference has no analogue (its sparse path is an out-of-tree MPI
SuperLU_DIST factorization, ``basic.py:121-177`` there); this kernel is
the TPU-native hot loop under that feature's replacement.
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ["dia_matvec_pallas", "DIA_VMEM_BUDGET"]

# keep y + out + one vals tile comfortably inside ~16 MB of VMEM
DIA_VMEM_BUDGET = 8 * 1024 * 1024


def _dia_kernel(vals_ref, ypad_ref, diag_ref, y_ref, out_ref, *,
                bm, offsets, base):
    """One row block: ``out[i] = diag[i] y[i] + sum_d vals[i, d] *
    ypad[i + base + offsets[d]]`` with ``ypad`` fully VMEM-resident."""
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    vals = vals_ref[...]
    acc = diag_ref[...][:, None] * y_ref[...]
    row0 = i * bm
    for j, d in enumerate(offsets):
        win = ypad_ref[pl.ds(row0 + base + int(d), bm), :]
        acc = acc + vals[:, j][:, None] * win
    out_ref[...] = acc


@functools.partial(
    jax.jit, static_argnames=("offsets", "block_rows", "interpret")
)
def dia_matvec_pallas(vals, offsets, diag, y, block_rows=1024,
                      interpret=False):
    """``(K + diag) y`` for a banded structure, Pallas TPU kernel.

    ``vals``: ``(n, D)`` masked value table; ``offsets``: static tuple of
    D diagonal offsets; ``y``: ``(n,)`` or ``(n, r)``.
    """
    import jax.experimental.pallas as pl

    squeeze = y.ndim == 1
    Y = y[:, None] if squeeze else y
    n, r = Y.shape
    D = vals.shape[1]
    assert len(offsets) == D

    lo = max(-min(offsets), 0)
    hi = max(max(offsets), 0)
    bm = min(block_rows, n)
    n_blocks = -(-n // bm)
    n_pad = n_blocks * bm
    # zero-pad: lo rows in front (negative offsets), band tail + row
    # padding behind — padded vals rows are zero, so they contribute 0
    Ypad = jnp.pad(Y, ((lo, hi + (n_pad - n)), (0, 0)))
    Yrows = jnp.pad(Y, ((0, n_pad - n), (0, 0)))
    vals_p = jnp.pad(vals, ((0, n_pad - n), (0, 0)))
    diag_p = jnp.pad(diag, (0, n_pad - n))

    out = pl.pallas_call(
        functools.partial(
            _dia_kernel, bm=bm, offsets=tuple(int(d) for d in offsets),
            base=lo,
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((bm, D), lambda i: (i, 0)),        # vals tile
            pl.BlockSpec(Ypad.shape, lambda i: (0, 0)),     # full ypad
            pl.BlockSpec((bm,), lambda i: (i,)),            # diag tile
            pl.BlockSpec((bm, r), lambda i: (i, 0)),        # y tile
        ],
        out_specs=pl.BlockSpec((bm, r), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, r), Y.dtype),
        interpret=interpret,
    )(vals_p, Ypad, diag_p, Yrows)
    out = out[:n]
    return out[:, 0] if squeeze else out
