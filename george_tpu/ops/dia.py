# -*- coding: utf-8 -*-
"""Pallas banded (DIA) sparse matvec for the compact-support solver.

The XLA formulation of ``dia_apply`` (``solvers/sparse.py``) is a sum of
D shifted elementwise products: correct, but each of the D terms streams
its own shifted copy of ``y`` from HBM, so one application reads ``y``
up to D times. This kernel DMAs, per row block, the single overlapping
window of the right-hand side that the block's band touches
(``bm + band`` rows) into a VMEM scratch and performs the D shifted
fused-multiply-adds on-chip, so HBM traffic drops to one read of the
value table + ~(1 + band/bm) reads of y + one write of the output —
essentially the bandwidth floor. Every slice start is static within the
block: scalar-dynamic sublane slices, the access pattern Mosaic supports
natively (no gathers anywhere — that is the point of the DIA layout).

(A previous revision kept the WHOLE padded RHS VMEM-resident. That dies
on-chip for single vectors: an ``(n, 1)`` f32 array in VMEM is padded to
128 lanes, so n=2e5 costs ~103 MB of a 128 MB VMEM budget. The windowed
DMA form has a per-block footprint of ``(bm + band, r)`` and scales to
any n.)

The reference has no analogue (its sparse path is an out-of-tree MPI
SuperLU_DIST factorization, ``basic.py:121-177`` there); this kernel is
the TPU-native hot loop under that feature's replacement.
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ["dia_matvec_pallas", "DIA_VMEM_BUDGET"]

# per-block scratch budget: the RHS window is lane-padded (r -> 128 for
# vectors), so gate on the padded footprint
DIA_VMEM_BUDGET = 8 * 1024 * 1024


def _dia_kernel(vals_ref, ypad_hbm, diag_ref, y_ref, out_ref, yscr, sem,
                *, bm, offsets, base, win):
    """One row block: ``out[i] = diag[i] y[i] + sum_d vals[i, d] *
    ypad[i + base + offsets[d]]``, with the block's RHS window DMA'd
    from HBM into the ``yscr`` scratch."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    row0 = i * bm
    dma = pltpu.make_async_copy(
        ypad_hbm.at[pl.ds(row0, win), :], yscr, sem
    )
    dma.start()
    # overlap the window DMA with the VMEM reads the block needs anyway
    vals = vals_ref[...]
    acc = diag_ref[...][:, None] * y_ref[...]
    dma.wait()
    for j, d in enumerate(offsets):
        acc = acc + vals[:, j][:, None] * yscr[pl.ds(base + int(d), bm), :]
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
    from jax.experimental.pallas import tpu as pltpu

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
    win = bm + lo + hi
    # zero-pad: lo rows in front (negative offsets), band tail + row
    # padding behind — padded vals rows are zero, so they contribute 0.
    # Ypad has n_pad + lo + hi rows, so the last block's window
    # [n_pad - bm, n_pad + lo + hi) exactly fits.
    Ypad = jnp.pad(Y, ((lo, hi + (n_pad - n)), (0, 0)))
    Yrows = jnp.pad(Y, ((0, n_pad - n), (0, 0)))
    vals_p = jnp.pad(vals, ((0, n_pad - n), (0, 0)))
    diag_p = jnp.pad(diag, (0, n_pad - n))

    out = pl.pallas_call(
        functools.partial(
            _dia_kernel, bm=bm, offsets=tuple(int(d) for d in offsets),
            base=lo, win=win,
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((bm, D), lambda i: (i, 0)),        # vals tile
            pl.BlockSpec(memory_space=pl.ANY),              # ypad in HBM
            pl.BlockSpec((bm,), lambda i: (i,)),            # diag tile
            pl.BlockSpec((bm, r), lambda i: (i, 0)),        # y tile
        ],
        out_specs=pl.BlockSpec((bm, r), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, r), Y.dtype),
        scratch_shapes=[
            pltpu.VMEM((win, r), Y.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(vals_p, Ypad, diag_p, Yrows)
    out = out[:n]
    return out[:, 0] if squeeze else out
