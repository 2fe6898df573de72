# -*- coding: utf-8 -*-
"""Pallas banded (DIA) sparse matvec for the compact-support solver.

The XLA formulation of ``dia_apply`` (``solvers/sparse.py``) is a sum of
D shifted elementwise products: correct, but each of the D terms streams
its own shifted copy of ``y`` from HBM, so one application reads ``y``
up to D times. This kernel DMAs, per row block, the single overlapping
window of the right-hand side that the block's band touches into VMEM
and performs the D shifted fused-multiply-adds on-chip, so HBM traffic
drops to one read of the value table + ~(1 + band/bm) reads of y + one
write of the output — essentially the bandwidth floor.

Layout (the part that makes it compile on real hardware): a vector in
its natural ``(n, 1)`` shape is tiling-hostile — VMEM tiles are
``(8, 128)`` and every lane slice must be 128-aligned, so a width-1
column cannot be sliced or DMA'd (Mosaic rejects the ``memref_slice``).
Instead the vector is **lane-folded** row-major into ``(n/128, 128)``:
flat row ``k`` lives at ``[k // 128, k % 128]``. Then

- the per-block RHS window is a full-lane sublane range (start and size
  both multiples of 128 rows) — a plain aligned DMA;
- a band shift by ``d`` decomposes statically into ``q, rl =
  divmod(lo + d, 128)``: two static sublane slices of the window and a
  static lane rotation (``pltpu.roll``) merged with a static lane mask.

Every slice start, rotation and mask is a Python constant (the offsets
are static), so the kernel contains no dynamic layout ops at all. The
value table is pre-transposed to ``(D, n/128, 128)`` so each diagonal's
coefficients are a full-lane tile too.

Multi-RHS input is handled by ``vmap`` over columns (each column pays
its own window DMA; the value-table read — the dominant stream — is
shared via the grid).

The reference has no analogue (its sparse path is an out-of-tree MPI
SuperLU_DIST factorization, ``basic.py:121-177`` there); this kernel is
the TPU-native hot loop under that feature's replacement.
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ["dia_matvec_pallas", "DIA_VMEM_BUDGET"]

_LANES = 128

# per-block VMEM budget for the value-table tile + RHS window scratch
DIA_VMEM_BUDGET = 8 * 1024 * 1024


def _round_up(k, m):
    return -(-k // m) * m


def _dia_kernel(vals_ref, ypad_hbm, diag_ref, y_ref, out_ref, yscr, sem,
                *, bs, ws, offsets, base):
    """One row block (``bs`` sublane rows of 128 lanes = ``bs*128`` flat
    rows): ``out[k] = diag[k] y[k] + sum_d vals[d, k] * ypad[k + base +
    offsets[d]]`` with the block's RHS window DMA'd into ``yscr``."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        ypad_hbm.at[pl.ds(i * bs, ws), :], yscr, sem
    )
    dma.start()
    # overlap the window DMA with the VMEM reads the block needs anyway
    vals = vals_ref[...]                      # (D, bs, 128)
    acc = diag_ref[...] * y_ref[...]          # (bs, 128)
    dma.wait()
    lane = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
    for j, d in enumerate(offsets):
        q, rl = divmod(base + int(d), _LANES)
        a = yscr[q:q + bs, :]
        if rl == 0:
            v = a
        else:
            # flat shift by rl within 128-lane rows: rotate the row and
            # its successor, take lanes < 128-rl from the first
            b = yscr[q + 1:q + 1 + bs, :]
            v = jnp.where(
                lane < _LANES - rl,
                pltpu.roll(a, _LANES - rl, 1),
                pltpu.roll(b, _LANES - rl, 1),
            )
        acc = acc + vals[j] * v
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

    if y.ndim != 1:
        return jax.vmap(
            lambda col: dia_matvec_pallas(
                vals, offsets, diag, col,
                block_rows=block_rows, interpret=interpret,
            ),
            in_axes=1, out_axes=1,
        )(y)

    n = y.shape[0]
    D = vals.shape[1]
    assert len(offsets) == D

    lo = max(-min(offsets), 0)
    hi = max(max(offsets), 0)
    # block and window sizes in full (8, 128) f32 VMEM tiles: a DMA
    # whose sublane start or extent is not tile-aligned faults the chip
    # (measured: ws=10/12 crash the worker, ws=16/24 run)
    tile_rows = 8 * _LANES
    bm = _round_up(min(block_rows, n), tile_rows)
    n_blocks = -(-n // bm)
    n_pad = n_blocks * bm
    bs = bm // _LANES
    # window extension past the block: the band reach + one lane row so
    # the rl>0 successor slice always exists, tile-rounded
    ext = _round_up(lo + hi + _LANES, tile_rows)
    ws = (bm + ext) // _LANES
    total = n_pad + ext

    # flat zero-padded RHS: front ``lo`` rows so index base+d >= 0, tail
    # covers the last block's window; padded vals rows are zero, so the
    # padding contributes nothing
    ypad = jnp.zeros(total, y.dtype).at[lo:lo + n].set(y)
    vals_t = jnp.pad(vals, ((0, n_pad - n), (0, 0))).T.reshape(
        D, n_pad // _LANES, _LANES
    )
    diag_f = jnp.pad(diag, (0, n_pad - n)).reshape(-1, _LANES)
    y_f = jnp.pad(y, (0, n_pad - n)).reshape(-1, _LANES)

    out = pl.pallas_call(
        functools.partial(
            _dia_kernel, bs=bs, ws=ws,
            offsets=tuple(int(d) for d in offsets), base=lo,
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((D, bs, _LANES), lambda i: (0, i, 0)),  # vals
            pl.BlockSpec(memory_space=pl.ANY),                   # ypad HBM
            pl.BlockSpec((bs, _LANES), lambda i: (i, 0)),        # diag
            pl.BlockSpec((bs, _LANES), lambda i: (i, 0)),        # y tile
        ],
        out_specs=pl.BlockSpec((bs, _LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad // _LANES, _LANES), y.dtype),
        scratch_shapes=[
            pltpu.VMEM((ws, _LANES), y.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(vals_t, ypad.reshape(-1, _LANES), diag_f, y_f)
    return out.reshape(n_pad)[:n]
