"""Stale-order stepping: reuse the cell sort across force steps.

The prepare sort is ~25% of the single-chip step (BENCH_NOTES
roofline) yet between consecutive steps almost every particle stays
inside the window (C cells + halo rows) that owned it: per-step
displacements are sub-cell, so only x-plane crossers (cell jumps of
ny_pad*nz_pad) and window-edge y/z crossers leave coverage. A stale
step therefore:

1. keeps the carried particle ORDER and the window range table from
   the last fresh prepare;
2. recomputes cells and CIC weights elementwise from the fresh
   positions (exact physics, no approximation);
3. detects "movers" -- particles whose fresh cell left their stale
   window's safe row span -- zeroes their weights in the main bundle
   (they become inert: zero deposits, zero readout), and routes them
   through a small freshly-sorted side bundle (paint adds canvases;
   readout scatters the side values back by index);
4. reports count > maxm as an overflow flag, on which the caller must
   run a fresh prepare (same contract as the homed halo ladder).

The result is EXACT (same corner weights; canvas addition reorders
f32 sums only). Reference cost being attacked: the reference re-sorts
ghosts every step too (pmghosts.c) but its sort is a local qsort;
on TPU the 7-operand lax.sort is a multi-pass comparator network and
dominates -- this trades it for an elementwise pass + a tiny sort.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh import PM
from .paint_pallas import (make_prepare_fn, make_paint_from8_fn,
                           make_prepare_carry_fn, base_cell_frac,
                           w8_from_frac, paint8_geometry)
from .readout_pallas import make_readout3_from8_fn, readout8_geometry

__all__ = ["make_stale_tools", "stale_safe_span"]


def stale_safe_span(pm: PM, C: int) -> int:
    """Largest rel = cell - w*C a non-mover may reach, derived from
    the kernel factories' OWN geometry functions (paint8_geometry /
    readout8_geometry) so a kernel-geometry change can never silently
    widen the span past the DMA'd canvas window."""
    nzp = pm.Nmesh[2] + 1
    CLh, HR_p = paint8_geometry(pm, C)
    _CLh, HR_r, _RX, RXL = readout8_geometry(pm, C)
    # safe span: max corner delta, the lane-127 fix reads one row
    # above, and one extra row of margin
    return ((CLh + min(HR_r, HR_p) - 1) * 128 - 1
            - max(RXL + nzp, nzp + 1) - 128)


def make_stale_tools(pm: PM, K: int = 512, C: int | None = None,
                     pad_to: int | None = None, maxm: int | None = None,
                     interpret: bool = False,
                     paint_from=None, readout_from=None):
    """Build the stale-step toolkit. Returns a dict of functions:

    fresh(x, v)        -> (prepared, xs, vs): full sort; the caller
                          carries (xs, vs) and prepared['ranges'].
    stale(x, ranges)   -> (main, mover, midx, nbad): main/mover
                          bundles for the SAME kernel factories.
    paint(main, mover) -> canvas (both bundles painted and added).
    readout3(main, mover, midx, cx, cy, cz) -> (n, 3) values in the
                          carried order.

    paint_from/readout_from: pass already-built from8 kernels (e.g.
    gravity's _fused_cache instances) to avoid constructing duplicate
    pallas programs; they must use the same (K, C)."""
    nx, ny, nz = pm.Nmesh
    nyp, nzp = ny + 1, nz + 1
    if C is None:
        from .paint_pallas import auto_window_C
        C = auto_window_C(nyp, nzp)
    mpad = (nx + 1) * nyp * nzp
    W = (mpad + C - 1) // C
    REL_MAX = stale_safe_span(pm, C)
    if maxm is None:
        maxm = 0  # caller must size; see stale()
    # numpy, NOT jnp: these builders may be constructed inside a jit
    # trace (gravity._fused_cache); a jnp constant born in one trace
    # and cached leaks into the next (UnexpectedTracerError)
    inv_cell = np.asarray(pm.InvCellSize, dtype=np.float32)
    if pad_to is None:
        # the from8 kernels DMA whole KD super-chunks: bundles must be
        # lane-padded to a multiple of DEFAULT_KD
        from .paint_pallas import DEFAULT_KD
        pad_to = max(2 * K, DEFAULT_KD)
    min_pad = pad_to - 256

    fresh = make_prepare_carry_fn(pm, C=C, pad_to=pad_to)
    prepare_small = make_prepare_fn(pm, C=C, pad_to=pad_to)
    if paint_from is None:
        paint_from = make_paint_from8_fn(pm, K=K, C=C,
                                         interpret=interpret)
    if readout_from is None:
        readout_from = make_readout3_from8_fn(pm, K=K, C=C,
                                              interpret=interpret)

    def _cells_w8(pos):
        cell, frac = base_cell_frac(pos, inv_cell, nx, ny, nz,
                                    nyp, nzp)
        return cell, w8_from_frac(frac[:, 0], frac[:, 1], frac[:, 2])

    def stale(x, ranges):
        """Bundles for one stale step; x in the carried (stale sorted)
        order, ranges from the last fresh prepare."""
        n = x.shape[0]
        cell, w8 = _cells_w8(x)
        # window of each index under the STALE partition (the s-column
        # of offset row 0 tiles the array)
        starts = ranges[:, 0, 0]
        iota = jnp.arange(n, dtype=jnp.int32)
        widx = (jnp.searchsorted(starts, iota, side="right")
                .astype(jnp.int32) - 1)
        rel = cell - widx * C
        mover = (rel < 0) | (rel > REL_MAX)
        nmov = jnp.sum(mover.astype(jnp.int32))
        nbad = jnp.maximum(nmov - maxm, 0)

        # main bundle: fresh cells/weights in the stale order; movers
        # inert via zero weights (their one-hot rows may still match
        # in-range rows after wraparound -- zero weights guarantee
        # zero deposit and zero readout either way)
        keep = jnp.logical_not(mover)
        w8_main = w8 * keep[:, None].astype(jnp.float32)
        n_padded = ((n + min_pad + pad_to - 1) // pad_to) * pad_to
        extra = n_padded - n
        # clamp main cells into coverage so padded/mover lanes can
        # never index below row 0 of a window block
        cell_main = jnp.clip(rel, 0, REL_MAX) + widx * C
        cell_2d = jnp.concatenate(
            [cell_main, jnp.full((extra,), mpad - 1, jnp.int32)])[None]
        w8T = jnp.concatenate(
            [w8_main.T, jnp.zeros((8, extra), jnp.float32)],
            axis=1)[:, None, :]
        main = dict(ranges=ranges, cell_2d=cell_2d, w8T=w8T,
                    orig=None, n=n)

        # mover side bundle: gather, weight-mask the padding, sort
        midx = jnp.nonzero(mover, size=maxm, fill_value=n)[0]
        lane_valid = jnp.arange(maxm) < nmov
        x_m = jnp.take(x, jnp.minimum(midx, n - 1), axis=0)
        mover_b = prepare_small(x_m)
        mover_b = dict(mover_b)
        mover_b["w8T"] = mover_b["w8T"] * _sorted_valid(
            mover_b, lane_valid)[None, None, :]
        # the packed operand must reflect the masked weights -- drop
        # the stale prepared cw9 so the kernels repack from w8T
        mover_b.pop("cw9", None)
        return main, mover_b, midx, nbad

    def _sorted_valid(bundle, lane_valid):
        """lane_valid permuted into the bundle's sorted order, padded
        to the bundle width."""
        orig = bundle["orig"]
        npad = bundle["cell_2d"].shape[1]
        vs = jnp.take(lane_valid.astype(jnp.float32), orig, axis=0)
        return jnp.concatenate(
            [vs, jnp.zeros((npad - vs.shape[0],), jnp.float32)])

    def paint(main, mover_b):
        return paint_from(main) + paint_from(mover_b)

    def readout3(main, mover_b, midx, cx, cy, cz):
        vals = readout_from(main, cx, cy, cz)
        vals_m = readout_from(mover_b, cx, cy, cz)
        return vals.at[midx].set(vals_m, mode="drop")

    return dict(fresh=fresh, stale=stale, paint=paint,
                readout3=readout3, REL_MAX=REL_MAX, W=W, maxm=maxm)
