"""Sorted windowed CIC paint -- a Pallas TPU kernel replacing scatter-add.

Idea: XLA's scatter on TPU costs ~14 ns/element (serialized); painting is
8N such updates. Instead:

1. (XLA) compute each particle's padded base cell and 8 CIC corner
   weights; sort particles by padded cell id (TPU sort: ~8 ns/particle).
2. For each corner o, the target cells t = c + off[o] are STILL sorted
   (constant flat offset into a +1-padded canvas, so no wraparound).
   Precompute, per (corner, window) of C cells, the contiguous particle
   range via searchsorted.
3. (Pallas) grid over (window, corner): DMA particle chunks (double
   buffered), build a (K, C) one-hot-weight mask in VMEM with pure
   vector ops, reduce over particles, accumulate into the window's
   canvas block. The canvas block stays resident in VMEM across the 8
   corner passes (output revisiting).
4. (XLA) fold the padded faces back (periodic wrap).

No scatter instruction is ever issued; the kernel is vector-dense and all
HBM reads are sequential.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mesh import PM

__all__ = ["paint_sorted", "make_paint_fn", "make_prepare_fn",
           "make_prepare_carry_fn", "make_paint_from_fn",
           "make_paint_from4_fn", "make_paint_from8_fn",
           "make_prepare_homed_fn",
           "make_paint_from4_homed_fn", "make_paint_from8_homed_fn",
           "pack_cw9", "DEFAULT_KD"]

# DMA super-chunk width of the from8 kernels: cell+weight chunks are
# fetched (and readout values written back) in KD-lane blocks with
# KD/K inner compute sub-rounds. The per-round fixed cost (DMA issue +
# semaphore wait + loop scalar work) was the measured b ~ 3.9 us/round
# sync term of BENCH_NOTES round 3 -- batching 4 K-chunks per DMA and
# packing cell+w8 into ONE HBM operand cuts the DMA issues per round
# ~8x. Prepared bundles must be lane-padded to a multiple of KD.
DEFAULT_KD = 2048


def pack_cw9(cell_2d, w8T):
    """Pack the sorted cells and corner weights into the ONE (9, 1, N)
    f32 HBM operand the from8 kernels stream: row 0 is the i32 cell ids
    bitcast to f32 (DMA moves bytes; the kernel bitcasts back), rows
    1..8 the corner weights. One DMA per chunk instead of two."""
    cell_f = jax.lax.bitcast_convert_type(cell_2d, jnp.float32)
    return jnp.concatenate([cell_f[None], w8T], axis=0)


def _corner_offsets_padded(nyp, nzp):
    offs = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                offs.append((dx * nyp + dy) * nzp + dz)
    return offs


def _paint_kernel(ranges_ref,        # SMEM (1, 8, 2) i32: [o] -> (s, e)
                  cell_hbm,          # (1, Npad+pad) i32 sorted padded cells
                  w8T_hbm,           # (8, 1, Npad+pad) f32 corner weights
                  out_ref,           # (CLh, 128) f32 canvas block, window w
                  cell_scratch,      # VMEM (2, 1, K+128) i32
                  w_scratch,         # VMEM (2, 1, K+128) f32
                  sems,              # DMA sems (2, 2)
                  *, K, C, CLh, nyp, nzp):
    """Two-level one-hot deposit: window-local index rel = hi*128 + lo.
    A[h, p] = [hi_p == h], B[l, p] = w_p [lo_p == l]; the deposit is the
    MXU contraction acc[h, l] += sum_p A[h, p] B[l, p]."""
    KA = K + 128
    w = pl.program_id(0)
    o = pl.program_id(1)

    @pl.when(o == 0)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    # corner offset from the bit pattern of o: (dx, dy, dz) = o bits
    dx = o >> 2
    dy = (o >> 1) & 1
    dz = o & 1
    off = (dx * nyp + dy) * nzp + dz
    s = ranges_ref[0, o, 0]
    e = ranges_ref[0, o, 1]
    count = e - s
    nrounds = jax.lax.div(count + K - 1, K)

    base_target = w * C - off
    hi_row = jax.lax.broadcasted_iota(jnp.int32, (CLh, KA), 0)
    lo_row = jax.lax.broadcasted_iota(jnp.int32, (128, KA), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, KA), 1)

    def aligned_start(r):
        # DMA lane offsets must be 128-aligned (Mosaic tiling); load from
        # the aligned floor and mask the overhang in-kernel
        start = s + r * K
        return pl.multiple_of((start // 128) * 128, 128)

    def make_copies(slot, r):
        start_al = aligned_start(r)
        return (pltpu.make_async_copy(
                    cell_hbm.at[:, pl.ds(start_al, KA)],
                    cell_scratch.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(
                    w8T_hbm.at[o, :, pl.ds(start_al, KA)],
                    w_scratch.at[slot], sems.at[slot, 1]))

    @pl.when(nrounds > 0)
    def _run():
        c0, c1 = make_copies(0, 0)
        c0.start()
        c1.start()

        def body(r, acc):
            slot = r % 2
            nxt = (r + 1) % 2

            @pl.when(r + 1 < nrounds)
            def _prefetch():
                n0, n1 = make_copies(nxt, r + 1)
                n0.start()
                n1.start()

            d0, d1 = make_copies(slot, r)
            d0.wait()
            d1.wait()

            cells = cell_scratch[slot]             # (1, KA)
            weights = w_scratch[slot]              # (1, KA)
            gidx = aligned_start(r) + lane         # global particle index
            valid = ((gidx >= s + r * K) & (gidx < s + (r + 1) * K)
                     & (gidx < e))
            rel = jnp.where(valid, cells - base_target, -1)
            hi = rel >> 7          # -1 stays -1: matches no A row
            lo = rel & 127
            A = (hi == hi_row).astype(jnp.float32)       # (CLh, KA)
            B = jnp.where(lo == lo_row, weights, 0.0)    # (128, KA)
            # HIGHEST precision: the f32 weights must not round to bf16
            # on the MXU (costs the 3-pass algorithm; the A operand is
            # exact 0/1 either way)
            acc = acc + jax.lax.dot_general(
                A, B, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            return acc

        acc = jax.lax.fori_loop(0, nrounds, body,
                                jnp.zeros((CLh, 128), jnp.float32))
        out_ref[...] = out_ref[...] + acc


def make_paint_fn(pm: PM, K: int = 256, C: int = 1024, interpret=False):
    """Build a jitted paint function (pos, mass) -> canvas (Nx,Ny,Nz),
    numerically equivalent to Painter(pm, 'cic').paint."""
    nx, ny, nz = pm.Nmesh
    nxp, nyp, nzp = nx + 1, ny + 1, nz + 1
    mpad = nxp * nyp * nzp
    W = (mpad + C - 1) // C
    offsets = _corner_offsets_padded(nyp, nzp)

    if C % 1024:
        raise ValueError("C must be a multiple of 1024 (8x128 tiles)")
    CLh = C // 128
    kernel = functools.partial(_paint_kernel, K=K, C=C, CLh=CLh,
                               nyp=nyp, nzp=nzp)

    grid = (W, 8)
    paint_call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, 2), lambda w, o: (w, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((CLh, 128), lambda w, o: (w, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 1, K + 128), jnp.int32),
            pltpu.VMEM((2, 1, K + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        out_shape=jax.ShapeDtypeStruct((W * CLh, 128), jnp.float32),
        interpret=interpret,
    )

    # numpy, NOT jnp: these builders may be constructed inside a jit
    # trace (gravity._fused_cache); a jnp constant born in one trace
    # and cached leaks into the next (UnexpectedTracerError)
    inv_cell = np.asarray(pm.InvCellSize, dtype=np.float32)

    def paint(pos, mass=1.0):
        n = pos.shape[0]
        gpos = pos * inv_cell
        base = jnp.floor(gpos).astype(jnp.int32)
        frac = gpos - base
        base = jnp.stack([jnp.remainder(base[:, 0], nx),
                          jnp.remainder(base[:, 1], ny),
                          jnp.remainder(base[:, 2], nz)], axis=-1)
        cell = ((base[:, 0] * nyp + base[:, 1]) * nzp + base[:, 2])

        # sort by cell carrying the fractions (and mass) as payload --
        # avoids expensive gathers of an (N, 8) weight array
        if jnp.ndim(mass) == 0:
            cell_s, fx, fy, fz = jax.lax.sort(
                (cell, frac[:, 0], frac[:, 1], frac[:, 2]), num_keys=1)
            m_s = mass
        else:
            cell_s, fx, fy, fz, m_s = jax.lax.sort(
                (cell, frac[:, 0], frac[:, 1], frac[:, 2], mass),
                num_keys=1)
        f = (fx, fy, fz)
        t = (1.0 - fx, 1.0 - fy, 1.0 - fz)
        w8_s = jnp.stack([(t[0], f[0])[dx] * (t[1], f[1])[dy]
                          * (t[2], f[2])[dz]
                          for dx in (0, 1) for dy in (0, 1)
                          for dz in (0, 1)], axis=-1)
        if jnp.ndim(mass) == 0:
            w8_s = w8_s * m_s
        else:
            w8_s = w8_s * m_s[:, None]

        # pad by K so chunked DMA never reads past the end; padded rows
        # carry zero weight and the last cell id (their windows may fall
        # beyond W-1 and are then never visited)
        pad = K + 256
        cell_s = jnp.concatenate(
            [cell_s, jnp.full((pad,), mpad - 1, jnp.int32)])
        cell_2d = cell_s[None, :]
        w8T = jnp.concatenate(
            [w8_s.T, jnp.zeros((8, pad), jnp.float32)], axis=1)[:, None, :]

        # per-(window, corner) particle ranges
        edges = jnp.arange(W + 1, dtype=jnp.int32) * C
        bounds = jnp.stack(
            [jnp.searchsorted(cell_s[:-pad], edges - off).astype(jnp.int32)
             for off in offsets], axis=1)          # (W+1, 8)
        ranges = jnp.stack([bounds[:-1], bounds[1:]], axis=-1)  # (W, 8, 2)

        padded = paint_call(ranges, cell_2d, w8T).reshape(-1)[:mpad]
        padded = padded.reshape(nxp, nyp, nzp)

        canvas = padded[:nx, :ny, :nz]
        canvas = canvas.at[0, :, :].add(padded[nx, :ny, :nz])
        canvas = canvas.at[:, 0, :].add(padded[:nx, ny, :nz])
        canvas = canvas.at[:, :, 0].add(padded[:nx, :ny, nz])
        canvas = canvas.at[0, 0, :].add(padded[nx, ny, :nz])
        canvas = canvas.at[0, :, 0].add(padded[nx, :ny, nz])
        canvas = canvas.at[:, 0, 0].add(padded[:nx, ny, nz])
        canvas = canvas.at[0, 0, 0].add(padded[nx, ny, nz])
        return canvas

    return jax.jit(paint)


def paint_sorted(pm: PM, pos, mass=1.0, K: int = 256, C: int = 1024,
                 interpret=False):
    return make_paint_fn(pm, K=K, C=C, interpret=interpret)(pos, mass)


def base_cell_frac(pos, inv_cell, nx, ny, nz, nyp, nzp):
    """THE canonical padded-cell + CIC-fraction formula. Shared by the
    prepare builders and the stale stepper (ops/stale.py) -- stale
    exactness depends on bit-identity with the fresh prepare."""
    gpos = pos * inv_cell
    base = jnp.floor(gpos).astype(jnp.int32)
    frac = gpos - base
    base = jnp.stack([jnp.remainder(base[:, 0], nx),
                      jnp.remainder(base[:, 1], ny),
                      jnp.remainder(base[:, 2], nz)], axis=-1)
    cell = ((base[:, 0] * nyp + base[:, 1]) * nzp + base[:, 2])
    return cell, frac


def w8_from_frac(f0, f1, f2):
    """(n, 8) CIC corner weights from the three fractions (corner
    order dx-major, matching the kernels' w8T rows)."""
    f = (f0, f1, f2)
    t = (1.0 - f0, 1.0 - f1, 1.0 - f2)
    return jnp.stack([(t[0], f[0])[dx] * (t[1], f[1])[dy]
                      * (t[2], f[2])[dz]
                      for dx in (0, 1) for dy in (0, 1)
                      for dz in (0, 1)], axis=-1)


def window_halo_rows(nyp: int, nzp: int, eight: bool = True) -> int:
    """Halo rows (HR) of the paint/readout canvas windows -- the rows
    past the window that a particle whose base cell sits at the window
    edge can still touch. SINGLE source of truth: auto_window_C,
    paint8_geometry, readout8_geometry and every kernel builder derive
    HR from here so kernel geometry can never desynchronize.

    eight=True is the one-pass 8-corner geometry (block 1 of the canvas
    sits one x-plane later, so deltas additionally carry the RX lane
    residual); eight=False the 4-corner/homed geometry (halo spans
    nzp+1 only). HR does not depend on the window size C."""
    if eight:
        RX = ((nyp * nzp) // 128 // 8) * 8
        span = nyp * nzp - RX * 128 + nzp + 1   # RXL + nzp + 1
    else:
        span = nzp + 1
    HR = (span + 127) // 128 + 1
    return ((HR + 7) // 8) * 8


def auto_window_C(nyp: int, nzp: int, eight: bool = True) -> int:
    """Pick the cell-window size C so the 8-corner kernels' canvas
    window (CLh + HR rows of 128 lanes) is EXACTLY 128 rows -- one full
    MXU contraction fill for the merged one-hot dots. Chip-measured +6%
    over the legacy C=8192 (72-row window) at 256^3 B2: 26.06M ->
    27.63M particle-steps/s (BENCH_NOTES round-3 matrix).

    See window_halo_rows for the eight= geometry distinction;
    test_pallas_paint pins the formulas together."""
    HR = window_halo_rows(nyp, nzp, eight)
    CLh = 128 - HR
    if CLh < 16:
        # degenerate (enormous Nz): no single-fill window exists. Grow
        # C until the kernels' HR <= CLh invariant holds (HR is a
        # multiple of 8, so C stays a multiple of 1024).
        CLh = max(HR, 64)
    return CLh * 128


def _window_ranges(cell_s, W: int, C: int, offsets):
    """Per-(corner, window) particle ranges from the sorted cells, in
    BOTH layouts: legacy (W, n_off, 2) for the multi-offset kernels
    and lane-major (n_off, 2, W) for the from8 kernels' SMEM operand.
    One batched searchsorted replaces per-offset bisection loops, and
    the lane-major layout turns the HBM->SMEM staging copy from 8790
    1-valid-lane (1,128) tiles (~4.5 MB moved, chip-measured 64 ms for
    the (W,1,2) readout operand) into ~140 dense tiles. The from8
    kernels consume offset row 0 only; callers that know it pass
    offsets=(0,) and skip 7/8 of the bisection gathers (~20 ms/step at
    the bench shape)."""
    edges = jnp.arange(W + 1, dtype=jnp.int32) * C
    q = edges[None, :] - jnp.asarray(offsets, jnp.int32)[:, None]
    bounds = jnp.searchsorted(cell_s, q).astype(jnp.int32)
    ranges = jnp.stack([bounds[:, :-1], bounds[:, 1:]],
                       axis=-1).transpose(1, 0, 2)       # (W, n_off, 2)
    ranges_lm = jnp.stack([bounds[:, :-1], bounds[:, 1:]],
                          axis=1)                        # (n_off, 2, W)
    return ranges, _pad_lm(ranges_lm)


def _pad_lm(ranges_lm):
    """Pad the lane (window) dim to a multiple of 128: the SMEM
    BlockSpec is (1, 2, 128) with an in-kernel w%128 lane read (TPU
    blocks need last-two dims divisible by (8, 128) or full). Padded
    lanes are never addressed (grid = W programs)."""
    w = ranges_lm.shape[-1]
    wpad = -(-w // 128) * 128
    if wpad == w:
        return ranges_lm
    return jnp.pad(ranges_lm, ((0, 0), (0, 0), (0, wpad - w)))


def ranges_lane_major(prepared):
    """The (8, 2, Wpad) lane-major range table of a prepared bundle,
    rebuilt from the legacy (W, 8, 2) layout when absent (bundles from
    ops/stale.py and older callers)."""
    lm = prepared.get("ranges_lm")
    if lm is None:
        lm = _pad_lm(jnp.transpose(prepared["ranges"], (1, 2, 0)))
    return lm


def make_prepare_fn(pm: PM, C: int | None = None,
                    pad_to: int = DEFAULT_KD,
                    base_only: bool = False,
                    presorted: bool = False):
    """Shared sorted-bundle builder for the paint and readout kernels:
    ONE sort by padded cell (carrying fx, fy, fz and the original index)
    and ONE per-(window, corner) range table serve both, halving the
    per-force-step indexing cost.

    base_only: build the range tables for the base corner (offset 0)
    only -- ranges (W, 1, 2), ranges_lm (1, 2, Wpad). The from8
    one-pass kernels and the stale window map consume offset row 0
    exclusively, so the 7 extra searchsorted rows (7*(W+1) bisections
    over n) are pure waste on those paths. Bundles built this way must
    NOT feed the multi-offset (from/from4) kernels."""
    nx, ny, nz = pm.Nmesh
    nyp, nzp = ny + 1, nz + 1
    if C is None:
        C = auto_window_C(nyp, nzp)
    mpad = (nx + 1) * nyp * nzp
    W = (mpad + C - 1) // C
    offsets = (0,) if base_only else _corner_offsets_padded(nyp, nzp)
    # numpy, NOT jnp: these builders may be constructed inside a jit
    # trace (gravity._fused_cache); a jnp constant born in one trace
    # and cached leaks into the next (UnexpectedTracerError)
    inv_cell = np.asarray(pm.InvCellSize, dtype=np.float32)
    min_pad = pad_to - 256   # >= K + 128 for the paint kernel's DMA

    def prepare(pos):
        n = pos.shape[0]
        cell, frac = base_cell_frac(pos, inv_cell, nx, ny, nz,
                                    nyp, nzp)
        if presorted:
            # rows already cell-sorted (order-free split paths): skip
            # the sort; values come back aligned with the given rows
            cell_s, fx, fy, fz = (cell, frac[:, 0], frac[:, 1],
                                  frac[:, 2])
            orig = None
        else:
            iota = jnp.arange(n, dtype=jnp.int32)
            cell_s, fx, fy, fz, orig = jax.lax.sort(
                (cell, frac[:, 0], frac[:, 1], frac[:, 2], iota),
                num_keys=1)
        w8_s = w8_from_frac(fx, fy, fz)

        n_padded = ((n + min_pad + pad_to - 1) // pad_to) * pad_to
        extra = n_padded - n
        cell_2d = jnp.concatenate(
            [cell_s, jnp.full((extra,), mpad - 1, jnp.int32)])[None, :]
        w8T = jnp.concatenate(
            [w8_s.T, jnp.zeros((8, extra), jnp.float32)],
            axis=1)[:, None, :]

        ranges, ranges_lm = _window_ranges(cell_s, W, C, offsets)
        return dict(ranges=ranges, ranges_lm=ranges_lm, cell_2d=cell_2d,
                    w8T=w8T, cw9=pack_cw9(cell_2d, w8T), orig=orig, n=n)

    return prepare


def make_prepare_carry_fn(pm: PM, C: int | None = None,
                          pad_to: int = DEFAULT_KD,
                          sort_block: int | None = None,
                          payload_gather: bool = False,
                          base_only: bool = False):
    """Order-free prepared-bundle builder: carries the PHASE-SPACE rows
    (x, v[, extra u32 columns]) through the cell sort instead of an
    un-sort index. The caller keeps particles in cell-sorted order
    across steps (order is physically meaningless), which deletes the
    per-step un-sort payload sort entirely: readout values come out
    already aligned with the sorted x/v.

    Fracs are recomputed from the sorted x (cheap elementwise) so the
    sort moves 7 arrays (cell + x*3 + v*3) instead of 5, and no inverse
    permutation is ever needed.

    sort_block: when set (power of two), use the k-sorted fast sort
    (ops/sort_pallas.sort_maybe_ksorted) with that run size instead of
    a full lax.sort -- exact-fallback-guarded, it wins whenever the
    carried order from the previous step is within ~sort_block ranks
    of sorted (sub-cell per-step displacements). f32 payloads only, so
    extras are not supported with it.

    payload_gather: sort only (cell, index) through the multi-pass
    comparator network and move the 6(+) payload columns with one
    take() each afterwards -- trades 6 columns x O(log^2 n) comparator
    passes for 6 O(n) gathers (bench variant; see BENCH_NOTES).

    base_only: offset-0-only range tables (see make_prepare_fn); valid
    whenever the bundle feeds the from8 kernels + stale window map
    only, which is exactly the production order-free path."""
    nx, ny, nz = pm.Nmesh
    nyp, nzp = ny + 1, nz + 1
    if C is None:
        C = auto_window_C(nyp, nzp)
    mpad = (nx + 1) * nyp * nzp
    W = (mpad + C - 1) // C
    offsets = (0,) if base_only else _corner_offsets_padded(nyp, nzp)
    # numpy, NOT jnp: these builders may be constructed inside a jit
    # trace (gravity._fused_cache); a jnp constant born in one trace
    # and cached leaks into the next (UnexpectedTracerError)
    inv_cell = np.asarray(pm.InvCellSize, dtype=np.float32)
    min_pad = pad_to - 256

    def prepare(pos, vel, extras=()):
        n = pos.shape[0]
        cell, _frac = base_cell_frac(pos, inv_cell, nx, ny, nz,
                                     nyp, nzp)
        ops_in = (cell, pos[:, 0], pos[:, 1], pos[:, 2],
                  vel[:, 0], vel[:, 1], vel[:, 2]) + tuple(extras)
        if sort_block is not None:
            if extras:
                raise ValueError("sort_block supports f32 payloads "
                                 "only (no extras)")
            from .sort_pallas import sort_maybe_ksorted
            npad_sort = -(-n // (2 * sort_block)) * (2 * sort_block)
            if npad_sort != n:
                # pad with +inf keys (sort to the end), slice off after
                padk = jnp.full((npad_sort - n,), np.iinfo(np.int32).max,
                                jnp.int32)
                padv = jnp.zeros((npad_sort - n,), jnp.float32)
                ops_pad = (jnp.concatenate([ops_in[0], padk]),) + tuple(
                    jnp.concatenate([o, padv]) for o in ops_in[1:])
                sorted_ops = tuple(
                    o[:n] for o in sort_maybe_ksorted(ops_pad,
                                                      sort_block))
            else:
                sorted_ops = sort_maybe_ksorted(ops_in, sort_block)
        elif payload_gather:
            idx = jnp.arange(n, dtype=jnp.int32)
            cell_key, idx_s = jax.lax.sort((cell, idx), num_keys=1)
            sorted_ops = (cell_key,) + tuple(
                jnp.take(o, idx_s, axis=0, indices_are_sorted=False,
                         unique_indices=True) for o in ops_in[1:])
        else:
            sorted_ops = jax.lax.sort(ops_in, num_keys=1)
        cell_s = sorted_ops[0]
        xs = jnp.stack(sorted_ops[1:4], axis=-1)
        vs = jnp.stack(sorted_ops[4:7], axis=-1)
        extras_s = sorted_ops[7:]
        # recompute fracs from the sorted positions (bit-identical to
        # pre-sort fracs: same inputs, same ops -- gpos - floor(gpos)
        # == gpos - base since base = floor(gpos))
        _cell2, fr = base_cell_frac(xs, inv_cell, nx, ny, nz,
                                    nyp, nzp)
        w8_s = w8_from_frac(fr[:, 0], fr[:, 1], fr[:, 2])

        n_padded = ((n + min_pad + pad_to - 1) // pad_to) * pad_to
        extra = n_padded - n
        cell_2d = jnp.concatenate(
            [cell_s, jnp.full((extra,), mpad - 1, jnp.int32)])[None, :]
        w8T = jnp.concatenate(
            [w8_s.T, jnp.zeros((8, extra), jnp.float32)],
            axis=1)[:, None, :]

        ranges, ranges_lm = _window_ranges(cell_s, W, C, offsets)
        prepared = dict(ranges=ranges, ranges_lm=ranges_lm,
                        cell_2d=cell_2d, w8T=w8T,
                        cw9=pack_cw9(cell_2d, w8T), orig=None, n=n)
        return prepared, xs, vs, extras_s

    return prepare


def make_paint_from_fn(pm: PM, K: int = 512, C: int | None = None,
                       interpret=False):
    """Paint from a prepared bundle (make_prepare_fn). The scalar mass
    multiplies the final canvas."""
    nx, ny, nz = pm.Nmesh
    nxp, nyp, nzp = nx + 1, ny + 1, nz + 1
    if C is None:
        C = auto_window_C(nyp, nzp)
    mpad = nxp * nyp * nzp
    W = (mpad + C - 1) // C
    if C % 1024:
        raise ValueError("C must be a multiple of 1024")
    CLh = C // 128
    kernel = functools.partial(_paint_kernel, K=K, C=C, CLh=CLh,
                               nyp=nyp, nzp=nzp)
    paint_call = pl.pallas_call(
        kernel,
        grid=(W, 8),
        in_specs=[
            pl.BlockSpec((1, 8, 2), lambda w, o: (w, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((CLh, 128), lambda w, o: (w, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 1, K + 128), jnp.int32),
            pltpu.VMEM((2, 1, K + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        out_shape=jax.ShapeDtypeStruct((W * CLh, 128), jnp.float32),
        interpret=interpret,
    )

    def paint_from(prepared, mass=1.0):
        padded = paint_call(prepared["ranges"], prepared["cell_2d"],
                            prepared["w8T"]).reshape(-1)[:mpad]
        padded = padded.reshape(nxp, nyp, nzp)
        canvas = padded[:nx, :ny, :nz]
        canvas = canvas.at[0, :, :].add(padded[nx, :ny, :nz])
        canvas = canvas.at[:, 0, :].add(padded[:nx, ny, :nz])
        canvas = canvas.at[:, :, 0].add(padded[:nx, :ny, nz])
        canvas = canvas.at[0, 0, :].add(padded[nx, ny, :nz])
        canvas = canvas.at[0, :, 0].add(padded[nx, :ny, nz])
        canvas = canvas.at[:, 0, 0].add(padded[:nx, ny, nz])
        canvas = canvas.at[0, 0, 0].add(padded[nx, ny, nz])
        if not (jnp.ndim(mass) == 0 and isinstance(mass, float)
                and mass == 1.0):
            canvas = canvas * mass
        return canvas

    return paint_from


def make_prepare_homed_fn(shape, C: int | None = None,
                          pad_to: int = DEFAULT_KD,
                          base_only: bool = False,
                          presorted: bool = False):
    """Prepared-bundle builder for the HOMED local slab (open x axis,
    periodic y/z): input is the precomputed (relx, iy, iz, frac) of
    parallel.psolver._cic_rel, so the cell math is bit-identical to the
    XLA homed paint. shape = (nx_local, Ny, Nz); the padded canvas is
    (nx_local + 1, Ny + 1, Nz + 1) and the x face is NOT folded.

    base_only: offset-0-only range table (see make_prepare_fn) --
    valid when the bundle feeds the from8 homed kernels only.

    presorted: the rows are ALREADY in extended-cell sorted order (the
    caller sorted the particle columns through the cell key -- the
    order-free homed carry, psolver._force_local_homed_carry): skip
    the sort and emit orig=None, so the readout returns values aligned
    with the caller's sorted rows and the un-sort payload sort
    disappears."""
    nx, ny, nz = shape
    nyp, nzp = ny + 1, nz + 1
    if C is None:
        # eight=False: the from4 homed trio shares this window choice
        # (the from8 trio passes the eight=True C explicitly)
        C = auto_window_C(nyp, nzp, eight=False)
    mpad = (nx + 1) * nyp * nzp
    W = (mpad + C - 1) // C
    offsets = ((0,) if base_only
               else _corner_offsets_padded(nyp, nzp))
    min_pad = pad_to - 256

    def prepare(relx, iy, iz, frac, mass=None):
        """mass (optional, per-particle): adds a mass-weighted corner
        table 'w8T_m' to the bundle so per-particle-mass species (ncdm
        FD splits) deposit through the Pallas paint instead of falling
        back to XLA scatter; the mass-FREE 'w8T' still serves the
        readout (gravity weights are per-field, not per-mass)."""
        n = relx.shape[0]
        cell = ((relx * nyp + iy) * nzp + iz)
        if presorted:
            cell_s, fx, fy, fz = (cell, frac[:, 0], frac[:, 1],
                                  frac[:, 2])
            m_s = (None if mass is None
                   else mass.astype(jnp.float32))
            orig = None
        elif mass is None:
            iota = jnp.arange(n, dtype=jnp.int32)
            cell_s, fx, fy, fz, orig = jax.lax.sort(
                (cell, frac[:, 0], frac[:, 1], frac[:, 2], iota),
                num_keys=1)
            m_s = None
        else:
            iota = jnp.arange(n, dtype=jnp.int32)
            cell_s, fx, fy, fz, m_s, orig = jax.lax.sort(
                (cell, frac[:, 0], frac[:, 1], frac[:, 2],
                 mass.astype(jnp.float32), iota), num_keys=1)
        f = (fx, fy, fz)
        t = (1.0 - fx, 1.0 - fy, 1.0 - fz)
        w8_s = jnp.stack([(t[0], f[0])[dx] * (t[1], f[1])[dy]
                          * (t[2], f[2])[dz]
                          for dx in (0, 1) for dy in (0, 1)
                          for dz in (0, 1)], axis=-1)

        n_padded = ((n + min_pad + pad_to - 1) // pad_to) * pad_to
        extra = n_padded - n
        cell_2d = jnp.concatenate(
            [cell_s, jnp.full((extra,), mpad - 1, jnp.int32)])[None, :]

        def pack8(w8):
            return jnp.concatenate(
                [w8.T, jnp.zeros((8, extra), jnp.float32)],
                axis=1)[:, None, :]

        edges = jnp.arange(W + 1, dtype=jnp.int32) * C
        bounds = jnp.stack(
            [jnp.searchsorted(cell_s, edges - off).astype(jnp.int32)
             for off in offsets], axis=1)
        ranges = jnp.stack([bounds[:-1], bounds[1:]], axis=-1)
        w8T = pack8(w8_s)
        out = dict(ranges=ranges, cell_2d=cell_2d, w8T=w8T,
                   cw9=pack_cw9(cell_2d, w8T), orig=orig, n=n)
        if m_s is not None:
            # key PRESENCE is the static flag (a bool leaf would trace)
            out["w8T_m"] = pack8(w8_s * m_s[:, None])
            out["cw9_m"] = pack_cw9(cell_2d, out["w8T_m"])
        return out

    return prepare


def _paint_kernel4(ranges_ref,      # SMEM (1, 2, 2) i32: [p] -> (s, e)
                   cell_hbm,        # (1, Npad) i32 sorted padded cells
                   w8T_hbm,         # (8, 1, Npad) f32 corner weights
                   out_ref,         # VMEM (CLh, 128) window block (piped)
                   tail_ref,        # VMEM (HR, 128) final halo tail
                   acc_scratch,     # VMEM (CLh+HR, 128) f32 window acc
                   carry_scratch,   # VMEM (HR, 128) f32 inter-window halo
                   cell_scratch,    # VMEM (2, 1, K) i32
                   w_scratch,       # VMEM (2, 4, 1, K) f32
                   sems,            # DMA sems (2, 2): cell, w8
                   *, K, C, CLh, HR, nyp, nzp):
    """4-corners-per-pass deposit: each pass p = dx scatters the corner
    quadruple delta = (0, 1, nzp, nzp+1) into one halo'd accumulator.

    Windows overlap by HR halo rows; instead of read-modify-writing the
    padded canvas, the halo tail rides in a VMEM carry into the next
    window's accumulator (requires HR <= CLh so only adjacent windows
    overlap). Every window then writes its CLh rows EXACTLY ONCE
    through a pipelined output BlockSpec -- no canvas reads, no manual
    output DMA. The final window's tail lands in tail_ref."""
    w = pl.program_id(0)
    nw = pl.num_programs(0)
    base_window = w * C
    hi_row3 = jax.lax.broadcasted_iota(jnp.int32, (CLh + HR, 3 * K), 0)
    lo_row = jax.lax.broadcasted_iota(jnp.int32, (128, K), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    deltas = (0, 1, nzp, nzp + 1)

    acc_scratch[...] = jnp.zeros_like(acc_scratch)
    # the previous window's halo tail contributes to our head rows
    @pl.when(w > 0)
    def _take_carry():
        acc_scratch[0:HR] = acc_scratch[0:HR] + carry_scratch[...]

    for p in range(2):
        base_off = p * nyp * nzp
        s = ranges_ref[0, p, 0]
        e = ranges_ref[0, p, 1]
        j0 = s // K
        j1 = jax.lax.div(e + K - 1, K)
        nrounds = jnp.maximum(j1 - j0, 0)
        base_target = base_window - base_off

        def make_in_copies(slot, r, j0=j0, p=p):
            start = pl.multiple_of((j0 + r) * K, 128)
            return [pltpu.make_async_copy(
                        cell_hbm.at[:, pl.ds(start, K)],
                        cell_scratch.at[slot], sems.at[slot, 0]),
                    pltpu.make_async_copy(
                        w8T_hbm.at[pl.ds(4 * p, 4), :, pl.ds(start, K)],
                        w_scratch.at[slot], sems.at[slot, 1])]

        @pl.when(nrounds > 0)
        def _run(j0=j0, p=p, s=s, e=e, nrounds=nrounds,
                 base_target=base_target, make_in_copies=make_in_copies):
            for cp in make_in_copies(0, 0):
                cp.start()

            def body(r, carry):
                slot = r % 2
                nxt = (r + 1) % 2

                @pl.when(r + 1 < nrounds)
                def _prefetch():
                    for cp in make_in_copies(nxt, r + 1):
                        cp.start()

                for cp in make_in_copies(slot, r):
                    cp.wait()

                start = (j0 + r) * K
                cells = cell_scratch[slot]
                gidx = start + lane
                valid = (gidx >= s) & (gidx < e)
                rel0 = jnp.where(valid, cells - base_target, -2)
                acc = acc_scratch[...]

                def deposit(acc, A_bf16, B):
                    # the one-hot A is exact in bf16; split the f32
                    # weights into bf16 hi+lo and run two single-pass
                    # dots instead of one 6-pass HIGHEST dot (3x less
                    # MXU work, ~2^-18 relative splitting error). Mask
                    # in f32 first (Mosaic cannot relayout the i1 mask
                    # to bf16 tiling).
                    B_hi = B.astype(jnp.bfloat16)
                    B_lo = (B - B_hi.astype(jnp.float32)
                            ).astype(jnp.bfloat16)
                    return acc + jax.lax.dot_general(
                        A_bf16, B_hi,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + jax.lax.dot_general(
                        A_bf16, B_lo,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                # corner-PAIR sharing: z-adjacent corners (d, d+1)
                # deposit through ONE one-hot with a combined lane
                # mask; the lane-127 crossing of corner d+1 (-> row
                # hi+1, lane 0) goes through a shared fix one-hot (nzp
                # odd: the two pairs never cross for the same
                # particle). Dot-merged (see _paint_kernel8): the
                # pi0|pi1|fix one-hots and weight matrices concatenate
                # along the contraction, so the whole round is ONE
                # hi/lo dot pair.
                his, crossings, w_cross = [], [], None
                Bs = []
                for pi, d in enumerate((0, nzp)):
                    rel = jnp.where(valid, rel0 + d, -1)
                    hi = rel >> 7
                    lo = rel & 127
                    his.append(hi)
                    cross = (lo == 127) & valid
                    crossings.append(cross)
                    # lo+1 == 128 matches no lane: crossing columns
                    # fall out of B automatically
                    Bs.append(jnp.where(lo == lo_row,
                                        w_scratch[slot, 2 * pi], 0.0)
                              + jnp.where(lo + 1 == lo_row,
                                          w_scratch[slot, 2 * pi + 1],
                                          0.0))
                    wc = jnp.where(cross, w_scratch[slot, 2 * pi + 1],
                                   0.0)
                    w_cross = wc if w_cross is None else w_cross + wc
                hifix = jnp.where(
                    crossings[0], his[0] + 1,
                    jnp.where(crossings[1], his[1] + 1, -1))
                hi_cat = jnp.concatenate([his[0], his[1], hifix],
                                         axis=1)          # (1, 3K)
                A3 = (hi_row3 == hi_cat).astype(jnp.bfloat16)
                Bs.append(jnp.where(lo_row == 0, w_cross, 0.0))
                B_cat = jnp.concatenate(Bs, axis=1)       # (128, 3K)
                acc = deposit(acc, A3, B_cat)
                acc_scratch[...] = acc
                return carry

            jax.lax.fori_loop(0, nrounds, body, 0)

    # emit this window's CLh rows once; pass the halo tail forward
    out_ref[...] = acc_scratch[0:CLh]
    carry_scratch[...] = acc_scratch[CLh:CLh + HR]
    tail_ref[...] = acc_scratch[CLh:CLh + HR]
    del nw


def make_paint_from4_fn(pm: PM, K: int = 512, C: int | None = None,
                        interpret=False):
    """paint_from with the 4-corners-per-pass kernel."""
    nx, ny, nz = pm.Nmesh
    nxp, nyp, nzp = nx + 1, ny + 1, nz + 1
    if C is None:
        # eight=True: must match make_prepare_fn's window choice (the
        # bundles are shared with the from8 kernels)
        C = auto_window_C(nyp, nzp)
    mpad = nxp * nyp * nzp
    W = (mpad + C - 1) // C
    if C % 1024:
        raise ValueError("C must be a multiple of 1024")
    if K % 128:
        raise ValueError("K must be a multiple of 128")
    CLh = C // 128
    HR = window_halo_rows(nyp, nzp, eight=False)
    if HR > CLh:
        raise ValueError("halo rows exceed the window (HR <= CLh "
                         "required by the paint carry)")
    npad_blocks = W * CLh + HR
    kernel = functools.partial(_paint_kernel4, K=K, C=C, CLh=CLh,
                               HR=HR, nyp=nyp, nzp=nzp)

    paint_call = pl.pallas_call(
        kernel,
        grid=(W,),
        in_specs=[
            pl.BlockSpec((1, 2, 2), lambda w: (w, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((CLh, 128), lambda w: (w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HR, 128), lambda w: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((CLh + HR, 128), jnp.float32),
            pltpu.VMEM((HR, 128), jnp.float32),
            pltpu.VMEM((2, 1, K), jnp.int32),
            pltpu.VMEM((2, 4, 1, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        out_shape=(jax.ShapeDtypeStruct((W * CLh, 128), jnp.float32),
                   jax.ShapeDtypeStruct((HR, 128), jnp.float32)),
        interpret=interpret,
    )

    def paint_from(prepared, mass=1.0):
        ranges2 = prepared["ranges"][:, (0, 4), :]
        main, tail = paint_call(ranges2, prepared["cell_2d"],
                                prepared["w8T"])
        padded = jnp.concatenate([main, tail]).reshape(-1)[:mpad]
        padded = padded.reshape(nxp, nyp, nzp)
        canvas = padded[:nx, :ny, :nz]
        canvas = canvas.at[0, :, :].add(padded[nx, :ny, :nz])
        canvas = canvas.at[:, 0, :].add(padded[:nx, ny, :nz])
        canvas = canvas.at[:, :, 0].add(padded[:nx, :ny, nz])
        canvas = canvas.at[0, 0, :].add(padded[nx, ny, :nz])
        canvas = canvas.at[0, :, 0].add(padded[nx, :ny, nz])
        canvas = canvas.at[:, 0, 0].add(padded[:nx, ny, nz])
        canvas = canvas.at[0, 0, 0].add(padded[nx, ny, nz])
        if not (jnp.ndim(mass) == 0 and isinstance(mass, float)
                and mass == 1.0):
            canvas = canvas * mass
        return canvas

    return paint_from


def make_paint_from8_homed_fn(shape, K: int = 512,
                              KD: int = DEFAULT_KD,
                              C: int | None = None,
                              interpret=False, vma=None,
                              open_y: bool = False):
    """Homed-slab paint with the ONE-pass 8-corner kernel
    (_paint_kernel8): the from8 analog of make_paint_from4_homed_fn.
    Returns the (nx_local + 1, Ny, Nz) extended canvas (open x; with
    open_y also the +1 y plane) with only the periodic faces folded.
    Consumes bundles from make_prepare_homed_fn(shape, C=<same C>);
    only offset row 0 of the range table is used (base_only bundles
    are valid)."""
    nx, ny, nz = shape
    nxp, nyp, nzp = nx + 1, ny + 1, nz + 1
    if C is None:
        C = auto_window_C(nyp, nzp, eight=True)
    mpad = nxp * nyp * nzp
    W = (mpad + C - 1) // C
    if C % 1024:
        raise ValueError("C must be a multiple of 1024")
    if K % 128:
        raise ValueError("K must be a multiple of 128")
    CLh = C // 128
    HR = window_halo_rows(nyp, nzp, eight=False)
    if HR > CLh:
        raise ValueError("halo rows exceed the window (HR <= CLh "
                         "required by the paint carry)")
    if KD % K or KD % 128:
        raise ValueError("KD must be a multiple of K and 128")
    kernel = functools.partial(_paint_kernel8, K=K, KD=KD, C=C, CLh=CLh,
                               HR=HR, nyp=nyp, nzp=nzp, SUBR=None)

    def sds(shape_):
        if vma is None:
            return jax.ShapeDtypeStruct(shape_, jnp.float32)
        return jax.ShapeDtypeStruct(shape_, jnp.float32,
                                    vma=frozenset(vma))

    paint_call = pl.pallas_call(
        kernel,
        grid=(W,),
        in_specs=[
            pl.BlockSpec((1, 2, 128), lambda w: (0, 0, w // 128),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((CLh, 128), lambda w: (w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CLh, 128), lambda w: (w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HR, 128), lambda w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HR, 128), lambda w: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CLh + HR, 128), jnp.float32),
            pltpu.VMEM((2, HR, 128), jnp.float32),
            pltpu.VMEM((2, 9, 1, KD), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=(sds((W * CLh, 128)), sds((W * CLh, 128)),
                   sds((HR, 128)), sds((HR, 128))),
        interpret=interpret,
    )

    xshift = nyp * nzp

    def paint_from(prepared, mass=1.0):
        ranges1 = ranges_lane_major(prepared)[0:1]      # (1, 2, W)
        if "w8T_m" in prepared:
            cw9 = prepared.get("cw9_m")
            if cw9 is None:
                cw9 = pack_cw9(prepared["cell_2d"], prepared["w8T_m"])
        else:
            cw9 = prepared.get("cw9")
            if cw9 is None:
                cw9 = pack_cw9(prepared["cell_2d"], prepared["w8T"])
        mainA, mainB, tailA, tailB = paint_call(ranges1, cw9)
        flatA = jnp.concatenate([mainA, tailA]).reshape(-1)
        flatB = jnp.concatenate([mainB, tailB]).reshape(-1)
        # stream B's deposits live at cell + nyp*nzp (the dx=1 plane)
        padded = (flatA[:mpad]
                  + jnp.concatenate(
                      [jnp.zeros((xshift,), jnp.float32),
                       flatB[:mpad - xshift]]))
        padded = padded.reshape(nxp, nyp, nzp)
        if open_y:
            canvas = padded[:, :, :nz]      # keep all x AND y planes
            canvas = canvas.at[:, :, 0].add(padded[:, :, nz])
        else:
            canvas = padded[:, :ny, :nz]    # keep all x planes
            canvas = canvas.at[:, 0, :].add(padded[:, ny, :nz])
            canvas = canvas.at[:, :, 0].add(padded[:, :ny, nz])
            canvas = canvas.at[:, 0, 0].add(padded[:, ny, nz])
        if not (jnp.ndim(mass) == 0 and isinstance(mass, float)
                and mass == 1.0):
            canvas = canvas * mass
        return canvas

    return paint_from


def _paint_kernel8(ranges_ref,      # SMEM (1, 2, 128) i32 lane w%128
                   cw9_hbm,         # (9, 1, Npad) f32 packed cell+w8
                   outA_ref,        # VMEM (CLh, 128) dx=0 stream (piped)
                   outB_ref,        # VMEM (CLh, 128) dx=1 stream (piped)
                   tailA_ref,       # VMEM (HR, 128) final dx=0 halo tail
                   tailB_ref,       # VMEM (HR, 128) final dx=1 halo tail
                   acc_scratch,     # VMEM (2, CLh+HR, 128) f32 streams
                   carry_scratch,   # VMEM (2, HR, 128) f32 halo carries
                   cw_scratch,      # VMEM (2, 9, 1, KD) f32 packed
                   sems,            # DMA sems (2,): packed chunk
                   *, K, KD, C, CLh, HR, nyp, nzp, SUBR=None):
    """ONE-pass 8-corner deposit: each particle is visited once (the
    base-cell range of window w) and scatters into TWO accumulator
    streams -- stream 0 takes the dx=0 corner quadruple at rel =
    cell - w*C, stream 1 takes the dx=1 quadruple at the SAME rel
    (semantically shifted by +nyp*nzp; the caller adds the streams
    with that flat offset in XLA). Halves the particle rounds and the
    cell/weight DMA of the 2-pass kernel (_paint_kernel4) at the cost
    of a second output stream + one shifted add.

    Particle traffic streams as ONE packed (9, 1, KD) super-chunk DMA
    (pack_cw9: row 0 = bitcast cells, rows 1..8 = corner weights) with
    KD/K inner compute sub-rounds -- one DMA issue+wait per KD lanes
    instead of two per K, attacking the measured per-round sync term
    (BENCH_NOTES round 3: b ~ 3.9 us/round)."""
    w = pl.program_id(0)
    lo_row = jax.lax.broadcasted_iota(jnp.int32, (128, K), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    base_window = w * C
    SUB = KD // K

    acc_scratch[...] = jnp.zeros_like(acc_scratch)
    @pl.when(w > 0)
    def _take_carry():
        acc_scratch[:, 0:HR] = acc_scratch[:, 0:HR] + carry_scratch[...]

    wl = jax.lax.rem(w, 128)
    s = ranges_ref[0, 0, wl]
    e = ranges_ref[0, 1, wl]
    j0 = s // KD
    j1 = jax.lax.div(e + KD - 1, KD)
    nrounds = jnp.maximum(j1 - j0, 0)

    def make_in_copies(slot, r):
        start = pl.multiple_of((j0 + r) * KD, 128)
        return [pltpu.make_async_copy(
                    cw9_hbm.at[:, :, pl.ds(start, KD)],
                    cw_scratch.at[slot], sems.at[slot])]

    @pl.when(nrounds > 0)
    def _run():
        for cp in make_in_copies(0, 0):
            cp.start()

        def body(r, carry):
            slot = r % 2
            nxt = (r + 1) % 2

            @pl.when(r + 1 < nrounds)
            def _prefetch():
                for cp in make_in_copies(nxt, r + 1):
                    cp.start()

            for cp in make_in_copies(slot, r):
                cp.wait()

            sstart = (j0 + r) * KD
            for sub in range(SUB):
                _sub_round(slot, sstart + sub * K, sub)
            return carry

        def _sub_round(slot, start, sub):
            ksl = pl.ds(sub * K, K)
            cells = jax.lax.bitcast_convert_type(
                cw_scratch[slot, 0, :, ksl], jnp.int32)
            w_rows = [cw_scratch[slot, 1 + i, :, ksl] for i in range(8)]
            gidx = start + lane
            valid = (gidx >= s) & (gidx < e)
            rel0 = jnp.where(valid, cells - base_window, -2)

            def do_round(R_A, base8):
                """One deposit round over an accumulator row window of
                R_A rows at base8 (8-aligned; 0 = full width).
                rel/hi/lo/crossing/A are shared by the two streams --
                only the weight rows differ (rows 4*dx + 2*pi + dz).

                Dot-merged: the two one-hot deposits (pi=0, pi=1)
                concatenate along the contraction into one (R_A, 2K)
                operand, and the two dx streams' weight matrices
                concatenate along output lanes into (256, 2K), so ONE
                hi/lo dot pair replaces the small dots of the unmerged
                round. The lane-127 crossing fix rides a SEPARATE
                skinny dot: its deposits land only in lane 0 of rows
                hifix, so a (R_A, K) x (2, K) dot -> (R_A, 2) column
                add replaces a full (R_A, K)-section of the merged
                contraction (24 -> 20 MXU tiles per hi/lo pass) and
                deletes the (128, K) lane-0 B masks."""
                his, crossings = [], []
                for pi, d in enumerate((0, nzp)):
                    rel = jnp.where(valid, rel0 + d, -1)
                    his.append((rel >> 7) - base8)
                    crossings.append(((rel & 127) == 127) & valid)
                # -1000000: "no fix" sentinel, matches no window row
                hifix = jnp.where(
                    crossings[0], his[0] + 1,
                    jnp.where(crossings[1], his[1] + 1, -1000000))
                hi_cat = jnp.concatenate([his[0], his[1]],
                                         axis=1)          # (1, 2K)
                sub_row2 = jax.lax.broadcasted_iota(
                    jnp.int32, (R_A, 2 * K), 0)
                A2 = (sub_row2 == hi_cat).astype(jnp.bfloat16)
                sub_rowf = jax.lax.broadcasted_iota(
                    jnp.int32, (R_A, K), 0)
                Af = (sub_rowf == hifix).astype(jnp.bfloat16)
                los = [jnp.where(valid, rel0 + d, -1) & 127
                       for d in (0, nzp)]
                Me = [l == lo_row for l in los]
                Mo = [l + 1 == lo_row for l in los]

                row0 = base8 if isinstance(base8, int) \
                    else pl.multiple_of(base8, 8)
                B_dx, Bf_dx = [], []
                for dx in range(2):
                    w_cross = None
                    Bs = []
                    for pi in range(2):
                        Bs.append(
                            jnp.where(Me[pi],
                                      w_rows[4 * dx + 2 * pi],
                                      0.0)
                            + jnp.where(Mo[pi],
                                        w_rows[4 * dx + 2 * pi + 1],
                                        0.0))
                        wc = jnp.where(crossings[pi],
                                       w_rows[4 * dx + 2 * pi + 1],
                                       0.0)
                        w_cross = wc if w_cross is None else w_cross + wc
                    B_dx.append(jnp.concatenate(Bs, axis=1))  # (128,2K)
                    Bf_dx.append(w_cross)                     # (1, K)
                B_cat = jnp.concatenate(B_dx, axis=0)         # (256,2K)
                Bf_cat = jnp.concatenate(Bf_dx, axis=0)       # (2, K)
                # bf16 hi/lo split: one-hot A exact in bf16, two
                # single-pass dots instead of a 6-pass HIGHEST dot
                B_hi = B_cat.astype(jnp.bfloat16)
                B_lo = (B_cat - B_hi.astype(jnp.float32)
                        ).astype(jnp.bfloat16)
                Bf_hi = Bf_cat.astype(jnp.bfloat16)
                Bf_lo = (Bf_cat - Bf_hi.astype(jnp.float32)
                         ).astype(jnp.bfloat16)
                res = jax.lax.dot_general(
                    A2, B_hi,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    A2, B_lo,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                          # (R_A, 256)
                resf = jax.lax.dot_general(
                    Af, Bf_hi,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    Af, Bf_lo,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                          # (R_A, 2)
                for dx in range(2):
                    acc_scratch[dx, pl.ds(row0, R_A)] = (
                        acc_scratch[dx, pl.ds(row0, R_A)]
                        + res[:, 128 * dx:128 * (dx + 1)])
                    acc_scratch[dx, pl.ds(row0, R_A), 0:1] = (
                        acc_scratch[dx, pl.ds(row0, R_A), 0:1]
                        + resf[:, dx:dx + 1])

            @pl.when((start < e) & (start + K > s))
            def _overlap():
                if SUBR is not None and SUBR < CLh + HR:
                    # dynamic row window (see _readout_kernel8): deposit
                    # dots shrink from (CLh+HR, K) to (SUBR, K); sparse
                    # chunks overflowing the window take the full path
                    row_lo = jnp.min(jnp.where(valid, rel0,
                                               C + nzp)) >> 7
                    # +1 row: the lane-127 fix writes hi+1
                    row_hi = ((jnp.max(jnp.where(valid, rel0, 0))
                               + nzp) >> 7) + 1
                    base8 = jnp.clip(row_lo & ~7, 0, CLh + HR - SUBR)
                    fits = row_hi - base8 < SUBR

                    @pl.when(fits)
                    def _fast():
                        do_round(SUBR, base8)

                    @pl.when(jnp.logical_not(fits))
                    def _slow():
                        do_round(CLh + HR, 0)
                else:
                    do_round(CLh + HR, 0)

        jax.lax.fori_loop(0, nrounds, body, 0)

    outA_ref[...] = acc_scratch[0, 0:CLh]
    outB_ref[...] = acc_scratch[1, 0:CLh]
    carry_scratch[...] = acc_scratch[:, CLh:CLh + HR]
    tailA_ref[...] = acc_scratch[0, CLh:CLh + HR]
    tailB_ref[...] = acc_scratch[1, CLh:CLh + HR]


def paint8_geometry(pm: PM, C: int = 8192):
    """Accumulator-window geometry of the 8-corner paint kernel:
    (CLh, HR). Single source of truth for the stale stepper's
    safe-span check (ops/stale.py)."""
    nyp, nzp = pm.Nmesh[1] + 1, pm.Nmesh[2] + 1
    CLh = C // 128
    return CLh, window_halo_rows(nyp, nzp, eight=False)


def make_paint_from8_fn(pm: PM, K: int = 512, KD: int = DEFAULT_KD,
                        C: int | None = None,
                        interpret=False, subr: int | None = None):
    """paint_from with the ONE-pass 8-corner kernel (_paint_kernel8).
    Consumes the same prepared bundle as the 2-pass variant; only
    offset row 0 of the range table is used. Particle traffic streams
    through the packed cw9 operand in KD-lane super-chunk DMAs."""
    nx, ny, nz = pm.Nmesh
    nxp, nyp, nzp = nx + 1, ny + 1, nz + 1
    if C is None:
        C = auto_window_C(nyp, nzp)
    mpad = nxp * nyp * nzp
    W = (mpad + C - 1) // C
    if C % 1024:
        raise ValueError("C must be a multiple of 1024")
    if K % 128:
        raise ValueError("K must be a multiple of 128")
    if KD % K or KD % 128:
        raise ValueError("KD must be a multiple of K and 128")
    CLh, HR = paint8_geometry(pm, C)
    if HR > CLh:
        raise ValueError("halo rows exceed the window (HR <= CLh "
                         "required by the paint carry)")
    if subr is not None and subr % 8:
        raise ValueError("subr must be a multiple of 8")
    kernel = functools.partial(_paint_kernel8, K=K, KD=KD, C=C, CLh=CLh,
                               HR=HR, nyp=nyp, nzp=nzp, SUBR=subr)

    paint_call = pl.pallas_call(
        kernel,
        grid=(W,),
        in_specs=[
            pl.BlockSpec((1, 2, 128), lambda w: (0, 0, w // 128),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((CLh, 128), lambda w: (w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CLh, 128), lambda w: (w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HR, 128), lambda w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HR, 128), lambda w: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CLh + HR, 128), jnp.float32),
            pltpu.VMEM((2, HR, 128), jnp.float32),
            pltpu.VMEM((2, 9, 1, KD), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=(jax.ShapeDtypeStruct((W * CLh, 128), jnp.float32),
                   jax.ShapeDtypeStruct((W * CLh, 128), jnp.float32),
                   jax.ShapeDtypeStruct((HR, 128), jnp.float32),
                   jax.ShapeDtypeStruct((HR, 128), jnp.float32)),
        interpret=interpret,
    )

    xshift = nyp * nzp

    def paint_from(prepared, mass=1.0):
        ranges1 = ranges_lane_major(prepared)[0:1]      # (1, 2, W)
        cw9 = prepared.get("cw9")
        if cw9 is None:
            cw9 = pack_cw9(prepared["cell_2d"], prepared["w8T"])
        mainA, mainB, tailA, tailB = paint_call(ranges1, cw9)
        flatA = jnp.concatenate([mainA, tailA]).reshape(-1)
        flatB = jnp.concatenate([mainB, tailB]).reshape(-1)
        # stream B's deposits live at cell + nyp*nzp (the dx=1 plane)
        padded = (flatA[:mpad]
                  + jnp.concatenate(
                      [jnp.zeros((xshift,), jnp.float32),
                       flatB[:mpad - xshift]]))
        padded = padded.reshape(nxp, nyp, nzp)
        canvas = padded[:nx, :ny, :nz]
        canvas = canvas.at[0, :, :].add(padded[nx, :ny, :nz])
        canvas = canvas.at[:, 0, :].add(padded[:nx, ny, :nz])
        canvas = canvas.at[:, :, 0].add(padded[:nx, :ny, nz])
        canvas = canvas.at[0, 0, :].add(padded[nx, ny, :nz])
        canvas = canvas.at[0, :, 0].add(padded[nx, :ny, nz])
        canvas = canvas.at[:, 0, 0].add(padded[:nx, ny, nz])
        canvas = canvas.at[0, 0, 0].add(padded[nx, ny, nz])
        if not (jnp.ndim(mass) == 0 and isinstance(mass, float)
                and mass == 1.0):
            canvas = canvas * mass
        return canvas

    return paint_from


def make_paint_from4_homed_fn(shape, K: int = 512, C: int | None = None,
                              interpret=False, vma=None,
                              open_y: bool = False):
    """Homed-slab paint (open x): returns the (nx_local + 1, Ny, Nz)
    extended canvas with the periodic y/z faces folded and the x face
    KEPT (the +1 plane is the halo the caller ppermutes to the right
    neighbor). Consumes bundles from make_prepare_homed_fn(shape).

    open_y=True is the PENCIL-homed variant (2D halo exchange,
    psolver._force_local_homed_pencil_multi): y is an open halo axis
    like x, so the output keeps the +1 y plane too and only the
    periodic z face folds. shape = (nlx + 2Hx, nly + 2Hy, Nz)."""
    nx, ny, nz = shape
    nxp, nyp, nzp = nx + 1, ny + 1, nz + 1
    if C is None:
        C = auto_window_C(nyp, nzp, eight=False)
    mpad = nxp * nyp * nzp
    W = (mpad + C - 1) // C
    if C % 1024:
        raise ValueError("C must be a multiple of 1024")
    if K % 128:
        raise ValueError("K must be a multiple of 128")
    CLh = C // 128
    HR = window_halo_rows(nyp, nzp, eight=False)
    if HR > CLh:
        raise ValueError("halo rows exceed the window (HR <= CLh "
                         "required by the paint carry)")
    kernel = functools.partial(_paint_kernel4, K=K, C=C, CLh=CLh,
                               HR=HR, nyp=nyp, nzp=nzp)

    def sds(shape_):
        if vma is None:
            return jax.ShapeDtypeStruct(shape_, jnp.float32)
        return jax.ShapeDtypeStruct(shape_, jnp.float32,
                                    vma=frozenset(vma))

    paint_call = pl.pallas_call(
        kernel,
        grid=(W,),
        in_specs=[
            pl.BlockSpec((1, 2, 2), lambda w: (w, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((CLh, 128), lambda w: (w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HR, 128), lambda w: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((CLh + HR, 128), jnp.float32),
            pltpu.VMEM((HR, 128), jnp.float32),
            pltpu.VMEM((2, 1, K), jnp.int32),
            pltpu.VMEM((2, 4, 1, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        out_shape=(sds((W * CLh, 128)), sds((HR, 128))),
        interpret=interpret,
    )

    def paint_from(prepared, mass=1.0):
        ranges2 = prepared["ranges"][:, (0, 4), :]
        # a mass-weighted bundle deposits w8 * m (per-particle-mass
        # species); the mass-free w8T still serves the readout
        w8T = prepared.get("w8T_m", prepared["w8T"])
        main, tail = paint_call(ranges2, prepared["cell_2d"], w8T)
        padded = jnp.concatenate([main, tail]).reshape(-1)[:mpad]
        padded = padded.reshape(nxp, nyp, nzp)
        if open_y:
            canvas = padded[:, :, :nz]          # keep all x AND y planes
            canvas = canvas.at[:, :, 0].add(padded[:, :, nz])
        else:
            canvas = padded[:, :ny, :nz]        # keep all x planes
            canvas = canvas.at[:, 0, :].add(padded[:, ny, :nz])
            canvas = canvas.at[:, :, 0].add(padded[:, :ny, nz])
            canvas = canvas.at[:, 0, 0].add(padded[:, ny, nz])
        if not (jnp.ndim(mass) == 0 and isinstance(mass, float)
                and mass == 1.0):
            canvas = canvas * mass
        return canvas

    return paint_from
