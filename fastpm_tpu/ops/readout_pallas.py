"""Sorted windowed CIC readout -- the gather dual of the Pallas paint.

XLA's gather costs ~8 ns per row regardless of batching, so the 3-component
force readout (fastpm_readout_local, painter.c:357-374 called once per
ACC_x/y/z, gravity.c:358-429) costs 3 full gathers -- and the fast
"packed-corner" variant needs an 8x canvas copy (4.3 GB at a 512^3 force
mesh). This kernel removes both costs:

1. (XLA) sort particles by padded base cell carrying (fx, fy, fz, iota);
   compute the paint kernel's per-(window, corner) particle ranges.
2. (Pallas) grid over cell windows; the 3 force canvases' window blocks
   sit in VMEM. For each corner the particle chunks stream through
   double-buffered DMA on an ABSOLUTE K-aligned chunk grid (chunks are
   disjoint within a (window, corner), so value write-backs pipeline
   without read-modify-write hazards; each corner owns its own output
   row, so corners never collide). The gather itself is the MXU
   contraction tmp[l, p] = sum_h block[h, l] A[h, p] with the two-level
   one-hot rel = hi*128 + lo, then a vector select and corner-weight
   multiply.
3. (XLA) sum the 8 corner rows, un-sort once: one extra key sort yields
   the inverse permutation and a single (N, 3) row gather restores
   particle order.

Per particle this costs one sort + one row-gather TOTAL for all three
components instead of three row-gathers plus an 8x packed canvas.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mesh import PM
from .paint_pallas import (_corner_offsets_padded, auto_window_C,
                           ranges_lane_major, window_halo_rows)

__all__ = ["make_readout3_fn", "make_readout3_from_fn",
           "make_readout3_from4_fn", "make_readout3_from8_fn",
           "make_readout3_from4_homed_fn",
           "make_readout3_from8_homed_fn"]


def _readout_kernel(ranges_ref,      # SMEM (1, 8, 2) i32: [o] -> (s, e)
                    cell_hbm,        # (1, Npad) i32 sorted padded cells
                    w8T_hbm,         # (8, 1, Npad) f32 corner weights
                    canvases_ref,    # VMEM (3, CLh, 128) canvas blocks
                    val_io,          # ANY (24, 1, Npad) f32 [o*3+comp],
                                     # aliased out
                    out_ref,         # same buffer as val_io (aliased)
                    cell_scratch,    # VMEM (2, 1, K) i32
                    w_scratch,       # VMEM (2, 1, K) f32
                    val_scratch,     # VMEM (2, 3, 1, K) f32
                    sems,            # DMA sems (2, 5): cell, w, val x3
                    wsems,           # DMA sems (2, 3) write-back per comp
                    *, K, C, CLh, nyp, nzp):
    del val_io
    w = pl.program_id(0)
    base_window = w * C
    hi_row = jax.lax.broadcasted_iota(jnp.int32, (CLh, K), 0)
    lo_row = jax.lax.broadcasted_iota(jnp.int32, (128, K), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

    for o in range(8):
        dx, dy, dz = o >> 2, (o >> 1) & 1, o & 1
        off = (dx * nyp + dy) * nzp + dz
        s = ranges_ref[0, o, 0]
        e = ranges_ref[0, o, 1]
        # absolute K-aligned chunk ids [j0, j1): disjoint, 128-aligned
        j0 = s // K
        j1 = jax.lax.div(e + K - 1, K)
        nrounds = jnp.maximum(j1 - j0, 0)
        base_target = base_window - off

        def make_in_copies(slot, r, j0=j0, o=o):
            start = pl.multiple_of((j0 + r) * K, 128)
            copies = [pltpu.make_async_copy(
                          cell_hbm.at[:, pl.ds(start, K)],
                          cell_scratch.at[slot], sems.at[slot, 0]),
                      pltpu.make_async_copy(
                          w8T_hbm.at[o, :, pl.ds(start, K)],
                          w_scratch.at[slot], sems.at[slot, 1])]
            for comp in range(3):
                copies.append(pltpu.make_async_copy(
                    out_ref.at[o * 3 + comp, :, pl.ds(start, K)],
                    val_scratch.at[slot, comp],
                    sems.at[slot, 2 + comp]))
            return copies

        def make_out_copies(slot, r, j0=j0, o=o):
            start = pl.multiple_of((j0 + r) * K, 128)
            return [pltpu.make_async_copy(
                        val_scratch.at[slot, comp],
                        out_ref.at[o * 3 + comp, :, pl.ds(start, K)],
                        wsems.at[slot, comp])
                    for comp in range(3)]

        @pl.when(nrounds > 0)
        def _run(j0=j0, o=o, s=s, e=e, nrounds=nrounds,
                 base_target=base_target,
                 make_in_copies=make_in_copies,
                 make_out_copies=make_out_copies):
            for cp in make_in_copies(0, 0):
                cp.start()

            def body(r, carry):
                slot = r % 2
                nxt = (r + 1) % 2

                @pl.when(r + 1 < nrounds)
                def _prefetch():
                    # slot `nxt` was written back in round r-1; its
                    # write must land before the value re-read
                    @pl.when(r >= 1)
                    def _drain():
                        for cp in make_out_copies(nxt, r - 1):
                            cp.wait()
                    for cp in make_in_copies(nxt, r + 1):
                        cp.start()

                for cp in make_in_copies(slot, r):
                    cp.wait()

                start = (j0 + r) * K
                cells = cell_scratch[slot]             # (1, K)
                weights = w_scratch[slot]              # (1, K)
                gidx = start + lane
                valid = (gidx >= s) & (gidx < e)
                rel = jnp.where(valid, cells - base_target, -1)
                hi = rel >> 7
                lo = rel & 127
                A = (hi == hi_row).astype(jnp.float32)   # (CLh, K)
                Bm = (lo == lo_row)                      # (128, K)
                for comp in range(3):
                    block = canvases_ref[comp]           # (CLh, 128)
                    tmp = jax.lax.dot_general(
                        block, A,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (128, K)
                    sel = jnp.where(Bm, tmp, 0.0)
                    vals = jnp.sum(sel, axis=0, keepdims=True) * weights
                    val_scratch[slot, comp] = \
                        val_scratch[slot, comp] + vals
                for cp in make_out_copies(slot, r):
                    cp.start()
                return carry

            jax.lax.fori_loop(0, nrounds, body, 0)
            # drain outstanding write-backs before the next corner /
            # window touches these chunks
            for cp in make_out_copies((nrounds - 1) % 2, nrounds - 1):
                cp.wait()

            @pl.when(nrounds > 1)
            def _drain_prev():
                for cp in make_out_copies((nrounds - 2) % 2,
                                          nrounds - 2):
                    cp.wait()


def make_readout3_fn(pm: PM, K: int = 512, C: int = 4096,
                     interpret=False):
    """Build a jitted 3-component readout: (canvas_x, canvas_y, canvas_z,
    pos) -> (N, 3), numerically equivalent to three
    Painter(pm, 'cic').readout calls."""
    nx, ny, nz = pm.Nmesh
    nxp, nyp, nzp = nx + 1, ny + 1, nz + 1
    mpad = nxp * nyp * nzp
    W = (mpad + C - 1) // C
    offsets = _corner_offsets_padded(nyp, nzp)

    if C % 1024:
        raise ValueError("C must be a multiple of 1024 (8x128 tiles)")
    if K % 128:
        raise ValueError("K must be a multiple of 128 (DMA alignment)")
    CLh = C // 128
    kernel = functools.partial(_readout_kernel, K=K, C=C, CLh=CLh,
                               nyp=nyp, nzp=nzp)

    def build_call(n_padded):
        return pl.pallas_call(
            kernel,
            grid=(W,),
            in_specs=[
                pl.BlockSpec((1, 8, 2), lambda w: (w, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((3, CLh, 128), lambda w: (0, w, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, 1, K), jnp.int32),
                pltpu.VMEM((2, 1, K), jnp.float32),
                pltpu.VMEM((2, 3, 1, K), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 5)),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
            out_shape=jax.ShapeDtypeStruct((24, 1, n_padded),
                                           jnp.float32),
            input_output_aliases={4: 0},
            interpret=interpret,
        )

    # numpy, NOT jnp: these builders may be constructed inside a jit
    # trace (gravity._fused_cache); a jnp constant born in one trace
    # and cached leaks into the next (UnexpectedTracerError)
    inv_cell = np.asarray(pm.InvCellSize, dtype=np.float32)
    npad_blocks = W * CLh

    def pad_canvas(canvas):
        """(nx,ny,nz) -> padded (nxp,nyp,nzp) with periodic faces, as
        (W*CLh, 128) blocks."""
        p = jnp.zeros((nxp, nyp, nzp), dtype=jnp.float32)
        p = p.at[:nx, :ny, :nz].set(canvas)
        p = p.at[nx, :ny, :nz].set(canvas[0])
        p = p.at[:nx, ny, :nz].set(canvas[:, 0])
        p = p.at[:nx, :ny, nz].set(canvas[:, :, 0])
        p = p.at[nx, ny, :nz].set(canvas[0, 0])
        p = p.at[nx, :ny, nz].set(canvas[0, :, 0])
        p = p.at[:nx, ny, nz].set(canvas[:, 0, 0])
        p = p.at[nx, ny, nz].set(canvas[0, 0, 0])
        flat = p.reshape(-1)
        flat = jnp.concatenate(
            [flat, jnp.zeros((npad_blocks * 128 - mpad,), jnp.float32)])
        return flat.reshape(npad_blocks, 128)

    def readout3(cx, cy, cz, pos):
        n = pos.shape[0]
        gpos = pos * inv_cell
        base = jnp.floor(gpos).astype(jnp.int32)
        frac = gpos - base
        base = jnp.stack([jnp.remainder(base[:, 0], nx),
                          jnp.remainder(base[:, 1], ny),
                          jnp.remainder(base[:, 2], nz)], axis=-1)
        cell = ((base[:, 0] * nyp + base[:, 1]) * nzp + base[:, 2])

        iota = jnp.arange(n, dtype=jnp.int32)
        cell_s, fx, fy, fz, orig = jax.lax.sort(
            (cell, frac[:, 0], frac[:, 1], frac[:, 2], iota), num_keys=1)
        f = (fx, fy, fz)
        t = (1.0 - fx, 1.0 - fy, 1.0 - fz)
        w8_s = jnp.stack([(t[0], f[0])[dx] * (t[1], f[1])[dy]
                          * (t[2], f[2])[dz]
                          for dx in (0, 1) for dy in (0, 1)
                          for dz in (0, 1)], axis=-1)

        # pad to a whole number of K chunks so absolute chunk DMA never
        # runs past the end; padded rows carry zero weight
        n_padded = ((n + K) // K) * K
        extra = n_padded - n
        cell_sp = jnp.concatenate(
            [cell_s, jnp.full((extra,), mpad - 1, jnp.int32)])
        cell_2d = cell_sp[None, :]
        w8T = jnp.concatenate(
            [w8_s.T, jnp.zeros((8, extra), jnp.float32)],
            axis=1)[:, None, :]

        edges = jnp.arange(W + 1, dtype=jnp.int32) * C
        bounds = jnp.stack(
            [jnp.searchsorted(cell_s, edges - off).astype(jnp.int32)
             for off in offsets], axis=1)
        ranges = jnp.stack([bounds[:-1], bounds[1:]], axis=-1)

        canvases = jnp.stack([pad_canvas(cx), pad_canvas(cy),
                              pad_canvas(cz)])
        val_init = jnp.zeros((24, 1, n_padded), jnp.float32)
        val8 = build_call(n_padded)(ranges, cell_2d, w8T, canvases,
                                    val_init)
        vals = jnp.sum(val8.reshape(8, 3, n_padded), axis=0)[:, :n]

        # un-sort by sorting (orig, values): one payload sort beats
        # the inverse-permutation row gather ~3x on TPU
        return jnp.stack(jax.lax.sort(
            (orig, vals[0], vals[1], vals[2]), num_keys=1)[1:],
            axis=-1)                                # (N, 3)

    return jax.jit(readout3)


def make_readout3_from_fn(pm: PM, K: int = 1024, C: int | None = None,
                          interpret=False):
    """3-component readout from a prepared bundle
    (paint_pallas.make_prepare_fn with the same C): reuses the sort and
    the (window, corner) ranges paid by the paint."""
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
    CLh = C // 128
    npad_blocks = W * CLh
    kernel = functools.partial(_readout_kernel, K=K, C=C, CLh=CLh,
                               nyp=nyp, nzp=nzp)

    def build_call(n_padded):
        return pl.pallas_call(
            kernel,
            grid=(W,),
            in_specs=[
                pl.BlockSpec((1, 8, 2), lambda w: (w, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((3, CLh, 128), lambda w: (0, w, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, 1, K), jnp.int32),
                pltpu.VMEM((2, 1, K), jnp.float32),
                pltpu.VMEM((2, 3, 1, K), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 5)),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
            out_shape=jax.ShapeDtypeStruct((24, 1, n_padded),
                                           jnp.float32),
            input_output_aliases={4: 0},
            interpret=interpret,
        )

    def pad_canvas(canvas):
        p = jnp.zeros((nxp, nyp, nzp), dtype=jnp.float32)
        p = p.at[:nx, :ny, :nz].set(canvas)
        p = p.at[nx, :ny, :nz].set(canvas[0])
        p = p.at[:nx, ny, :nz].set(canvas[:, 0])
        p = p.at[:nx, :ny, nz].set(canvas[:, :, 0])
        p = p.at[nx, ny, :nz].set(canvas[0, 0])
        p = p.at[nx, :ny, nz].set(canvas[0, :, 0])
        p = p.at[:nx, ny, nz].set(canvas[:, 0, 0])
        p = p.at[nx, ny, nz].set(canvas[0, 0, 0])
        flat = p.reshape(-1)
        flat = jnp.concatenate(
            [flat, jnp.zeros((npad_blocks * 128 - mpad,), jnp.float32)])
        return flat.reshape(npad_blocks, 128)

    def readout3_from(prepared, cx, cy, cz):
        n = prepared["n"]               # static even under jit
        n_padded = prepared["cell_2d"].shape[1]
        if n_padded % K:
            raise ValueError("prepared padding not a multiple of K")
        canvases = jnp.stack([pad_canvas(cx), pad_canvas(cy),
                              pad_canvas(cz)])
        val_init = jnp.zeros((24, 1, n_padded), jnp.float32)
        val8 = build_call(n_padded)(
            prepared["ranges"], prepared["cell_2d"], prepared["w8T"],
            canvases, val_init)
        vals = jnp.sum(val8.reshape(8, 3, n_padded), axis=0)[:, :n]
        if prepared.get("orig") is None:
            return jnp.stack([vals[0], vals[1], vals[2]], axis=-1)
        return jnp.stack(jax.lax.sort(
            (prepared["orig"], vals[0], vals[1], vals[2]),
            num_keys=1)[1:], axis=-1)

    return readout3_from


def _readout_kernel4(ranges_ref,     # SMEM (1, 2, 2) i32: [p] -> (s, e)
                     cell_hbm,       # (1, Npad) i32 sorted padded cells
                     w8T_hbm,        # (8, 1, Npad) f32 corner weights
                     canvases_hbm,   # ANY (3, W*CLh + HR, 128)
                     val_io,         # ANY (6, 1, Npad) f32 [p*3+comp]
                     out_ref,        # aliased with val_io
                     canvas_scratch,  # VMEM (2, 3, CLh+HR, 128) dbl-buffered
                     cell_scratch,   # VMEM (2, 1, K) i32
                     w_scratch,      # VMEM (2, 4, 1, K) f32
                     val_scratch,    # VMEM (2, 3, 1, K) f32
                     carry_scratch,  # VMEM (2, 3, 1, K) f32 per-pass carry
                     carry_id,       # SMEM (2,) i32 carried chunk (-1 none)
                     csem,           # DMA sems (2,) canvas per slot
                     sems,           # DMA sems (2, 5): cell, w8
                     wsems,          # DMA sems (2, 3)
                     fsem,           # DMA sems (2,) carry flush
                     *, K, C, CLh, HR, nyp, nzp, gather_mode="split"):
    """4-corners-per-pass variant: pass p = dx handles the corner
    quadruple delta = (0, 1, nzp, nzp+1) against ONE halo'd canvas
    block, so the chunk loop runs 4x fewer rounds than the per-corner
    kernel.

    Value chunks are WRITE-ONLY: per-(window, pass) the chunk ranges
    tile the sorted particle array, so only the boundary chunk is
    shared between consecutive windows -- its partial sums ride in a
    VMEM carry (consumed when the next window's first chunk matches,
    flushed otherwise). This removes the val read DMA and its
    write-after-read hazards from every round."""
    del val_io
    w = pl.program_id(0)
    nw = pl.num_programs(0)
    base_window = w * C
    hi_row3 = jax.lax.broadcasted_iota(jnp.int32, (CLh + HR, 3 * K), 0)
    lo_row = jax.lax.broadcasted_iota(jnp.int32, (128, K), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

    def canvas_copy(slot, wi):
        return pltpu.make_async_copy(
            canvases_hbm.at[:, pl.ds(pl.multiple_of(wi * CLh, 8),
                                     CLh + HR)],
            canvas_scratch.at[slot], csem.at[slot])

    @pl.when(w == 0)
    def _init_carry():
        carry_id[0] = -1
        carry_id[1] = -1
        canvas_copy(0, 0).start()

    # prefetch the NEXT window's canvas block while this one computes;
    # the canvas DMA latency then hides behind the chunk loop
    cslot = jax.lax.rem(w, 2)

    @pl.when(w + 1 < nw)
    def _prefetch_canvas():
        canvas_copy(jax.lax.rem(w + 1, 2), w + 1).start()

    canvas_copy(cslot, w).wait()

    def flush_carry(p):
        """Write the carried chunk of pass p to HBM and clear it."""
        cid = carry_id[p]

        @pl.when(cid >= 0)
        def _go():
            cp = pltpu.make_async_copy(
                carry_scratch.at[p],
                out_ref.at[pl.ds(p * 3, 3), :, pl.ds(cid * K, K)],
                fsem.at[p])
            cp.start()
            cp.wait()

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
                        w8T_hbm.at[pl.ds(4 * p, 4), :,
                                   pl.ds(start, K)],
                        w_scratch.at[slot], sems.at[slot, 1])]

        def make_out_copies(slot, r, j0=j0, p=p):
            start = pl.multiple_of((j0 + r) * K, 128)
            return [pltpu.make_async_copy(
                        val_scratch.at[slot],
                        out_ref.at[pl.ds(p * 3, 3), :, pl.ds(start, K)],
                        wsems.at[slot, 0])]

        @pl.when(nrounds > 0)
        def _run(j0=j0, p=p, s=s, e=e, nrounds=nrounds,
                 base_target=base_target,
                 make_in_copies=make_in_copies,
                 make_out_copies=make_out_copies):
            for cp in make_in_copies(0, 0):
                cp.start()

            # consume the carry if it is this pass's first chunk,
            # flush it otherwise (the ranges tile the sorted array, so
            # an unconsumed carry can never be touched again)
            cid = carry_id[p]

            @pl.when(cid == j0)
            def _consume():
                val_scratch[0] = carry_scratch[p]

            @pl.when((cid >= 0) & (cid != j0))
            def _flush(p=p):
                flush_carry(p)

            @pl.when(cid != j0)
            def _zero0():
                val_scratch[0] = jnp.zeros_like(val_scratch[0])

            carry_id[p] = -1

            def body(r, carry):
                slot = r % 2
                nxt = (r + 1) % 2

                @pl.when(r + 1 < nrounds)
                def _prefetch():
                    @pl.when(r >= 1)
                    def _drain():
                        for cp in make_out_copies(nxt, r - 1):
                            cp.wait()
                    val_scratch[nxt] = jnp.zeros_like(val_scratch[nxt])
                    for cp in make_in_copies(nxt, r + 1):
                        cp.start()

                for cp in make_in_copies(slot, r):
                    cp.wait()

                start = (j0 + r) * K
                cells = cell_scratch[slot]             # (1, K)
                gidx = start + lane
                valid = (gidx >= s) & (gidx < e)
                rel0 = jnp.where(valid, cells - base_target, -2)

                # corner-PAIR sharing: the z-adjacent corner deltas
                # (d, d+1) share one row-gather dot -- corner d+1 reads
                # lane lo+1 of the same tmp. The lane-127 crossing
                # (lo == 127 -> row hi+1, lane 0) is handled by ONE
                # shared fix dot: nzp is odd, so the two pairs never
                # cross for the same particle. 3 dots per comp instead
                # of 4.
                his, los, crossings = [], [], []
                for pi, d in enumerate((0, nzp)):
                    rel = jnp.where(valid, rel0 + d, -1)
                    his.append(rel >> 7)
                    los.append(rel & 127)
                    # invalid lanes have rel = -1 -> lo = 127; they must
                    # NOT take the fix row (their tmp columns are zero)
                    crossings.append(((rel & 127) == 127) & valid)
                hifix = jnp.where(
                    crossings[0], his[0] + 1,
                    jnp.where(crossings[1], his[1] + 1, -1))

                # one-hot and lane masks built ONCE per round and
                # reused by all 3 components (the per-round VPU mask
                # builds, not the DMAs, dominate the b ~ 3.9 us/round
                # sync term measured in BENCH_NOTES). Dot-merged (see
                # _readout_kernel8): q0|q1|fix one-hots concatenate
                # along the contraction, canvas comps along lanes, so
                # one hi/lo gather pair serves the whole round.
                mdt = (jnp.bfloat16 if gather_mode == "split"
                       else jnp.float32)
                hi_cat = jnp.concatenate([his[0], his[1], hifix],
                                         axis=1)          # (1, 3K)
                A3 = (hi_row3 == hi_cat).astype(mdt)
                Me = [l == lo_row for l in los]
                Mo = [l + 1 == lo_row for l in los]

                def gather(b_hi, b_lo, A):
                    if gather_mode == "split":
                        return jax.lax.dot_general(
                            b_hi, A,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ) + jax.lax.dot_general(
                            b_lo, A,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    return jax.lax.dot_general(
                        b_hi, A,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=(jax.lax.Precision.HIGHEST
                                   if gather_mode == "highest"
                                   else jax.lax.Precision.HIGH))

                block = jnp.concatenate(
                    [canvas_scratch[cslot, comp] for comp in range(3)],
                    axis=1)                       # (CLh+HR, 384)
                if gather_mode == "split":
                    b_hi = block.astype(jnp.bfloat16)
                    b_lo = (block - b_hi.astype(jnp.float32)
                            ).astype(jnp.bfloat16)
                else:
                    b_hi, b_lo = block, None
                res = gather(b_hi, b_lo, A3)      # (384, 3K)
                for comp in range(3):
                    fixrow = res[128 * comp:128 * comp + 1,
                                 2 * K:3 * K]     # lane 0 of comp
                    acc = None
                    for pi in range(2):
                        tmp = res[128 * comp:128 * (comp + 1),
                                  K * pi:K * (pi + 1)]
                        v_even = jnp.sum(
                            jnp.where(Me[pi], tmp, 0.0),
                            axis=0, keepdims=True)
                        # lo+1 == 128 matches no lane: crossing columns
                        # contribute 0 here and take the fix row instead
                        v_odd = jnp.sum(
                            jnp.where(Mo[pi], tmp, 0.0),
                            axis=0, keepdims=True)
                        v_odd = v_odd + jnp.where(crossings[pi],
                                                  fixrow, 0.0)
                        v = (v_even * w_scratch[slot, 2 * pi]
                             + v_odd * w_scratch[slot, 2 * pi + 1])
                        acc = v if acc is None else acc + v
                    val_scratch[slot, comp] = \
                        val_scratch[slot, comp] + acc

                # completed chunks are written back (write-only, no
                # hazard: chunks within a pass are disjoint); the LAST
                # chunk is held in the carry for the next window
                @pl.when(r + 1 < nrounds)
                def _writeback():
                    for cp in make_out_copies(slot, r):
                        cp.start()

                @pl.when(r + 1 == nrounds)
                def _hold(p=p):
                    carry_scratch[p] = val_scratch[slot]
                    carry_id[p] = j0 + r
                return carry

            jax.lax.fori_loop(0, nrounds, body, 0)
            # drain the last started write-back (round nrounds-2); all
            # earlier ones were drained by the prefetch steps
            @pl.when(nrounds > 1)
            def _drain_last():
                for cp in make_out_copies((nrounds - 2) % 2,
                                          nrounds - 2):
                    cp.wait()

    # final window: flush both passes' carries
    @pl.when(w == nw - 1)
    def _final_flush():
        for p in range(2):
            flush_carry(p)


def make_readout3_from4_fn(pm: PM, K: int = 512, C: int | None = None,
                           interpret=False, gather_mode="split"):
    """readout3_from with the 4-corners-per-pass kernel.

    gather_mode: 'split' (bf16 hi/lo two-pass gather, default),
    'high' or 'highest' (f32 emulated matmul at that precision)."""
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
    CLh = C // 128
    # halo rows covering delta up to nzp+1 (multiple of 8 for tiling)
    HR = window_halo_rows(nyp, nzp, eight=False)
    npad_blocks = W * CLh + HR
    kernel = functools.partial(_readout_kernel4, K=K, C=C, CLh=CLh,
                               HR=HR, nyp=nyp, nzp=nzp,
                               gather_mode=gather_mode)

    def build_call(n_padded):
        return pl.pallas_call(
            kernel,
            grid=(W,),
            in_specs=[
                pl.BlockSpec((1, 2, 2), lambda w: (w, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, 3, CLh + HR, 128), jnp.float32),
                pltpu.VMEM((2, 1, K), jnp.int32),
                pltpu.VMEM((2, 4, 1, K), jnp.float32),
                pltpu.VMEM((2, 3, 1, K), jnp.float32),
                pltpu.VMEM((2, 3, 1, K), jnp.float32),
                pltpu.SMEM((2,), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2, 5)),
                pltpu.SemaphoreType.DMA((2, 3)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            out_shape=jax.ShapeDtypeStruct((6, 1, n_padded),
                                           jnp.float32),
            input_output_aliases={4: 0},
            interpret=interpret,
        )

    def pad_canvas(canvas):
        p = jnp.zeros((nxp, nyp, nzp), dtype=jnp.float32)
        p = p.at[:nx, :ny, :nz].set(canvas)
        p = p.at[nx, :ny, :nz].set(canvas[0])
        p = p.at[:nx, ny, :nz].set(canvas[:, 0])
        p = p.at[:nx, :ny, nz].set(canvas[:, :, 0])
        p = p.at[nx, ny, :nz].set(canvas[0, 0])
        p = p.at[nx, :ny, nz].set(canvas[0, :, 0])
        p = p.at[:nx, ny, nz].set(canvas[:, 0, 0])
        p = p.at[nx, ny, nz].set(canvas[0, 0, 0])
        flat = p.reshape(-1)
        flat = jnp.concatenate(
            [flat, jnp.zeros((npad_blocks * 128 - mpad,), jnp.float32)])
        return flat.reshape(npad_blocks, 128)

    def readout3_from(prepared, cx, cy, cz):
        n = prepared["n"]
        n_padded = prepared["cell_2d"].shape[1]
        if n_padded % K:
            raise ValueError("prepared padding not a multiple of K")
        # pass p = dx uses the base corner o = 4p range
        ranges2 = prepared["ranges"][:, (0, 4), :]
        canvases = jnp.stack([pad_canvas(cx), pad_canvas(cy),
                              pad_canvas(cz)])
        val_init = jnp.zeros((6, 1, n_padded), jnp.float32)
        val2 = build_call(n_padded)(
            ranges2, prepared["cell_2d"], prepared["w8T"],
            canvases, val_init)
        vals = jnp.sum(val2.reshape(2, 3, n_padded), axis=0)[:, :n]
        if prepared.get("orig") is None:
            # order-free bundle (make_prepare_carry_fn): values are
            # already aligned with the caller's sorted particle order
            return jnp.stack([vals[0], vals[1], vals[2]], axis=-1)
        return jnp.stack(jax.lax.sort(
            (prepared["orig"], vals[0], vals[1], vals[2]),
            num_keys=1)[1:], axis=-1)

    return readout3_from


def make_readout3_from8_homed_fn(shape, K: int = 512,
                                 KD: int | None = None,
                                 C: int | None = None,
                                 interpret=False, gather_mode="split",
                                 vma=None, open_y: bool = False):
    """Homed-slab 3-component readout with the ONE-pass 8-corner
    kernel: the from8 analog of make_readout3_from4_homed_fn. Input
    fields are the EXTENDED local slabs (nx_local + 1, Ny, Nz) -- or
    with open_y the 2D extended pencils (nlx+2Hx+1, nly+2Hy+1, Nz) --
    so only the periodic faces pad. Consumes bundles from
    make_prepare_homed_fn(shape, C=<same C>); only offset row 0 of
    the range table is used."""
    from .paint_pallas import DEFAULT_KD
    if KD is None:
        KD = DEFAULT_KD
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
    if KD % K or KD % 128:
        raise ValueError("KD must be a multiple of K and 128")
    CLh, HR, RX, RXL = readout8_geometry_shape(nyp, nzp, C)
    npad_blocks = W * CLh + RX + HR
    kernel = functools.partial(_readout_kernel8, K=K, KD=KD, C=C,
                               CLh=CLh,
                               HR=HR, RX=RX, RXL=RXL, nyp=nyp, nzp=nzp,
                               gather_mode=gather_mode, SUBR=None)

    def build_call(n_padded):
        return pl.pallas_call(
            kernel,
            grid=(W,),
            in_specs=[
                pl.BlockSpec((1, 2, 128), lambda w: (0, 0, w // 128),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, 2, 3, CLh + HR, 128), jnp.float32),
                pltpu.VMEM((2, 9, 1, KD), jnp.float32),
                pltpu.VMEM((2, 3, 1, KD), jnp.float32),
                pltpu.VMEM((3, 1, KD), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA((2, 2, 3)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((1,)),
            ],
            out_shape=(jax.ShapeDtypeStruct((3, 1, n_padded),
                                            jnp.float32)
                       if vma is None else
                       jax.ShapeDtypeStruct((3, 1, n_padded),
                                            jnp.float32,
                                            vma=frozenset(vma))),
            input_output_aliases={5: 0},
            interpret=interpret,
        )

    def pad_canvas(field_ext):
        """Extended field -> the flat (npad_blocks, 128) wrap-padded
        window layout; only the periodic faces fold (the open-axis
        halo planes are already in the field)."""
        p = field_ext
        if open_y:
            p = jnp.concatenate([p, p[:, :, :1]], axis=2)
        else:
            p = jnp.concatenate([p, p[:, :1, :]], axis=1)
            p = jnp.concatenate([p, p[:, :, :1]], axis=2)
        flat = p.reshape(-1)
        flat = jnp.concatenate(
            [flat, jnp.zeros((npad_blocks * 128 - mpad,), jnp.float32)])
        return flat.reshape(npad_blocks, 128)

    def readout3_from(prepared, cx, cy, cz):
        n = prepared["n"]
        n_padded = prepared["cell_2d"].shape[1]
        if n_padded % KD:
            raise ValueError("prepared padding not a multiple of KD")
        ranges1 = ranges_lane_major(prepared)[0:1]      # (1, 2, W)
        cw9 = prepared.get("cw9")
        if cw9 is None:
            from .paint_pallas import pack_cw9
            cw9 = pack_cw9(prepared["cell_2d"], prepared["w8T"])
        val_init = jnp.zeros((3, 1, n_padded), jnp.float32)
        vals = build_call(n_padded)(
            ranges1, cw9, pad_canvas(cx), pad_canvas(cy),
            pad_canvas(cz), val_init)[:, 0, :n]
        if prepared.get("orig") is None:
            return jnp.stack([vals[0], vals[1], vals[2]], axis=-1)
        return jnp.stack(jax.lax.sort(
            (prepared["orig"], vals[0], vals[1], vals[2]),
            num_keys=1)[1:], axis=-1)

    return readout3_from


def _readout_kernel8(ranges_ref,     # SMEM (1, 2, 128) i32 lane w%128
                     cw9_hbm,        # (9, 1, Npad) f32 packed cell+w8
                     c0_hbm,         # ANY (W*CLh + RX + HR, 128) comp 0
                     c1_hbm,         # ANY same, comp 1
                     c2_hbm,         # ANY same, comp 2
                     val_io,         # ANY (3, 1, Npad) f32
                     out_ref,        # aliased with val_io
                     canvas_scratch,  # VMEM (2, 2, 3, CLh+HR, 128)
                     cw_scratch,     # VMEM (2, 9, 1, KD) f32 packed
                     val_scratch,    # VMEM (2, 3, 1, KD) f32
                     carry_scratch,  # VMEM (3, 1, KD) f32
                     carry_id,      # SMEM (1,) i32 carried chunk (-1)
                     csem,          # DMA sems (2, 2, 3) slot x block x comp
                     sems,          # DMA sems (2,): packed chunk
                     wsems,         # DMA sems (2,)
                     fsem,          # DMA sems (1,) carry flush
                     *, K, KD, C, CLh, HR, RX, RXL, nyp, nzp,
                     gather_mode="split", SUBR=None, ablate=None):
    """ONE-pass 8-corner readout: window w holds TWO canvas blocks --
    block 0 at rows [w*CLh, w*CLh+CLh+HR) and block 1 one x-plane later
    (row offset RX = (nyp*nzp)//128, residual lane shift
    RXL = (nyp*nzp) % 128) -- so every particle with base cell in the
    window reads all 8 CIC corners in a single visit. Versus the
    2-pass kernel this HALVES the chunk-round count (the sync-bound
    term of BENCH_NOTES), reads each cell/w8 chunk once instead of
    twice, and writes (3,) value rows instead of (6,) + a final sum.

    Corner-pair sharing is per block: block b serves the z-adjacent
    pairs at deltas b*RXL + (0, 1) and b*RXL + (nzp, nzp+1); the two
    pairs of one block sit nzp (odd) apart, so at most one of them
    crosses lane 127 for a given particle and one fix dot per block
    suffices (same argument as the 2-pass kernel).

    Particle traffic streams as ONE packed (9, 1, KD) super-chunk DMA
    (pack_cw9) with KD/K inner compute sub-rounds, and value
    write-backs batch at KD granularity -- one in-DMA + one out-DMA
    issue per KD lanes instead of three per K (the b ~ 3.9 us/round
    sync term of BENCH_NOTES round 3)."""
    del val_io
    w = pl.program_id(0)
    nw = pl.num_programs(0)
    base_window = w * C
    lo_row = jax.lax.broadcasted_iota(jnp.int32, (128, K), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    SUB = KD // K

    def canvas_copies(slot, wi, b):
        # three per-component copies (the components stay SEPARATE
        # operands: stacking them in HBM cost a full extra canvas set
        # of temps at 768^3+, the 384^3 B2 OOM)
        start = pl.ds(pl.multiple_of(wi * CLh + b * RX, 8), CLh + HR)
        return [pltpu.make_async_copy(
                    ch.at[start], canvas_scratch.at[slot, b, comp],
                    csem.at[slot, b, comp])
                for comp, ch in enumerate((c0_hbm, c1_hbm, c2_hbm))]

    @pl.when(w == 0)
    def _init_carry():
        carry_id[0] = -1
        for cp in canvas_copies(0, 0, 0) + canvas_copies(0, 0, 1):
            cp.start()

    cslot = jax.lax.rem(w, 2)

    @pl.when(w + 1 < nw)
    def _prefetch_canvas():
        nslot = jax.lax.rem(w + 1, 2)
        for cp in (canvas_copies(nslot, w + 1, 0)
                   + canvas_copies(nslot, w + 1, 1)):
            cp.start()

    for cp in canvas_copies(cslot, w, 0) + canvas_copies(cslot, w, 1):
        cp.wait()

    def flush_carry():
        cid = carry_id[0]

        @pl.when(cid >= 0)
        def _go():
            cp = pltpu.make_async_copy(
                carry_scratch,
                out_ref.at[:, :, pl.ds(cid * KD, KD)],
                fsem.at[0])
            cp.start()
            cp.wait()

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

    def make_out_copies(slot, r):
        start = pl.multiple_of((j0 + r) * KD, 128)
        return [pltpu.make_async_copy(
                    val_scratch.at[slot],
                    out_ref.at[:, :, pl.ds(start, KD)],
                    wsems.at[slot])]

    @pl.when(nrounds > 0)
    def _run():
        for cp in make_in_copies(0, 0):
            cp.start()

        cid = carry_id[0]

        @pl.when(cid == j0)
        def _consume():
            val_scratch[0] = carry_scratch[...]

        @pl.when((cid >= 0) & (cid != j0))
        def _flush():
            flush_carry()

        @pl.when(cid != j0)
        def _zero0():
            val_scratch[0] = jnp.zeros_like(val_scratch[0])

        carry_id[0] = -1

        def body(r, carry):
            slot = r % 2
            nxt = (r + 1) % 2

            @pl.when(r + 1 < nrounds)
            def _prefetch():
                @pl.when(r >= 1)
                def _drain():
                    for cp in make_out_copies(nxt, r - 1):
                        cp.wait()
                val_scratch[nxt] = jnp.zeros_like(val_scratch[nxt])
                for cp in make_in_copies(nxt, r + 1):
                    cp.start()

            for cp in make_in_copies(slot, r):
                cp.wait()

            sstart = (j0 + r) * KD
            for sub in range(SUB):
                _sub_round(slot, sstart + sub * K, sub)

            @pl.when(r + 1 < nrounds)
            def _writeback():
                for cp in make_out_copies(slot, r):
                    cp.start()

            @pl.when(r + 1 == nrounds)
            def _hold():
                carry_scratch[...] = val_scratch[slot]
                carry_id[0] = j0 + r
            return carry

        def _sub_round(slot, start, sub):
            ksl = pl.ds(sub * K, K)
            cells = jax.lax.bitcast_convert_type(
                cw_scratch[slot, 0, :, ksl], jnp.int32)   # (1, K)
            w_rows = [cw_scratch[slot, 1 + i, :, ksl] for i in range(8)]
            gidx = start + lane
            valid = (gidx >= s) & (gidx < e)
            rel0 = jnp.where(valid, cells - base_window, -2)

            mdt = (jnp.bfloat16 if gather_mode == "split"
                   else jnp.float32)

            def do_round(R_A, base8):
                """One chunk round over a canvas row window of R_A rows
                starting at base8 (8-aligned, 0 for the full-width
                path). pair q = 2*b + pi: block b, z-pair pi, corner
                weight rows (2q, 2q+1); block-b deltas carry the lane
                residual b*RXL.

                Dot-merged: per block, ONE gather pair contracts a
                comp-concatenated canvas (R_A, 384) against a
                q0|q1-concatenated one-hot (R_A, 2K) -- the 24 small
                dots/round become 4. The lane-127 crossing fix rides a
                SEPARATE skinny dot: the old 3K layout spent a full
                (384, K) dot section on fix values of which only
                sublane 0 per comp was read (1/3 of the gather MACs for
                3/384 of its output); gathering canvas[hifix, lane0]
                directly from the (R_A, 3) lane-0 columns costs a
                (3, K) dot instead -- 36 -> 28 MXU tiles per hi/lo
                pass."""
                his, los, crossings = [], [], []
                for b in range(2):
                    for d in (b * RXL, b * RXL + nzp):
                        rel = jnp.where(valid, rel0 + d, -1)
                        his.append((rel >> 7) - base8)
                        los.append(rel & 127)
                        crossings.append(((rel & 127) == 127) & valid)
                # -1000000: "no fix" sentinel, matches no window row
                hifix = [jnp.where(
                             crossings[2 * b], his[2 * b] + 1,
                             jnp.where(crossings[2 * b + 1],
                                       his[2 * b + 1] + 1, -1000000))
                         for b in range(2)]
                Me = [l == lo_row for l in los]
                Mo = [l + 1 == lo_row for l in los]
                sub_row2 = jax.lax.broadcasted_iota(
                    jnp.int32, (R_A, 2 * K), 0)
                sub_rowf = jax.lax.broadcasted_iota(
                    jnp.int32, (R_A, K), 0)

                def gather(b_hi, b_lo, A):
                    if gather_mode == "split":
                        return jax.lax.dot_general(
                            b_hi, A,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ) + jax.lax.dot_general(
                            b_lo, A,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    return jax.lax.dot_general(
                        b_hi, A,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=(jax.lax.Precision.HIGHEST
                                   if gather_mode == "highest"
                                   else jax.lax.Precision.HIGH))

                row0 = base8 if isinstance(base8, int) \
                    else pl.multiple_of(base8, 8)
                for b in range(2):
                    hi_cat = jnp.concatenate(
                        [his[2 * b], his[2 * b + 1]], axis=1)
                    A2 = (sub_row2 == hi_cat).astype(mdt)
                    Af = (sub_rowf == hifix[b]).astype(mdt)
                    block = jnp.concatenate(
                        [canvas_scratch[cslot, b, comp,
                                        pl.ds(row0, R_A)]
                         for comp in range(3)], axis=1)   # (R_A, 384)
                    # lane-0 columns of the 3 comps: the fix gather's
                    # skinny canvas operand
                    cols = jnp.concatenate(
                        [canvas_scratch[cslot, b, comp,
                                        pl.ds(row0, R_A), 0:1]
                         for comp in range(3)], axis=1)   # (R_A, 3)
                    if gather_mode == "split":
                        b_hi = block.astype(jnp.bfloat16)
                        b_lo = (block - b_hi.astype(jnp.float32)
                                ).astype(jnp.bfloat16)
                        c_hi = cols.astype(jnp.bfloat16)
                        c_lo = (cols - c_hi.astype(jnp.float32)
                                ).astype(jnp.bfloat16)
                    else:
                        b_hi, b_lo = block, None
                        c_hi, c_lo = cols, None
                    if ablate == "nodot":
                        # perf ablation: skip the MXU gather but keep
                        # all mask/sum VPU work. res = a sublane
                        # broadcast of one canvas row tiled to 2K
                        # lanes ((1,1)->2D broadcasts are
                        # unimplemented in Mosaic; (1,N)->(M,N) works)
                        reps = -(-2 * K // 384)
                        row = jnp.concatenate(
                            [block[0:1].astype(jnp.float32)] * reps,
                            axis=1)[:, :2 * K]
                        res = jnp.broadcast_to(row, (384, 2 * K))
                        fixres = jnp.broadcast_to(
                            row[:, :K], (8, K))
                    else:
                        res = gather(b_hi, b_lo, A2)      # (384, 2K)
                        fixres = gather(c_hi, c_lo, Af)   # (3, K)
                    # weighted lane one-hot WM[l,p] = w_even[p][l==lo]
                    # + w_odd[p][l==lo+1], built ONCE per q and shared
                    # by the 3 comps: the lane-select collapses to one
                    # multiply+sum per (comp, q) instead of two
                    # where+sum pairs + two scalar multiplies -- the
                    # mask/sum VPU volume (which rivals the dot cost
                    # per the nodot ablation) halves
                    WMs, fixts = [], []
                    for pi in range(2):
                        q = 2 * b + pi
                        WMs.append(
                            jnp.where(Me[q], w_rows[2 * q],
                                      0.0)
                            + jnp.where(Mo[q],
                                        w_rows[2 * q + 1],
                                        0.0))                # (128, K)
                        fixts.append(jnp.where(
                            crossings[q],
                            w_rows[2 * q + 1], 0.0))  # (1, K)
                    fixw = fixts[0] + fixts[1]
                    for comp in range(3):
                        acc = fixres[comp:comp + 1, :] * fixw
                        for pi in range(2):
                            tmp = res[128 * comp:128 * (comp + 1),
                                      K * pi:K * (pi + 1)]
                            if ablate == "nomask":
                                acc = acc + tmp[0:1, :]
                            else:
                                acc = acc + jnp.sum(
                                    WMs[pi] * tmp,
                                    axis=0, keepdims=True)
                        val_scratch[slot, comp, :, ksl] = \
                            val_scratch[slot, comp, :, ksl] + acc

            if ablate == "noround":
                # perf ablation: no compute at all -- the DMA pipeline
                # + loop overhead floor (touch cw_scratch so the DMAs
                # stay live)
                val_scratch[slot, 0, :, ksl] = (
                    val_scratch[slot, 0, :, ksl]
                    + cw_scratch[slot, 1, :, ksl])
                return

            @pl.when((start < e) & (start + K > s))
            def _overlap():
                if SUBR is not None and SUBR < CLh + HR:
                    # dynamic row window: a cell-sorted chunk touches
                    # only span(rel)/128 + halo-delta rows of the block;
                    # slicing the block and shrinking the one-hot cuts
                    # the dot and mask-build cost by (CLh+HR)/SUBR
                    # (~4.5x at the bench shape). Sparse chunks whose
                    # span exceeds SUBR rows take the full-width path.
                    row_lo = jnp.min(jnp.where(valid, rel0,
                                               C + RXL + nzp)) >> 7
                    # +1 row: the lane-127 fix reads hi+1, which can
                    # sit one row above (relmax + max delta) >> 7
                    row_hi = ((jnp.max(jnp.where(valid, rel0, 0))
                               + RXL + nzp) >> 7) + 1
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

        @pl.when(nrounds > 1)
        def _drain_last():
            for cp in make_out_copies((nrounds - 2) % 2,
                                      nrounds - 2):
                cp.wait()

    @pl.when(w == nw - 1)
    def _final_flush():
        flush_carry()


def readout8_geometry_shape(nyp: int, nzp: int, C: int = 8192):
    """Canvas-window geometry of the 8-corner readout kernel from the
    padded plane shape: (CLh, HR, RX, RXL)."""
    CLh = C // 128
    RX = (nyp * nzp) // 128
    RX = (RX // 8) * 8            # DMA row starts must stay 8-aligned
    RXL = nyp * nzp - RX * 128    # lane residual (< 1024 + 128)
    # halo rows: max rel = C - 1 + RXL + nzp + 1
    HR = window_halo_rows(nyp, nzp, eight=True)
    return CLh, HR, RX, RXL


def readout8_geometry(pm: PM, C: int = 8192):
    """Canvas-window geometry of the 8-corner readout kernel:
    (CLh, HR, RX, RXL). Single source of truth -- the stale stepper's
    safe-span check (ops/stale.py) imports this so it can never
    desynchronize from the kernel."""
    _nx, ny, nz = pm.Nmesh
    return readout8_geometry_shape(ny + 1, nz + 1, C)


def make_readout3_from8_fn(pm: PM, K: int = 512, KD: int | None = None,
                           C: int | None = None,
                           interpret=False, gather_mode="split",
                           subr: int | None = None, ablate=None):
    """readout3_from with the ONE-pass 8-corner kernel (see
    _readout_kernel8). Consumes the same prepared bundle as the 2-pass
    variant; only offset row 0 of the range table is used (window w
    owns exactly the particles whose base cell lies in it). Particle
    traffic streams through the packed cw9 operand in KD-lane
    super-chunk DMAs."""
    from .paint_pallas import DEFAULT_KD
    if KD is None:
        KD = DEFAULT_KD
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
    if subr is not None and subr % 8:
        raise ValueError("subr must be a multiple of 8")
    CLh, HR, RX, RXL = readout8_geometry(pm, C)
    npad_blocks = W * CLh + RX + HR
    kernel = functools.partial(_readout_kernel8, K=K, KD=KD, C=C,
                               CLh=CLh,
                               HR=HR, RX=RX, RXL=RXL, nyp=nyp, nzp=nzp,
                               gather_mode=gather_mode, SUBR=subr,
                               ablate=ablate)

    def build_call(n_padded):
        return pl.pallas_call(
            kernel,
            grid=(W,),
            in_specs=[
                pl.BlockSpec((1, 2, 128), lambda w: (0, 0, w // 128),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, 2, 3, CLh + HR, 128), jnp.float32),
                pltpu.VMEM((2, 9, 1, KD), jnp.float32),
                pltpu.VMEM((2, 3, 1, KD), jnp.float32),
                pltpu.VMEM((3, 1, KD), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA((2, 2, 3)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((1,)),
            ],
            out_shape=jax.ShapeDtypeStruct((3, 1, n_padded),
                                           jnp.float32),
            input_output_aliases={5: 0},
            interpret=interpret,
        )

    def pad_canvas(canvas):
        """(nx, ny, nz) or z-extended (nx, ny, nzp) canvas -> the flat
        (npad_blocks, 128) wrap-padded window layout. Pure concatenates
        (no scatter/update-slice): the chained wrap faces fuse into the
        flatten pass, where the .at[].set form compiled to per-face
        dynamic-update-slices + while loops (~10 ms/canvas on chip).
        The z face is free when the caller's inverse FFT already
        extended it (fftmm.grad3_c2r_mm zext: the c2r synthesis matrix
        grows one wrapped output column)."""
        if canvas.shape[2] == nz:
            canvas = jnp.concatenate([canvas, canvas[:, :, :1]], axis=2)
        p = canvas
        if p.shape[1] == ny:
            p = jnp.concatenate([p, p[:, :1, :]], axis=1)
        if p.shape[0] == nx:
            p = jnp.concatenate([p, p[:1]], axis=0)
        flat = p.reshape(-1)
        flat = jnp.concatenate(
            [flat, jnp.zeros((npad_blocks * 128 - mpad,), jnp.float32)])
        return flat.reshape(npad_blocks, 128)

    def readout3_from(prepared, cx, cy, cz):
        n = prepared["n"]
        n_padded = prepared["cell_2d"].shape[1]
        if n_padded % KD:
            raise ValueError("prepared padding not a multiple of KD")
        ranges1 = ranges_lane_major(prepared)[0:1]      # (1, 2, W)
        cw9 = prepared.get("cw9")
        if cw9 is None:
            from .paint_pallas import pack_cw9
            cw9 = pack_cw9(prepared["cell_2d"], prepared["w8T"])
        val_init = jnp.zeros((3, 1, n_padded), jnp.float32)
        vals = build_call(n_padded)(
            ranges1, cw9, pad_canvas(cx), pad_canvas(cy),
            pad_canvas(cz), val_init)[:, 0, :n]
        if prepared.get("orig") is None:
            return jnp.stack([vals[0], vals[1], vals[2]], axis=-1)
        return jnp.stack(jax.lax.sort(
            (prepared["orig"], vals[0], vals[1], vals[2]),
            num_keys=1)[1:], axis=-1)

    return readout3_from


def make_readout3_from4_homed_fn(shape, K: int = 512,
                                 C: int | None = None,
                                 interpret=False, gather_mode="split",
                                 vma=None, open_y: bool = False):
    """Homed-slab 3-component readout (open x axis): the input fields
    are the EXTENDED local slabs (nx_local + 1, Ny, Nz) -- interior
    plus halo planes already fetched by the caller's ppermutes -- so
    only the periodic y/z faces are padded. Consumes bundles from
    paint_pallas.make_prepare_homed_fn(shape).

    open_y=True is the PENCIL-homed variant: the fields are the 2D
    extended pencils (nlx + 2Hx + 1, nly + 2Hy + 1, Nz) -- y halo
    planes already gathered -- so only the periodic z face pads.
    shape = (nlx + 2Hx, nly + 2Hy, Nz)."""
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
    npad_blocks = W * CLh + HR
    kernel = functools.partial(_readout_kernel4, K=K, C=C, CLh=CLh,
                               HR=HR, nyp=nyp, nzp=nzp,
                               gather_mode=gather_mode)

    def build_call(n_padded):
        return pl.pallas_call(
            kernel,
            grid=(W,),
            in_specs=[
                pl.BlockSpec((1, 2, 2), lambda w: (w, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, 3, CLh + HR, 128), jnp.float32),
                pltpu.VMEM((2, 1, K), jnp.int32),
                pltpu.VMEM((2, 4, 1, K), jnp.float32),
                pltpu.VMEM((2, 3, 1, K), jnp.float32),
                pltpu.VMEM((2, 3, 1, K), jnp.float32),
                pltpu.SMEM((2,), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2, 5)),
                pltpu.SemaphoreType.DMA((2, 3)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            out_shape=(jax.ShapeDtypeStruct((6, 1, n_padded),
                                            jnp.float32)
                       if vma is None else
                       jax.ShapeDtypeStruct((6, 1, n_padded),
                                            jnp.float32,
                                            vma=frozenset(vma))),
            input_output_aliases={4: 0},
            interpret=interpret,
        )

    def pad_canvas(field_ext):
        """(nxp, ny, nz) extended field -> padded (nxp, nyp, nzp)
        blocks; only y/z faces are periodic. With open_y the field is
        (nxp, nyp, nz) -- x and y halo planes already gathered -- and
        only the z face is periodic."""
        p = jnp.zeros((nxp, nyp, nzp), dtype=jnp.float32)
        if open_y:
            p = p.at[:, :, :nz].set(field_ext)
            p = p.at[:, :, nz].set(field_ext[:, :, 0])
        else:
            p = p.at[:, :ny, :nz].set(field_ext)
            p = p.at[:, ny, :nz].set(field_ext[:, 0])
            p = p.at[:, :ny, nz].set(field_ext[:, :, 0])
            p = p.at[:, ny, nz].set(field_ext[:, 0, 0])
        flat = p.reshape(-1)
        flat = jnp.concatenate(
            [flat, jnp.zeros((npad_blocks * 128 - mpad,), jnp.float32)])
        return flat.reshape(npad_blocks, 128)

    def readout3_from(prepared, cx, cy, cz):
        n = prepared["n"]
        n_padded = prepared["cell_2d"].shape[1]
        if n_padded % K:
            raise ValueError("prepared padding not a multiple of K")
        ranges2 = prepared["ranges"][:, (0, 4), :]
        canvases = jnp.stack([pad_canvas(cx), pad_canvas(cy),
                              pad_canvas(cz)])
        val_init = jnp.zeros((6, 1, n_padded), jnp.float32)
        val2 = build_call(n_padded)(
            ranges2, prepared["cell_2d"], prepared["w8T"],
            canvases, val_init)
        vals = jnp.sum(val2.reshape(2, 3, n_padded), axis=0)[:, :n]
        if prepared.get("orig") is None:
            # order-free bundle (make_prepare_carry_fn): values are
            # already aligned with the caller's sorted particle order
            return jnp.stack([vals[0], vals[1], vals[2]], axis=-1)
        return jnp.stack(jax.lax.sort(
            (prepared["orig"], vals[0], vals[1], vals[2]),
            num_keys=1)[1:], axis=-1)

    return readout3_from
