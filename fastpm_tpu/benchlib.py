"""Shared benchmark helpers: the canonical single-chip PM step used by
bench.py and __graft_entry__.py."""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .mesh import PM
from .painter import Painter
from .kernels import kernel_orders
from . import transfers

__all__ = ["make_step_fn", "example_particles"]


def make_step_fn(pm: PM, kernel_type: str = "1_4",
                 painter_type: str = "cic", support: int = 2,
                 donate: bool = True, carry_sorted: bool = True,
                 sort_block: int | None = None,
                 payload_gather: bool = False,
                 paint8: bool = True,
                 K: int = 512, C: int | None = None,
                 subr: int | None = None):
    """One full PM force+kick+drift step as a single jitted function:
    (x, v, coeffs[2]) -> (x, v, acc). The hot loop of the framework.

    carry_sorted: keep particles in cell-sorted order across steps
    (order-free stepping; make_prepare_carry_fn). The output (x, v)
    rows are a permutation of the order-preserving result -- physically
    identical, but the per-step un-sort payload sort disappears."""
    painter = Painter(pm, painter_type, support)
    potorder, gradorder, difforder, _ = kernel_orders(kernel_type)
    L = jnp.asarray(pm.BoxSize, dtype=jnp.float32)
    if C is None:
        from .ops.paint_pallas import auto_window_C
        C = auto_window_C(pm.Nmesh[1] + 1, pm.Nmesh[2] + 1)

    from .painter import _PACK8_MAX_CELLS
    fused = (painter._use_pallas and painter_type == "cic"
             and int(np.prod(pm.Nmesh)) > _PACK8_MAX_CELLS)
    if fused:
        # one sort + one range table serve both the paint and the
        # 3-component readout (make_prepare_fn)
        from .ops.paint_pallas import (make_prepare_fn,
                                       make_prepare_carry_fn,
                                       make_paint_from4_fn,
                                       make_paint_from8_fn)
        from .ops.readout_pallas import make_readout3_from8_fn
        # n pads to a multiple of pad_to with at least pad_to-256
        # spare rows; the from8 kernels DMA whole KD super-chunks, so
        # pad_to must be a multiple of KD (and of K for the from4
        # escape hatch).
        from .ops.paint_pallas import DEFAULT_KD
        pad_to = max(2 * K, DEFAULT_KD)
        # paint8 consumers read offset row 0 only -> base-only ranges
        prepare = make_prepare_fn(pm, C=C, pad_to=pad_to,
                                  base_only=paint8)
        prepare_carry = make_prepare_carry_fn(
            pm, C=C, pad_to=pad_to, sort_block=sort_block,
            payload_gather=payload_gather, base_only=paint8)
        if paint8:
            paint_from = make_paint_from8_fn(pm, K=K, C=C, subr=subr)
        else:
            paint_from = make_paint_from4_fn(pm, K=K, C=C)
        readout3_from = make_readout3_from8_fn(pm, K=K, C=C, subr=subr)
    else:
        carry_sorted = False

    def step(x, v, coeffs):
        if fused and carry_sorted:
            prepared, x, v, _ = prepare_carry(x, v)
            canvas = paint_from(prepared)
        elif fused:
            prepared = prepare(x)
            canvas = paint_from(prepared)
        else:
            canvas = painter.paint(x, 1.0)
        canvas = canvas / (x.shape[0] / pm.Norm)
        delta_k = pm.r2c(canvas)
        # one potential transfer + the fused 3-gradient inverse
        # (mesh.c2r_grad3: direct hermitian z-stage + shared axis-0
        # inverse on the mm engine; packed-pair iFFT otherwise)
        pot_k = transfers.apply_pot(pm, delta_k, potorder)
        # zext/wrap: the mm engine's synthesis matrices emit the
        # wrapped 0-planes so readout's pad_canvas skips its
        # concatenates (all of them in direct-grad3 mode)
        fields = list(pm.c2r_grad3(pot_k, gradorder, zext=fused,
                                   wrap=fused))
        if fused:
            acc = readout3_from(prepared, *fields)
        else:
            acc = painter.readout3(fields[0], fields[1], fields[2], x)
        v = v + acc * coeffs[0]
        x = x + v * coeffs[1]
        x = x - jnp.floor(x / L) * L
        return x, v, acc

    if donate:
        return jax.jit(step, donate_argnums=(0, 1))
    return jax.jit(step)


def make_stale_step_fns(pm: PM, kernel_type: str = "1_4",
                        K: int = 512, C: int | None = None,
                        maxm_frac: float = 0.02,
                        interpret: bool = False):
    """Stale-order stepping (ops/stale.py): returns (step_fresh,
    step_stale), both jitted.

    step_fresh(x, v, coeffs) -> (x, v, acc, ranges): full prepare; the
        outputs are in fresh cell-sorted order.
    step_stale(x, v, ranges, coeffs) -> (x, v, acc, nbad): reuses the
        carried order and range table; movers ride the side bundle.
        nbad > 0 means the mover cap overflowed -- the caller must
        redo a fresh step (same contract as the homed halo ladder)."""
    from .ops.stale import make_stale_tools
    from .ops.paint_pallas import make_paint_from8_fn
    from .ops.readout_pallas import make_readout3_from8_fn
    potorder, gradorder, _d, _ = kernel_orders(kernel_type)
    L = jnp.asarray(pm.BoxSize, dtype=jnp.float32)
    paint_plain = make_paint_from8_fn(pm, K=K, C=C,
                                      interpret=interpret)
    readout_plain = make_readout3_from8_fn(pm, K=K, C=C,
                                           interpret=interpret)
    # tools are built EAGERLY per particle count (constructing them
    # inside a trace would cache trace-local constants; see the
    # PM._device_const pattern)
    tools_cache = {}
    jit_cache = {}

    def get_tools(n):
        if n not in tools_cache:
            maxm = max(int(n * maxm_frac) // 1024 * 1024, 1024)
            tools_cache[n] = make_stale_tools(pm, K=K, C=C, maxm=maxm,
                                              interpret=interpret)
        return tools_cache[n]

    def _force_fields(canvas, readout):
        delta_k = pm.r2c(canvas)
        pot_k = transfers.apply_pot(pm, delta_k, potorder)
        fields = list(pm.c2r_grad3(pot_k, gradorder))
        return readout(fields)

    def _kdk(x, v, acc, coeffs):
        v = v + acc * coeffs[0]
        x = x + v * coeffs[1]
        return x - jnp.floor(x / L) * L, v

    def _build(n):
        tools = get_tools(n)

        def step_fresh(x, v, coeffs):
            prepared, x, v, _ = tools["fresh"](x, v)
            norm = x.shape[0] / pm.Norm
            acc = _force_fields(
                paint_plain(prepared) / norm,
                lambda fields: readout_plain(prepared, *fields))
            x, v = _kdk(x, v, acc, coeffs)
            return x, v, acc, prepared["ranges"]

        def step_stale(x, v, ranges, coeffs):
            main, mover, midx, nbad = tools["stale"](x, ranges)
            norm = x.shape[0] / pm.Norm
            acc = _force_fields(
                tools["paint"](main, mover) / norm,
                lambda fields: tools["readout3"](main, mover, midx,
                                                 *fields))
            x, v = _kdk(x, v, acc, coeffs)
            return x, v, acc, nbad

        return jax.jit(step_fresh), jax.jit(step_stale)

    def step_fresh(x, v, coeffs):
        n = x.shape[0]
        if n not in jit_cache:
            jit_cache[n] = _build(n)
        return jit_cache[n][0](x, v, coeffs)

    def step_stale(x, v, ranges, coeffs):
        n = x.shape[0]
        if n not in jit_cache:
            jit_cache[n] = _build(n)
        return jit_cache[n][1](x, v, ranges, coeffs)

    return step_fresh, step_stale


def example_particles(nc: int, boxsize: float, seed: int = 0, jitter=0.3):
    """A jittered lattice of nc^3 particles (f32)."""
    cell = boxsize / nc
    g = np.arange(nc) * cell
    q = np.stack(np.meshgrid(g, g, g, indexing="ij"), axis=-1).reshape(-1, 3)
    rng = np.random.RandomState(seed)
    x = (q + jitter * cell * rng.standard_normal(q.shape)) % boxsize
    v = np.zeros_like(x)
    return (jnp.asarray(x.astype(np.float32)),
            jnp.asarray(v.astype(np.float32)))
