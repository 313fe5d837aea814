"""The PM force solver (reference: libfastpm/gravity.c).

One force step is a single jittable array program:

  paint mass (all species) -> delta = rho / mean - handled via total mass
  -> r2c -> softening -> per-component {kernel transfer -> c2r -> readout}

No ghosts, no reductions across ranks: painting/readout are global
scatter/gather on the (optionally sharded) mesh; the total-mass Allreduce
becomes a jnp.sum.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .mesh import PM
from .painter import Painter
from .store import Store
from . import kernels

__all__ = ["paint_delta_k", "compute_force", "FORCE_FIELDS"]

_FUSED_CACHE = {}


def _fused_cache(pm, kind, builder):
    """Per-PM cache of the prepared-bundle kernel builders."""
    key = (pm.cache_key, kind)
    fn = _FUSED_CACHE.get(key)
    if fn is None:
        fn = builder(pm)
        _FUSED_CACHE[key] = fn
    return fn

FORCE_FIELDS = ("acc", "potential", "tidal")


def paint_delta_k(pm: PM, painter: Painter, stores: Sequence[Store]):
    """Paint all species and return the overdensity transform delta_k
    (_fastpm_solver_compute_delta_k, gravity.c:304-356).

    Convention: paint mass per cell, divide by mean mass per cell -- the
    canvas entering r2c is 1+delta.
    """
    canvas = jnp.zeros(pm.rshape, dtype=pm.dtype)
    total_mass = 0.0
    for p in stores:
        mass = p.mass if p.mass is not None else jnp.float32(p.M0)
        if p.mass is not None:
            total_mass = total_mass + jnp.sum(mass)
            canvas = painter.paint(p.x, mass, canvas)
        else:
            total_mass = total_mass + p.M0 * p.np_local
            canvas = painter.paint(p.x, jnp.float32(p.M0), canvas)
    mean_mass_per_cell = total_mass / pm.Norm
    canvas = canvas / mean_mass_per_cell
    return pm.r2c(canvas)


def compute_force(pm: PM, painter: Painter, stores: Sequence[Store],
                  kernel_type: str = "1_4", softening_type: str = "none",
                  compute_potential: bool = False,
                  compute_tidal: bool = False,
                  delta_transfer=None):
    """Compute accelerations (and optional potential/tidal) for every
    species (fastpm_solver_compute_force, gravity.c:457-529).

    delta_transfer(pm, delta_k) -> delta_k, applied after softening and
    before the force kernels -- the hook used by the neutrino linear
    response (gravity.c:494-522).

    Returns (new_stores, delta_k) where delta_k has the softening applied
    but NOT the deCIC compensation (the caller applies that for the power
    spectrum event, solver.c:466-471).
    """
    # fused Pallas path: one sort + one range table serve both the
    # paint and the 3-component readout (single species, scalar mass).
    # Only pays off on meshes too big for the packed-corner gather
    # (XLA's 8-wide row gather wins below that).
    from .painter import _PACK8_MAX_CELLS
    fused = (painter._use_pallas and len(stores) == 1
             and stores[0].mass is None and not compute_potential
             and not compute_tidal
             and int(np.prod(pm.Nmesh)) > _PACK8_MAX_CELLS)
    prepared = None
    if fused:
        from .ops.paint_pallas import make_prepare_fn, make_paint_from8_fn
        p0 = stores[0]
        # base_only: this bundle only ever feeds the from8 kernels,
        # which consume offset row 0 -- skip the 7 extra searchsorted
        # rows (~20 ms/step at 256^3)
        prepare = _fused_cache(
            pm, "prepare",
            lambda pm: make_prepare_fn(pm, base_only=True))
        # one-pass deposit (vs from4: one particle visit, half the
        # cell/weight DMA; bench_variants r3)
        paint_from = _fused_cache(pm, "paint_from8", make_paint_from8_fn)
        prepared = prepare(p0.x)
        canvas = paint_from(prepared)
        mean_mass_per_cell = jnp.float32(p0.M0) * p0.np_local / pm.Norm
        delta_k = pm.r2c(canvas * jnp.float32(p0.M0)
                         / mean_mass_per_cell)
    else:
        delta_k = paint_delta_k(pm, painter, stores)
    delta_k = kernels.apply_softening(pm, delta_k, softening_type)
    if delta_transfer is not None:
        delta_k = delta_transfer(pm, delta_k)

    # one potential transfer + the fused 3-gradient inverse (on the mm
    # engine: direct hermitian z-stage + shared axis-0 inverse; else
    # the packed-pair iFFT + c2r)
    pot_k = kernels.apply_kernel_transfer(pm, delta_k, kernel_type,
                                          "potential")
    gradorder = kernels.kernel_orders(kernel_type)[1]
    # zext/wrap: when the fused readout consumes the fields, the mm
    # engine emits the wrapped 0-planes so pad_canvas skips its
    # concatenates
    acc_fields = list(pm.c2r_grad3(pot_k, gradorder, zext=fused,
                                   wrap=fused))

    pot_field = None
    if compute_potential:
        fk = kernels.apply_kernel_transfer(pm, delta_k, kernel_type,
                                           "potential")
        pot_field = pm.c2r(fk)

    tidal_fields = None
    if compute_tidal:
        tidal_fields = []
        for m in range(6):
            fk = kernels.apply_kernel_transfer(pm, delta_k, kernel_type,
                                               "tidal", m)
            tidal_fields.append(pm.c2r(fk))

    out = []
    for p in stores:
        if fused:
            from .ops.readout_pallas import make_readout3_from8_fn
            readout3_from = _fused_cache(pm, "readout3_from8",
                                         make_readout3_from8_fn)
            acc = readout3_from(prepared, acc_fields[0], acc_fields[1],
                                acc_fields[2])
        else:
            acc = painter.readout3(acc_fields[0], acc_fields[1],
                                   acc_fields[2], p.x)
        updates = dict(acc=acc)
        if compute_potential and p.potential is not None:
            updates["potential"] = painter.readout(pot_field, p.x)
        if compute_tidal and p.tidal is not None:
            updates["tidal"] = jnp.stack(
                [painter.readout(f, p.x) for f in tidal_fields], axis=-1)
        out.append(p.replace(**updates))
    return out, delta_k


def _carry_fields():
    """Per-particle store columns that must ride the order-free sort:
    EVERY array field except x/v (sorted natively by the carry bundle)
    and acc (overwritten by the force). Derived from the dataclass so
    a newly added column can never silently stay in the old order."""
    import dataclasses as _dc
    out = []
    for f in _dc.fields(Store):
        if f.metadata.get("static"):
            continue
        if f.name in ("x", "v", "acc"):
            continue
        out.append(f.name)
    return tuple(out)


def carry_eligible(pm: PM, painter: Painter, stores,
                   compute_potential: bool,
                   compute_tidal: bool) -> bool:
    """Whether compute_force_carry can serve this configuration."""
    from .painter import _PACK8_MAX_CELLS
    return (painter._use_pallas and len(stores) == 1
            and stores[0].mass is None and stores[0].v is not None
            and not compute_potential and not compute_tidal
            and int(np.prod(pm.Nmesh)) > _PACK8_MAX_CELLS)


def compute_force_carry(pm: PM, painter: Painter, store: Store,
                        kernel_type: str = "1_4",
                        softening_type: str = "none",
                        delta_transfer=None):
    """Order-free fused force: like the fused branch of compute_force
    but the store comes back PERMUTED into cell-sorted order (every
    per-particle column rides the sort), which deletes the per-step
    un-sort payload sort entirely — readout values are already aligned
    with the sorted rows. Particle order is physically meaningless
    (writers sort by id; summaries are order-free), matching the
    reference, whose store order is likewise decomposition-defined
    (store.c:486-657).

    Returns (store_sorted, delta_k, ranges) with acc filled; ranges is
    the prepare's window range table, which compute_force_stale can
    reuse on subsequent steps. The caller checks carry_eligible
    first."""
    from .ops.paint_pallas import (make_prepare_carry_fn,
                                   make_paint_from8_fn)
    from .ops.readout_pallas import make_readout3_from8_fn
    # base_only: from8 kernels + the stale window map read offset row 0
    # only -- the 7 extra searchsorted rows are dead weight here
    prepare = _fused_cache(
        pm, "prepare_carry",
        lambda pm: make_prepare_carry_fn(pm, base_only=True))
    paint_from = _fused_cache(pm, "paint_from8", make_paint_from8_fn)
    readout3_from = _fused_cache(pm, "readout3_from8",
                                 make_readout3_from8_fn)
    p0 = store
    cols, spec = [], []
    for name in _carry_fields():
        a = getattr(p0, name)
        if a is None:
            continue
        dt = a.dtype
        if dt == jnp.bool_:          # sort payloads must be numeric
            a = a.astype(jnp.uint8)
        if a.ndim == 1:
            cols.append(a)
            spec.append((name, 0, dt))
        else:
            for j in range(a.shape[1]):
                cols.append(a[:, j])
            spec.append((name, a.shape[1], dt))
    prepared, xs, vs, extras_s = prepare(p0.x, p0.v, tuple(cols))

    canvas = paint_from(prepared)
    mean_mass_per_cell = jnp.float32(p0.M0) * p0.np_local / pm.Norm
    delta_k = pm.r2c(canvas * jnp.float32(p0.M0) / mean_mass_per_cell)
    delta_k = kernels.apply_softening(pm, delta_k, softening_type)
    if delta_transfer is not None:
        delta_k = delta_transfer(pm, delta_k)
    pot_k = kernels.apply_kernel_transfer(pm, delta_k, kernel_type,
                                          "potential")
    f0, f1, f2 = pm.c2r_grad3(pot_k,
                              kernels.kernel_orders(kernel_type)[1],
                              zext=True, wrap=True)
    acc = readout3_from(prepared, f0, f1, f2)

    updates = dict(x=xs, v=vs, acc=acc)
    i = 0
    for name, k, dt in spec:
        if k == 0:
            updates[name] = extras_s[i].astype(dt)
            i += 1
        else:
            updates[name] = jnp.stack(
                extras_s[i:i + k], axis=-1).astype(dt)
            i += k
    return p0.replace(**updates), delta_k, prepared["ranges"]


def compute_delta_k_carry(pm: PM, painter: Painter, store: Store,
                          softening_type: str = "none"):
    """First half of the order-free fused force, split where a
    transfer needs a host round trip between the density and the
    kernels (the neutrino linear-response table, gravity.c:431-455):
    carry-sort + paint + r2c + softening. Returns (store_sorted,
    delta_k). The caller computes its 1D table from delta_k (one
    small fetch) and finishes with compute_force_presorted -- which
    re-derives the prepare from the ALREADY sorted rows, so no second
    sort is paid. Caller checks carry_eligible."""
    from .ops.paint_pallas import (make_prepare_carry_fn,
                                   make_paint_from8_fn)
    prepare = _fused_cache(
        pm, "prepare_carry",
        lambda pm: make_prepare_carry_fn(pm, base_only=True))
    paint_from = _fused_cache(pm, "paint_from8", make_paint_from8_fn)
    p0 = store
    cols, spec = [], []
    for name in _carry_fields():
        a = getattr(p0, name)
        if a is None:
            continue
        dt = a.dtype
        if dt == jnp.bool_:
            a = a.astype(jnp.uint8)
        if a.ndim == 1:
            cols.append(a)
            spec.append((name, 0, dt))
        else:
            for j in range(a.shape[1]):
                cols.append(a[:, j])
            spec.append((name, a.shape[1], dt))
    prepared, xs, vs, extras_s = prepare(p0.x, p0.v, tuple(cols))
    canvas = paint_from(prepared)
    mean_mass_per_cell = jnp.float32(p0.M0) * p0.np_local / pm.Norm
    delta_k = pm.r2c(canvas * jnp.float32(p0.M0) / mean_mass_per_cell)
    delta_k = kernels.apply_softening(pm, delta_k, softening_type)
    updates = dict(x=xs, v=vs)
    i = 0
    for name, k, dt in spec:
        if k == 0:
            updates[name] = extras_s[i].astype(dt)
            i += 1
        else:
            updates[name] = jnp.stack(
                extras_s[i:i + k], axis=-1).astype(dt)
            i += k
    return p0.replace(**updates), delta_k


def compute_force_presorted(pm: PM, painter: Painter, store: Store,
                            delta_k, kernel_type: str = "1_4"):
    """Second half of the split fused force: gradients + readout on an
    ALREADY cell-sorted store (compute_delta_k_carry output). The
    presorted prepare recomputes cells/weights/ranges elementwise from
    the sorted rows -- no sort. Returns the store with acc filled."""
    from .ops.paint_pallas import make_prepare_fn
    from .ops.readout_pallas import make_readout3_from8_fn
    prepare_ps = _fused_cache(
        pm, "prepare_presorted",
        lambda pm: make_prepare_fn(pm, base_only=True, presorted=True))
    readout3_from = _fused_cache(pm, "readout3_from8",
                                 make_readout3_from8_fn)
    prepared = prepare_ps(store.x)
    pot_k = kernels.apply_kernel_transfer(pm, delta_k, kernel_type,
                                          "potential")
    f0, f1, f2 = pm.c2r_grad3(pot_k,
                              kernels.kernel_orders(kernel_type)[1],
                              zext=True, wrap=True)
    acc = readout3_from(prepared, f0, f1, f2)
    return store.replace(acc=acc)


def compute_delta_k(pm: PM, painter: Painter, stores: Sequence[Store],
                    softening_type: str = "none"):
    """Generic first half (any species mix / painter): paint + r2c +
    softening. Pairs with compute_force_from_delta_k."""
    delta_k = paint_delta_k(pm, painter, stores)
    return kernels.apply_softening(pm, delta_k, softening_type)


def compute_force_from_delta_k(pm: PM, painter: Painter,
                               stores: Sequence[Store], delta_k,
                               kernel_type: str = "1_4",
                               compute_potential: bool = False,
                               compute_tidal: bool = False):
    """Generic second half: kernel transfers + inverse FFTs + readout
    at the stores' positions (order preserved; XLA gather path)."""
    pot_k = kernels.apply_kernel_transfer(pm, delta_k, kernel_type,
                                          "potential")
    gradorder = kernels.kernel_orders(kernel_type)[1]
    acc_fields = list(pm.c2r_grad3(pot_k, gradorder))
    pot_field = None
    if compute_potential:
        fk = kernels.apply_kernel_transfer(pm, delta_k, kernel_type,
                                           "potential")
        pot_field = pm.c2r(fk)
    tidal_fields = None
    if compute_tidal:
        tidal_fields = [
            pm.c2r(kernels.apply_kernel_transfer(
                pm, delta_k, kernel_type, "tidal", m))
            for m in range(6)]
    out = []
    for p in stores:
        acc = painter.readout3(acc_fields[0], acc_fields[1],
                               acc_fields[2], p.x)
        updates = dict(acc=acc)
        if compute_potential and p.potential is not None:
            updates["potential"] = painter.readout(pot_field, p.x)
        if compute_tidal and p.tidal is not None:
            updates["tidal"] = jnp.stack(
                [painter.readout(f, p.x) for f in tidal_fields],
                axis=-1)
        out.append(p.replace(**updates))
    return out


def compute_force_stale(pm: PM, painter: Painter, store: Store,
                        ranges, maxm: int,
                        kernel_type: str = "1_4",
                        softening_type: str = "none",
                        delta_transfer=None):
    """Stale-order fused force (ops/stale.py): the store is ALREADY in
    the cell-sorted order of a previous compute_force_carry whose
    range table is `ranges`; cells and CIC weights are recomputed
    elementwise and window-leavers ride a small side bundle, so no
    per-particle sort runs at all. Returns (store, delta_k, nbad);
    nbad > 0 means the mover cap overflowed and the caller must redo
    a fresh carry force (the result is then invalid)."""
    from .ops.stale import make_stale_tools
    from .ops.paint_pallas import make_paint_from8_fn
    from .ops.readout_pallas import make_readout3_from8_fn

    def build(pm):
        # reuse the already-built fused kernels (same K/C defaults)
        return make_stale_tools(
            pm, maxm=maxm,
            paint_from=_fused_cache(pm, "paint_from8",
                                    make_paint_from8_fn),
            readout_from=_fused_cache(pm, "readout3_from8",
                                      make_readout3_from8_fn))
    tools = _fused_cache(pm, ("stale", maxm), build)
    p0 = store
    main, mover, midx, nbad = tools["stale"](p0.x, ranges)
    canvas = tools["paint"](main, mover)
    mean_mass_per_cell = jnp.float32(p0.M0) * p0.np_local / pm.Norm
    delta_k = pm.r2c(canvas * jnp.float32(p0.M0) / mean_mass_per_cell)
    delta_k = kernels.apply_softening(pm, delta_k, softening_type)
    if delta_transfer is not None:
        delta_k = delta_transfer(pm, delta_k)
    pot_k = kernels.apply_kernel_transfer(pm, delta_k, kernel_type,
                                          "potential")
    f0, f1, f2 = pm.c2r_grad3(pot_k,
                              kernels.kernel_orders(kernel_type)[1])
    acc = tools["readout3"](main, mover, midx, f0, f1, f2)
    return p0.replace(acc=acc), delta_k, nbad
