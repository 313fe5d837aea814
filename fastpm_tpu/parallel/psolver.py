"""SPMD force + KDK step over a device mesh (the multi-chip hot loop).

Two force designs:

v1 (correctness-first, any displacement):
- particles are index-sharded (block of N/P particles per device); no
  spatial homing is required for correctness
- paint: each device scatters its particles into a full-size local canvas,
  then one psum_scatter sums and shards the canvas into x-slabs -- the
  analog of the reference's ghost reduction (pmghosts.c), done as a single
  XLA collective
- FFT: slab pencil via SlabPM (all_to_all transposes)
- readout: per force component, all_gather the x-slabs and gather locally
  (the analog of ghost readout)
- kick/drift: purely local
Memory is O(Nmesh^3) per device and traffic O(P * Nmesh^3) -- fine for
small meshes, unusable at 1024^3+.

v2 "homed" (scalable; the pmghosts.c:31-131 + store.c:486-657 analog):
- the Lagrangian lattice is filled in x-major id order, so index-sharding
  IS q-slab spatial homing: device d owns particles whose unperturbed
  position lies in x-slab d. Displacements |x - q| are bounded (~tens of
  Mpc/h), so each device's particles live within +-H mesh planes of its
  slab for a modest halo width H.
- paint: each device deposits into its slab extended by H halo planes on
  each side (nloc + 2H + 1 planes, O(Nmesh^3/P) memory), then two
  `ppermute`s send the halo blocks to the +-1 neighbors which add them
  into their interiors -- the ghost reduce of pmghosts.c:247-307 as two
  neighbor block exchanges instead of a full-canvas psum.
- readout: the mirror image -- fetch H(+1) planes from each neighbor via
  two `ppermute`s, gather locally.
- the halo width is chosen adaptively per force step from the measured
  maximum displacement (bucketed to limit recompiles); a particle beyond
  H triggers the overflow contract (the alloc_factor abort of
  store.c:507-509): the solver either re-compiles with a larger H or
  falls back to v1.

The whole step is one jitted, donated-buffer SPMD program.
"""

from __future__ import annotations

from functools import partial

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from ..mesh import PM
from ..painter import Painter
from ..kernels import kernel_orders
from .pfft import SlabPM, PencilPM, make_engine

__all__ = ["make_sharded_step", "sharded_force_fn", "particle_spec",
           "deltak_spec", "required_halo_planes",
           "required_halo_planes_pencil", "halo_ladder"]


def _apply_kernel_local(spm, delta_k, kernel_type: str, field: str,
                        memb: int = 0):
    """Shard-local mirror of kernels.apply_kernel_transfer
    (gravity.c:173-242)."""
    potorder, gradorder, difforder, deconvolveorder = \
        kernel_orders(kernel_type)
    out = delta_k
    for _ in range(deconvolveorder):
        out = spm.apply_decic(out)
    if field == "potential":
        return spm.apply_pot(out, potorder)
    if field == "acc":
        out = spm.apply_pot(out, potorder)
        return spm.apply_grad(out, memb, gradorder)
    if field == "tidal":
        pairs = [(0, 0), (1, 1), (2, 2), (0, 1), (1, 2), (2, 0)]
        d1, d2 = pairs[memb]
        out = spm.apply_pot(out, potorder)
        out = spm.apply_grad(out, d1, gradorder)
        return spm.apply_grad(out, d2, gradorder)
    raise ValueError(f"unknown gravity field {field!r}")


def _paint_delta_k_local(spm, painter, xs, masses):
    """Paint every species into one canvas, reduce to shards, normalize
    to 1+delta, r2c (the _fastpm_solver_compute_delta_k analog,
    gravity.c:304-356). masses[i] is a scalar M0 or a (Nloc,) column."""
    canvas_full = None
    total_mass = 0.0
    for x, mass in zip(xs, masses):
        canvas_full = painter.paint(x, mass, canvas=canvas_full)
        if jnp.ndim(mass) == 0:
            total_mass = total_mass + jnp.float32(mass) * x.shape[0]
        else:
            total_mass = total_mass + jnp.sum(mass)
    canvas = spm.reduce_canvas(canvas_full)
    ntotal = total_mass
    for ax in spm.particle_axes:
        ntotal = jax.lax.psum(ntotal, ax)
    return canvas, ntotal


def _force_local(spm: SlabPM, painter: Painter, x, kernel_type: str,
                 return_delta_k: bool = False,
                 softening_type: str = "none",
                 compute_potential: bool = False,
                 compute_tidal: bool = False):
    """Shard-local body: positions (Nloc,3) -> dict(acc[, potential,
    tidal])[, delta_k shard]. Runs INSIDE shard_map; collectives are
    explicit. Multi-species callers use _force_local_multi."""
    out, dk = _force_local_multi(
        spm, painter, (x,), (1.0,), kernel_type,
        softening_type=softening_type,
        compute_potential=compute_potential,
        compute_tidal=compute_tidal)
    res = out[0] if (compute_potential or compute_tidal) \
        else out[0]["acc"]
    return (res, dk) if return_delta_k else res


def _force_local_multi(spm, painter: Painter, xs, masses,
                       kernel_type: str, softening_type: str = "none",
                       compute_potential: bool = False,
                       compute_tidal: bool = False):
    """Multi-species shard-local force (v1 full-canvas exchange).

    xs: tuple of per-species positions; masses: scalar M0 or (Nloc,)
    mass column per species (the mass enters the delta normalization;
    with a single species and scalar mass it cancels,
    gravity.c:311-319). Returns ([dict(acc[, potential, tidal])...],
    delta_k shard)."""
    pm = spm.pm
    canvas, ntotal = _paint_delta_k_local(spm, painter, xs, masses)
    canvas = canvas / (ntotal / pm.Norm)
    delta_k = spm.r2c_local(canvas)
    delta_k = spm.apply_softening(delta_k, softening_type)

    fields = []       # (name, memb) in readout order
    for d in range(3):
        fields.append(("acc", d))
    if compute_potential:
        fields.append(("potential", 0))
    if compute_tidal:
        for m in range(6):
            fields.append(("tidal", m))

    fulls = []
    for name, memb in fields:
        fk = _apply_kernel_local(spm, delta_k, kernel_type, name, memb)
        local = spm.c2r_local(fk)
        fulls.append(spm.gather_canvas(local))

    outs = []
    for x in xs:
        vals = [painter.readout(f, x) for f in fulls]
        d = dict(acc=jnp.stack(vals[:3], axis=-1))
        i = 3
        if compute_potential:
            d["potential"] = vals[i]
            i += 1
        if compute_tidal:
            d["tidal"] = jnp.stack(vals[i:i + 6], axis=-1)
        outs.append(d)
    return outs, delta_k


# ---- v2 "homed" slab force: halo-exchange paint/readout ----------------


def _ring_perms(nproc: int):
    """(to_left, to_right) ppermute permutations on a ring."""
    to_left = [(i, (i - 1) % nproc) for i in range(nproc)]
    to_right = [(i, (i + 1) % nproc) for i in range(nproc)]
    return to_left, to_right


def _cic_rel(pm: PM, x, r0, H):
    """Base cell / fraction / extended-slab x-index for CIC on the
    extended local slab. Returns (relx, iy, iz, frac, valid)."""
    n0, n1, n2 = pm.Nmesh
    inv_cell = jnp.asarray(pm.InvCellSize, dtype=x.dtype)
    gpos = x * inv_cell
    base = jnp.floor(gpos).astype(jnp.int32)
    frac = (gpos - base).astype(jnp.float32)
    bx = jnp.remainder(base[:, 0], n0)
    iy = jnp.remainder(base[:, 1], n1)
    iz = jnp.remainder(base[:, 2], n2)
    relx = jnp.remainder(bx - r0 + H, n0)
    return relx, iy, iz, frac


def _paint_homed(pm: PM, nloc: int, H: int, r0, x, mass=1.0,
                 canvas=None):
    """CIC-deposit mass (scalar or (Nloc,) column) into the extended
    local slab (nloc + 2H + 1, Ny, Nz). Particles beyond the halo are
    dropped and counted (the overflow contract of store.c:507-509).
    Returns (canvas_ext, local bad count)."""
    n0, n1, n2 = pm.Nmesh
    ext = nloc + 2 * H + 1
    relx, iy, iz, frac = _cic_rel(pm, x, r0, H)
    valid = relx < nloc + 2 * H
    bad = jnp.sum(~valid).astype(jnp.int32)
    relx = jnp.where(valid, relx, 0)
    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
    w0 = jnp.where(valid, 1.0, 0.0) * mass
    if canvas is None:
        canvas = jnp.zeros((ext * n1 * n2,), dtype=pm.dtype)
    else:
        canvas = canvas.reshape(-1)
    for dx in (0, 1):
        wx = (1.0 - fx) if dx == 0 else fx
        ix = relx + dx
        for dy in (0, 1):
            wy = (1.0 - fy) if dy == 0 else fy
            jy = iy + dy
            jy = jnp.where(jy == n1, 0, jy)
            for dz in (0, 1):
                wz = (1.0 - fz) if dz == 0 else fz
                jz = iz + dz
                jz = jnp.where(jz == n2, 0, jz)
                flat = (ix * n1 + jy) * n2 + jz
                canvas = canvas.at[flat].add(
                    (w0 * wx * wy * wz).astype(pm.dtype))
    return canvas.reshape(ext, n1, n2), bad


def _readout_homed(pm: PM, nloc: int, H: int, r0, x, fields_ext):
    """CIC-interpolate each extended field (nloc + 2H + 1, Ny, Nz) at x.
    Returns (N, len(fields_ext))."""
    n0, n1, n2 = pm.Nmesh
    relx, iy, iz, frac = _cic_rel(pm, x, r0, H)
    valid = relx < nloc + 2 * H
    relx = jnp.where(valid, relx, 0)
    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
    w0 = jnp.where(valid, 1.0, 0.0)
    flats = []
    weights = []
    for dx in (0, 1):
        wx = (1.0 - fx) if dx == 0 else fx
        ix = relx + dx
        for dy in (0, 1):
            wy = (1.0 - fy) if dy == 0 else fy
            jy = iy + dy
            jy = jnp.where(jy == n1, 0, jy)
            for dz in (0, 1):
                wz = (1.0 - fz) if dz == 0 else fz
                jz = iz + dz
                jz = jnp.where(jz == n2, 0, jz)
                flats.append((ix * n1 + jy) * n2 + jz)
                weights.append(w0 * wx * wy * wz)
    outs = []
    for f in fields_ext:
        ff = f.reshape(-1)
        acc = 0.0
        for flat, w in zip(flats, weights):
            acc = acc + ff[flat] * w
        outs.append(acc)
    return jnp.stack(outs, axis=-1)


def _hop_perms(nproc: int, m: int):
    """(to_left_by_m, to_right_by_m) ppermute permutations."""
    to_left = [(i, (i - m) % nproc) for i in range(nproc)]
    to_right = [(i, (i + m) % nproc) for i in range(nproc)]
    return to_left, to_right


def _sl(dim: int, a, b):
    """Index tuple selecting [a:b) along dimension dim."""
    return (slice(None),) * dim + (slice(a, b),)


def _halo_reduce(canvas_ext, axis: str, nloc: int, H: int, nproc: int,
                 dim: int = 0):
    """Ghost reduce: add each device's halo blocks into the neighbors'
    interiors, return the complete interior slab (nloc along dim).

    Multi-hop: when H spans more than one slab (H >= nloc), the ghost
    block is split into per-neighbor pieces sent m hops along the ring
    (the reference's pm_ghosts can also reach non-adjacent ranks,
    pmghosts.c:31-131). Requires ceil((H+1)/nloc) <= nproc - 1 ghosts
    per side (checked by the caller's halo ladder) unless nproc == 1,
    where every hop wraps to self (periodic fold).

    dim selects which ARRAY dimension carries the decomposition (0 for
    the slab x-exchange, 1 for the pencil y-exchange)."""
    c = canvas_ext
    R = max(1, -(-H // nloc)) if H else 0
    Rr = max(1, -(-(H + 1) // nloc))
    for m in range(1, R + 1):
        to_left, _ = _hop_perms(nproc, m)
        # my ghost planes belonging to the m-th left neighbor:
        # globals [r0 - min(H, m nloc), r0 - (m-1) nloc)
        a = H - min(H, m * nloc)
        b = H - (m - 1) * nloc
        if b <= a:
            continue
        blk = jax.lax.ppermute(c[_sl(dim, a, b)], axis, to_left)
        # lands on the receiver's interior tail: ext indices
        # [H + max(0, m nloc - H), H + nloc)
        lo = H + max(0, m * nloc - H)
        c = c.at[_sl(dim, lo, H + nloc)].add(blk)
    for m in range(1, Rr + 1):
        _, to_right = _hop_perms(nproc, m)
        # my right ghost piece for the m-th right neighbor:
        # globals [r0 + m nloc, r0 + min(nloc + H + 1, (m+1) nloc))
        a = m * nloc + H
        b = min(nloc + H + 1, (m + 1) * nloc) + H
        if b <= a:
            continue
        blk = jax.lax.ppermute(c[_sl(dim, a, b)], axis, to_right)
        # lands on the receiver's interior head: [H, H + (b - a))
        c = c.at[_sl(dim, H, H + (b - a))].add(blk)
    return c[_sl(dim, H, H + nloc)]


def _halo_gather(field_slab, axis: str, nloc: int, H: int, nproc: int,
                 dim: int = 0):
    """Readout mirror of _halo_reduce: extend the local slab with H
    planes from the left side and H+1 from the right, fetching from as
    many neighbors as the halo spans."""
    R = max(1, -(-H // nloc)) if H else 0
    Rr = max(1, -(-(H + 1) // nloc))
    left_parts = []
    for m in range(R, 0, -1):
        _, to_right = _hop_perms(nproc, m)
        # ext planes [H - min(H, m nloc), H - (m-1) nloc) come from the
        # m-th left neighbor's interior tail
        a = H - min(H, m * nloc)
        b = H - (m - 1) * nloc
        if b <= a:
            continue
        # the sender's planes [max(0, m nloc - H), nloc)
        lo = max(0, m * nloc - H)
        piece = field_slab[_sl(dim, lo, nloc)]
        left_parts.append(jax.lax.ppermute(piece, axis, to_right))
    right_parts = []
    for m in range(1, Rr + 1):
        to_left, _ = _hop_perms(nproc, m)
        # ext planes [m nloc + H, min(nloc+H+1, (m+1) nloc) + H) come
        # from the m-th right neighbor's head
        a = m * nloc
        b = min(nloc + H + 1, (m + 1) * nloc)
        if b <= a:
            continue
        piece = field_slab[_sl(dim, 0, b - a)]
        right_parts.append(jax.lax.ppermute(piece, axis, to_left))
    return jnp.concatenate(left_parts + [field_slab] + right_parts,
                           axis=dim)


def _force_local_homed(spm: SlabPM, x, kernel_type: str, H: int,
                       return_delta_k: bool = False):
    """Single-species shard-local homed force body: positions (Nloc,3)
    -> (acc, bad[, delta_k shard])."""
    outs, bad, dk = _force_local_homed_multi(spm, (x,), (1.0,),
                                             kernel_type, H)
    acc = outs[0]["acc"]
    return (acc, bad, dk) if return_delta_k else (acc, bad)


_HOMED_KERNEL_CACHE = {}


def _homed_trio(shape, vma, interpret, open_y, presorted=False):
    """Build the (prepare, paint, readout3) trio for a homed extended
    shape. Default: the ONE-pass 8-corner kernels with a shared
    eight=True window and base-only range tables (same kernels as the
    single-chip fused path). FASTPM_TPU_HOMED_KERNEL=from4 restores
    the 2-pass kernels (re-measurement escape hatch).

    presorted: the prepare consumes rows ALREADY in extended-cell
    sorted order (the order-free homed carry) and skips the sort +
    un-sort index."""
    from ..ops.paint_pallas import (make_prepare_homed_fn,
                                    make_paint_from4_homed_fn,
                                    make_paint_from8_homed_fn,
                                    auto_window_C)
    from ..ops.readout_pallas import (make_readout3_from4_homed_fn,
                                      make_readout3_from8_homed_fn)
    if os.environ.get("FASTPM_TPU_HOMED_KERNEL", "from8") == "from4":
        return (make_prepare_homed_fn(shape, presorted=presorted),
                make_paint_from4_homed_fn(shape, interpret=interpret,
                                          vma=vma, open_y=open_y),
                make_readout3_from4_homed_fn(shape, interpret=interpret,
                                             vma=vma, open_y=open_y))
    nyp, nzp = shape[1] + 1, shape[2] + 1
    C = auto_window_C(nyp, nzp, eight=True)
    return (make_prepare_homed_fn(shape, C=C, base_only=True,
                                  presorted=presorted),
            make_paint_from8_homed_fn(shape, C=C, interpret=interpret,
                                      vma=vma, open_y=open_y),
            make_readout3_from8_homed_fn(shape, C=C,
                                         interpret=interpret,
                                         vma=vma, open_y=open_y))


def _homed_kernels(shape, axis, interpret=False, presorted=False):
    """Cached Pallas kernel builders for a homed local mesh shape.
    axis is the shard_map mesh axis (the pallas outputs' vma)."""
    key = (tuple(shape), axis, bool(interpret), bool(presorted),
           os.environ.get("FASTPM_TPU_HOMED_KERNEL", "from8"))
    fns = _HOMED_KERNEL_CACHE.get(key)
    if fns is None:
        fns = _homed_trio(shape, {axis}, interpret, open_y=False,
                          presorted=presorted)
        _HOMED_KERNEL_CACHE[key] = fns
    return fns


def _homed_kernels_pencil(shape, axes, interpret=False,
                          presorted=False):
    """Cached Pallas kernel builders for the PENCIL-homed extended
    shape (nlx + 2Hx, nly + 2Hy, Nz): x AND y are open halo axes
    (open_y=True), vma spans both mesh axes."""
    key = (tuple(shape), tuple(axes), bool(interpret), "pencil",
           bool(presorted),
           os.environ.get("FASTPM_TPU_HOMED_KERNEL", "from8"))
    fns = _HOMED_KERNEL_CACHE.get(key)
    if fns is None:
        fns = _homed_trio(shape, set(axes), interpret, open_y=True,
                          presorted=presorted)
        _HOMED_KERNEL_CACHE[key] = fns
    return fns


def _use_pallas_homed(shape) -> bool:
    """The fused Pallas paint/readout engages on TPU-family backends
    for local meshes past the packed-gather crossover (mirrors
    painter._use_pallas + the _PACK8_MAX_CELLS gate)."""
    from ..painter import _PACK8_MAX_CELLS
    if int(np.prod(shape)) <= _PACK8_MAX_CELLS // 8:
        return False
    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:
        return False
    return plat not in ("cpu", "gpu")


def pallas_policy(shape, pallas=None, interpret=False):
    """Resolve (use_pallas, interpret) for a homed force body.
    FASTPM_TPU_PALLAS=on|off|interpret overrides the auto policy --
    'interpret' runs the real kernel programs through the Pallas
    interpreter on CPU (how the multichip dryrun exercises the TPU
    kernel path without a chip)."""
    import os
    env = os.environ.get("FASTPM_TPU_PALLAS", "").lower()
    if env == "off":
        return False, False
    if env == "on":
        return True, interpret
    if env == "interpret":
        return True, True
    if pallas is not None:
        return bool(pallas), interpret
    return _use_pallas_homed(shape), interpret


def _force_local_homed_multi(spm, xs, masses, kernel_type: str, H: int,
                             softening_type: str = "none",
                             compute_potential: bool = False,
                             compute_tidal: bool = False,
                             pallas=None, pallas_interpret=False):
    """Multi-species shard-local homed force (halo-exchange paint and
    readout). Returns ([dict(acc[, potential, tidal])...], bad,
    delta_k shard); bad is the global count of particles beyond the
    halo (must be 0 for a correct force).

    pallas: force the fused Pallas paint/readout on (True), off
    (False), or auto by platform/size (None). Per-particle mass
    columns always use the XLA deposit (the Pallas weights are
    mass-free); the Pallas bundle is still shared with the readout."""
    pm = spm.pm
    nproc = spm.nproc
    nloc = pm.Nmesh[0] // nproc
    r0 = jax.lax.axis_index(spm.axis) * nloc
    n0, n1, n2 = pm.Nmesh
    nx_l = nloc + 2 * H
    shape_local = (nx_l, n1, n2)
    use_pallas, pallas_interpret = pallas_policy(
        shape_local, pallas, pallas_interpret)
    if use_pallas:
        prepare, paint_from, readout3_from = _homed_kernels(
            shape_local, spm.axis, interpret=pallas_interpret)

    canvas_ext = None
    total_mass = 0.0
    bad = jnp.int32(0)
    prepared_list = []
    for x, mass in zip(xs, masses):
        scalar_mass = jnp.ndim(mass) == 0
        if use_pallas:
            relx, iy, iz, frac = _cic_rel(pm, x, r0, H)
            valid = relx < nx_l
            bad = bad + jnp.sum(~valid).astype(jnp.int32)
            # invalid cells sort past the last window: painted nowhere,
            # read out as zero (the caller raises on bad != 0 anyway)
            relx = jnp.where(valid, relx, nx_l + 1)
            # per-particle masses ride the bundle as a mass-weighted
            # corner table (w8T_m), so ncdm FD-split species deposit
            # through the Pallas paint too (VERDICT r3 weak #5); the
            # mass-free w8T still serves the readout
            prepared = prepare(relx, iy, iz, frac,
                               mass=None if scalar_mass else mass)
            prepared_list.append(prepared)
            c = paint_from(prepared, float(mass) if scalar_mass else 1.0)
            canvas_ext = c if canvas_ext is None else canvas_ext + c
        else:
            prepared_list.append(None)
            canvas_ext, b = _paint_homed(pm, nloc, H, r0, x, mass=mass,
                                         canvas=canvas_ext)
            bad = bad + b
        if scalar_mass:
            total_mass = total_mass + jnp.float32(mass) * x.shape[0]
        else:
            total_mass = total_mass + jnp.sum(mass)
    canvas = _halo_reduce(canvas_ext, spm.axis, nloc, H, nproc)
    ntotal = jax.lax.psum(jnp.float32(total_mass), spm.axis)
    bad = jax.lax.psum(bad, spm.axis)
    canvas = canvas / (ntotal / pm.Norm)

    delta_k = spm.r2c_local(canvas)
    delta_k = spm.apply_softening(delta_k, softening_type)

    fields = [("acc", d) for d in range(3)]
    if compute_potential:
        fields.append(("potential", 0))
    if compute_tidal:
        fields += [("tidal", m) for m in range(6)]

    if (not compute_potential and not compute_tidal
            and hasattr(spm, "c2r_grad3_local")):
        # fused distributed 3-gradient inverse: shared x-stage +
        # shared all_to_all for grad_y/grad_z, diff tables folded
        # into the synthesis matrices (2 transposes instead of 3)
        potorder, gradorder, _d, deconv = kernel_orders(kernel_type)
        out = delta_k
        for _ in range(deconv):
            out = spm.apply_decic(out)
        pot_k = spm.apply_pot(out, potorder)
        locs = spm.c2r_grad3_local(pot_k, gradorder)
        fields_ext = [_halo_gather(g, spm.axis, nloc, H, nproc)
                      for g in locs]
    else:
        fields_ext = []
        for name, memb in fields:
            fk = _apply_kernel_local(spm, delta_k, kernel_type, name,
                                     memb)
            local = spm.c2r_local(fk)
            fields_ext.append(_halo_gather(local, spm.axis, nloc, H,
                                           nproc))

    outs = []
    for x, prepared in zip(xs, prepared_list):
        if use_pallas and prepared is not None:
            acc3 = readout3_from(prepared, fields_ext[0], fields_ext[1],
                                 fields_ext[2])
            extra = fields_ext[3:]
            if extra:
                rest = _readout_homed(pm, nloc, H, r0, x, extra)
                vals = jnp.concatenate([acc3, rest], axis=-1)
            else:
                vals = acc3
        else:
            vals = _readout_homed(pm, nloc, H, r0, x, fields_ext)
        d = dict(acc=vals[:, :3])
        i = 3
        if compute_potential:
            d["potential"] = vals[:, i]
            i += 1
        if compute_tidal:
            d["tidal"] = vals[:, i:i + 6]
        outs.append(d)
    return outs, bad, delta_k


def _grad3_fields_homed(spm, delta_k, kernel_type, gather):
    """Shared tail of the homed force bodies: potential transfer +
    fused 3-gradient inverse (or the per-field fallback), then the
    halo gather of each gradient. gather(field) -> extended field."""
    if hasattr(spm, "c2r_grad3_local"):
        potorder, gradorder, _d, deconv = kernel_orders(kernel_type)
        out = delta_k
        for _ in range(deconv):
            out = spm.apply_decic(out)
        pot_k = spm.apply_pot(out, potorder)
        locs = spm.c2r_grad3_local(pot_k, gradorder)
        return [gather(g) for g in locs]
    fields_ext = []
    for memb in range(3):
        fk = _apply_kernel_local(spm, delta_k, kernel_type, "acc",
                                 memb)
        fields_ext.append(gather(spm.c2r_local(fk)))
    return fields_ext


def _force_local_homed_carry(spm, x, v, extras, kernel_type, H,
                             softening_type: str = "none",
                             pallas=None, pallas_interpret=False):
    """ORDER-FREE single-species homed force (the shard-local analog of
    gravity.compute_force_carry): every per-particle column rides the
    extended-cell sort, the presorted one-pass kernels run without an
    un-sort index, and the readout values come out aligned with the
    permuted rows. Particle order within a shard is physically
    meaningless (the reference's own store order is
    decomposition-defined, store.c:486-657), so the per-step un-sort
    payload sort disappears from the multichip hot loop (VERDICT r4
    next #1).

    Returns (xs, vs, extras_sorted, acc, bad, delta_k). Scalar-mass
    single species only; the caller wraps x beforehand (or folds the
    wrap into the same program)."""
    pm = spm.pm
    nproc = spm.nproc
    nloc = pm.Nmesh[0] // nproc
    r0 = jax.lax.axis_index(spm.axis) * nloc
    n0, n1, n2 = pm.Nmesh
    nx_l = nloc + 2 * H
    nyp, nzp = n1 + 1, n2 + 1
    shape_local = (nx_l, n1, n2)
    use_pallas, pallas_interpret = pallas_policy(
        shape_local, pallas, pallas_interpret)
    if not use_pallas:
        raise ValueError("the homed carry needs the fused Pallas "
                         "kernels (pallas_policy said no)")
    prepare, paint_from, readout3_from = _homed_kernels(
        shape_local, spm.axis, interpret=pallas_interpret,
        presorted=True)

    relx, iy, iz, _fr = _cic_rel(pm, x, r0, H)
    valid = relx < nx_l
    bad = jnp.sum(~valid).astype(jnp.int32)
    relx = jnp.where(valid, relx, nx_l + 1)
    cell = (relx * nyp + iy) * nzp + iz
    ops_in = (cell, x[:, 0], x[:, 1], x[:, 2],
              v[:, 0], v[:, 1], v[:, 2]) + tuple(extras)
    sorted_ops = jax.lax.sort(ops_in, num_keys=1)
    xs = jnp.stack(sorted_ops[1:4], axis=-1)
    vs = jnp.stack(sorted_ops[4:7], axis=-1)
    extras_s = sorted_ops[7:]
    # recompute the cell tuple from the sorted positions -- the same
    # pure function of x, so bit-identical per row (and the recomputed
    # keys are already sorted)
    relx2, iy2, iz2, fr = _cic_rel(pm, xs, r0, H)
    relx2 = jnp.where(relx2 < nx_l, relx2, nx_l + 1)
    prepared = prepare(relx2, iy2, iz2, fr)

    canvas_ext = paint_from(prepared)
    canvas = _halo_reduce(canvas_ext, spm.axis, nloc, H, nproc)
    ntotal = jax.lax.psum(jnp.float32(x.shape[0]), spm.axis)
    bad = jax.lax.psum(bad, spm.axis)
    canvas = canvas / (ntotal / pm.Norm)

    delta_k = spm.r2c_local(canvas)
    delta_k = spm.apply_softening(delta_k, softening_type)

    fields_ext = _grad3_fields_homed(
        spm, delta_k, kernel_type,
        lambda g: _halo_gather(g, spm.axis, nloc, H, nproc))
    acc = readout3_from(prepared, fields_ext[0], fields_ext[1],
                        fields_ext[2])
    return xs, vs, extras_s, acc, bad, delta_k


def _force_local_homed_pencil_carry(ppm, x, v, extras,
                                    kernel_type, Hx, Hy,
                                    softening_type: str = "none",
                                    pallas=None,
                                    pallas_interpret=False):
    """Pencil (2D) variant of _force_local_homed_carry: rows sort by
    the extended 2D cell; the presorted open_y kernels run without an
    un-sort. Returns (xs, vs, extras_sorted, acc, bad, delta_k)."""
    pm = ppm.pm
    px, py = ppm.px, ppm.py
    ax0, ax1 = ppm.ax0, ppm.ax1
    n0, n1, n2 = pm.Nmesh
    nlx, nly = n0 // px, n1 // py
    r0x = jax.lax.axis_index(ax0) * nlx
    r0y = jax.lax.axis_index(ax1) * nly
    nx_l, ny_l = nlx + 2 * Hx, nly + 2 * Hy
    nyp, nzp = ny_l + 1, n2 + 1
    shape_local = (nx_l, ny_l, n2)
    use_pallas, pallas_interpret = pallas_policy(
        shape_local, pallas, pallas_interpret)
    if not use_pallas:
        raise ValueError("the homed carry needs the fused Pallas "
                         "kernels (pallas_policy said no)")
    prepare, paint_from, readout3_from = _homed_kernels_pencil(
        shape_local, (ax0, ax1), interpret=pallas_interpret,
        presorted=True)

    relx, rely, iz, _fr = _cic_rel2(pm, x, r0x, r0y, Hx, Hy)
    valid = (relx < nx_l) & (rely < ny_l)
    bad = jnp.sum(~valid).astype(jnp.int32)
    relx = jnp.where(valid, relx, nx_l + 1)
    rely = jnp.where(valid, rely, 0)
    cell = (relx * nyp + rely) * nzp + iz
    ops_in = (cell, x[:, 0], x[:, 1], x[:, 2],
              v[:, 0], v[:, 1], v[:, 2]) + tuple(extras)
    sorted_ops = jax.lax.sort(ops_in, num_keys=1)
    xs = jnp.stack(sorted_ops[1:4], axis=-1)
    vs = jnp.stack(sorted_ops[4:7], axis=-1)
    extras_s = sorted_ops[7:]
    relx2, rely2, iz2, fr = _cic_rel2(pm, xs, r0x, r0y, Hx, Hy)
    valid2 = (relx2 < nx_l) & (rely2 < ny_l)
    relx2 = jnp.where(valid2, relx2, nx_l + 1)
    rely2 = jnp.where(valid2, rely2, 0)
    prepared = prepare(relx2, rely2, iz2, fr)

    canvas_ext = paint_from(prepared)
    c = _halo_reduce(canvas_ext, ax0, nlx, Hx, px, dim=0)
    c = _halo_reduce(c, ax1, nly, Hy, py, dim=1)
    ntotal = jax.lax.psum(jnp.float32(x.shape[0]), (ax0, ax1))
    bad = jax.lax.psum(bad, (ax0, ax1))
    canvas = c / (ntotal / pm.Norm)

    delta_k = ppm.r2c_local(canvas)
    delta_k = ppm.apply_softening(delta_k, softening_type)

    def gather2(g):
        f = _halo_gather(g, ax1, nly, Hy, py, dim=1)
        return _halo_gather(f, ax0, nlx, Hx, px, dim=0)

    fields_ext = _grad3_fields_homed(ppm, delta_k, kernel_type,
                                     gather2)
    acc = readout3_from(prepared, fields_ext[0], fields_ext[1],
                        fields_ext[2])
    return xs, vs, extras_s, acc, bad, delta_k


# ---- v4 "rehomed" slab force: sort-based particle migration -------------
#
# The store.c:486-657 + permute.c analog, TPU-first: instead of growing
# the halo width H with the global max displacement (which makes the
# ghost volume rival the interior at late times, MEMSCALE 2048^3), each
# force step ENDS by migrating boundary-crossers to their owner slab:
#
# - per-device rows are a fixed-capacity buffer (R = cap + 2B rows) with
#   an explicit alive flag; dead rows sort to the end of the carry sort
#   (their cell key is forced past the last window) and weigh zero in
#   the paint/readout,
# - after the force's OWN cell sort, this step's movers are CONTIGUOUS:
#   left-movers are the sorted prefix (relx < H), right-movers the
#   valid suffix (relx >= H + nloc) -- three searchsorted scalars give
#   the block bounds, so migration is two static-size slices + two
#   neighbor ppermutes of a bitcast-packed (B, ncols) matrix; no extra
#   sort, no scatter, no nonzero,
# - the output drops the sent movers by ONE dynamic-start slice
#   (dynamic_slice(sorted, n_left, cap)) and appends the two arrival
#   buffers -- the next force's sort folds them in.
#
# With migration every force, the halo requirement stays at the CIC
# support + one step's drift (H <= 4 regardless of epoch); overflow of
# any contract (halo, bucket B, capacity cap, hop > 1) is counted into
# the returned bad. Requires H <= nloc (movers belong to the immediate
# neighbor).


def _pack_cols_f32(cols):
    """Stack mixed-dtype 1D columns as one (n, ncols) f32 matrix
    (bitcast transport for the migration ppermute)."""
    return jnp.stack(
        [jax.lax.bitcast_convert_type(
            c if c.dtype.itemsize == 4 else c.astype(jnp.float32),
            jnp.float32) for c in cols], axis=1)


def _force_local_homed_rehome(spm, x, v, alive, extras, kernel_type,
                              H: int, B: int,
                              softening_type: str = "none",
                              pallas=None, pallas_interpret=False):
    """Order-free homed force WITH end-of-step migration (see module
    comment above). Rows: R = cap + 2B per device; at most cap may be
    alive. Returns (xs, vs, alive_out, extras_sorted, acc, bad,
    delta_k) -- all (R,) rows, migrated; bad > 0 means a contract
    (halo / bucket / capacity) overflowed and the result is invalid."""
    pm = spm.pm
    nproc = spm.nproc
    nloc = pm.Nmesh[0] // nproc
    if H > nloc:
        raise ValueError("rehoming requires H <= nloc")
    r0 = jax.lax.axis_index(spm.axis) * nloc
    n0, n1, n2 = pm.Nmesh
    nx_l = nloc + 2 * H
    nyp, nzp = n1 + 1, n2 + 1
    shape_local = (nx_l, n1, n2)
    R = x.shape[0]
    cap = R - 2 * B
    use_pallas, pallas_interpret = pallas_policy(
        shape_local, pallas, pallas_interpret)
    if not use_pallas:
        raise ValueError("the rehomed carry needs the fused Pallas "
                         "kernels (pallas_policy said no)")
    prepare, paint_from, readout3_from = _homed_kernels(
        shape_local, spm.axis, interpret=pallas_interpret,
        presorted=True)

    def masked_rel(xq, alive_b):
        relx, iy, iz, fr = _cic_rel(pm, xq, r0, H)
        ok = alive_b & (relx < nx_l)
        relx = jnp.where(ok, relx, nx_l + 1)
        iy = jnp.where(ok, iy, 0)
        iz = jnp.where(ok, iz, 0)
        return relx, iy, iz, fr, ok

    alive_b = alive > 0
    relx, iy, iz, _fr, ok = masked_rel(x, alive_b)
    # halo overflow: ALIVE rows beyond the extended slab
    bad = jnp.sum(alive_b & jnp.logical_not(ok)).astype(jnp.int32)
    cell = (relx * nyp + iy) * nzp + iz
    ops_in = (cell, x[:, 0], x[:, 1], x[:, 2],
              v[:, 0], v[:, 1], v[:, 2],
              alive.astype(jnp.uint8) if alive.dtype == jnp.bool_
              else alive) + tuple(extras)
    sorted_ops = jax.lax.sort(ops_in, num_keys=1)
    cell_s = sorted_ops[0]
    xs = jnp.stack(sorted_ops[1:4], axis=-1)
    vs = jnp.stack(sorted_ops[4:7], axis=-1)
    alive_s = sorted_ops[7]
    extras_s = sorted_ops[8:]
    relx2, iy2, iz2, fr2, _ok2 = masked_rel(xs, alive_s > 0)
    prepared = prepare(relx2, iy2, iz2, fr2)

    canvas_ext = paint_from(prepared)
    canvas = _halo_reduce(canvas_ext, spm.axis, nloc, H, nproc)
    ntotal = jax.lax.psum(
        jnp.sum((alive_s > 0).astype(jnp.float32)), spm.axis)
    canvas = canvas / (ntotal / pm.Norm)
    delta_k = spm.r2c_local(canvas)
    delta_k = spm.apply_softening(delta_k, softening_type)
    fields_ext = _grad3_fields_homed(
        spm, delta_k, kernel_type,
        lambda g: _halo_gather(g, spm.axis, nloc, H, nproc))
    acc = readout3_from(prepared, fields_ext[0], fields_ext[1],
                        fields_ext[2])

    # ---- migration on the fresh sort ----
    bounds = jnp.searchsorted(
        cell_s, jnp.asarray([H * nyp * nzp,
                             (H + nloc) * nyp * nzp,
                             (nx_l + 1) * nyp * nzp],
                            dtype=jnp.int32)).astype(jnp.int32)
    n_l, n_r0, E = bounds[0], bounds[1], bounds[2]
    n_stay = n_r0 - n_l
    n_right = E - n_r0
    # contract checks fold into bad (any nonzero invalidates the step)
    bad = bad + jnp.where(n_l > B, n_l - B, 0)
    bad = bad + jnp.where(n_right > B, n_right - B, 0)
    bad = bad + jnp.where(n_stay > cap, n_stay - cap, 0)
    # the keep slice's dynamic start clamps at 2B
    bad = bad + jnp.where(n_l > 2 * B, n_l, 0)

    # column set riding the migration: x(3) v(3) acc(3) extras, plus
    # the EXPLICIT alive flag. Transport is pure data movement (bitcast
    # pack + ppermute + slices); masked-out rows are marked dead via
    # the alive column ONLY -- never by multiplying values (TPU f32
    # multiplies flush subnormals, which would corrupt bitcast integer
    # lanes like the ids).
    aliveu = alive_s.astype(jnp.uint32)
    cols_mv = ([xs[:, j] for j in range(3)]
               + [vs[:, j] for j in range(3)]
               + [acc[:, j] for j in range(3)]
               + list(extras_s))
    dtypes = [jnp.float32] * 9 + [e.dtype for e in extras_s]
    iota_b = jnp.arange(B, dtype=jnp.int32)

    # left buffer rows [0, B): alive iff row < n_l (all rows < n_l are
    # alive movers by the sort order)
    l_alive = jnp.where(iota_b < n_l, aliveu[:B], 0)
    leftbuf = jnp.concatenate(
        [_pack_cols_f32([c[:B] for c in cols_mv]),
         jax.lax.bitcast_convert_type(l_alive, jnp.float32)[:, None]],
        axis=1)
    # right buffer rows [E-B, E): alive iff global index in [n_r0, E)
    start = jnp.maximum(E - B, 0)
    ridx = start + iota_b
    right_ok = (ridx >= n_r0) & (ridx < E)
    r_alive = jnp.where(
        right_ok, jax.lax.dynamic_slice(aliveu, (start,), (B,)), 0)
    rightbuf = jnp.concatenate(
        [_pack_cols_f32([jax.lax.dynamic_slice(c, (start,), (B,))
                         for c in cols_mv]),
         jax.lax.bitcast_convert_type(r_alive, jnp.float32)[:, None]],
        axis=1)

    to_left, to_right = _ring_perms(nproc)
    recv_from_right = jax.lax.ppermute(leftbuf, spm.axis, to_left)
    recv_from_left = jax.lax.ppermute(rightbuf, spm.axis, to_right)

    # keep: stayers slide to the front (ONE dynamic-start static-size
    # slice per column); rows past n_stay are marked dead
    ks = jnp.minimum(n_l, 2 * B)
    keep_alive = jnp.where(
        jnp.arange(cap, dtype=jnp.int32) < n_stay,
        jax.lax.dynamic_slice(aliveu, (ks,), (cap,)), 0)

    def merge_col(c_sorted, recv_l_col, recv_r_col):
        k = jax.lax.dynamic_slice(c_sorted, (ks,), (cap,))
        return jnp.concatenate([k, recv_l_col, recv_r_col])

    cols_o = []
    for j, dt in enumerate(dtypes):
        rl = recv_from_left[:, j]
        rr = recv_from_right[:, j]
        if dt != jnp.float32:
            rl = jax.lax.bitcast_convert_type(rl, dt) \
                if jnp.dtype(dt).itemsize == 4 \
                else jax.lax.bitcast_convert_type(
                    rl, jnp.float32).astype(dt)
            rr = jax.lax.bitcast_convert_type(rr, dt) \
                if jnp.dtype(dt).itemsize == 4 \
                else jax.lax.bitcast_convert_type(
                    rr, jnp.float32).astype(dt)
        cols_o.append(merge_col(cols_mv[j], rl, rr))
    alive_o = jnp.concatenate(
        [keep_alive,
         jax.lax.bitcast_convert_type(recv_from_left[:, -1],
                                      jnp.uint32),
         jax.lax.bitcast_convert_type(recv_from_right[:, -1],
                                      jnp.uint32)]).astype(alive.dtype)
    xs_o = jnp.stack(cols_o[0:3], axis=-1)
    vs_o = jnp.stack(cols_o[3:6], axis=-1)
    acc_o = jnp.stack(cols_o[6:9], axis=-1)
    extras_o = tuple(cols_o[9:])
    bad = jax.lax.psum(bad, spm.axis)
    return xs_o, vs_o, alive_o, extras_o, acc_o, bad, delta_k


# ---- split (pre/post) bodies: transfers needing a host round trip ------
#
# The neutrino linear response multiplies delta_k by a 1D table that
# depends on THIS step's measured P_cdm(k) (gravity.c:431-455): the
# force must split into two programs around one small host fetch. pre =
# density half (sort/paint/reduce/r2c/soften), post = kernels half
# (presorted prepare + fk-interp transfer + gradients + readout). The
# non-carry fallback is the v1 full-canvas split (_force_local_multi
# split in the solver's LRA branch).


def _force_local_homed_carry_pre(spm, x, v, extras, H,
                                 softening_type: str = "none",
                                 pallas=None, pallas_interpret=False):
    """Density half of the order-free homed force. Returns
    (xs, vs, extras_sorted, bad, delta_k shard)."""
    pm = spm.pm
    nproc = spm.nproc
    nloc = pm.Nmesh[0] // nproc
    r0 = jax.lax.axis_index(spm.axis) * nloc
    n0, n1, n2 = pm.Nmesh
    nx_l = nloc + 2 * H
    nyp, nzp = n1 + 1, n2 + 1
    shape_local = (nx_l, n1, n2)
    use_pallas, pallas_interpret = pallas_policy(
        shape_local, pallas, pallas_interpret)
    if not use_pallas:
        raise ValueError("the homed carry needs the fused Pallas "
                         "kernels (pallas_policy said no)")
    prepare, paint_from, _ro = _homed_kernels(
        shape_local, spm.axis, interpret=pallas_interpret,
        presorted=True)

    relx, iy, iz, _fr = _cic_rel(pm, x, r0, H)
    valid = relx < nx_l
    bad = jnp.sum(~valid).astype(jnp.int32)
    relx = jnp.where(valid, relx, nx_l + 1)
    cell = (relx * nyp + iy) * nzp + iz
    ops_in = (cell, x[:, 0], x[:, 1], x[:, 2],
              v[:, 0], v[:, 1], v[:, 2]) + tuple(extras)
    sorted_ops = jax.lax.sort(ops_in, num_keys=1)
    xs = jnp.stack(sorted_ops[1:4], axis=-1)
    vs = jnp.stack(sorted_ops[4:7], axis=-1)
    extras_s = sorted_ops[7:]
    relx2, iy2, iz2, fr = _cic_rel(pm, xs, r0, H)
    relx2 = jnp.where(relx2 < nx_l, relx2, nx_l + 1)
    prepared = prepare(relx2, iy2, iz2, fr)

    canvas_ext = paint_from(prepared)
    canvas = _halo_reduce(canvas_ext, spm.axis, nloc, H, nproc)
    ntotal = jax.lax.psum(jnp.float32(x.shape[0]), spm.axis)
    bad = jax.lax.psum(bad, spm.axis)
    canvas = canvas / (ntotal / pm.Norm)
    delta_k = spm.r2c_local(canvas)
    delta_k = spm.apply_softening(delta_k, softening_type)
    return xs, vs, extras_s, bad, delta_k


def _force_local_homed_carry_post(spm, xs, delta_k, kernel_type, H,
                                  logk, vals, pallas=None,
                                  pallas_interpret=False):
    """Kernels half: fk-interp transfer (the LRA table as data) +
    gradients + halo gather + presorted readout. Returns
    (acc, delta_k with the transfer applied)."""
    pm = spm.pm
    nproc = spm.nproc
    nloc = pm.Nmesh[0] // nproc
    r0 = jax.lax.axis_index(spm.axis) * nloc
    n0, n1, n2 = pm.Nmesh
    nx_l = nloc + 2 * H
    shape_local = (nx_l, n1, n2)
    use_pallas, pallas_interpret = pallas_policy(
        shape_local, pallas, pallas_interpret)
    if not use_pallas:
        raise ValueError("the homed carry needs the fused Pallas "
                         "kernels (pallas_policy said no)")
    prepare, _pf, readout3_from = _homed_kernels(
        shape_local, spm.axis, interpret=pallas_interpret,
        presorted=True)
    relx2, iy2, iz2, fr = _cic_rel(pm, xs, r0, H)
    relx2 = jnp.where(relx2 < nx_l, relx2, nx_l + 1)
    prepared = prepare(relx2, iy2, iz2, fr)

    delta_k = spm.apply_fk_interp(delta_k, logk, vals)
    fields_ext = _grad3_fields_homed(
        spm, delta_k, kernel_type,
        lambda g: _halo_gather(g, spm.axis, nloc, H, nproc))
    acc = readout3_from(prepared, fields_ext[0], fields_ext[1],
                        fields_ext[2])
    return acc, delta_k


def _force_local_homed_pencil_carry_pre(ppm, x, v, extras, Hx, Hy,
                                        softening_type: str = "none",
                                        pallas=None,
                                        pallas_interpret=False):
    """Pencil density half of the order-free carry split."""
    pm = ppm.pm
    px, py = ppm.px, ppm.py
    ax0, ax1 = ppm.ax0, ppm.ax1
    n0, n1, n2 = pm.Nmesh
    nlx, nly = n0 // px, n1 // py
    r0x = jax.lax.axis_index(ax0) * nlx
    r0y = jax.lax.axis_index(ax1) * nly
    nx_l, ny_l = nlx + 2 * Hx, nly + 2 * Hy
    nyp, nzp = ny_l + 1, n2 + 1
    shape_local = (nx_l, ny_l, n2)
    use_pallas, pallas_interpret = pallas_policy(
        shape_local, pallas, pallas_interpret)
    if not use_pallas:
        raise ValueError("the homed carry needs the fused Pallas "
                         "kernels (pallas_policy said no)")
    prepare, paint_from, _ro = _homed_kernels_pencil(
        shape_local, (ax0, ax1), interpret=pallas_interpret,
        presorted=True)

    relx, rely, iz, _fr = _cic_rel2(pm, x, r0x, r0y, Hx, Hy)
    valid = (relx < nx_l) & (rely < ny_l)
    bad = jnp.sum(~valid).astype(jnp.int32)
    relx = jnp.where(valid, relx, nx_l + 1)
    rely = jnp.where(valid, rely, 0)
    cell = (relx * nyp + rely) * nzp + iz
    ops_in = (cell, x[:, 0], x[:, 1], x[:, 2],
              v[:, 0], v[:, 1], v[:, 2]) + tuple(extras)
    sorted_ops = jax.lax.sort(ops_in, num_keys=1)
    xs = jnp.stack(sorted_ops[1:4], axis=-1)
    vs = jnp.stack(sorted_ops[4:7], axis=-1)
    extras_s = sorted_ops[7:]
    relx2, rely2, iz2, fr = _cic_rel2(pm, xs, r0x, r0y, Hx, Hy)
    valid2 = (relx2 < nx_l) & (rely2 < ny_l)
    relx2 = jnp.where(valid2, relx2, nx_l + 1)
    rely2 = jnp.where(valid2, rely2, 0)
    prepared = prepare(relx2, rely2, iz2, fr)

    canvas_ext = paint_from(prepared)
    c = _halo_reduce(canvas_ext, ax0, nlx, Hx, px, dim=0)
    c = _halo_reduce(c, ax1, nly, Hy, py, dim=1)
    ntotal = jax.lax.psum(jnp.float32(x.shape[0]), (ax0, ax1))
    bad = jax.lax.psum(bad, (ax0, ax1))
    canvas = c / (ntotal / pm.Norm)
    delta_k = ppm.r2c_local(canvas)
    delta_k = ppm.apply_softening(delta_k, softening_type)
    return xs, vs, extras_s, bad, delta_k


def _force_local_homed_pencil_carry_post(ppm, xs, delta_k,
                                         kernel_type, Hx, Hy,
                                         logk, vals, pallas=None,
                                         pallas_interpret=False):
    """Pencil kernels half of the order-free carry split."""
    pm = ppm.pm
    px, py = ppm.px, ppm.py
    ax0, ax1 = ppm.ax0, ppm.ax1
    n0, n1, n2 = pm.Nmesh
    nlx, nly = n0 // px, n1 // py
    r0x = jax.lax.axis_index(ax0) * nlx
    r0y = jax.lax.axis_index(ax1) * nly
    nx_l, ny_l = nlx + 2 * Hx, nly + 2 * Hy
    shape_local = (nx_l, ny_l, n2)
    use_pallas, pallas_interpret = pallas_policy(
        shape_local, pallas, pallas_interpret)
    if not use_pallas:
        raise ValueError("the homed carry needs the fused Pallas "
                         "kernels (pallas_policy said no)")
    prepare, _pf, readout3_from = _homed_kernels_pencil(
        shape_local, (ax0, ax1), interpret=pallas_interpret,
        presorted=True)
    relx2, rely2, iz2, fr = _cic_rel2(pm, xs, r0x, r0y, Hx, Hy)
    valid2 = (relx2 < nx_l) & (rely2 < ny_l)
    relx2 = jnp.where(valid2, relx2, nx_l + 1)
    rely2 = jnp.where(valid2, rely2, 0)
    prepared = prepare(relx2, rely2, iz2, fr)

    delta_k = ppm.apply_fk_interp(delta_k, logk, vals)

    def gather2(g):
        f = _halo_gather(g, ax1, nly, Hy, py, dim=1)
        return _halo_gather(f, ax0, nlx, Hx, px, dim=0)

    fields_ext = _grad3_fields_homed(ppm, delta_k, kernel_type,
                                     gather2)
    acc = readout3_from(prepared, fields_ext[0], fields_ext[1],
                        fields_ext[2])
    return acc, delta_k


def _force_local_multi_pre(spm, painter, xs, masses,
                           softening_type: str = "none"):
    """v1 density half (any species mix): paint + reduce + r2c +
    soften. Returns delta_k shard."""
    pm = spm.pm
    canvas, ntotal = _paint_delta_k_local(spm, painter, xs, masses)
    canvas = canvas / (ntotal / pm.Norm)
    delta_k = spm.r2c_local(canvas)
    return spm.apply_softening(delta_k, softening_type)


def _force_local_multi_post(spm, painter, xs, delta_k, kernel_type,
                            logk, vals,
                            compute_potential: bool = False,
                            compute_tidal: bool = False):
    """v1 kernels half: fk-interp transfer + kernels + c2r + gather +
    readout for every species. Returns ([dict...], delta_k)."""
    delta_k = spm.apply_fk_interp(delta_k, logk, vals)
    fields = [("acc", d) for d in range(3)]
    if compute_potential:
        fields.append(("potential", 0))
    if compute_tidal:
        fields += [("tidal", m) for m in range(6)]
    fulls = []
    for name, memb in fields:
        fk = _apply_kernel_local(spm, delta_k, kernel_type, name, memb)
        local = spm.c2r_local(fk)
        fulls.append(spm.gather_canvas(local))
    outs = []
    for x in xs:
        vals_r = [painter.readout(f, x) for f in fulls]
        d = dict(acc=jnp.stack(vals_r[:3], axis=-1))
        i = 3
        if compute_potential:
            d["potential"] = vals_r[i]
            i += 1
        if compute_tidal:
            d["tidal"] = jnp.stack(vals_r[i:i + 6], axis=-1)
        outs.append(d)
    return outs, delta_k


# ---- v3 "pencil-homed" force: 2D halo exchange on the true pencil ------
#
# The 2D analog of the homed slab (the reference's production layout,
# pmpfft.c:108-260: 2D process mesh over x,y; z local). Device (i, j)
# owns the particles whose Lagrangian q lies in x-block i, y-block j
# (pencil-blocked row order, store.lattice_store(blocks=...)), paints
# into its pencil extended by (Hx, Hy) halo planes, and exchanges halo
# BLOCKS with x- then y-neighbors -- corners ride through the two-phase
# exchange exactly like the reference's 2D ghost regions
# (pmghosts.c:31-131 probes the x,y window jointly).


def _cic_rel2(pm: PM, x, r0x, r0y, Hx: int, Hy: int):
    """Base cell / fraction / extended-pencil x,y indices for CIC on
    the extended local pencil. Returns (relx, rely, iz, frac)."""
    n0, n1, n2 = pm.Nmesh
    inv_cell = jnp.asarray(pm.InvCellSize, dtype=x.dtype)
    gpos = x * inv_cell
    base = jnp.floor(gpos).astype(jnp.int32)
    frac = (gpos - base).astype(jnp.float32)
    bx = jnp.remainder(base[:, 0], n0)
    by = jnp.remainder(base[:, 1], n1)
    iz = jnp.remainder(base[:, 2], n2)
    relx = jnp.remainder(bx - r0x + Hx, n0)
    rely = jnp.remainder(by - r0y + Hy, n1)
    return relx, rely, iz, frac


def _paint_homed2(pm: PM, nlx: int, nly: int, Hx: int, Hy: int,
                  r0x, r0y, x, mass=1.0, canvas=None):
    """CIC-deposit into the extended local pencil
    (nlx + 2Hx + 1, nly + 2Hy + 1, Nz); x and y open, z periodic.
    Returns (canvas_ext, local bad count)."""
    n0, n1, n2 = pm.Nmesh
    ext_x = nlx + 2 * Hx + 1
    ext_y = nly + 2 * Hy + 1
    relx, rely, iz, frac = _cic_rel2(pm, x, r0x, r0y, Hx, Hy)
    valid = (relx < nlx + 2 * Hx) & (rely < nly + 2 * Hy)
    bad = jnp.sum(~valid).astype(jnp.int32)
    relx = jnp.where(valid, relx, 0)
    rely = jnp.where(valid, rely, 0)
    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
    w0 = jnp.where(valid, 1.0, 0.0) * mass
    if canvas is None:
        canvas = jnp.zeros((ext_x * ext_y * n2,), dtype=pm.dtype)
    else:
        canvas = canvas.reshape(-1)
    for dx in (0, 1):
        wx = (1.0 - fx) if dx == 0 else fx
        ix = relx + dx
        for dy in (0, 1):
            wy = (1.0 - fy) if dy == 0 else fy
            jy = rely + dy
            for dz in (0, 1):
                wz = (1.0 - fz) if dz == 0 else fz
                jz = iz + dz
                jz = jnp.where(jz == n2, 0, jz)
                flat = (ix * ext_y + jy) * n2 + jz
                canvas = canvas.at[flat].add(
                    (w0 * wx * wy * wz).astype(pm.dtype))
    return canvas.reshape(ext_x, ext_y, n2), bad


def _readout_homed2(pm: PM, nlx: int, nly: int, Hx: int, Hy: int,
                    r0x, r0y, x, fields_ext):
    """CIC-interpolate each extended pencil field at x.
    Returns (N, len(fields_ext))."""
    n0, n1, n2 = pm.Nmesh
    ext_y = nly + 2 * Hy + 1
    relx, rely, iz, frac = _cic_rel2(pm, x, r0x, r0y, Hx, Hy)
    valid = (relx < nlx + 2 * Hx) & (rely < nly + 2 * Hy)
    relx = jnp.where(valid, relx, 0)
    rely = jnp.where(valid, rely, 0)
    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
    w0 = jnp.where(valid, 1.0, 0.0)
    flats = []
    weights = []
    for dx in (0, 1):
        wx = (1.0 - fx) if dx == 0 else fx
        ix = relx + dx
        for dy in (0, 1):
            wy = (1.0 - fy) if dy == 0 else fy
            jy = rely + dy
            for dz in (0, 1):
                wz = (1.0 - fz) if dz == 0 else fz
                jz = iz + dz
                jz = jnp.where(jz == n2, 0, jz)
                flats.append((ix * ext_y + jy) * n2 + jz)
                weights.append(w0 * wx * wy * wz)
    outs = []
    for f in fields_ext:
        ff = f.reshape(-1)
        acc = 0.0
        for flat, w in zip(flats, weights):
            acc = acc + ff[flat] * w
        outs.append(acc)
    return jnp.stack(outs, axis=-1)


def _force_local_homed_pencil_multi(ppm, xs, masses, kernel_type: str,
                                    Hx: int, Hy: int,
                                    softening_type: str = "none",
                                    compute_potential: bool = False,
                                    compute_tidal: bool = False,
                                    pallas=None,
                                    pallas_interpret=False):
    """Multi-species shard-local pencil-homed force: 2D halo-exchange
    paint/readout + the PencilPM two-transpose FFT. Particle rows must
    be pencil-blocked (store.lattice_store(blocks=(px, py))).

    Exchange order: x-reduce first (halo blocks carry the full extended
    y width, so corner contributions hop x then y), then y-reduce; the
    readout gathers mirror in reverse (y then x). All four exchanges
    are neighbor ppermutes of O(H * Nmesh^2 / P)-sized blocks.

    pallas: force the fused Pallas paint/readout (open_y kernels) on
    (True), off (False), or auto by platform/size (None) -- without
    them the pencil path pays XLA scatter/gather rates on real chips
    (VERDICT r3 partial #51). Per-particle-mass species ride the
    mass-weighted bundle (w8T_m).

    Returns ([dict(acc[, potential, tidal])...], bad, delta_k shard)."""
    pm = ppm.pm
    px, py = ppm.px, ppm.py
    ax0, ax1 = ppm.ax0, ppm.ax1
    n0, n1, n2 = pm.Nmesh
    nlx, nly = n0 // px, n1 // py
    r0x = jax.lax.axis_index(ax0) * nlx
    r0y = jax.lax.axis_index(ax1) * nly
    nx_l, ny_l = nlx + 2 * Hx, nly + 2 * Hy
    shape_local = (nx_l, ny_l, n2)
    use_pallas, pallas_interpret = pallas_policy(
        shape_local, pallas, pallas_interpret)
    if use_pallas:
        prepare, paint_from, readout3_from = _homed_kernels_pencil(
            shape_local, (ax0, ax1), interpret=pallas_interpret)

    canvas_ext = None
    total_mass = 0.0
    bad = jnp.int32(0)
    prepared_list = []
    for x, mass in zip(xs, masses):
        scalar_mass = jnp.ndim(mass) == 0
        if use_pallas:
            relx, rely, iz, frac = _cic_rel2(pm, x, r0x, r0y, Hx, Hy)
            valid = (relx < nx_l) & (rely < ny_l)
            bad = bad + jnp.sum(~valid).astype(jnp.int32)
            # invalid cells sort past the last window: painted nowhere,
            # read out as zero (the caller raises on bad != 0 anyway)
            relx = jnp.where(valid, relx, nx_l + 1)
            prepared = prepare(relx, rely, iz, frac,
                               mass=None if scalar_mass else mass)
            prepared_list.append(prepared)
            c = paint_from(prepared,
                           float(mass) if scalar_mass else 1.0)
            canvas_ext = c if canvas_ext is None else canvas_ext + c
        else:
            prepared_list.append(None)
            canvas_ext, b = _paint_homed2(pm, nlx, nly, Hx, Hy, r0x,
                                          r0y, x, mass=mass,
                                          canvas=canvas_ext)
            bad = bad + b
        if scalar_mass:
            total_mass = total_mass + jnp.float32(mass) * x.shape[0]
        else:
            total_mass = total_mass + jnp.sum(mass)
    c = _halo_reduce(canvas_ext, ax0, nlx, Hx, px, dim=0)
    c = _halo_reduce(c, ax1, nly, Hy, py, dim=1)
    ntotal = jax.lax.psum(jnp.float32(total_mass), (ax0, ax1))
    bad = jax.lax.psum(bad, (ax0, ax1))
    canvas = c / (ntotal / pm.Norm)

    delta_k = ppm.r2c_local(canvas)
    delta_k = ppm.apply_softening(delta_k, softening_type)

    fields = [("acc", d) for d in range(3)]
    if compute_potential:
        fields.append(("potential", 0))
    if compute_tidal:
        fields += [("tidal", m) for m in range(6)]

    if (not compute_potential and not compute_tidal
            and hasattr(ppm, "c2r_grad3_local")):
        # fused two-hop 3-gradient inverse: shared x-stage + stacked
        # all_to_alls, diff tables folded into the synthesis matrices
        potorder, gradorder, _d, deconv = kernel_orders(kernel_type)
        out = delta_k
        for _ in range(deconv):
            out = ppm.apply_decic(out)
        pot_k = ppm.apply_pot(out, potorder)
        locs = ppm.c2r_grad3_local(pot_k, gradorder)
        fields_ext = []
        for g in locs:
            f = _halo_gather(g, ax1, nly, Hy, py, dim=1)
            f = _halo_gather(f, ax0, nlx, Hx, px, dim=0)
            fields_ext.append(f)
    else:
        fields_ext = []
        for name, memb in fields:
            fk = _apply_kernel_local(ppm, delta_k, kernel_type, name,
                                     memb)
            local = ppm.c2r_local(fk)
            f = _halo_gather(local, ax1, nly, Hy, py, dim=1)
            f = _halo_gather(f, ax0, nlx, Hx, px, dim=0)
            fields_ext.append(f)

    outs = []
    for x, prepared in zip(xs, prepared_list):
        if use_pallas and prepared is not None:
            acc3 = readout3_from(prepared, fields_ext[0],
                                 fields_ext[1], fields_ext[2])
            extra = fields_ext[3:]
            if extra:
                rest = _readout_homed2(pm, nlx, nly, Hx, Hy, r0x, r0y,
                                       x, extra)
                vals = jnp.concatenate([acc3, rest], axis=-1)
            else:
                vals = acc3
        else:
            vals = _readout_homed2(pm, nlx, nly, Hx, Hy, r0x, r0y, x,
                                   fields_ext)
        d = dict(acc=vals[:, :3])
        i = 3
        if compute_potential:
            d["potential"] = vals[:, i]
            i += 1
        if compute_tidal:
            d["tidal"] = vals[:, i:i + 6]
        outs.append(d)
    return outs, bad, delta_k


def required_halo_planes_pencil(pm: PM, mesh: Mesh, x,
                                axes=("x", "y")):
    """Measured 2D halo requirement for pencil-blocked rows: the
    maximum distance (in mesh planes) any particle strays outside its
    index-block's x-window / y-window. Returns (hx, hy)."""
    ax0, ax1 = axes
    px, py = mesh.shape[ax0], mesh.shape[ax1]
    n0, n1, _ = pm.Nmesh
    nlx, nly = n0 // px, n1 // py

    @jax.jit
    def req(x):
        npart = x.shape[0]
        pper = npart // (px * py)
        b = jnp.arange(npart, dtype=jnp.int32) // pper
        bi = b // py
        bj = b - bi * py
        inv = jnp.asarray(pm.InvCellSize, dtype=x.dtype)

        def one(col, invd, r0, nloc, n):
            cix = jnp.remainder(
                jnp.floor(col * invd).astype(jnp.int32), n)
            rel = jnp.remainder(cix - r0, n)
            inside = rel < nloc
            right = rel - (nloc - 1)
            left = n - rel
            d = jnp.minimum(right, left)
            return jnp.max(jnp.where(inside, 0, d))

        hx = one(x[:, 0], inv[0], bi * nlx, nlx, n0)
        hy = one(x[:, 1], inv[1], bj * nly, nly, n1)
        return hx, hy

    hx, hy = req(x)
    return int(hx), int(hy)


def halo_ladder(nloc: int, n0: int = None):
    """Candidate halo widths: powers of two up to the memory cap
    ext = nloc + 2H + 1 <= n0 (the extended slab must not exceed the
    full mesh -- beyond that the v1 full-canvas path is cheaper).
    Multi-hop exchange lifts the old nloc - 1 bound."""
    if n0 is None:
        cap = nloc - 1
    else:
        cap = (n0 - nloc - 1) // 2
    out = []
    h = 2
    while h < cap:
        out.append(h)
        h *= 2
    if cap >= 1:
        out.append(cap)
    return out


def required_halo_planes(pm: PM, mesh: Mesh, x) -> int:
    """Measured halo requirement: the maximum distance (in mesh planes)
    any particle strays outside its index-shard's x-slab. Positions must
    be wrapped. Runs as one jitted global reduction."""
    names = tuple(mesh.axis_names)
    nproc = int(np.prod([mesh.shape[n] for n in names]))
    n0 = pm.Nmesh[0]
    nloc = n0 // nproc

    @jax.jit
    def req(x):
        npart = x.shape[0]
        pper = npart // nproc
        dev = jnp.arange(npart, dtype=jnp.int32) // pper
        r0 = dev * nloc
        bx = jnp.remainder(
            jnp.floor(x[:, 0] * jnp.float32(pm.InvCellSize[0])
                      ).astype(jnp.int32), n0)
        rel = jnp.remainder(bx - r0, n0)
        inside = rel < nloc
        right = rel - (nloc - 1)       # planes beyond the right edge
        left = n0 - rel                # planes beyond the left edge
        d = jnp.minimum(right, left)
        return jnp.max(jnp.where(inside, 0, d))

    return int(req(x))


def particle_spec(mesh: Mesh) -> P:
    """Particles are index-sharded over every mesh axis jointly."""
    names = tuple(mesh.axis_names)
    return P(names if len(names) > 1 else names[0])


def deltak_spec(spm) -> P:
    """PartitionSpec of the transposed k layout produced by the
    engine: slab -> (None, 'x', None); pencil -> (None, 'x', 'y')."""
    if hasattr(spm, "axes"):
        return P(None, spm.ax0, spm.ax1)
    return P(None, spm.axis, None)


def sharded_force_fn(pm: PM, mesh: Mesh, kernel_type: str = "1_4",
                     painter_type: str = "cic", painter_support: int = 2):
    """Jitted SPMD function positions (N,3) -> accelerations (N,3),
    sharded over the mesh's axes."""
    spm = make_engine(pm, mesh)
    painter = Painter(pm, painter_type, painter_support)
    spec = particle_spec(mesh)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=spec, out_specs=spec)
    def force(x):
        return _force_local(spm, painter, x, kernel_type)

    return force


def make_sharded_step(pm: PM, mesh: Mesh, kernel_type: str = "1_4",
                      painter_type: str = "cic", painter_support: int = 2):
    """The full multi-chip training step: force -> kick -> drift -> wrap.

    Returns a jitted function step(x, v, coeffs) -> (x, v, acc) where
    coeffs = [dda, dyyy] are the kick/drift factors for this step
    (computed host-side from the factor tables). Buffers are donated.
    """
    spm = make_engine(pm, mesh)
    painter = Painter(pm, painter_type, painter_support)
    L = jnp.asarray(pm.BoxSize, dtype=jnp.float32)
    spec = particle_spec(mesh)

    def step_local(x, v, coeffs):
        acc = _force_local(spm, painter, x, kernel_type)
        v = v + acc * coeffs[0]
        x = x + v * coeffs[1]
        x = x - jnp.floor(x / L) * L
        return x, v, acc

    sharded = jax.shard_map(step_local, mesh=mesh,
                            in_specs=(spec, spec, P()),
                            out_specs=(spec, spec, spec))
    return jax.jit(sharded, donate_argnums=(0, 1))
