"""Sharded friends-of-friends over a device mesh (shard_map + neighbor
ppermute exchange).

TPU-native analog of the reference's distributed FOF merge loop
(/root/reference/libfastpm/fof.c:289-420): every rank labels locally,
sends boundary labels to neighbors via ghosts, takes minima, and
repeats until NO rank changes (`MPIU_Any` convergence). Here:

- particles are index-sharded in x-major row order over a 1D ring, so
  device d owns the x-slab [d*sw, (d+1)*sw) up to bounded displacement
  (the homing-by-construction of parallel/psolver.py);
- each outer round: (1) exchange fixed-capacity buffers of BOUNDARY
  particles (within `ll` of a slab face) with the +-1 ring neighbors
  (pm_ghosts_create's window probe, pmghosts.c:31-131); (2) run the
  LOCAL label-propagation fixed point over [owned + ghosts] with labels
  in GLOBAL index space; (3) ppermute the ghosts' updated labels back
  to their owners and fold with a min (pm_ghosts_reduce,
  pmghosts.c:247-307);
- the outer loop converges when a global psum of per-device change
  flags is zero -- halos are tiny compared to a slab, so label chains
  cross at most a few device boundaries and the loop ends in O(1)
  rounds, not O(P).

Ghost capacity follows the alloc_factor contract (store.c:507-509):
the boundary-layer population is measured, padded up to a power of two,
and an overflow makes the call raise rather than silently drop links.

Labels are the minimum GLOBAL particle row of each group, bit-identical
to the single-device fof_labels_device / host union-find oracle.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["fof_labels_sharded", "fof_labels_sharded_auto",
           "boundary_capacity"]


def _local_label_pass(x, lab, valid, ll, boxsize, rmax, max_rounds):
    """Label propagation to a fixed point over one device's rows
    (owned + ghosts). x: (M, 3); lab: (M,) GLOBAL labels; valid: (M,)
    mask (padding rows never link). Returns the updated labels.

    Same cell-hash + sorted-segment scheme as ops.fof_device
    (kdcount analog), but seeded with incoming labels instead of iota
    and min-reducing in global index space."""
    ll = float(ll)
    L = float(boxsize)
    ncell = max(1, int(L / ll))
    cs = L / ncell
    ll2 = jnp.float32(ll * ll)
    m = x.shape[0]

    ci = jnp.floor(x / cs).astype(jnp.int32)
    ci = jnp.remainder(ci, ncell)
    cid = (ci[:, 0] * ncell + ci[:, 1]) * ncell + ci[:, 2]
    # invalid rows hash past every real cell so they form their own
    # tail segment and never pass the distance test
    big = jnp.int32(np.int32(2 ** 31 - 1))
    cid = jnp.where(valid, cid, big)
    order = jnp.argsort(cid)
    cid_s = cid[order]
    x_s = x[order]
    ci_s = ci[order]
    lab_s = lab[order]
    valid_s = valid[order]

    starts = []
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                nci = jnp.stack(
                    [jnp.remainder(ci_s[:, 0] + ox, ncell),
                     jnp.remainder(ci_s[:, 1] + oy, ncell),
                     jnp.remainder(ci_s[:, 2] + oz, ncell)], axis=-1)
                ncid = (nci[:, 0] * ncell + nci[:, 1]) * ncell \
                    + nci[:, 2]
                starts.append((jnp.searchsorted(cid_s, ncid), ncid))

    BIG = jnp.asarray(jnp.iinfo(lab.dtype).max, dtype=lab.dtype)

    def neighbor_min(lab_s):
        best = lab_s
        for seg_start, ncid in starts:
            for r in range(rmax):
                j = seg_start + r
                jc = jnp.minimum(j, m - 1)
                ok = (j < m) & (cid_s[jc] == ncid) & valid_s \
                    & valid_s[jc]
                d = x_s - x_s[jc]
                d = d - jnp.round(d / L) * L
                dist2 = jnp.sum(d * d, axis=-1)
                link = ok & (dist2 <= ll2)
                best = jnp.minimum(
                    best, jnp.where(link, lab_s[jc], BIG))
        return best

    # local union-find shadow in SORTED space for O(log) convergence:
    # glab holds the global labels; slab the sorted-space parent used
    # for pointer-doubling compression
    def body(state):
        glab, _changed, rounds = state
        mfound = neighbor_min(glab)
        # scatter-min onto the row currently holding each label? global
        # labels are not local indices, so compress via repeated
        # neighbor minima only (the halo diameter in cells is small)
        new = jnp.minimum(glab, mfound)
        changed = jnp.any(new != glab)
        return new, changed, rounds + 1

    def cond(state):
        _g, changed, rounds = state
        return changed & (rounds < max_rounds)

    # initial changed=True derived from the (varying) labels so the
    # carry vma matches the loop output under shard_map
    changed0 = jnp.any(lab_s == lab_s)
    glab, _c, _r = jax.lax.while_loop(
        cond, body, (lab_s, changed0, jnp.int32(0)))
    return jnp.zeros_like(lab).at[order].set(glab)


def boundary_capacity(x, mesh_or_nproc, boxsize, ll) -> int:
    """Measured boundary-layer population: the max over devices and
    faces of the number of owned particles within `ll` of a slab face
    (the ghost-buffer sizing pass; pmghosts.c two-pass count)."""
    if isinstance(mesh_or_nproc, Mesh):
        nproc = int(np.prod([mesh_or_nproc.shape[a]
                             for a in mesh_or_nproc.axis_names]))
    else:
        nproc = int(mesh_or_nproc)
    L = float(boxsize)
    sw = L / nproc
    n = x.shape[0]
    pper = n // nproc

    @jax.jit
    def count(x):
        dev = jnp.arange(n, dtype=jnp.int32) // pper
        xw = x[:, 0] - jnp.floor(x[:, 0] / L) * L
        slab_lo = jnp.remainder(
            jnp.floor((xw - ll) / sw).astype(jnp.int32), nproc)
        slab_hi = jnp.remainder(
            jnp.floor((xw + ll) / sw).astype(jnp.int32), nproc)
        k = jnp.remainder(slab_hi - slab_lo, nproc) + 1

        def contains(t):
            return jnp.remainder(t - slab_lo, nproc) < k

        clo = jax.ops.segment_sum(
            contains(dev - 1).astype(jnp.int32), dev,
            num_segments=nproc)
        chi = jax.ops.segment_sum(
            contains(dev + 1).astype(jnp.int32), dev,
            num_segments=nproc)
        return jnp.maximum(jnp.max(clo), jnp.max(chi))

    return int(count(x))


def fof_labels_sharded(x, linking_length, boxsize, mesh: Mesh,
                       rmax: int = 32, ghost_cap: int = None,
                       max_outer: int = 8, max_rounds: int = 64):
    """Distributed FOF labels for index-sharded x-major rows over a
    1D device ring. Returns (labels (N,) int64 = min global row per
    group, overflow count). overflow > 0 means the measured ghost_cap
    was exceeded (alloc_factor contract: caller must re-size)."""
    ll = float(linking_length)
    L = float(boxsize)
    names = tuple(mesh.axis_names)
    axis = names[0] if len(names) == 1 else names
    nproc = int(np.prod([mesh.shape[a] for a in names]))
    n = x.shape[0]
    if n % nproc:
        raise ValueError("particle count must divide the device ring")
    pper = n // nproc
    sw = L / nproc                     # slab width per device
    if sw <= 2 * ll:
        raise ValueError("slab width must exceed 2 linking lengths")

    if ghost_cap is None:
        occ = boundary_capacity(x, nproc, L, ll)
        ghost_cap = 256
        while ghost_cap < occ:
            ghost_cap *= 2

    to_left = [(i, (i - 1) % nproc) for i in range(nproc)]
    to_right = [(i, (i + 1) % nproc) for i in range(nproc)]

    spec = P(names if len(names) > 1 else names[0])

    ldt = jnp.int32 if n < 2 ** 31 else jnp.int64

    def local(x):
        me = jax.lax.axis_index(axis)
        nl = x.shape[0]                  # = pper
        base = me.astype(ldt) * pper
        gidx = base + jnp.arange(nl, dtype=ldt)
        lab = gidx

        xw = x - jnp.floor(x / L) * L
        # which slabs does each particle's ll-ball touch? Rows may have
        # STRAYED outside their home slab (homing-by-construction only
        # bounds displacement); all cross-device links are discovered
        # as long as the touched-slab interval stays within
        # {me-1, me, me+1} -- two strays meeting in a neighbor slab
        # link as ghost-ghost pairs on that device. Anything reaching
        # further counts as overflow (alloc_factor contract).
        slab_lo = jnp.remainder(
            jnp.floor((xw[:, 0] - ll) / sw).astype(jnp.int32), nproc)
        slab_hi = jnp.remainder(
            jnp.floor((xw[:, 0] + ll) / sw).astype(jnp.int32), nproc)
        k = jnp.remainder(slab_hi - slab_lo, nproc) + 1

        def contains(t):
            return jnp.remainder(t - slab_lo, nproc) < k

        near_lo = contains(me - 1)
        near_hi = contains(me + 1)
        lo_rel = jnp.remainder(slab_lo - (me - 1), nproc)
        hi_rel = jnp.remainder(slab_hi - (me - 1), nproc)
        reach_ok = (k <= 3) & (lo_rel <= 2) & (hi_rel <= 2)
        ov0 = jnp.sum((~reach_ok).astype(jnp.int32))

        def pack(mask):
            cnt = jnp.sum(mask.astype(jnp.int32))
            idx = jnp.nonzero(mask, size=ghost_cap,
                              fill_value=nl - 1)[0]
            ok = jnp.arange(ghost_cap) < jnp.minimum(cnt, ghost_cap)
            over = jnp.maximum(cnt - ghost_cap, 0)
            return idx, ok, over

        ilo, oklo, ov1 = pack(near_lo)
        ihi, okhi, ov2 = pack(near_hi)
        overflow = ov0 + ov1 + ov2

        def outer_body(state):
            lab, _changed, it = state
            # ship boundary (x, label) buffers to both neighbors
            glo_x = jax.lax.ppermute(xw[ilo], axis, to_left)
            glo_l = jax.lax.ppermute(lab[ilo], axis, to_left)
            glo_ok = jax.lax.ppermute(oklo, axis, to_left)
            ghi_x = jax.lax.ppermute(xw[ihi], axis, to_right)
            ghi_l = jax.lax.ppermute(lab[ihi], axis, to_right)
            ghi_ok = jax.lax.ppermute(okhi, axis, to_right)

            allx = jnp.concatenate([xw, glo_x, ghi_x])
            alll = jnp.concatenate([lab, glo_l, ghi_l])
            allok = jnp.concatenate(
                [jnp.ones(nl, bool), glo_ok, ghi_ok])
            newl = _local_label_pass(allx, alll, allok, ll, L, rmax,
                                     max_rounds)
            lab2 = newl[:nl]
            # ghost labels travel back to their owners (reverse hop)
            # and fold in with a min (pm_ghosts_reduce)
            back_lo = jax.lax.ppermute(newl[nl:nl + ghost_cap], axis,
                                       to_right)
            back_hi = jax.lax.ppermute(newl[nl + ghost_cap:], axis,
                                       to_left)
            lab2 = lab2.at[ilo].min(jnp.where(oklo, back_lo, lab2[ilo]))
            lab2 = lab2.at[ihi].min(jnp.where(okhi, back_hi, lab2[ihi]))
            # head relabel (fof.c _merge): labels pointing at a LOCAL
            # row follow that row's current label (pointer jumping);
            # cross-device pointers resolve over outer rounds instead
            for _ in range(3):
                lrow = jnp.clip((lab2 - base).astype(jnp.int32), 0,
                                nl - 1)
                inrange = (lab2 >= base) & (lab2 < base + nl)
                lab2 = jnp.minimum(
                    lab2, jnp.where(inrange, lab2[lrow], lab2))
            changed = jnp.any(lab2 != lab)
            changed = jax.lax.psum(changed.astype(jnp.int32), axis) > 0
            return lab2, changed, it + 1

        def outer_cond(state):
            _l, changed, it = state
            return changed & (it < max_outer)

        lab, _c, _i = jax.lax.while_loop(
            outer_cond, outer_body,
            (lab, jnp.bool_(True), jnp.int32(0)))
        overflow = jax.lax.psum(overflow, axis)
        return lab, overflow

    fn = jax.jit(jax.shard_map(local, mesh=mesh, in_specs=spec,
                               out_specs=(spec, P())))
    lab, overflow = fn(x)
    return lab, int(overflow)


def fof_labels_sharded_auto(x, linking_length, boxsize, mesh: Mesh,
                            max_outer: int = 16):
    """fof_labels_sharded with the mandatory sizing passes: rmax from
    the global cell occupancy (a device's local+ghost cells never
    exceed the global occupancy of those cells) and ghost_cap from the
    measured boundary-layer population, both rounded to a power of two
    (bounded jit ladder). Raises on ghost overflow (alloc_factor
    semantics, store.c:507-509)."""
    from ..ops.fof_device import max_cell_occupancy
    occ = max_cell_occupancy(x, linking_length, boxsize)
    rmax = 4
    while rmax < occ:
        rmax *= 2
    lab, overflow = fof_labels_sharded(x, linking_length, boxsize,
                                       mesh, rmax=rmax,
                                       max_outer=max_outer)
    if overflow:
        raise RuntimeError(
            f"sharded FOF ghost overflow: {overflow} rows reach beyond "
            "the +-1 neighbor slabs (re-home or use the single-device "
            "path)")
    return lab
