"""On-device friends-of-friends labels via iterated label propagation.

TPU-native analog of the reference's distributed FOF
(/root/reference/libfastpm/fof.c:289-420): the reference builds a local
kdtree and iteratively merges minids across ranks until no rank changes;
here the same fixed point is reached as a jittable array program:

1. hash particles to linking-length-sized cells and sort by cell id
   (the kdcount analog -- sorted segments replace the tree);
2. per round: every particle takes the minimum label over all linked
   neighbors (27 cell offsets x bounded per-cell occupancy, distance
   test at `ll`), then a scatter-min "hook" and a few gather "compress"
   steps (Shiloach-Vishkin), giving O(log N) round convergence instead
   of O(cluster diameter);
3. rounds run under `lax.while_loop` until the labels are a fixed
   point.

Labels are the minimum ORIGINAL particle index of each group --
bit-identical to the host union-find (csrc/fof.c), which tests assert.

The program is pure jnp/lax, so it runs under jit on sharded inputs
(XLA partitions the gathers/scatters with collectives); a shard_map
version with explicit neighbor exchange is the planned follow-up for
pod-scale catalogs.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["fof_labels_device", "max_cell_occupancy"]


def _cell_ids(x, ncell, cs):
    ci = jnp.floor(x / cs).astype(jnp.int32)
    ci = jnp.remainder(ci, ncell)
    return ci, (ci[:, 0].astype(jnp.int64) * ncell
                + ci[:, 1]) * ncell + ci[:, 2]


def max_cell_occupancy(x, linking_length, boxsize) -> int:
    """Largest number of particles in one linking-length cell (host
    scalar; sets the static candidate bound rmax)."""
    ncell = max(1, int(float(boxsize) / float(linking_length)))
    cs = boxsize / ncell

    @jax.jit
    def occ(x):
        _ci, cid = _cell_ids(x, ncell, cs)
        cid_s = jnp.sort(cid)
        n = cid_s.shape[0]
        i = jnp.arange(n)
        # run lengths of equal cell ids: position minus the first
        # position holding the same id
        first = jnp.searchsorted(cid_s, cid_s, side="left")
        return jnp.max(i - first) + 1

    return int(occ(x))


def fof_labels_device(x, linking_length, boxsize, rmax: int = 32,
                      max_rounds: int = 64):
    """FOF labels (min original particle index per group) for periodic
    positions x (N, 3). rmax bounds the per-cell occupancy; use
    max_cell_occupancy to size it (occupancy > rmax silently drops
    links -- the caller must check, mirroring the alloc_factor
    contract)."""
    ll = float(linking_length)
    L = float(boxsize)
    ncell = max(1, int(L / ll))
    cs = L / ncell
    ll2 = jnp.float32(ll * ll)
    n = x.shape[0]

    ci, cid = _cell_ids(x, ncell, cs)
    order = jnp.argsort(cid)
    cid_s = cid[order]
    x_s = x[order]
    ci_s = ci[order]

    # neighbor segment starts for the 27 cell offsets (static unroll)
    starts = []
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                nci = jnp.stack(
                    [jnp.remainder(ci_s[:, 0] + ox, ncell),
                     jnp.remainder(ci_s[:, 1] + oy, ncell),
                     jnp.remainder(ci_s[:, 2] + oz, ncell)], axis=-1)
                ncid = (nci[:, 0].astype(jnp.int64) * ncell
                        + nci[:, 1]) * ncell + nci[:, 2]
                starts.append((jnp.searchsorted(cid_s, ncid), ncid))

    def neighbor_min(lab):
        best = lab
        for seg_start, ncid in starts:
            for r in range(rmax):
                j = seg_start + r
                jc = jnp.minimum(j, n - 1)
                valid = (j < n) & (cid_s[jc] == ncid)
                d = x_s - x_s[jc]
                d = d - jnp.round(d / L) * L
                dist2 = jnp.sum(d * d, axis=-1)
                link = valid & (dist2 <= ll2)
                best = jnp.minimum(best,
                                   jnp.where(link, lab[jc], jnp.int32(n)))
        return best

    def body(state):
        lab, _changed, rounds = state
        m = neighbor_min(lab)
        # hook: the current representative takes the new minimum
        lab2 = lab.at[lab].min(m)
        lab2 = jnp.minimum(lab2, m)
        # compress: pointer doubling
        for _ in range(4):
            lab2 = jnp.minimum(lab2, lab2[lab2])
        changed = jnp.any(lab2 != lab)
        return lab2, changed, rounds + 1

    def cond(state):
        _lab, changed, rounds = state
        return changed & (rounds < max_rounds)

    lab0 = jnp.arange(n, dtype=jnp.int32)
    lab, _c, _r = jax.lax.while_loop(
        cond, body, (lab0, jnp.bool_(True), jnp.int32(0)))

    # convert sorted-space representatives to min ORIGINAL index per
    # group, then back to original order
    min_orig = jax.ops.segment_min(order.astype(jnp.int64), lab,
                                   num_segments=n,
                                   indices_are_sorted=False)
    lab_orig_sorted = min_orig[lab]
    out = jnp.zeros(n, dtype=jnp.int64).at[order].set(lab_orig_sorted)
    return out
