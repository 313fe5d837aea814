"""Sharded shard_map FOF (parallel/pfof.py) vs the host union-find
oracle: labels must be identical for x-major index-sharded particles,
including halos straddling device boundaries, strayed rows, and the
ghost-overflow contract (fof.c:289-420's iterative merge)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from fastpm_tpu.parallel.pfof import (fof_labels_sharded,
                                      fof_labels_sharded_auto,
                                      boundary_capacity)
from fastpm_tpu.fof import fof_labels as host_fof_labels


@pytest.fixture(scope="module")
def ring8():
    return Mesh(np.array(jax.devices()[:8]), ("x",))


def xmajor_points(n_per_slab, nproc, box, seed, jitter=0.0):
    """Clustered points in x-major slab-homed row order: device d's
    rows live in x-slab d (up to `jitter` in box units)."""
    rng = np.random.RandomState(seed)
    sw = box / nproc
    rows = []
    for d in range(nproc):
        # a few cluster centers inside slab d, some near the faces so
        # halos straddle the boundary
        ncl = 4
        cx = d * sw + np.array([0.02, 0.35, 0.7, 0.98]) * sw
        cy = rng.uniform(0, box, ncl)
        cz = rng.uniform(0, box, ncl)
        per = n_per_slab // ncl
        pts = []
        for c in range(ncl):
            p = (np.stack([np.full(per, cx[c]), np.full(per, cy[c]),
                           np.full(per, cz[c])], -1)
                 + rng.standard_normal((per, 3)) * 0.35)
            pts.append(p)
        extra = n_per_slab - per * ncl
        pts.append(rng.uniform(0, box, (extra, 3))
                   + np.array([d * sw, 0, 0]) * 0)  # background
        p = np.concatenate(pts)
        if jitter:
            p[:, 0] += rng.uniform(-jitter, jitter, len(p))
        rows.append(p)
    x = np.concatenate(rows).astype(np.float32) % box
    return jnp.asarray(x)


def oracle_labels(x, ll, box):
    """Host union-find labels = min particle index per group."""
    return host_fof_labels(np.asarray(x, np.float32), ll, box,
                           periodic=True)


def test_sharded_fof_matches_oracle(ring8):
    box = 64.0
    ll = 0.45
    x = xmajor_points(1500, 8, box, seed=3)
    lab, overflow = fof_labels_sharded(x, ll, box, ring8, rmax=32)
    assert overflow == 0
    want = oracle_labels(x, ll, box)
    np.testing.assert_array_equal(np.asarray(lab, np.int64), want)


def test_sharded_fof_strayed_rows(ring8):
    """Rows displaced into the NEIGHBOR slab (homing drift) still link
    correctly -- including two strays from different owners meeting as
    ghost-ghost pairs."""
    box = 64.0
    ll = 0.45
    x = xmajor_points(1200, 8, box, seed=7, jitter=2.0)  # sw = 8
    lab, overflow = fof_labels_sharded(x, ll, box, ring8, rmax=32)
    assert overflow == 0
    want = oracle_labels(x, ll, box)
    np.testing.assert_array_equal(np.asarray(lab, np.int64), want)


def test_sharded_fof_auto(ring8):
    box = 64.0
    ll = 0.6
    x = xmajor_points(1000, 8, box, seed=11)
    lab = fof_labels_sharded_auto(x, ll, box, ring8)
    want = oracle_labels(x, ll, box)
    np.testing.assert_array_equal(np.asarray(lab, np.int64), want)


def test_sharded_fof_overflow_detected(ring8):
    """A row reaching beyond the +-1 neighbor slabs trips the overflow
    contract instead of silently dropping links."""
    box = 64.0
    ll = 0.45
    x = np.array(xmajor_points(512, 8, box, seed=5))
    # teleport one of device 0's rows into slab 3 (2+ slabs away)
    x[0, 0] = 3.5 * (box / 8)
    lab, overflow = fof_labels_sharded(jnp.asarray(x), ll, box, ring8,
                                       rmax=32)
    assert overflow >= 1
    with pytest.raises(RuntimeError):
        fof_labels_sharded_auto(jnp.asarray(x), ll, box, ring8)


def test_boundary_capacity(ring8):
    box = 64.0
    x = xmajor_points(800, 8, box, seed=9)
    cap = boundary_capacity(x, 8, box, 0.45)
    # boundary clusters sit at 0.02/0.98 of each slab: plenty of rows
    # within ll of a face
    assert cap > 0
    assert cap <= 800
