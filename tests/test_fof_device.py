"""On-device FOF label propagation vs the exact host union-find."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import pytest

from fastpm_tpu.fof import fof_labels
from fastpm_tpu.ops.fof_device import fof_labels_device, max_cell_occupancy


def clustered_points(n, box, seed=0, nclump=24, frac=0.6):
    """Uniform background + tight clumps (some straddling the periodic
    boundary) to exercise multi-cell groups."""
    rng = np.random.RandomState(seed)
    nin = int(n * frac)
    pts = [rng.uniform(0, box, size=(n - nin, 3))]
    centers = rng.uniform(0, box, size=(nclump, 3))
    per = nin // nclump
    for c in centers:
        pts.append(c + rng.standard_normal((per, 3)) * 0.02 * box)
    x = np.concatenate(pts)
    if len(x) < n:
        x = np.concatenate([x, rng.uniform(0, box, (n - len(x), 3))])
    return (x[:n] % box).astype(np.float32)


@pytest.mark.parametrize("seed", [1, 2])
def test_matches_host_unionfind(seed):
    box = 32.0
    n = 4000
    ll = 0.65
    x = clustered_points(n, box, seed=seed)
    host = fof_labels(x, ll, box)
    occ = max_cell_occupancy(jnp.asarray(x), ll, box)
    dev = np.asarray(fof_labels_device(jnp.asarray(x), ll, box,
                                       rmax=occ))
    np.testing.assert_array_equal(dev, host)


def test_periodic_boundary_links():
    """A chain crossing the box boundary merges into one group."""
    box = 16.0
    xs = np.array([[15.7, 8.0, 8.0], [15.95, 8.0, 8.0],
                   [0.15, 8.0, 8.0], [0.4, 8.0, 8.0],
                   [8.0, 8.0, 8.0]], dtype=np.float32)
    ll = 0.3
    host = fof_labels(xs, ll, box)
    dev = np.asarray(fof_labels_device(jnp.asarray(xs), ll, box, rmax=4))
    np.testing.assert_array_equal(dev, host)
    assert (host[:4] == host[0]).all() and host[4] != host[0]


def test_long_filament_converges():
    """A 200-particle chain (diameter >> 1 cell) converges via the
    hook+compress rounds, not O(diameter) propagation."""
    box = 128.0
    n = 200
    x = np.zeros((n, 3), dtype=np.float32)
    x[:, 0] = 1.0 + np.arange(n) * 0.45
    x[:, 1] = x[:, 2] = 64.0
    ll = 0.5
    host = fof_labels(x, ll, box)
    assert (host == 0).all()
    dev = np.asarray(fof_labels_device(jnp.asarray(x), ll, box, rmax=4))
    np.testing.assert_array_equal(dev, host)


def test_runs_on_sharded_input():
    """The label program executes under jit with the positions sharded
    over 8 virtual devices."""
    box = 32.0
    x = clustered_points(4096, box, seed=7)
    mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("x")))
    occ = max_cell_occupancy(xs, 0.65, box)
    dev = np.asarray(fof_labels_device(xs, 0.65, box, rmax=occ))
    host = fof_labels(x, 0.65, box)
    np.testing.assert_array_equal(dev, host)


def test_find_halos_with_device_labels():
    """find_halos consumes device labels and produces the same catalog
    as with host labels."""
    from fastpm_tpu.fof import find_halos
    from fastpm_tpu.store import Store
    box = 32.0
    x = clustered_points(4000, box, seed=3)
    ll = 0.65
    occ = max_cell_occupancy(jnp.asarray(x), ll, box)
    dev = np.asarray(fof_labels_device(jnp.asarray(x), ll, box, rmax=occ))
    v = np.zeros_like(x)
    p = Store(x=jnp.asarray(x), v=jnp.asarray(v), M0=1.0)
    cat_d, ih_d = find_halos(p, ll, box, nmin=20, labels=dev)
    cat_h, ih_h = find_halos(p, ll, box, nmin=20)
    assert cat_d.nhalo == cat_h.nhalo
    np.testing.assert_array_equal(cat_d.length, cat_h.length)
    np.testing.assert_array_equal(ih_d, ih_h)
    np.testing.assert_allclose(cat_d.x, cat_h.x, atol=1e-6)


def test_find_halos_device_catalog_matches_host():
    """The fully device-side production path (find_halos_device:
    auto-sized labels + segment-reduce attrs + nh-capped compaction)
    must reproduce the host catalog: exact lengths/minid/ihalo, and
    CM/dispersions to summation-order tolerance."""
    from fastpm_tpu.fof import find_halos, find_halos_device
    from fastpm_tpu.store import Store
    box = 32.0
    n = 5000
    x = clustered_points(n, box, seed=5)
    rng = np.random.RandomState(7)
    v = rng.standard_normal((n, 3)).astype(np.float32)
    ids = np.arange(n, dtype=np.uint32)
    rng.shuffle(ids)
    p = Store(x=jnp.asarray(x), v=jnp.asarray(v),
              id=jnp.asarray(ids), M0=1.0)
    ll = 0.65
    cat_d, ih_d = find_halos_device(p, ll, box, nmin=20)
    cat_h, ih_h = find_halos(p, ll, box, nmin=20, backend="host")
    assert cat_d.nhalo == cat_h.nhalo
    np.testing.assert_array_equal(cat_d.length, cat_h.length)
    np.testing.assert_array_equal(cat_d.minid, cat_h.minid)
    np.testing.assert_array_equal(np.asarray(ih_d), ih_h)
    np.testing.assert_allclose(cat_d.x, cat_h.x, atol=1e-4)
    np.testing.assert_allclose(cat_d.v, cat_h.v, atol=1e-4)
    np.testing.assert_allclose(cat_d.rdisp, cat_h.rdisp, atol=1e-4)
    np.testing.assert_allclose(cat_d.vdisp, cat_h.vdisp, atol=1e-4)
    np.testing.assert_allclose(cat_d.rvdisp, cat_h.rvdisp, atol=1e-4)


def test_find_halos_device_nonperiodic():
    """Non-periodic (lightcone-slice) embedding on the device path."""
    from fastpm_tpu.fof import find_halos, find_halos_device
    from fastpm_tpu.store import Store
    rng = np.random.RandomState(11)
    # points spread far outside any box, clumped
    centers = rng.uniform(-50, 90, size=(8, 3))
    pts = np.concatenate([c + rng.standard_normal((60, 3)) * 0.15
                          for c in centers]).astype(np.float32)
    p = Store(x=jnp.asarray(pts), v=jnp.zeros_like(jnp.asarray(pts)),
              M0=1.0)
    cat_d, ih_d = find_halos_device(p, 0.6, 1.0, nmin=20,
                                    periodic=False)
    cat_h, ih_h = find_halos(p, 0.6, 1.0, nmin=20, periodic=False,
                             backend="host")
    assert cat_d.nhalo == cat_h.nhalo
    np.testing.assert_array_equal(cat_d.length, cat_h.length)
    np.testing.assert_array_equal(np.asarray(ih_d), ih_h)
    np.testing.assert_allclose(cat_d.x, cat_h.x, atol=1e-3)
