"""FOF / RFOF halo finder tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastpm_tpu.fof import fof_labels, find_halos, rfof_find_halos
from fastpm_tpu.store import Store
from fastpm_tpu.cosmology import Cosmology

COSMO = Cosmology(h=0.6774, Omega_m=0.307494, T_cmb=0.0, growth_mode="lcdm")


def _store(pos, vel=None, ids=None):
    n = len(pos)
    return Store(
        x=jnp.asarray(np.asarray(pos, dtype=np.float32)),
        v=jnp.asarray(np.asarray(
            vel if vel is not None else np.zeros((n, 3)), dtype=np.float32)),
        id=jnp.asarray(np.asarray(
            ids if ids is not None else np.arange(n), dtype=np.uint32)))


def test_fof_two_clusters_and_field():
    rng = np.random.RandomState(0)
    L = 100.0
    c1 = 10 + 0.1 * rng.standard_normal((50, 3))
    c2 = np.array([0.2, 50, 50]) + 0.1 * rng.standard_normal((40, 3))
    c2[:20, 0] = (c2[:20, 0] - 0.4) % L  # straddles the periodic boundary
    field = rng.uniform(5, 95, (30, 3))
    pos = np.concatenate([c1, c2, field])

    labels = fof_labels(pos.astype(np.float32), 1.0, L)
    assert len(np.unique(labels[:50])) == 1
    assert len(np.unique(labels[50:90])) == 1

    cat, ihalo = find_halos(_store(pos), 1.0, L, nmin=20)
    assert cat.nhalo == 2
    np.testing.assert_array_equal(sorted(cat.length), [40, 50])
    # periodic CM: cluster 2 center is near x=0 (wrapped), not x=50
    c2row = int(np.argmin(cat.length))
    assert (cat.x[c2row, 0] < 1.0) or (cat.x[c2row, 0] > 99.0)
    assert cat.minid[c2row] == 50
    # field particles unassigned
    assert np.all(ihalo[90:] == -1)


def test_fof_linking_length_threshold():
    """Particles exactly at distance ll are NOT linked (r2 < ll2 strict,
    kdtree FOF convention)."""
    pos = np.array([[10, 10, 10], [10, 10, 11.0]], dtype=np.float32)
    assert len(np.unique(fof_labels(pos, 1.0, 100.0))) == 2
    assert len(np.unique(fof_labels(pos, 1.001, 100.0))) == 1


def test_fof_chain_links_transitively():
    # a chain of particles each within ll of the next
    pos = np.array([[i * 0.9, 0, 0] for i in range(10)], dtype=np.float32)
    pos += 50
    labels = fof_labels(pos, 1.0, 200.0)
    assert len(np.unique(labels)) == 1


def test_fof_dispersions():
    rng = np.random.RandomState(1)
    n = 2000
    pos = 50 + rng.standard_normal((n, 3)) * 0.2
    vel = rng.standard_normal((n, 3)) * np.array([100.0, 50.0, 25.0])
    cat, _ = find_halos(_store(pos, vel), 2.0, 100.0, nmin=20)
    assert cat.nhalo == 1
    # vdisp diagonal ~ input variances
    np.testing.assert_allclose(np.sqrt(cat.vdisp[0, :3]),
                               [100, 50, 25], rtol=0.1)
    np.testing.assert_allclose(np.sqrt(cat.rdisp[0, :3]), 0.2, rtol=0.1)


def test_rfof_runs_and_rejects_diffuse():
    rng = np.random.RandomState(2)
    L = 100.0
    sep = 1.0
    # a compact cold halo (accepted) and a hot sparse one (rejected)
    cold = 20 + 0.3 * rng.standard_normal((100, 3))
    cold_v = 30.0 * rng.standard_normal((100, 3))
    hot = 70 + 0.3 * rng.standard_normal((60, 3))
    hot_v = 5000.0 * rng.standard_normal((60, 3))
    pos = np.concatenate([cold, hot])
    vel = np.concatenate([cold_v, hot_v])
    st = _store(pos, vel).replace(M0=1.0)
    cat, ihalo = rfof_find_halos(
        st, L, z=0.0, cosmology=COSMO, nmin=8,
        linkinglength=0.2 * sep, l1=0.25 * sep, l6=0.24 * sep,
        A1=0.012 * sep, A2=0.06 * sep, B1=7.02, B2=6.025)
    # RFOF's mass-binned acceptance (length < Np[i] per round) may
    # fragment/save the cold cluster across rounds, but the hot halo must
    # never be saved (vdisp ~8600 km/s >> r0 sigma_std ~650 km/s).
    assert cat.nhalo >= 1
    assert np.all(ihalo[100:] == -1)
    assert np.any(ihalo[:100] >= 0)
    # saved halos all have cold dispersions
    assert np.sqrt(cat.vdisp[:, :3].sum(axis=1)).max() < 200.0
