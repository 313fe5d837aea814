"""Multi-device tests on the 8-way virtual CPU mesh: the sharded slab FFT
and SPMD force step must agree with the single-device path."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
import pytest

from fastpm_tpu.mesh import PM
from fastpm_tpu.painter import Painter
from fastpm_tpu import transfers
from fastpm_tpu.parallel.pfft import SlabPM
from fastpm_tpu.parallel.psolver import sharded_force_fn, make_sharded_step
from fastpm_tpu.gravity import compute_force
from fastpm_tpu.store import Store


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("x",))


def test_slab_fft_matches_single_device(mesh):
    pm = PM(16, 32.0)
    spm = SlabPM(pm, mesh)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=pm.rshape).astype(np.float32))

    r2c = jax.jit(jax.shard_map(spm.r2c_local, mesh=mesh,
                                in_specs=P("x"), out_specs=P(None, "x")))
    dk_sharded = np.asarray(r2c(x))
    dk_single = np.asarray(pm.r2c(x))
    np.testing.assert_allclose(dk_sharded, dk_single, atol=2e-6)

    roundtrip = jax.jit(jax.shard_map(
        lambda a: spm.c2r_local(spm.r2c_local(a)), mesh=mesh,
        in_specs=P("x"), out_specs=P("x")))
    back = np.asarray(roundtrip(x))
    np.testing.assert_allclose(back, np.asarray(x), atol=1e-4)


def test_slab_transfers_match(mesh):
    pm = PM(16, 32.0)
    spm = SlabPM(pm, mesh)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.normal(size=pm.rshape).astype(np.float32))
    dk = pm.r2c(x)

    def local(fieldk):
        out = spm.apply_pot(fieldk, 1)
        out = spm.apply_grad(out, 1, 1)
        return spm.apply_decic(out)

    f = jax.jit(jax.shard_map(local, mesh=mesh,
                              in_specs=P(None, "x"), out_specs=P(None, "x")))
    got = np.asarray(f(dk))
    want = transfers.apply_decic(
        pm, transfers.apply_grad(pm, transfers.apply_pot(pm, dk, 1), 1, 1))
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-6)


def test_sharded_force_matches_single_device(mesh):
    pm = PM(16, 32.0)
    n = 4096
    rng = np.random.RandomState(2)
    pos = jnp.asarray((rng.uniform(size=(n, 3)) * 32.0).astype(np.float32))

    force = sharded_force_fn(pm, mesh)
    acc_sharded = np.asarray(force(pos))

    store = Store(x=pos, M0=1.0)
    painter = Painter(pm, "cic")
    (out,), _ = compute_force(pm, painter, [store], "1_4", "none")
    acc_single = np.asarray(out.acc)
    np.testing.assert_allclose(acc_sharded, acc_single, atol=2e-5)


def test_sharded_step_runs_and_conserves_momentum(mesh):
    pm = PM(16, 32.0)
    n = 4096
    rng = np.random.RandomState(3)
    x = jnp.asarray((rng.uniform(size=(n, 3)) * 32.0).astype(np.float32))
    v = jnp.zeros((n, 3), dtype=jnp.float32)
    step = make_sharded_step(pm, mesh)
    coeffs = jnp.asarray([0.1, 0.05], dtype=jnp.float32)
    x1, v1, acc = step(x, v, coeffs)
    assert x1.shape == (n, 3)
    assert np.isfinite(np.asarray(x1)).all()
    # total momentum from an internal force stays ~0
    assert np.abs(np.asarray(v1).sum(axis=0)).max() < 1e-2 * np.abs(
        np.asarray(v1)).sum() / n * n ** 0.5 + 1e-2
    # positions wrapped
    assert float(x1.max()) <= 32.0 and float(x1.min()) >= 0.0
