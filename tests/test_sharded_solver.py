"""The mesh-sharded Solver must reproduce the single-device evolution."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh
import pytest

from fastpm_tpu.mesh import PM
from fastpm_tpu.powerspectrum import FuncK
from fastpm_tpu.cosmology import Cosmology
from fastpm_tpu import ic
from fastpm_tpu.solver import Solver, SolverConfig

COSMO = Cosmology(h=0.6774, Omega_m=0.307494, T_cmb=0.0, growth_mode="lcdm")


@pytest.mark.slow
def test_sharded_solver_matches_single_device():
    cfg = SolverConfig(nc=16, boxsize=64.0, time_step=[0.3, 0.6, 1.0],
                       force_mode="fastpm", pm_nc_factor=1)
    pk = FuncK.from_file("/root/repo/tests/fixtures/powerspec.txt")

    def run(mesh):
        s = Solver(cfg, COSMO, mesh=mesh)
        dk, _ = ic.linear_field(s.lptpm, COSMO, pk, seed=7, aout=1.0)
        s.setup_lpt(dk, 0.3)
        s.evolve()
        return s.species["cdm"]

    single = run(None)
    mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
    sharded = run(mesh)

    np.testing.assert_allclose(np.asarray(sharded.x),
                               np.asarray(single.x), atol=2e-3)
    np.testing.assert_allclose(np.asarray(sharded.v),
                               np.asarray(single.v), atol=2e-4)
    # the sharded force path was actually used (sanity: cache populated)
    s2 = Solver(cfg, COSMO, mesh=mesh)
    dk, _ = ic.linear_field(s2.lptpm, COSMO, pk, seed=7, aout=1.0)
    s2.setup_lpt(dk, 0.3)
    s2.evolve()
    assert len(s2._sharded_force_cache) >= 1


@pytest.mark.slow
def test_sharded_wide_path_two_species_softening_potential():
    """The widened SPMD fast path: 2 species (one with a per-particle
    mass column), gaussian softening, and potential+tidal outputs all
    run shard-mapped and match the single-device force."""
    from fastpm_tpu.store import lattice_store

    cfg = SolverConfig(nc=16, boxsize=64.0, time_step=[0.3, 0.6, 1.0],
                       force_mode="fastpm", pm_nc_factor=1,
                       softening_type="gaussian",
                       compute_potential=True, compute_tidal=True)
    pk = FuncK.from_file("/root/repo/tests/fixtures/powerspec.txt")

    def run(mesh):
        s = Solver(cfg, COSMO, mesh=mesh)
        # second species: a coarse lattice with a mass column
        b = lattice_store(s.basepm, Nc=8, columns=("v", "acc", "id"),
                          name="baryon")
        import jax.numpy as jnp
        b = b.replace(M0=0.3,
                      mass=jnp.full((b.np_local,), 0.3,
                                    dtype=jnp.float32),
                      potential=jnp.zeros((b.np_local,), jnp.float32),
                      tidal=jnp.zeros((b.np_local, 6), jnp.float32),
                      a_x=0.3, a_v=0.3)
        s.add_species("baryon", b)
        dk, _ = ic.linear_field(s.lptpm, COSMO, pk, seed=7, aout=1.0)
        s.setup_lpt(dk, 0.3)
        s.evolve()
        return s

    single = run(None)
    sharded = run(Mesh(np.array(jax.devices()[:8]), ("x",)))
    for name in ("cdm", "baryon"):
        a = single.species[name]
        b = sharded.species[name]
        np.testing.assert_allclose(np.asarray(b.x), np.asarray(a.x),
                                   atol=2e-3, err_msg=name)
        np.testing.assert_allclose(np.asarray(b.potential),
                                   np.asarray(a.potential),
                                   rtol=2e-3, atol=1e-5, err_msg=name)
        np.testing.assert_allclose(np.asarray(b.tidal),
                                   np.asarray(a.tidal),
                                   rtol=2e-3, atol=1e-5, err_msg=name)
    assert len(sharded._sharded_force_cache) >= 1
