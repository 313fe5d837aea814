"""Order-free fused force (gravity.compute_force_carry): the permuted
store must agree with the order-preserving compute_force when matched
by particle id, and every per-particle column must ride the sort."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastpm_tpu.mesh import PM
from fastpm_tpu.store import Store, lattice_store
from fastpm_tpu.painter import Painter
from fastpm_tpu import gravity


@pytest.fixture
def fused_interpret(monkeypatch):
    """Force carry-eligibility on CPU: pallas kernels in interpret
    mode, pack8 threshold down to 0."""
    import fastpm_tpu.painter as painter_mod
    from fastpm_tpu.ops.paint_pallas import (make_prepare_carry_fn,
                                             make_prepare_fn,
                                             make_paint_from8_fn)
    from fastpm_tpu.ops.readout_pallas import make_readout3_from8_fn

    monkeypatch.setattr(painter_mod, "_PACK8_MAX_CELLS", 0)
    cache = {}

    def fused_cache(pm, kind, builder):
        key = (pm.cache_key, kind)
        if key not in cache:
            if kind == "prepare_carry":
                cache[key] = make_prepare_carry_fn(pm, C=1024)
            elif kind == "prepare":
                cache[key] = make_prepare_fn(pm, C=1024)
            elif kind == "paint_from8":
                cache[key] = make_paint_from8_fn(pm, K=128, C=1024,
                                                 interpret=True)
            elif kind == "readout3_from8":
                cache[key] = make_readout3_from8_fn(pm, K=128, C=1024,
                                                    interpret=True)
            else:
                # e.g. ("stale", maxm): defer to the builder closure
                # (make_stale_tools is monkeypatched to interpret mode
                # in the tests that reach this)
                cache[key] = builder(pm)
        return cache[key]

    monkeypatch.setattr(gravity, "_fused_cache", fused_cache)
    return None


def test_compute_force_carry_matches_by_id(fused_interpret, monkeypatch):
    pm = PM(32, 64.0)
    p = lattice_store(pm, Nc=16)
    rng = np.random.default_rng(41)
    n = p.x.shape[0]
    p = p.replace(
        x=jnp.asarray(rng.uniform(0, 64, (n, 3)).astype(np.float32)),
        v=jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32)),
        dx1=jnp.asarray(rng.standard_normal((n, 3))
                        .astype(np.float32)),
        aemit=jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32)))
    painter = Painter(pm, "cic", 2, backend="xla")
    monkeypatch.setattr(Painter, "_use_pallas",
                        property(lambda self: True))

    assert gravity.carry_eligible(pm, painter, [p], False, False)

    ref, dk_ref = gravity.compute_force(pm, painter, [p], "1_4", "none")
    got, dk, ranges = gravity.compute_force_carry(pm, painter, p,
                                                  "1_4", "none")

    np.testing.assert_allclose(np.asarray(jnp.abs(dk - dk_ref)).max(),
                               0.0, atol=2e-5)
    # match rows by id: every column must carry the same permutation
    ref0 = ref[0]
    oa = np.argsort(np.asarray(ref0.id))
    ob = np.argsort(np.asarray(got.id))
    assert np.array_equal(np.asarray(ref0.id)[oa],
                          np.asarray(got.id)[ob])
    for name in ("x", "v", "dx1", "aemit"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref0, name))[oa],
            np.asarray(getattr(got, name))[ob], err_msg=name)
    np.testing.assert_allclose(np.asarray(ref0.acc)[oa],
                               np.asarray(got.acc)[ob], atol=5e-5)


def test_compute_force_stale_matches_fresh(fused_interpret,
                                           monkeypatch):
    """After a carry force, a slightly-drifted store's stale force
    (reusing the carry's range table) must match a fresh carry force
    on the same positions."""
    import fastpm_tpu.ops.stale as stale_mod
    from fastpm_tpu.ops.paint_pallas import (make_prepare_carry_fn,
                                             make_prepare_fn,
                                             make_paint_from8_fn)
    from fastpm_tpu.ops.readout_pallas import make_readout3_from8_fn

    pm = PM(32, 64.0)
    p = lattice_store(pm, Nc=16)
    rng = np.random.default_rng(42)
    n = p.x.shape[0]
    p = p.replace(
        x=jnp.asarray(rng.uniform(0, 64, (n, 3)).astype(np.float32)),
        v=jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32)))
    painter = Painter(pm, "cic", 2, backend="xla")
    monkeypatch.setattr(Painter, "_use_pallas",
                        property(lambda self: True))

    # interpret-mode stale tools (gravity caches by (pm, ("stale", m)))
    real_make = stale_mod.make_stale_tools
    monkeypatch.setattr(
        stale_mod, "make_stale_tools",
        lambda pm_, **kw: real_make(pm_, C=1024, K=128,
                                    interpret=True, **kw))

    sorted_p, _dk, ranges = gravity.compute_force_carry(
        pm, painter, p, "1_4", "none")
    drifted = sorted_p.replace(
        x=(sorted_p.x + sorted_p.v * 0.2) % 64.0)

    stale_p, dk_s, nbad = gravity.compute_force_stale(
        pm, painter, drifted, ranges, 2048, "1_4", "none")
    assert int(nbad) == 0
    fresh_p, dk_f, _r = gravity.compute_force_carry(
        pm, painter, drifted, "1_4", "none")

    # same positions, same physics; stale keeps the drifted order
    ob = np.argsort(np.asarray(stale_p.id))
    oa = np.argsort(np.asarray(fresh_p.id))
    np.testing.assert_allclose(np.asarray(stale_p.acc)[ob],
                               np.asarray(fresh_p.acc)[oa], atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(jnp.abs(dk_s - dk_f)).max(), 0.0, atol=2e-5)


def test_solver_stale_policy_matches_order_free(fused_interpret,
                                                monkeypatch):
    """The solver's stale state machine (fresh carry force -> N-1
    stale forces -> refresh; overflow falls back) must produce the
    same evolution as order_free alone."""
    import fastpm_tpu.ops.stale as stale_mod
    from fastpm_tpu.powerspectrum import FuncK
    from fastpm_tpu.cosmology import Cosmology
    from fastpm_tpu import ic
    from fastpm_tpu.solver import Solver, SolverConfig

    monkeypatch.setattr(Painter, "_use_pallas",
                        property(lambda self: True))
    real_make = stale_mod.make_stale_tools
    monkeypatch.setattr(
        stale_mod, "make_stale_tools",
        lambda pm_, **kw: real_make(pm_, C=1024, K=128,
                                    interpret=True, **kw))
    # the fixture's _fused_cache builds C=1024/K=128 interpret kernels

    cosmo = Cosmology(h=0.6774, Omega_m=0.307494, T_cmb=0.0,
                      growth_mode="lcdm")
    pk = FuncK.from_file("tests/fixtures/powerspec.txt")

    def run(stale_every):
        cfg = SolverConfig(nc=16, boxsize=128.0,
                           time_step=list(np.linspace(0.1, 1.0, 5)),
                           force_mode="fastpm", pm_nc_factor=2,
                           lpt_nc_factor=1, order_free=True,
                           stale_every=stale_every)
        s = Solver(cfg, cosmo)
        dk, _v = ic.linear_field(s.lptpm, cosmo, pk, seed=100,
                                 aout=1.0,
                                 remove_cosmic_variance=True)
        s.setup_lpt(dk, cfg.time_step[0])
        s.evolve()
        p = s.species["cdm"]
        order = np.argsort(np.asarray(p.id))
        return (np.asarray(p.x)[order], np.asarray(p.v)[order],
                s._stale_state)

    xa, va, _st = run(0)
    xb, vb, st = run(3)
    assert st, "stale state was never engaged"
    # stale forces are exact up to f32 summation order
    np.testing.assert_allclose(xa, xb, atol=1e-4)
    np.testing.assert_allclose(va, vb, atol=1e-4)
