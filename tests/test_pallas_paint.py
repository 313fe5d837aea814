"""The sorted windowed Pallas paint must reproduce the scatter painter
exactly (interpret mode on CPU; on-device correctness is asserted in the
TPU benchmarks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastpm_tpu.mesh import PM
from fastpm_tpu.painter import Painter
from fastpm_tpu.ops.paint_pallas import make_paint_fn


@pytest.mark.parametrize("nc,box", [(16, 32.0), (20, 10.0)])
def test_matches_scatter_painter(nc, box):
    pm = PM(nc, box)
    rng = np.random.RandomState(0)
    n = 2500
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)).astype(np.float32))
    ref = Painter(pm, "cic", backend="never").paint(pos, 1.0)
    got = make_paint_fn(pm, K=128, C=1024, interpret=True)(pos, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-6)


def test_mass_weighted_and_clustered():
    pm = PM(16, 32.0)
    rng = np.random.RandomState(1)
    # heavy clustering: all particles in a couple of cells stresses the
    # multi-round path
    pos = np.concatenate([
        10 + 0.4 * rng.random((2000, 3)),
        rng.uniform(0, 32.0, (500, 3))]).astype(np.float32)
    m = rng.uniform(0.1, 3.0, len(pos)).astype(np.float32)
    ref = Painter(pm, "cic", backend="never").paint(
        jnp.asarray(pos), jnp.asarray(m))
    got = make_paint_fn(pm, K=64, C=1024, interpret=True)(
        jnp.asarray(pos), jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=2e-5)


def test_boundary_particles():
    """Particles exactly at box edges and cell boundaries wrap correctly
    through the padded-canvas fold."""
    pm = PM(8, 16.0)
    eps = 1e-4
    pos = jnp.asarray(np.array([
        [0.0, 0.0, 0.0],
        [16.0 - eps, 16.0 - eps, 16.0 - eps],
        [15.9, 0.1, 8.0],
        [2.0, 2.0, 2.0],       # exactly on a grid point
    ], dtype=np.float32))
    ref = Painter(pm, "cic", backend="never").paint(pos, 1.0)
    got = make_paint_fn(pm, K=64, C=1024, interpret=True)(pos, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
    assert float(got.sum()) == pytest.approx(4.0, rel=1e-6)


def test_pallas_readout3_matches_painter():
    """The windowed MXU readout (ops/readout_pallas.py) must reproduce
    three Painter.readout calls exactly (interpret mode on CPU)."""
    from fastpm_tpu.ops.readout_pallas import make_readout3_fn

    pm = PM(16, 64.0)
    painter = Painter(pm, "cic", 2, backend="xla")
    rng = np.random.default_rng(7)
    n = 4321    # deliberately not a multiple of K or 128
    pos = jnp.asarray(rng.uniform(0, 64, (n, 3)).astype(np.float32))
    cs = [jnp.asarray(rng.standard_normal((16, 16, 16))
                      .astype(np.float32)) for _ in range(3)]

    f = make_readout3_fn(pm, K=256, C=1024, interpret=True)
    got = np.asarray(f(cs[0], cs[1], cs[2], pos))
    want = np.stack([np.asarray(painter.readout(c, pos)) for c in cs],
                    axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_readout3_boundary_particles():
    """Particles exactly on cell edges and at the box boundary exercise
    the periodic pad faces."""
    from fastpm_tpu.ops.readout_pallas import make_readout3_fn

    pm = PM(8, 32.0)
    painter = Painter(pm, "cic", 2, backend="xla")
    g = np.stack(np.meshgrid(*[np.arange(8) * 4.0] * 3,
                             indexing="ij"), axis=-1).reshape(-1, 3)
    pos = jnp.asarray(np.concatenate(
        [g, g + 3.999, np.full((4, 3), 31.999)]).astype(np.float32))
    rng = np.random.default_rng(1)
    cs = [jnp.asarray(rng.standard_normal((8, 8, 8)).astype(np.float32))
          for _ in range(3)]
    f = make_readout3_fn(pm, K=256, C=1024, interpret=True)
    got = np.asarray(f(cs[0], cs[1], cs[2], pos))
    want = np.stack([np.asarray(painter.readout(c, pos)) for c in cs],
                    axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_readout3_v3_matches_painter():
    """4-corners-per-pass readout (make_readout3_from4_fn) against the
    XLA painter, including the shared prepared bundle."""
    from fastpm_tpu.ops.paint_pallas import make_prepare_fn
    from fastpm_tpu.ops.readout_pallas import make_readout3_from4_fn

    pm = PM(16, 64.0)
    painter = Painter(pm, "cic", 2, backend="xla")
    rng = np.random.default_rng(11)
    n = 3777
    pos = jnp.asarray(rng.uniform(0, 64, (n, 3)).astype(np.float32))
    cs = [jnp.asarray(rng.standard_normal((16, 16, 16))
                      .astype(np.float32)) for _ in range(3)]
    prepared = jax.jit(make_prepare_fn(pm, C=1024))(pos)
    f = make_readout3_from4_fn(pm, K=256, C=1024, interpret=True)
    got = np.asarray(f(prepared, *cs))
    want = np.stack([np.asarray(painter.readout(c, pos)) for c in cs],
                    axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_paint_v3_matches_painter():
    """4-corners-per-pass paint (make_paint_from4_fn) vs the XLA
    painter, sharing the prepared bundle."""
    from fastpm_tpu.ops.paint_pallas import (make_prepare_fn,
                                             make_paint_from4_fn)

    pm = PM(16, 64.0)
    painter = Painter(pm, "cic", 2, backend="xla")
    rng = np.random.default_rng(12)
    pos = jnp.asarray(rng.uniform(0, 64, (4321, 3)).astype(np.float32))
    prepared = jax.jit(make_prepare_fn(pm, C=1024))(pos)
    f = make_paint_from4_fn(pm, K=256, C=1024, interpret=True)
    got = np.asarray(f(prepared))
    want = np.asarray(painter.paint(pos))
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.sum() == pytest.approx(4321.0, rel=1e-6)


def test_stale_step_trajectory_matches_fresh():
    """Stale-order stepping (ops/stale.py via make_stale_step_fns):
    a 5-step trajectory with fresh prepares only every 3rd step must
    match the plain per-step path (movers ride the side bundle; the
    physics is exact up to f32 summation order)."""
    from fastpm_tpu.benchlib import (make_stale_step_fns, make_step_fn,
                                     example_particles)

    pm = PM(32, 64.0)
    x0, v0 = example_particles(16, 64.0, seed=2, jitter=0.4)
    coeffs = jnp.asarray([0.5, 0.3], dtype=jnp.float32)
    step_ref = make_step_fn(pm, donate=False)
    xr, vr = x0, v0
    for _ in range(5):
        xr, vr, _a = step_ref(xr, vr, coeffs)

    sf, ss = make_stale_step_fns(pm, K=128, C=1024, maxm_frac=0.3,
                                 interpret=True)
    x, v = x0, v0
    ranges = None
    for i in range(5):
        if i % 3 == 0:
            x, v, _a, ranges = sf(x, v, coeffs)
        else:
            x, v, _a, nbad = ss(x, v, ranges, coeffs)
            assert int(nbad) == 0

    def keyed(a, b):
        k = np.lexsort((np.asarray(a)[:, 2], np.asarray(a)[:, 1],
                        np.asarray(a)[:, 0]))
        return np.asarray(a)[k], np.asarray(b)[k]

    xs_s, vs_s = keyed(x, v)
    xs_r, vs_r = keyed(xr, vr)
    np.testing.assert_allclose(xs_s, xs_r, atol=5e-5)
    np.testing.assert_allclose(vs_s, vs_r, atol=5e-5)


def test_prepare_base_only_matches_full():
    """base_only=True range tables (offset row 0 only) must be the
    row-0 slice of the full 8-offset tables, and the from8 paint +
    readout kernels (which consume only row 0) must produce identical
    results from either bundle."""
    from fastpm_tpu.ops.paint_pallas import (make_prepare_fn,
                                             make_prepare_carry_fn,
                                             make_paint_from8_fn)
    from fastpm_tpu.ops.readout_pallas import make_readout3_from8_fn

    pm = PM(16, 64.0)
    rng = np.random.default_rng(47)
    n = 5120
    pos = jnp.asarray(rng.uniform(0, 64, (n, 3)).astype(np.float32))
    vel = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))

    full = jax.jit(make_prepare_fn(pm, C=1024))(pos)
    base = jax.jit(make_prepare_fn(pm, C=1024, base_only=True))(pos)
    assert base["ranges"].shape[1] == 1
    np.testing.assert_array_equal(np.asarray(base["ranges"][:, 0]),
                                  np.asarray(full["ranges"][:, 0]))
    np.testing.assert_array_equal(np.asarray(base["ranges_lm"][0]),
                                  np.asarray(full["ranges_lm"][0]))

    paint = make_paint_from8_fn(pm, K=256, C=1024, interpret=True)
    np.testing.assert_array_equal(np.asarray(paint(base)),
                                  np.asarray(paint(full)))
    read = make_readout3_from8_fn(pm, K=256, C=1024, interpret=True)
    cs = [jnp.asarray(rng.standard_normal((16, 16, 16))
                      .astype(np.float32)) for _ in range(3)]
    np.testing.assert_array_equal(np.asarray(read(base, *cs)),
                                  np.asarray(read(full, *cs)))

    # carry variant: sorted rows identical, tables row-0-equal
    fa = jax.jit(make_prepare_carry_fn(pm, C=1024))(pos, vel)
    ba = jax.jit(make_prepare_carry_fn(pm, C=1024,
                                       base_only=True))(pos, vel)
    np.testing.assert_array_equal(np.asarray(ba[0]["ranges"][:, 0]),
                                  np.asarray(fa[0]["ranges"][:, 0]))
    np.testing.assert_array_equal(np.asarray(ba[1]), np.asarray(fa[1]))
    np.testing.assert_array_equal(np.asarray(ba[2]), np.asarray(fa[2]))


def test_prepare_carry_payload_gather_identical():
    """payload_gather=True (2-operand key sort + per-column take) must
    produce a bit-identical bundle and sorted rows to the 7-operand
    stable sort."""
    from fastpm_tpu.ops.paint_pallas import make_prepare_carry_fn

    pm = PM(16, 32.0)
    rng = np.random.default_rng(31)
    n = 4000
    pos = jnp.asarray(rng.uniform(0, 32, (n, 3)).astype(np.float32))
    vel = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    a = jax.jit(make_prepare_carry_fn(pm, C=1024))(pos, vel)
    b = jax.jit(make_prepare_carry_fn(pm, C=1024,
                                      payload_gather=True))(pos, vel)
    for key in ("ranges", "cell_2d", "w8T"):
        np.testing.assert_array_equal(np.asarray(a[0][key]),
                                      np.asarray(b[0][key]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))


def test_prepare_carry_order_free():
    """The order-free bundle (make_prepare_carry_fn) must paint the
    same canvas and read out values aligned with the sorted (x, v)
    it returns; extras follow the same permutation."""
    from fastpm_tpu.ops.paint_pallas import (make_prepare_fn,
                                             make_prepare_carry_fn,
                                             make_paint_from4_fn)
    from fastpm_tpu.ops.readout_pallas import make_readout3_from4_fn

    pm = PM(16, 32.0)
    rng = np.random.default_rng(11)
    n = 3000
    pos = jnp.asarray(rng.uniform(0, 32, (n, 3)).astype(np.float32))
    vel = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    ids = jnp.arange(n, dtype=jnp.uint32)
    cs = [jnp.asarray(rng.standard_normal((16, 16, 16))
                      .astype(np.float32)) for _ in range(3)]

    prep_c = make_prepare_carry_fn(pm, C=1024)
    paint4 = make_paint_from4_fn(pm, K=128, C=1024, interpret=True)
    ro4 = make_readout3_from4_fn(pm, K=128, C=1024, interpret=True)

    prepared, xs, vs, (ids_s,) = prep_c(pos, vel, (ids,))
    canvas = paint4(prepared)

    prep = make_prepare_fn(pm, C=1024)
    canvas_ref = paint4(prep(pos))
    np.testing.assert_allclose(np.asarray(canvas), np.asarray(canvas_ref),
                               atol=2e-6)

    # sorted (x, v, id) are a permutation of the inputs, consistent rows
    perm = np.asarray(ids_s)
    np.testing.assert_array_equal(np.sort(perm), np.arange(n))
    np.testing.assert_allclose(np.asarray(xs), np.asarray(pos)[perm])
    np.testing.assert_allclose(np.asarray(vs), np.asarray(vel)[perm])

    # readout values come back aligned with the sorted rows
    vals = ro4(prepared, *cs)
    painter = Painter(pm, "cic", 2, backend="xla")
    want = np.stack([np.asarray(painter.readout(c, xs)) for c in cs],
                    axis=-1)
    # bf16-split gather error is ~5e-6 relative (BENCH_NOTES)
    np.testing.assert_allclose(np.asarray(vals), want, atol=2e-5)


def test_pallas_readout3_onepass_matches_painter():
    """ONE-pass 8-corner readout (make_readout3_from8_fn) against the
    XLA painter. PM(16): nyp*nzp = 289 -> RX aligns down to 0 with a
    large lane residual RXL = 289 (the residual-shift path)."""
    from fastpm_tpu.ops.paint_pallas import make_prepare_fn
    from fastpm_tpu.ops.readout_pallas import make_readout3_from8_fn

    pm = PM(16, 64.0)
    painter = Painter(pm, "cic", 2, backend="xla")
    rng = np.random.default_rng(21)
    n = 3777
    pos = jnp.asarray(rng.uniform(0, 64, (n, 3)).astype(np.float32))
    cs = [jnp.asarray(rng.standard_normal((16, 16, 16))
                      .astype(np.float32)) for _ in range(3)]
    prepared = jax.jit(make_prepare_fn(pm, C=1024))(pos)
    # split mode: the 8-corner in-kernel accumulation regroups the
    # bf16-split sums vs the 2-pass kernel, so the documented ~5e-6
    # rel gather error can reach ~2e-5 absolute here
    f = make_readout3_from8_fn(pm, K=256, C=1024, interpret=True)
    got = np.asarray(f(prepared, *cs))
    want = np.stack([np.asarray(painter.readout(c, pos)) for c in cs],
                    axis=-1)
    np.testing.assert_allclose(got, want, atol=3e-5)
    # f32 dots: the kernel logic itself is exact to f32 rounding
    fh = make_readout3_from8_fn(pm, K=256, C=1024, interpret=True,
                                gather_mode="highest")
    np.testing.assert_allclose(np.asarray(fh(prepared, *cs)), want,
                               atol=1e-6)


def test_pallas_readout3_onepass_rx_aligned():
    """One-pass readout on PM(32): nyp*nzp = 1089 -> RX = 8 (8-aligned
    row offset) with RXL = 65; boundary particles exercise the
    cross-block corner split."""
    from fastpm_tpu.ops.paint_pallas import make_prepare_fn
    from fastpm_tpu.ops.readout_pallas import make_readout3_from8_fn

    pm = PM(32, 64.0)
    painter = Painter(pm, "cic", 2, backend="xla")
    rng = np.random.default_rng(22)
    n = 5000
    pos = np.concatenate([
        rng.uniform(0, 64, (n - 8, 3)),
        np.full((4, 3), 63.999),          # wrap corner
        np.full((4, 3), 0.0005)])         # origin corner
    pos = jnp.asarray(pos.astype(np.float32))
    cs = [jnp.asarray(rng.standard_normal((32, 32, 32))
                      .astype(np.float32)) for _ in range(3)]
    prepared = jax.jit(make_prepare_fn(pm, C=1024))(pos)
    f = make_readout3_from8_fn(pm, K=128, C=1024, interpret=True)
    got = np.asarray(f(prepared, *cs))
    want = np.stack([np.asarray(painter.readout(c, pos)) for c in cs],
                    axis=-1)
    np.testing.assert_allclose(got, want, atol=3e-5)
    fh = make_readout3_from8_fn(pm, K=128, C=1024, interpret=True,
                                gather_mode="highest")
    np.testing.assert_allclose(np.asarray(fh(prepared, *cs)), want,
                               atol=1e-6)


def test_pallas_paint_onepass_matches_painter():
    """ONE-pass 8-corner paint (make_paint_from8_fn): each particle is
    visited once and deposits into two accumulator streams (dx=0/1)
    that the wrapper adds with a +nyp*nzp flat shift. Boundary
    particles exercise the wrap folds and the halo carry of BOTH
    streams."""
    from fastpm_tpu.ops.paint_pallas import (make_prepare_fn,
                                             make_paint_from8_fn)

    pm = PM(32, 64.0)
    painter = Painter(pm, "cic", 2, backend="xla")
    rng = np.random.default_rng(5)
    n = 5000
    pos = np.concatenate([
        rng.uniform(0, 64, (n - 8, 3)),
        np.full((4, 3), 63.999),          # wrap corner
        np.full((4, 3), 0.0005)])         # origin corner
    pos = jnp.asarray(pos.astype(np.float32))
    prepared = jax.jit(make_prepare_fn(pm, C=1024))(pos)
    got = np.asarray(make_paint_from8_fn(pm, K=128, C=1024,
                                         interpret=True)(prepared))
    want = np.asarray(painter.paint(pos))
    np.testing.assert_allclose(got, want, atol=2e-5)
    # total mass is conserved across the two streams
    np.testing.assert_allclose(got.sum(), n, rtol=1e-5)


def test_pallas_paint_onepass_small_mesh():
    """One-pass paint on PM(16) (large lane residual regime) with a
    scalar mass."""
    from fastpm_tpu.ops.paint_pallas import (make_prepare_fn,
                                             make_paint_from8_fn)

    pm = PM(16, 64.0)
    painter = Painter(pm, "cic", 2, backend="xla")
    rng = np.random.default_rng(6)
    pos = jnp.asarray(rng.uniform(0, 64, (3777, 3)).astype(np.float32))
    prepared = jax.jit(make_prepare_fn(pm, C=1024))(pos)
    got = np.asarray(make_paint_from8_fn(pm, K=256, C=1024,
                                         interpret=True)(prepared, 2.0))
    want = np.asarray(painter.paint(pos, 2.0))
    np.testing.assert_allclose(got, want, atol=4e-5)


def test_pallas_readout3_onepass_row_window():
    """The dynamic row-windowed gather (subr) is bit-identical to the
    full-width path, including chunks that overflow the window (sparse
    regions take the slow branch) and lane-127 fix rows."""
    from fastpm_tpu.ops.readout_pallas import make_readout3_from8_fn

    pm = PM(Nmesh=(20, 20, 20), BoxSize=20.0)
    rng = np.random.RandomState(7)
    # dense clump (fast branch) + uniform sparse tail (slow branch)
    clump = 5.0 + rng.rand(3000, 3).astype(np.float32) * 0.8
    spread = rng.rand(600, 3).astype(np.float32) * 20.0
    x = jnp.asarray(np.concatenate([clump, spread]))
    canvases = [jnp.asarray(rng.standard_normal(
        (20, 20, 20)).astype(np.float32)) for _ in range(3)]
    wide = make_readout3_from8_fn(pm, K=128, C=1024, interpret=True,
                                  subr=1024)  # > CLh+HR: windowing off
    narrow = make_readout3_from8_fn(pm, K=128, C=1024, interpret=True,
                                    subr=8)
    from fastpm_tpu.ops.paint_pallas import make_prepare_fn
    prep = make_prepare_fn(pm, C=1024)(x)
    prep["n"] = int(x.shape[0])
    a = np.asarray(wide(prep, *canvases))
    b = np.asarray(narrow(prep, *canvases))
    assert np.array_equal(a, b)


def test_pallas_paint_onepass_row_window():
    """Row-windowed deposit (subr) matches the full-width one-pass
    paint bit-for-bit, dense + sparse mix (both branches)."""
    from fastpm_tpu.ops.paint_pallas import (make_prepare_fn,
                                             make_paint_from8_fn)

    pm = PM(Nmesh=(20, 20, 20), BoxSize=20.0)
    rng = np.random.RandomState(11)
    clump = 5.0 + rng.rand(3000, 3).astype(np.float32) * 0.8
    spread = rng.rand(600, 3).astype(np.float32) * 20.0
    x = jnp.asarray(np.concatenate([clump, spread]))
    prep = make_prepare_fn(pm, C=1024)(x)
    prep["n"] = int(x.shape[0])
    a = np.asarray(make_paint_from8_fn(pm, K=128, C=1024,
                                       interpret=True,
                                       subr=1024)(prep))
    b = np.asarray(make_paint_from8_fn(pm, K=128, C=1024,
                                       interpret=True, subr=8)(prep))
    assert np.array_equal(a, b)


def test_auto_window_C_hits_one_mxu_fill():
    """auto_window_C (the C=None default of every prepared-bundle
    builder) picks the window so the 8-corner kernels' canvas block is
    exactly 128 rows -- one full MXU contraction (chip-measured +6%,
    BENCH_NOTES round-3 matrix) -- and stays consistent with the
    kernels' own geometry helpers."""
    from fastpm_tpu.ops.paint_pallas import (auto_window_C,
                                             paint8_geometry)
    from fastpm_tpu.ops.readout_pallas import readout8_geometry

    for nmesh in ((512, 512, 512), (256, 256, 256), (384, 384, 384),
                  (768, 768, 768), (1024, 1024, 1024),
                  (2048, 2048, 2048), (64, 64, 64),
                  (128, 192, 320)):
        pm = PM(Nmesh=nmesh, BoxSize=float(nmesh[0]))
        nyp, nzp = nmesh[1] + 1, nmesh[2] + 1
        C = auto_window_C(nyp, nzp)
        assert C % 1024 == 0
        CLh, HR, _RX, _RXL = readout8_geometry(pm, C)
        assert CLh + HR == 128, (nmesh, CLh, HR)
        # the paint window never exceeds one fill either (HR_p <= HR_r)
        CLp, HRp = paint8_geometry(pm, C)
        assert CLp + HRp <= 128
        assert HRp <= CLp                   # the paint carry contract
        # homed trio: 4-corner geometry, same 128-row target
        Ch = auto_window_C(nyp, nzp, eight=False)
        assert Ch % 1024 == 0
        assert Ch // 128 + paint8_geometry(pm, Ch)[1] == 128

    # the bench shape lands on the measured winner
    assert auto_window_C(513, 513) == 15360

    # degenerate (enormous Nz, no single-fill window): the chosen C
    # must still satisfy the kernels' HR <= CLh carry invariant
    from fastpm_tpu.ops.paint_pallas import window_halo_rows
    for nzp_big in (16385, 40961):
        for eight in (True, False):
            Cd = auto_window_C(513, nzp_big, eight=eight)
            assert Cd % 1024 == 0
            assert window_halo_rows(513, nzp_big, eight) <= Cd // 128
