#!/usr/bin/env python
"""Per-phase breakdown of one PM force step on the real chip.

Times each phase of the hot loop separately (prepare/paint/r2c/
transfer/c2r/readout/kick+drift), plus FFT-variant micro-benchmarks that
inform packing decisions (c2r vs full complex ifftn). Prints a table and
a JSON line per phase.

Under the tunneled axon platform block_until_ready does not synchronize;
a host fetch of a scalar is the only reliable barrier, so every timing
loop chains a dependency and fetches one scalar at the end.
"""

import json
import os
import time

import numpy as np


def timeit(fn, fence, reps, *args):
    """Median wall time of fn(*args) over reps, fenced by a scalar fetch
    of fence(out)."""
    out = fn(*args)
    _ = float(fence(out))  # compile + warmup
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(fence(out))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp
    from fastpm_tpu.mesh import PM
    from fastpm_tpu.painter import Painter, _PACK8_MAX_CELLS
    from fastpm_tpu.benchlib import example_particles
    from fastpm_tpu.kernels import kernel_orders
    from fastpm_tpu import transfers

    nc = int(os.environ.get("BENCH_NC", "256"))
    b = int(os.environ.get("BENCH_B", "2"))
    reps = int(os.environ.get("BENCH_REPS", "20"))
    box = 1.0 * nc

    pm = PM(nc * b, box)
    painter = Painter(pm, "cic", 2)
    x, v = example_particles(nc, box, seed=0)
    potorder, gradorder, difforder, _ = kernel_orders("1_4")

    fused = painter._use_pallas and int(np.prod(pm.Nmesh)) > _PACK8_MAX_CELLS
    print(f"# nc={nc} B={b} mesh={pm.Nmesh} np={nc**3} fused={fused} "
          f"platform={jax.devices()[0].platform} reps={reps}")

    ssum = jax.jit(lambda a: sum(jnp.sum(leaf.astype(jnp.float32))
                                 for leaf in jax.tree.leaves(a)))

    rows = []

    def add(name, dt):
        rows.append((name, dt))
        print(json.dumps({"phase": name, "ms": round(dt * 1e3, 3)}))

    if fused:
        # profile the PRODUCTION kernels: from8 one-pass, auto window,
        # K=512, base-only range tables (same as gravity/benchlib)
        from fastpm_tpu.ops.paint_pallas import (make_prepare_fn,
                                                 make_paint_from8_fn)
        from fastpm_tpu.ops.readout_pallas import make_readout3_from8_fn
        prepare = jax.jit(make_prepare_fn(pm, base_only=True))
        paint_from = jax.jit(make_paint_from8_fn(pm))
        _ro3 = make_readout3_from8_fn(pm)
        # close over the static row count: a jitted dict arg would
        # trace "n" and the kernel slices by it
        n_static = int(np.prod(x.shape[:1]))
        readout3_from = jax.jit(
            lambda p, a, b_, c: _ro3({**p, "n": n_static}, a, b_, c))

        add("prepare(sort)", timeit(prepare, ssum, reps, x))
        prepared = prepare(x)
        # standalone jit(prepare) turns the static row count into a
        # device scalar; the kernels slice by it, so pin it back
        prepared["n"] = int(prepared["n"])
        add("paint_from", timeit(paint_from, ssum, reps, prepared))
        canvas = paint_from(prepared)
    else:
        paint = jax.jit(lambda xx: painter.paint(xx, 1.0))
        add("paint(xla)", timeit(paint, ssum, reps, x))
        canvas = paint(x)

    r2c = jax.jit(pm.r2c)
    add("r2c", timeit(r2c, lambda k: jnp.sum(jnp.real(k)), reps, canvas))
    delta_k = r2c(canvas)

    tr = jax.jit(lambda k: transfers.apply_grad(
        pm, transfers.apply_pot(pm, k, potorder), 0, gradorder))
    add("transfer(pot+grad)",
        timeit(tr, lambda k: jnp.sum(jnp.real(k)), reps, delta_k))
    fk = tr(delta_k)

    # the round-4 production inverse: pot transfer + fused 3-gradient
    # return (mesh.c2r_grad3) in ONE program
    g3 = jax.jit(lambda k: pm.c2r_grad3(
        transfers.apply_pot(pm, k, potorder), gradorder))
    add("pot+grad3(all 3)", timeit(g3, ssum, reps, delta_k))

    c2r = jax.jit(pm.c2r)
    add("c2r(x1)", timeit(c2r, ssum, reps, fk))
    f0 = c2r(fk)

    # FFT micro-benchmarks: is a full complex ifftn ~2x a c2r (hermitian
    # savings real) or ~1x (packing two real fields into one complex
    # transform halves FFT time)?
    re = jnp.ones(pm.rshape, dtype=pm.dtype)
    im = jnp.ones(pm.rshape, dtype=pm.dtype)
    cifft = jax.jit(lambda a, b_: jnp.fft.ifftn(jax.lax.complex(a, b_)))
    add("ifftn(full cplx)",
        timeit(cifft, lambda k: jnp.sum(jnp.real(k)), reps, re, im))

    rifft2 = jax.jit(lambda k: jnp.fft.irfftn(k, s=pm.Nmesh))
    t2 = timeit(rifft2, ssum, reps, fk)
    add("irfftn(alone)", t2)

    if fused:
        f1 = c2r(tr(delta_k))
        f2 = c2r(tr(delta_k))
        add("readout3_from", timeit(
            lambda p, a, b_, c: readout3_from(p, a, b_, c),
            ssum, reps, prepared, f0, f1, f2))
    else:
        ro3 = jax.jit(lambda a, b_, c, xx: painter.readout3(a, b_, c, xx))
        f1, f2 = f0, f0
        add("readout3(xla)", timeit(ro3, ssum, reps, f0, f1, f2, x))

    kd = jax.jit(lambda xx, vv, aa: (
        (xx + (vv + aa * 0.05) * 0.02) % box, vv + aa * 0.05))
    acc = jnp.stack([jnp.zeros(nc ** 3, jnp.float32)] * 3, -1)
    add("kick+drift", timeit(kd, ssum, reps, x, v, acc))

    total = sum(dt for _n, dt in rows
                if not _n.startswith(("ifftn", "irfftn(alone")))
    grad3 = [dt for _n, dt in rows if _n.startswith("c2r")][0] * 3
    print("#")
    print(f"# {'phase':24s} {'ms':>10s} {'% of step':>10s}")
    step_est = total + grad3 - [dt for n, dt in rows
                                if n.startswith("c2r")][0] \
        + 2 * [dt for n, dt in rows if n.startswith("transfer")][0]
    for name, dt in rows:
        pct = 100 * dt / step_est
        mult = ""
        if name.startswith(("c2r", "transfer")):
            mult = " (x3 in step)"
        print(f"# {name:24s} {dt*1e3:10.3f} {pct:9.1f}%{mult}")
    print(f"# estimated full step: {step_est*1e3:.1f} ms")


if __name__ == "__main__":
    main()
