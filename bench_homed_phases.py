#!/usr/bin/env python
"""Per-phase breakdown of the HOMED force on a 1-device mesh, real
chip: prepare+paint, halo_reduce, r2c_local, transfer+c2r_local,
halo_gather, readout. Pinpoints where the 27x vs the fused path goes
(bench_homed.py measured 18.4 s/step vs 0.67 s)."""

import json
import os
import time

import numpy as np


def timeit(fn, fence, reps, *args):
    out = fn(*args)
    _ = float(fence(out))
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
    from jax.sharding import Mesh, PartitionSpec as P
    from fastpm_tpu.mesh import PM
    from fastpm_tpu.benchlib import example_particles
    from fastpm_tpu.parallel.pfft import SlabPM
    from fastpm_tpu.parallel import psolver as ps

    nc = int(os.environ.get("BENCH_NC", "256"))
    b = int(os.environ.get("BENCH_B", "2"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    H = int(os.environ.get("BENCH_H", "4"))
    box = 1.0 * nc

    pm = PM(nc * b, box)
    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
    spm = SlabPM(pm, mesh, axis="x")
    x0, _v0 = example_particles(nc, box, seed=0)
    nproc, nloc = 1, pm.Nmesh[0]
    nx_l = nloc + 2 * H
    shape_local = (nx_l, pm.Nmesh[1], pm.Nmesh[2])
    use_pallas = ps._use_pallas_homed(shape_local)
    print(f"# homed phases nc={nc} B={b} H={H} shape_local={shape_local}"
          f" use_pallas={use_pallas}")

    ssum = jax.jit(lambda a: sum(jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
                                 for leaf in jax.tree.leaves(a)))

    def sm(f, out_specs=P()):
        return jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=P(), out_specs=out_specs,
            check_vma=False))

    rows = []

    def add(name, dt):
        rows.append((name, dt))
        print(json.dumps({"phase": name, "ms": round(dt * 1e3, 2)}),
              flush=True)

    prepare, paint_from, readout3_from = ps._homed_kernels(
        shape_local, "x")

    def f_prepare(x):
        r0 = jax.lax.axis_index("x") * nloc
        relx, iy, iz, frac = ps._cic_rel(pm, x, r0, H)
        return prepare(relx, iy, iz, frac)

    add("prepare(sort)", timeit(sm(f_prepare), ssum, reps, x0))
    prepared = sm(f_prepare)(x0)

    def f_paint(prep):
        return paint_from({**prep, "n": int(x0.shape[0])}, 1.0)

    jp = sm(f_paint)
    add("paint_from4_homed", timeit(jp, ssum, reps, prepared))
    canvas_ext = jp(prepared)

    def f_reduce(c):
        return ps._halo_reduce(c, "x", nloc, H, nproc)

    jr = sm(f_reduce)
    add("halo_reduce", timeit(jr, ssum, reps, canvas_ext))
    canvas = jr(canvas_ext)

    jr2c = sm(lambda c: spm.r2c_local(c))
    add("r2c_local", timeit(jr2c, lambda k: jnp.sum(jnp.real(k)), reps,
                            canvas))
    delta_k = jr2c(canvas)

    def f_tr(k):
        return ps._apply_kernel_local(spm, k, "1_4", "acc", 0)

    jtr = sm(f_tr)
    add("transfer_local", timeit(jtr, lambda k: jnp.sum(jnp.real(k)),
                                 reps, delta_k))
    fk = jtr(delta_k)

    jc2r = sm(lambda k: spm.c2r_local(k))
    add("c2r_local(x3)", timeit(jc2r, ssum, reps, fk))
    f_loc = jc2r(fk)

    def f_gather(fl):
        return ps._halo_gather(fl, "x", nloc, H, nproc)

    jg = sm(f_gather)
    add("halo_gather(x3)", timeit(jg, ssum, reps, f_loc))
    f_ext = jg(f_loc)

    def f_ro(prep, a, b_, c):
        return readout3_from({**prep, "n": int(x0.shape[0])}, a, b_, c)

    jro = sm(f_ro)
    add("readout3_from4_homed", timeit(jro, ssum, reps, prepared,
                                       f_ext, f_ext, f_ext))

    tot = sum(dt for _n, dt in rows) \
        + 2 * sum(dt for n_, dt in rows
                  if n_.startswith(("transfer", "c2r", "halo_gather")))
    print(f"# step estimate (x3 grads): {tot*1e3:.0f} ms")


if __name__ == "__main__":
    main()
