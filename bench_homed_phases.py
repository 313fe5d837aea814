#!/usr/bin/env python
"""Per-phase breakdown of the PRODUCTION homed carry force on a
1-device mesh, real chip: cell sort, presorted prepare, paint_from8,
halo_reduce, r2c_local, fused grad3 inverse, halo_gather x3,
readout3_from8. Pinpoints where the homed body's delta vs the fused
single-device step (bench.py) lives -- the phases mirror
parallel/psolver._force_local_homed_carry line by line."""

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
    from fastpm_tpu.kernels import kernel_orders

    nc = int(os.environ.get("BENCH_NC", "256"))
    b = int(os.environ.get("BENCH_B", "2"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    H = int(os.environ.get("BENCH_H", "4"))
    box = 1.0 * nc

    pm = PM(nc * b, box)
    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
    spm = SlabPM(pm, mesh, axis="x")
    x0, v0 = example_particles(nc, box, seed=0)
    nproc, nloc = 1, pm.Nmesh[0]
    nx_l = nloc + 2 * H
    n0, n1, n2 = pm.Nmesh
    nyp, nzp = n1 + 1, n2 + 1
    shape_local = (nx_l, n1, n2)
    print(f"# homed carry phases nc={nc} B={b} H={H} "
          f"shape_local={shape_local} "
          f"use_pallas={ps._use_pallas_homed(shape_local)}")

    ssum = jax.jit(lambda a: sum(jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
                                 for leaf in jax.tree.leaves(a)))

    def sm(f):
        return jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=P(), out_specs=P(),
            check_vma=False))

    rows = {}

    def add(name, dt):
        rows[name] = dt
        print(json.dumps({"phase": name, "ms": round(dt * 1e3, 2)}),
              flush=True)

    prepare, paint_from, readout3_from = ps._homed_kernels(
        shape_local, "x", presorted=True)

    def f_sort(x, v):
        r0 = jax.lax.axis_index("x") * nloc
        relx, iy, iz, _fr = ps._cic_rel(pm, x, r0, H)
        relx = jnp.where(relx < nx_l, relx, nx_l + 1)
        cell = (relx * nyp + iy) * nzp + iz
        ops = jax.lax.sort((cell, x[:, 0], x[:, 1], x[:, 2],
                            v[:, 0], v[:, 1], v[:, 2]), num_keys=1)
        return (jnp.stack(ops[1:4], axis=-1),
                jnp.stack(ops[4:7], axis=-1))

    js = sm(f_sort)
    add("cell_sort(7col)", timeit(js, ssum, reps, x0, v0))
    xs, vs = js(x0, v0)

    def f_prepare(xs):
        r0 = jax.lax.axis_index("x") * nloc
        relx2, iy2, iz2, fr = ps._cic_rel(pm, xs, r0, H)
        relx2 = jnp.where(relx2 < nx_l, relx2, nx_l + 1)
        return prepare(relx2, iy2, iz2, fr)

    jp = sm(f_prepare)
    add("prepare_presorted", timeit(jp, ssum, reps, xs))
    prepared = jp(xs)

    jpaint = sm(paint_from)
    add("paint_from8", timeit(jpaint, ssum, reps, prepared))
    canvas_ext = jpaint(prepared)

    jr = sm(lambda c: ps._halo_reduce(c, "x", nloc, H, nproc))
    add("halo_reduce", timeit(jr, ssum, reps, canvas_ext))
    canvas = jr(canvas_ext) / (nc ** 3 / pm.Norm)

    jr2c = sm(lambda c: spm.r2c_local(c))
    add("r2c_local", timeit(jr2c, lambda k: jnp.sum(jnp.real(k)), reps,
                            canvas))
    delta_k = jr2c(canvas)

    potorder, gradorder, _d, deconv = kernel_orders("1_4")

    def f_grad3(dk):
        out = dk
        for _ in range(deconv):
            out = spm.apply_decic(out)
        pot_k = spm.apply_pot(out, potorder)
        return tuple(spm.c2r_grad3_local(pot_k, gradorder))

    jg3 = sm(f_grad3)
    add("grad3_fused_inverse", timeit(jg3, ssum, reps, delta_k))
    locs = jg3(delta_k)

    def f_gather3(locs):
        return tuple(ps._halo_gather(g, "x", nloc, H, nproc)
                     for g in locs)

    jg = sm(f_gather3)
    add("halo_gather(x3)", timeit(jg, ssum, reps, locs))
    f_ext = jg(locs)

    def f_ro(prep, fe):
        # "n" is a static int inside the one-program force; restore it
        # after the jit boundary turned it into an array
        prep = dict(prep)
        prep["n"] = int(x0.shape[0])
        return readout3_from(prep, fe[0], fe[1], fe[2])

    jro = sm(f_ro)
    add("readout3_from8", timeit(jro, ssum, reps, prepared, f_ext))

    tot = sum(rows.values())
    print(f"# phase sum: {tot*1e3:.0f} ms "
          f"(bench_homed carry step for comparison)")


if __name__ == "__main__":
    main()
