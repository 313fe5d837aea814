#!/usr/bin/env python
"""Bisect the composed homed-force blowup (bench_homed.py: 18.4 s/step
vs bench_homed_phases.py: isolated phases summing to ~1.24 s).

Times jitted shard_map programs of progressively larger PREFIXES of
_force_local_homed_multi on a 1-device mesh, real chip. The first
prefix whose time departs from the phase-sum pinpoints the pathology
(scheduling, spill, or layout copies introduced by composition).
"""

import json
import os
import time

import numpy as np


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
    reps = int(os.environ.get("BENCH_REPS", "3"))
    H = int(os.environ.get("BENCH_H", "4"))
    stages = os.environ.get("BENCH_STAGES", "1,2,3,4").split(",")
    box = 1.0 * nc

    pm = PM(nc * b, box)
    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
    spm = SlabPM(pm, mesh, axis="x")
    x0, _ = example_particles(nc, box, seed=0)
    nloc = pm.Nmesh[0]
    nx_l = nloc + 2 * H
    shape_local = (nx_l, pm.Nmesh[1], pm.Nmesh[2])
    prepare, paint_from, readout3_from = ps._homed_kernels(
        shape_local, "x")
    n = int(x0.shape[0])

    def prefix(depth):
        def f(x):
            r0 = jax.lax.axis_index("x") * nloc
            relx, iy, iz, frac = ps._cic_rel(pm, x, r0, H)
            relx = jnp.where(relx < nx_l, relx, nx_l + 1)
            prepared = prepare(relx, iy, iz, frac)
            canvas_ext = paint_from({**prepared, "n": n}, 1.0)
            canvas = ps._halo_reduce(canvas_ext, "x", nloc, H, 1)
            if depth == 1:
                return jnp.sum(jnp.abs(canvas))
            canvas = canvas / (jnp.float32(n) / pm.Norm)
            delta_k = spm.r2c_local(canvas)
            if depth == 2:
                return jnp.sum(jnp.real(delta_k))
            fields_ext = []
            for d in range(3):
                fk = ps._apply_kernel_local(spm, delta_k, "1_4",
                                            "acc", d)
                local = spm.c2r_local(fk)
                fields_ext.append(
                    ps._halo_gather(local, "x", nloc, H, 1))
            if depth == 3:
                return sum(jnp.sum(jnp.abs(fe)) for fe in fields_ext)
            acc3 = readout3_from({**prepared, "n": n}, *fields_ext)
            return jnp.sum(jnp.abs(acc3))

        return jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=P("x"), out_specs=P(),
            check_vma=False))

    for depth in [int(s) for s in stages]:
        fn = prefix(depth)
        t0 = time.perf_counter()
        out = float(fn(x0))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = float(fn(x0))
            ts.append(time.perf_counter() - t0)
        print(json.dumps({
            "stage": depth, "median_s": round(float(np.median(ts)), 3),
            "compile_s": round(compile_s, 1), "out": out}), flush=True)


if __name__ == "__main__":
    main()
