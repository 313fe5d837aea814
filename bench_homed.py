#!/usr/bin/env python
"""Real-chip bench of the HOMED halo-exchange force on a 1-device mesh
(VERDICT r2 weak #7): the scalable shard_map path (ppermute halo
reduce/gather + homed Pallas kernels) vs the single-device fused step
(bench.py). On one device the ppermutes are self-sends, so the delta
vs bench.py isolates what the homed kernels' extended-slab layout and
exchange plumbing cost on real hardware.

Prints one JSON line per engine."""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec
    from fastpm_tpu.mesh import PM
    from fastpm_tpu.benchlib import example_particles
    from fastpm_tpu.parallel.pfft import SlabPM
    from fastpm_tpu.parallel.psolver import (_force_local_homed_multi,
                                             _force_local_homed_carry,
                                             particle_spec, deltak_spec)

    nc = int(os.environ.get("BENCH_NC", "256"))
    b = int(os.environ.get("BENCH_B", "2"))
    nsteps = int(os.environ.get("BENCH_STEPS", "3"))
    H = int(os.environ.get("BENCH_H", "4"))
    # order-free carry (the production multichip body) by default;
    # BENCH_HOMED_CARRY=0 restores the order-preserving body
    carry = bool(int(os.environ.get("BENCH_HOMED_CARRY", "1")))
    baseline = 1024 ** 3 * 40 / (60.0 * 16)
    box = 1.0 * nc

    pm = PM(nc * b, box)
    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
    spm = SlabPM(pm, mesh, axis="x")
    x0, v0 = example_particles(nc, box, seed=0)
    coeffs = jnp.asarray([0.05, 0.02], dtype=jnp.float32)
    pspec = particle_spec(mesh)
    L = jnp.float32(box)
    # commit inputs to the SAME sharding the step outputs carry --
    # otherwise call #2 (jax Array with out_specs sharding, vs numpy
    # with default sharding on call #1) triggers a second full compile
    # INSIDE the timed loop (~50 s dressed up as a slow step)
    from jax.sharding import NamedSharding
    x0 = jax.device_put(x0, NamedSharding(mesh, pspec))
    v0 = jax.device_put(v0, NamedSharding(mesh, pspec))

    if carry:
        def local(xs, vs, coeffs):
            xs = xs - jnp.floor(xs / L) * L
            x, v, _extras, acc, bad, _dk = _force_local_homed_carry(
                spm, xs, vs, (), "1_4", H)
            v = v + acc * coeffs[0]
            x = x + v * coeffs[1]
            return x, v, bad
    else:
        def local(xs, vs, coeffs):
            outs, bad, _dk = _force_local_homed_multi(
                spm, (xs,), (1.0,), "1_4", H)
            acc = outs[0]["acc"]
            v = vs + acc * coeffs[0]
            x = xs + v * coeffs[1]
            x = x - jnp.floor(x / L) * L
            return x, v, bad

    step = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(pspec, pspec, PartitionSpec()),
        out_specs=(pspec, pspec, PartitionSpec()),
        check_vma=False))

    t_c = time.perf_counter()
    x1, v1, bad = step(x0, v0, coeffs)
    nbad = int(bad)
    compile_s = time.perf_counter() - t_c
    if nbad:
        raise SystemExit(f"halo overflow: bad={nbad}")
    # per-step fetches change the metric (adds a host round trip per
    # step, forbids cross-step overlap) -- keep the headline timing
    # chained+one-fetch like bench.py; BENCH_HOMED_PERSTEP=1 opts into
    # the diagnostic per-step timings (recompile hunting)
    per_step = []
    diag = bool(os.environ.get("BENCH_HOMED_PERSTEP"))
    t0 = time.perf_counter()
    for _ in range(nsteps):
        t1 = time.perf_counter()
        x1, v1, bad = step(x1, v1, coeffs)
        if diag:
            _ = float(jnp.sum(x1))
            per_step.append(round(time.perf_counter() - t1, 3))
    _ = float(jnp.sum(x1))
    dt = time.perf_counter() - t0
    rate = nc ** 3 * nsteps / dt
    print(json.dumps({
        "metric": f"homed_force_step_{nc}^3_B{b}_H{H}_1dev",
        "variant": "carry" if carry else "per-step-sort",
        "value": round(rate, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(rate / baseline, 4),
        "step_s": round(dt / nsteps, 4),
        "per_step_s": per_step,
        "compile_s": round(compile_s, 1)}))


if __name__ == "__main__":
    main()
