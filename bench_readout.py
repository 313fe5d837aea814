#!/usr/bin/env python
"""Experiment: readout kernel variants (precision mode, C, K) on the
real chip. Reports time + max relative error vs the XLA f32 gather."""

import os
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from fastpm_tpu.mesh import PM
    from fastpm_tpu.painter import Painter
    from fastpm_tpu.benchlib import example_particles
    from fastpm_tpu.ops.paint_pallas import make_prepare_fn
    from fastpm_tpu.ops.readout_pallas import make_readout3_from4_fn

    nc = int(os.environ.get("BENCH_NC", "256"))
    b = int(os.environ.get("BENCH_B", "2"))
    reps = int(os.environ.get("BENCH_REPS", "10"))
    box = 1.0 * nc
    pm = PM(nc * b, box)
    painter = Painter(pm, "cic", 2)
    x, _ = example_particles(nc, box, seed=0)

    # reference fields: smooth-ish random
    key = jax.random.PRNGKey(0)
    fields = [jax.random.normal(k, pm.rshape, jnp.float32)
              for k in jax.random.split(key, 3)]

    # XLA reference on a small subset (full gather is slow; subset ok)
    nsub = 65536
    xs = x[:nsub]
    ref = jax.jit(lambda a, b_, c, xx: painter.readout3(a, b_, c, xx))(
        fields[0], fields[1], fields[2], xs)
    ref = np.asarray(ref)

    configs = [("split", 256, 8192), ("split", 512, 4096),
               ("split", 256, 4096)]

    prepared_cache = {}

    def get_prepared(C, xx, tag, pad_to=1024):
        key = (C, tag, pad_to)
        if key not in prepared_cache:
            prepared_cache[key] = jax.jit(
                make_prepare_fn(pm, C=C, pad_to=pad_to))(xx)
        return prepared_cache[key]

    for mode, K, C in configs:
        try:
            ro = jax.jit(make_readout3_from4_fn(pm, K=K, C=C,
                                                gather_mode=mode))
            prepared = get_prepared(C, x, "full", pad_to=max(K, 2048))
            out = ro(prepared, *fields)
            _ = float(jnp.sum(out))
            # accuracy on the subset
            psub = get_prepared(C, xs, "sub", pad_to=max(K, 2048))
            osub = np.asarray(ro(psub, *fields))
            scale = np.abs(ref).max()
            err = np.abs(osub - ref).max() / scale
            ts = []
            for _i in range(reps):
                t0 = time.perf_counter()
                out = ro(prepared, *fields)
                _ = float(jnp.sum(out))
                ts.append(time.perf_counter() - t0)
            print(f"mode={mode:8s} K={K:5d} C={C:6d}: "
                  f"{np.median(ts)*1e3:9.2f} ms   maxrelerr={err:.2e}")
        except Exception as e:
            print(f"mode={mode:8s} K={K:5d} C={C:6d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
