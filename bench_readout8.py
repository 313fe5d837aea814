#!/usr/bin/env python
"""(K, C) sweep of the ONE-pass 8-corner readout kernel on the real
chip (the from4 sweep lives in bench_readout.py; its K=1024/C=8192
optimum does not transfer: from8 halves rounds and doubles canvas
blocks, so the window/round balance moved)."""

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
    from fastpm_tpu.ops.readout_pallas import make_readout3_from8_fn

    nc = int(os.environ.get("BENCH_NC", "256"))
    b = int(os.environ.get("BENCH_B", "2"))
    reps = int(os.environ.get("BENCH_REPS", "10"))
    box = 1.0 * nc
    pm = PM(nc * b, box)
    painter = Painter(pm, "cic", 2)
    x, _ = example_particles(nc, box, seed=0)

    key = jax.random.PRNGKey(0)
    fields = [jax.random.normal(k, pm.rshape, jnp.float32)
              for k in jax.random.split(key, 3)]

    nsub = 65536
    xs = x[:nsub]
    ref = jax.jit(lambda a, b_, c, xx: painter.readout3(a, b_, c, xx))(
        fields[0], fields[1], fields[2], xs)
    ref = np.asarray(ref)

    configs = [(512, 8192), (1024, 8192), (512, 16384), (1024, 16384),
               (2048, 16384), (1024, 32768), (2048, 32768)]

    prepared_cache = {}

    def get_prepared(C, xx, tag, pad_to=1024):
        ck = (C, tag, pad_to)
        if ck not in prepared_cache:
            p = jax.jit(make_prepare_fn(pm, C=C, pad_to=pad_to))(xx)
            p["n"] = int(p["n"])   # kernels slice by the static count
            prepared_cache[ck] = p
        return prepared_cache[ck]

    n_full, n_sub = int(x.shape[0]), nsub

    def jit_static_n(f, n_static):
        return jax.jit(lambda p, a, b_, c: f({**p, "n": n_static},
                                             a, b_, c))

    for K, C in configs:
        try:
            f = make_readout3_from8_fn(pm, K=K, C=C)
            ro = jit_static_n(f, n_full)
            ro_sub = jit_static_n(f, n_sub)
            prepared = get_prepared(C, x, "full", pad_to=max(K, 2048))
            out = ro(prepared, *fields)
            _ = float(jnp.sum(out))
            psub = get_prepared(C, xs, "sub", pad_to=max(K, 2048))
            osub = np.asarray(ro_sub(psub, *fields))
            scale = np.abs(ref).max()
            err = np.abs(osub - ref).max() / scale
            ts = []
            for _i in range(reps):
                t0 = time.perf_counter()
                out = ro(prepared, *fields)
                _ = float(jnp.sum(out))
                ts.append(time.perf_counter() - t0)
            print(f"K={K:5d} C={C:6d}: {np.median(ts)*1e3:9.2f} ms   "
                  f"maxrelerr={err:.2e}", flush=True)
        except Exception as e:
            print(f"K={K:5d} C={C:6d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
