#!/usr/bin/env python
"""A/B the 2-pass vs ONE-pass paint kernels on the real chip."""

import os
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from fastpm_tpu.mesh import PM
    from fastpm_tpu.benchlib import example_particles
    from fastpm_tpu.ops.paint_pallas import (make_prepare_fn,
                                             make_paint_from4_fn,
                                             make_paint_from8_fn)

    nc = int(os.environ.get("BENCH_NC", "256"))
    b = int(os.environ.get("BENCH_B", "2"))
    reps = int(os.environ.get("BENCH_REPS", "10"))
    box = 1.0 * nc
    pm = PM(nc * b, box)
    x, _ = example_particles(nc, box, seed=0)

    configs = [("from4", make_paint_from4_fn, 512, 8192),
               ("from4", make_paint_from4_fn, 1024, 8192),
               ("from8", make_paint_from8_fn, 512, 8192),
               ("from8", make_paint_from8_fn, 1024, 8192),
               ("from8", make_paint_from8_fn, 1024, 16384),
               ("from8", make_paint_from8_fn, 2048, 16384)]

    prepared_cache = {}

    def get_prepared(C, pad_to):
        ck = (C, pad_to)
        if ck not in prepared_cache:
            p = jax.jit(make_prepare_fn(pm, C=C, pad_to=pad_to))(x)
            p["n"] = int(p["n"])
            prepared_cache[ck] = p
        return prepared_cache[ck]

    ref_sum = None
    for name, maker, K, C in configs:
        try:
            f = jax.jit(maker(pm, K=K, C=C))
            prepared = get_prepared(C, max(K, 2048))
            out = f(prepared)
            tot = float(jnp.sum(out))
            if ref_sum is None:
                ref_sum = tot
            ts = []
            for _i in range(reps):
                t0 = time.perf_counter()
                out = f(prepared)
                _ = float(jnp.sum(out))
                ts.append(time.perf_counter() - t0)
            print(f"{name} K={K:5d} C={C:6d}: "
                  f"{np.median(ts)*1e3:9.2f} ms   sum={tot:.1f} "
                  f"(ref {ref_sum:.1f})", flush=True)
        except Exception as e:
            print(f"{name} K={K:5d} C={C:6d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
