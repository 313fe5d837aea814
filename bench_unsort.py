#!/usr/bin/env python
"""Break readout3_from into kernel vs unsort (inv-sort + row take)."""
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from fastpm_tpu.mesh import PM
    from fastpm_tpu.benchlib import example_particles
    from fastpm_tpu.ops.paint_pallas import make_prepare_fn

    nc, b = 256, 2
    pm = PM(nc * b, 1.0 * nc)
    x, _ = example_particles(nc, 1.0 * nc, seed=0)
    prepare = jax.jit(make_prepare_fn(pm, C=8192))
    prepared = prepare(x)
    n = prepared["orig"].shape[0]
    orig = prepared["orig"]
    vals = jnp.ones((3, prepared["cell_2d"].shape[1]),
                    jnp.float32)[:, :n]

    def timeit(fn, *args, reps=10):
        out = fn(*args)
        _ = float(jnp.sum(out))
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = float(jnp.sum(out))
            ts.append(time.perf_counter() - t0)
        return np.median(ts) * 1e3

    invsort = jax.jit(lambda o: jax.lax.sort(
        (o, jnp.arange(n, dtype=jnp.int32)), num_keys=1)[1])
    print("inv sort       %8.2f ms" % timeit(invsort, orig))
    inv = invsort(orig)
    take = jax.jit(lambda v, i: jnp.take(v.T, i, axis=0))
    print("row take (N,3) %8.2f ms" % timeit(take, vals, inv))
    scat = jax.jit(lambda v, o: jnp.zeros((n, 3), jnp.float32)
                   .at[o].set(v.T))
    print("row scatter    %8.2f ms" % timeit(scat, vals, orig))
    # unsort via 3 separate takes
    take3 = jax.jit(lambda v, i: jnp.stack(
        [jnp.take(v[c], i) for c in range(3)], axis=-1))
    print("3x scalar take %8.2f ms" % timeit(take3, vals, inv))


if __name__ == "__main__":
    main()
