#!/usr/bin/env python
"""Per-round cost decomposition of the one-pass 8-corner readout on
the real chip: full kernel vs ablations (nodot = no MXU gathers,
nomask = no lane-select masked sums, noround = no compute at all:
DMA pipeline + grid/loop floor). Decides where the next optimization
goes (dot consolidation vs mask-build vs window overhead)."""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from fastpm_tpu.mesh import PM
    from fastpm_tpu.benchlib import example_particles
    from fastpm_tpu.ops.paint_pallas import make_prepare_fn
    from fastpm_tpu.ops.readout_pallas import make_readout3_from8_fn

    nc = int(os.environ.get("BENCH_NC", "256"))
    b = int(os.environ.get("BENCH_B", "2"))
    reps = int(os.environ.get("BENCH_REPS", "10"))
    K = int(os.environ.get("BENCH_K", "512"))
    C = int(os.environ.get("BENCH_C", "8192"))
    subr = int(os.environ.get("BENCH_SUBR", "0")) or None
    modes = os.environ.get("BENCH_ABLATE",
                           "none,nodot,nomask,noround").split(",")
    box = 1.0 * nc
    pm = PM(nc * b, box)
    x, _ = example_particles(nc, box, seed=0)

    key = jax.random.PRNGKey(0)
    fields = [jax.random.normal(k, pm.rshape, jnp.float32)
              for k in jax.random.split(key, 3)]

    prep = jax.jit(make_prepare_fn(pm, C=C, pad_to=max(K, 2048)))(x)
    prep["n"] = int(prep["n"])

    for mode in modes:
        ab = None if mode == "none" else mode
        f = make_readout3_from8_fn(pm, K=K, C=C, subr=subr, ablate=ab)
        # arrays ride as traced args; only the int "n" is static (a
        # closure capture of the arrays ships them as constants inside
        # the remote-compile request -> HTTP 413 on the tunnel)
        n_static = int(prep["n"])
        parr = {k: v for k, v in prep.items() if k != "n"}
        jf = jax.jit(lambda p, a, b_, c, f=f:
                     f({**p, "n": n_static}, a, b_, c))
        t0 = time.perf_counter()
        out = jf(parr, *fields)
        _ = float(jnp.sum(out))
        compile_s = time.perf_counter() - t0
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            out = jf(parr, *fields)
            _ = float(jnp.sum(out))
            ts.append(time.perf_counter() - t0)
        print(json.dumps({
            "ablate": mode, "K": K, "C": C, "subr": subr,
            "median_ms": round(float(np.median(ts)) * 1e3, 1),
            "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
