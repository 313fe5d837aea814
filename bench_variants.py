#!/usr/bin/env python
"""Variant matrix for the bench step at 256^3 B2 on the real chip:
lax.sort prepare vs k-sorted (sort_block), paint4 vs paint8.
One JSON line per config."""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from fastpm_tpu.mesh import PM
    from fastpm_tpu.benchlib import make_step_fn, example_particles

    nc = int(os.environ.get("BENCH_NC", "256"))
    b = int(os.environ.get("BENCH_B", "2"))
    nsteps = int(os.environ.get("BENCH_STEPS", "3"))
    baseline = 1024 ** 3 * 40 / (60.0 * 16)

    box = 1.0 * nc
    x0, v0 = example_particles(nc, box, seed=0)
    coeffs = jnp.asarray([0.05, 0.02], dtype=jnp.float32)

    configs = []
    for name in os.environ.get(
            "BENCH_VARIANTS",
            "base,sb32768,paint8,sb32768+paint8").split(","):
        kw = {}
        for part in name.split("+"):
            if part.startswith("sb"):
                kw["sort_block"] = int(part[2:])
            elif part == "paint8":
                kw["paint8"] = True
            elif part.startswith("K"):
                kw["K"] = int(part[1:])
            elif part.startswith("C"):
                kw["C"] = int(part[1:])
            elif part.startswith("subr"):
                kw["subr"] = int(part[4:])
            elif part == "gather":
                kw["payload_gather"] = True
            elif part == "mmfft":
                kw["mmfft"] = True
            elif part.startswith("stale"):
                kw["stale"] = int(part[5:])
            elif part != "base":
                raise ValueError(part)
        configs.append((name, kw))

    for name, kw in configs:
        # fresh PM per config: the mm-FFT mode is a cached property
        # read from the environment at first use
        if kw.pop("mmfft", False):
            os.environ["FASTPM_TPU_FFT"] = "mm"
        else:
            os.environ.pop("FASTPM_TPU_FFT", None)
        pm = PM(nc * b, box)
        stale_every = kw.pop("stale", 0)
        if stale_every:
            from fastpm_tpu.benchlib import make_stale_step_fns
            sf, ss = make_stale_step_fns(
                pm, K=kw.get("K", 512), C=kw.get("C", 8192))
            t_c = time.perf_counter()
            x1, v1, acc, ranges = sf(x0, v0, coeffs)
            x1, v1, acc, nbad = ss(x1, v1, ranges, coeffs)
            _ = float(jnp.sum(x1)) + float(nbad)
            compile_s = time.perf_counter() - t_c
            t0 = time.perf_counter()
            nb = 0
            for i in range(nsteps):
                if i % stale_every == 0:
                    x1, v1, acc, ranges = sf(x1, v1, coeffs)
                else:
                    x1, v1, acc, nbad = ss(x1, v1, ranges, coeffs)
                    nb = nb + nbad          # device-side accumulate
            _ = float(jnp.sum(x1))
            dt = time.perf_counter() - t0
            if int(nb):
                raise SystemExit(f"stale mover overflow: {int(nb)}")
            rate = nc ** 3 * nsteps / dt
            print(json.dumps({
                "metric": f"pm_step_{nc}^3_B{b}:{name}",
                "value": round(rate, 1),
                "unit": "particle-steps/s",
                "vs_baseline": round(rate / baseline, 4),
                "step_s": round(dt / nsteps, 4),
                "compile_s": round(compile_s, 1)}))
            sys.stdout.flush()
            continue
        step = make_step_fn(pm, donate=False, **kw)
        t_c = time.perf_counter()
        x1, v1, acc = step(x0, v0, coeffs)
        _ = float(jnp.sum(x1))
        compile_s = time.perf_counter() - t_c
        t0 = time.perf_counter()
        for _ in range(nsteps):
            x1, v1, acc = step(x1, v1, coeffs)
        _ = float(jnp.sum(x1))
        dt = time.perf_counter() - t0
        rate = nc ** 3 * nsteps / dt
        print(json.dumps({
            "metric": f"pm_step_{nc}^3_B{b}:{name}",
            "value": round(rate, 1),
            "unit": "particle-steps/s",
            "vs_baseline": round(rate / baseline, 4),
            "step_s": round(dt / nsteps, 4),
            "compile_s": round(compile_s, 1)}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
