#!/usr/bin/env python
"""Benchmark: full PM gravity steps (paint + FFT Poisson + 3x readout +
kick + drift) on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no benchmark numbers (BASELINE.md); the baseline
used here is the north-star target rate derived from "1024^3 particles,
40 steps, <60 s on v5p-16": 1024^3*40/(60*16) ~= 44.74e6 particle-steps
per second per chip. vs_baseline = measured rate / that.
"""

import json
import os
import sys
import time

import numpy as np


def run_one(nc: int, b: int, nsteps: int, mmfft: bool = False,
            stale_every: int = 0):
    import jax
    from fastpm_tpu.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from fastpm_tpu.mesh import PM
    from fastpm_tpu.benchlib import make_step_fn, example_particles

    # 'auto' now resolves to mm on TPU (mesh._use_mm_fft); the xla
    # variant must pin explicitly
    os.environ["FASTPM_TPU_FFT"] = "mm" if mmfft else "xla"
    box = 1.0 * nc
    pm = PM(nc * b, box)
    x, v = example_particles(nc, box, seed=0)
    coeffs = jnp.asarray([0.05, 0.02], dtype=jnp.float32)

    # compile + warmup. NOTE: under the tunneled axon platform
    # block_until_ready does not synchronize; a host fetch of a scalar is
    # the only reliable barrier, so we time chained steps + one fetch.
    if stale_every:
        from fastpm_tpu.benchlib import make_stale_step_fns
        sf, ss = make_stale_step_fns(pm)
        x1, v1, acc, ranges = sf(x, v, coeffs)
        x1, v1, acc, nbad = ss(x1, v1, ranges, coeffs)
        _ = float(jnp.sum(x1)) + float(nbad)
        t0 = time.perf_counter()
        nb = 0
        for i in range(nsteps):
            if i % stale_every == 0:
                x1, v1, acc, ranges = sf(x1, v1, coeffs)
            else:
                x1, v1, acc, nbad = ss(x1, v1, ranges, coeffs)
                nb = nb + nbad
        _ = float(jnp.sum(x1))
        dt = time.perf_counter() - t0
        if int(nb):
            raise RuntimeError(f"stale mover overflow: {int(nb)}")
        return nc ** 3 * nsteps / dt

    subr = int(os.environ.get("BENCH_SUBR", "0")) or None
    K = int(os.environ.get("BENCH_K", "512"))
    # BENCH_DONATE=1: donate x/v into the step (saves 2 full particle
    # buffers of HBM -- the 384^3 B2 rung needs it on a 16G v5e)
    donate = bool(int(os.environ.get("BENCH_DONATE", "0")))
    step = make_step_fn(pm, donate=donate, subr=subr, K=K)
    x1, v1, acc = step(x, v, coeffs)
    _ = float(jnp.sum(x1))

    t0 = time.perf_counter()
    for _ in range(nsteps):
        x1, v1, acc = step(x1, v1, coeffs)
    _ = float(jnp.sum(x1))
    dt = time.perf_counter() - t0
    return nc ** 3 * nsteps / dt


def main():
    nc = int(os.environ.get("BENCH_NC", "256"))
    b = int(os.environ.get("BENCH_B", "2"))       # pm_nc_factor
    # 10 chained steps: the per-step rate at 3-5 steps still carries
    # ~10 ms/step of tunnel dispatch amortization (chip-measured
    # 30.9M at 3 steps vs 31.4M at 10; longer chains change < 1%)
    nsteps = int(os.environ.get("BENCH_STEPS", "10"))
    baseline = 1024 ** 3 * 40 / (60.0 * 16)  # north-star per-chip rate

    if os.environ.get("BENCH_MATRIX"):
        # scaling curve over (nc, B); one json line per config.
        # 256^3 B3 (768^3 mesh) runs via the adaptive c2r_pair
        # fallback (pair_ok False -> two plain c2r, O(half) peak mem)
        mm = os.environ.get("BENCH_FFT", "mm") == "mm"
        for nc_i, b_i in ((128, 2), (256, 1), (256, 2), (192, 3),
                          (256, 3), (320, 2)):
            rate = run_one(nc_i, b_i, nsteps, mmfft=mm)
            print(json.dumps({
                "metric": f"pm_step_{nc_i}^3_B{b_i}",
                "value": round(rate, 1),
                "unit": "particle-steps/s",
                "vs_baseline": round(rate / baseline, 4)}))
        return

    # the matmul-FFT path (ops/fftmm.py) usually beats XLA's TPU FFT;
    # measure both and report the better step (BENCH_FFT=xla|mm pins,
    # and a pin skips the other variant's compile+run entirely)
    pin = os.environ.get("BENCH_FFT")
    if pin == "mm":
        rate, fft = run_one(nc, b, nsteps, mmfft=True), "mm"
    else:
        rate = run_one(nc, b, nsteps)
        fft = "xla"
        if pin != "xla":
            try:
                rate_mm = run_one(nc, b, nsteps, mmfft=True)
            except Exception:
                rate_mm = 0.0
            if rate_mm > rate:
                rate, fft = rate_mm, "mm"
    variant = "per-step-sort"
    # stale-order stepping (ops/stale.py) amortizes the prepare sort;
    # opt-in (BENCH_STALE=N): chip-measured 2.05 s/step at 256^3 B2
    # C15360 vs 0.61 s for the per-step sort (round-3 matrix) -- the
    # mover side-bundle path loses far more than the sort saves.
    stale_env = os.environ.get("BENCH_STALE", "0")
    if stale_env != "0":
        every = int(stale_env)
        try:
            rate_st = run_one(nc, b, nsteps, mmfft=(fft == "mm"),
                              stale_every=every)
        except Exception:
            rate_st = 0.0
        if rate_st > rate:
            rate, variant = rate_st, f"stale{every}"
    result = {
        "metric": f"pm_step_{nc}^3_B{b}_particle_steps_per_sec",
        "value": round(rate, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(rate / baseline, 4),
        "fft": fft,
        "variant": variant,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
