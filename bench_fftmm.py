#!/usr/bin/env python
"""Microbenchmarks of the force-step FFT trio (r2c + packed-pair ifftn
+ c2r) and the matmul-FFT stages, on the real chip.

The FFT trio is ~51% of the 0.607 s bench step (VERDICT r3); the mm-FFT
does the DFT as MXU einsums yet only wins ~10% end-to-end, which says
the einsum stages are dispatch/layout-bound, not compute-bound. This
tool isolates where the time goes:

  MODE=trio   r2c / ifftn / irfftn for engines xla, mm(highest), mm(high)
  MODE=stage  per-axis CT stage ablation for the mm engine
  MODE=acc    accuracy of each engine vs XLA (device-side max-rel-err)

Env: BENCH_MESH (default 512), BENCH_REPS (default 10).
Raw medians include ~30 ms of tunnel dispatch+fence latency per timed
call (BENCH_NOTES roofline); compare deltas, not absolutes.
"""

import json
import os
import time

import numpy as np


def timeit(fn, fence, reps, *args):
    out = fn(*args)
    _ = float(fence(out))  # compile + warmup
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

    n = int(os.environ.get("BENCH_MESH", "512"))
    reps = int(os.environ.get("BENCH_REPS", "10"))
    mode = os.environ.get("MODE", "trio")
    shape = (n, n, n)
    kshape = (n, n, n // 2 + 1)
    print(f"# mesh={shape} reps={reps} mode={mode} "
          f"platform={jax.devices()[0].platform}")

    # inputs generated ON DEVICE (a 512 MB host upload over the axon
    # tunnel costs minutes)
    @jax.jit
    def make_inputs(seed):
        kx = jax.random.split(jax.random.PRNGKey(seed), 2)
        xr = jax.random.normal(kx[0], shape, jnp.float32)
        kr = jax.random.normal(kx[1], kshape, jnp.float32)
        ki = jax.random.normal(jax.random.PRNGKey(seed + 7), kshape,
                               jnp.float32)
        return xr, jax.lax.complex(kr, ki)

    xr, kk = make_inputs(0)
    fr = jax.jit(lambda k: jnp.sum(jnp.real(k)))
    fs = jax.jit(lambda a: jnp.sum(a))

    rows = []

    def add(name, dt):
        rows.append((name, dt))
        print(json.dumps({"op": name, "ms": round(dt * 1e3, 3)}),
              flush=True)

    if mode == "trio":
        from fastpm_tpu.ops import fftmm

        # variant tokens: xla | mm-<prec>-<fac>-<d|h>
        # (d = direct hermitian axis, h = herm-extend CT axis)
        default_variants = ("xla,mm-highest-sqrt-h,mm-high-sqrt-h,"
                            "mm-high-wide-d,mm-highest-wide-d,"
                            "mm-high-sqrt-d")
        variants = os.environ.get("BENCH_VARIANTS",
                                  default_variants).split(",")

        def set_env(v):
            _mm, prec, fac, dflag = v.split("-")
            os.environ["FASTPM_TPU_FFT_PREC"] = prec
            os.environ["FASTPM_TPU_FFT_FAC"] = fac
            os.environ["FASTPM_TPU_FFT_DIRECT"] = \
                "1" if dflag == "d" else "0"
            fftmm._dft_tables.cache_clear()

        for v in variants:
            if v == "xla":
                add("xla_r2c", timeit(jax.jit(jnp.fft.rfftn),
                                      fr, reps, xr))
                add("xla_ifftn", timeit(
                    jax.jit(lambda k: jnp.fft.ifftn(
                        jax.lax.complex(jnp.real(k), jnp.imag(k)),
                        s=shape)), fr, reps, kk))
                add("xla_c2r", timeit(
                    jax.jit(lambda k: jnp.fft.irfftn(k, s=shape)),
                    fs, reps, kk))
                continue
            set_env(v)
            add(f"{v}_r2c",
                timeit(jax.jit(fftmm.rfftn_mm), fr, reps, xr))
            add(f"{v}_ifftn",
                timeit(jax.jit(lambda k: fftmm.ifftn_mm(
                    jnp.pad(k, ((0, 0), (0, 0), (0, n - n // 2 - 1))))),
                    fr, reps, kk))
            add(f"{v}_c2r",
                timeit(jax.jit(lambda k: fftmm.irfftn_mm(k, shape)),
                       fs, reps, kk))

    elif mode == "stage":
        from fastpm_tpu.ops import fftmm
        prec = os.environ.get("FASTPM_TPU_FFT_PREC", "highest")
        print(f"# prec={prec}")

        # one CT DFT along each axis of a complex field (fwd)
        kr = jnp.real(kk)
        ki = jnp.imag(kk)
        full_r = jnp.concatenate([kr, kr[:, :, 1:n - n // 2]], axis=2)
        full_i = jnp.concatenate([ki, ki[:, :, 1:n - n // 2]], axis=2)

        for ax in (2, 1, 0):
            f = jax.jit(lambda a, b, ax=ax: fftmm._ct_axis(a, b, ax, -1)[0])
            add(f"ct_axis{ax}_cplx", timeit(f, fs, reps, full_r, full_i))
        # real input, last axis (the r2c first stage)
        f = jax.jit(lambda a: fftmm._ct_last(a, None, n, -1)[0])
        add("ct_last_real", timeit(f, fs, reps, xr))
        # moveaxis alone (what non-last axes pay on top)
        f = jax.jit(lambda a: jnp.moveaxis(a, 0, -1) + 0.0)
        add("moveaxis0_f32", timeit(f, fs, reps, full_r))
        # plain elementwise pass over the full complex field (HBM floor)
        f = jax.jit(lambda a, b: (a * 2.0 + b))
        add("elementwise_rw", timeit(f, fs, reps, full_r, full_i))

    elif mode == "acc":
        from fastpm_tpu.ops import fftmm
        ref = jax.jit(jnp.fft.rfftn)(xr)

        @jax.jit
        def relerr(a, b):
            d = jnp.max(jnp.abs(jnp.real(a) - jnp.real(b))
                        + jnp.abs(jnp.imag(a) - jnp.imag(b)))
            s = jnp.max(jnp.abs(jnp.real(b)) + jnp.abs(jnp.imag(b)))
            return d / s

        for v in os.environ.get(
                "BENCH_VARIANTS",
                "mm-highest-sqrt-h,mm-high-sqrt-h,mm-high-wide-d"
                ).split(","):
            _mm, prec, fac, dflag = v.split("-")
            os.environ["FASTPM_TPU_FFT_PREC"] = prec
            os.environ["FASTPM_TPU_FFT_FAC"] = fac
            os.environ["FASTPM_TPU_FFT_DIRECT"] = \
                "1" if dflag == "d" else "0"
            fftmm._dft_tables.cache_clear()
            got = jax.jit(fftmm.rfftn_mm)(xr)
            print(json.dumps({"variant": v,
                              "max_rel_err": float(relerr(got, ref))}),
                  flush=True)

    print("#")
    for name, dt in rows:
        print(f"# {name:24s} {dt*1e3:10.3f} ms")


if __name__ == "__main__":
    main()
