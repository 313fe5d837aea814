#!/usr/bin/env python
"""Roofline table for the hot PM step (VERDICT r3 item 8): per phase,
measured time, analytic FLOPs / bytes moved, achieved rate, and % of
the relevant chip ceiling.

Ceilings (TPU v5e, the chip behind the axon tunnel): 197 TFLOP/s bf16
MXU, 819 GB/s HBM. The FFT rows are judged against the measured XLA
FFT floor instead (the library is the practical ceiling there).

Analytic models (kernel parameters, not estimates):
- paint_from8:   12 MXU dots/round of 2*(CLh+HR)*128*K flops
                 (2 streams x (2 pair deposits + 1 fix) x hi/lo split)
- readout3_from8: 36 dots/round (3 comps x 2 blocks x (2+1) x split)
- rounds ~= ceil(n/K) + W window-boundary partial rounds
- prepare(sort): bytes = 7 ops * n * 4B * 2 (one read+write pass-set);
  lax.sort is multi-pass so achieved/819 GB/s >> 100% is impossible --
  the printed 'passes' column is achieved_bytes / one-pass bytes.
- FFTs: 5 * M log2(M) flops per 3D transform of M cells.
- kick+drift: 5 reads + 3 writes of (n,3) f32.
"""

import json
import os
import time

import numpy as np

PEAK_BF16 = 197e12
PEAK_HBM = 819e9


def timeit(fn, fence, reps, *args):
    out = fn(*args)
    _ = float(fence(out))
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
    from fastpm_tpu.mesh import PM
    from fastpm_tpu.benchlib import example_particles
    from fastpm_tpu.kernels import kernel_orders
    from fastpm_tpu import transfers
    from fastpm_tpu.ops.paint_pallas import (make_prepare_carry_fn,
                                             make_paint_from8_fn)
    from fastpm_tpu.ops.readout_pallas import make_readout3_from8_fn

    nc = int(os.environ.get("BENCH_NC", "256"))
    b = int(os.environ.get("BENCH_B", "2"))
    reps = int(os.environ.get("BENCH_REPS", "10"))
    K = int(os.environ.get("BENCH_K", "512"))
    C = int(os.environ.get("BENCH_C", "8192"))
    box = 1.0 * nc

    pm = PM(nc * b, box)
    nx, ny, nz = pm.Nmesh
    nyp, nzp = ny + 1, nz + 1
    mpad = (nx + 1) * nyp * nzp
    W = (mpad + C - 1) // C
    CLh = C // 128
    HR = ((nzp + 1 + 127) // 128 + 1)
    HR = ((HR + 7) // 8) * 8
    M = int(np.prod(pm.Nmesh))
    n = nc ** 3
    x, v = example_particles(nc, box, seed=0)
    potorder, gradorder, _d, _ = kernel_orders("1_4")

    print(f"# roofline nc={nc} B={b} mesh={tuple(pm.Nmesh)} n={n} "
          f"K={K} C={C} CLh+HR={CLh + HR} W={W} reps={reps} "
          f"platform={jax.devices()[0].platform}")

    ssum = jax.jit(lambda a: sum(jnp.sum(leaf.astype(jnp.float32))
                                 for leaf in jax.tree.leaves(a)))

    pad_to = max(K, 2048)
    prepare_carry = jax.jit(make_prepare_carry_fn(pm, C=C, pad_to=pad_to))
    paint_from = jax.jit(make_paint_from8_fn(pm, K=K, C=C))
    _ro3 = make_readout3_from8_fn(pm, K=K, C=C)

    rows = []

    def add(name, t_s, flops=None, bbytes=None, ceiling=None, note=""):
        rec = {"phase": name, "ms": round(t_s * 1e3, 2)}
        if flops:
            rec["gflops"] = round(flops / t_s / 1e9, 1)
            if ceiling:
                rec["pct_ceiling"] = round(100 * flops / t_s / ceiling, 1)
        if bbytes:
            rec["gbps"] = round(bbytes / t_s / 1e9, 1)
            if ceiling:
                rec["pct_ceiling"] = round(100 * bbytes / t_s / ceiling, 1)
        if note:
            rec["note"] = note
        rows.append(rec)
        print(json.dumps(rec))

    t = timeit(prepare_carry, ssum, reps, x, v)
    add("prepare_carry(sort)", t, bbytes=7 * n * 4 * 2, ceiling=PEAK_HBM,
        note="one-pass bytes; lax.sort is multi-pass")
    prepared, xs, vs, _ = prepare_carry(x, v)
    prepared["n"] = int(prepared["n"])
    n_padded = int(prepared["cell_2d"].shape[1])

    nrounds = -(-n // K) + W
    dotf = 2 * (CLh + HR) * 128 * K
    t = timeit(paint_from, ssum, reps, prepared)
    add("paint_from8", t, flops=12 * dotf * nrounds, ceiling=PEAK_BF16)
    canvas = paint_from(prepared)

    r2c = jax.jit(pm.r2c)
    fftf = 5 * M * np.log2(M)
    t = timeit(r2c, lambda k: jnp.sum(jnp.real(k)), reps, canvas)
    add("r2c", t, flops=fftf, ceiling=None, note="vs measured XLA floor")
    delta_k = r2c(canvas)

    tr = jax.jit(lambda k: transfers.apply_grad(
        pm, transfers.apply_pot(pm, k, potorder), 0, gradorder))
    t = timeit(tr, lambda k: jnp.sum(jnp.real(k)), reps, delta_k)
    add("transfer(pot+grad) x3", t,
        bbytes=2 * M // 2 * 8, ceiling=PEAK_HBM,
        note="complex read+write; x3 per step")
    fk = tr(delta_k)

    c2r_pair = jax.jit(pm.c2r_pair)
    t = timeit(c2r_pair, ssum, reps, fk, fk)
    add("c2r_pair(2 grads)", t, flops=fftf, ceiling=None,
        note="one packed complex iFFT for two real fields")
    c2r = jax.jit(pm.c2r)
    t = timeit(c2r, ssum, reps, fk)
    add("c2r(third grad)", t, flops=fftf, ceiling=None)
    f0 = c2r(fk)

    ro = jax.jit(lambda p, a, b_, c: _ro3(
        {**p, "n": prepared["n"]}, a, b_, c))
    t = timeit(ro, ssum, reps, prepared, f0, f0, f0)
    add("readout3_from8", t, flops=36 * dotf * nrounds,
        ceiling=PEAK_BF16)

    kd = jax.jit(lambda xx, vv, aa: (
        (xx + (vv + aa * 0.05) * 0.02) % box, vv + aa * 0.05))
    acc = jnp.zeros((n, 3), jnp.float32)
    t = timeit(kd, ssum, reps, x, v, acc)
    add("kick+drift", t, bbytes=8 * n * 3 * 4, ceiling=PEAK_HBM)

    step_ms = sum(r["ms"] for r in rows) \
        + 2 * [r["ms"] for r in rows if r["phase"].startswith("transfer")][0]
    print(f"# sum-of-phases step estimate: {step_ms:.1f} ms "
          f"({n / step_ms * 1e3 / 1e6:.2f}M particle-steps/s)")


if __name__ == "__main__":
    main()
