#!/usr/bin/env python
"""Sort microbenchmarks on the real chip, sizing the prepare-sort
replacement (VERDICT r2 item 1 lever b/c).

Measures, at the bench scale (16.7M rows, 27-bit cell keys):
  1. full lax.sort with 1/4/7 f32 payload operands (the current
     prepare_carry cost is the 7-operand row),
  2. blocked row sorts, lax.sort over (nb, B) along the last axis --
     the pass-1 cost of a k-sorted two-phase sort, for several B,
  3. jnp.diff>=0 global sortedness check (the fallback guard).
"""

import os
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n = int(os.environ.get("BENCH_N", str(16 * 1024 * 1024)))
    reps = int(os.environ.get("BENCH_REPS", "10"))
    mpad = 513 * 513 * 513

    rng = np.random.RandomState(0)
    cell = jnp.asarray(rng.randint(0, mpad, n).astype(np.int32))
    pay = [jnp.asarray(rng.standard_normal(n).astype(np.float32))
           for _ in range(6)]

    def timeit(fn, *args):
        out = fn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, (tuple, list))
                          else out).astype(jnp.float32))
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = float(jnp.sum(out[0] if isinstance(out, (tuple, list))
                              else out).astype(jnp.float32))
            ts.append(time.perf_counter() - t0)
        return np.median(ts) * 1e3

    for nops in (1, 4, 7):
        ops = (cell,) + tuple(pay[:nops - 1])
        f = jax.jit(lambda *o: jax.lax.sort(o, num_keys=1))
        print(f"full sort {nops} ops: {timeit(f, *ops):9.2f} ms",
              flush=True)

    for B in (16384, 65536, 131072, 262144):
        nb = n // B
        ops = (cell.reshape(nb, B),) + tuple(
            p.reshape(nb, B) for p in pay[:6])
        f = jax.jit(lambda *o: jax.lax.sort(o, dimension=1, num_keys=1))
        print(f"blocked sort 7 ops B={B:6d}: {timeit(f, *ops):9.2f} ms",
              flush=True)

    f = jax.jit(lambda c: jnp.all(c[1:] >= c[:-1]))
    out = f(cell)
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        _ = bool(f(cell))
        ts.append(time.perf_counter() - t0)
    print(f"sortedness check: {np.median(ts)*1e3:9.2f} ms", flush=True)




def bench_ksorted():
    """k-sorted fast path vs full lax.sort at the bench shape: keys
    displaced by a bounded number of ranks, 6 f32 payloads (the
    prepare_carry operand set)."""
    import jax
    import jax.numpy as jnp
    from fastpm_tpu.ops.sort_pallas import sort_ksorted, \
        sort_maybe_ksorted

    n = int(os.environ.get("BENCH_N", str(16 * 1024 * 1024)))
    reps = int(os.environ.get("BENCH_REPS", "10"))
    rng = np.random.RandomState(1)
    # D-displaced keys: sorted ranks + jitter of +-D
    D = int(os.environ.get("BENCH_D", "30000"))
    vals = np.arange(n, dtype=np.int64) * 7 \
        + rng.randint(-7 * D, 7 * D, n)
    order = np.argsort(vals, kind="stable")
    ranks = np.empty(n, dtype=np.int32)
    ranks[order] = np.arange(n, dtype=np.int32)
    key = jnp.asarray(ranks)
    pay = tuple(jnp.asarray(rng.standard_normal(n).astype(np.float32))
                for _ in range(6))

    def timeit(fn, *args):
        out = fn(*args)
        _ = float(jnp.sum(out[0].astype(jnp.float32)))
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = float(jnp.sum(out[0].astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        return np.median(ts) * 1e3

    full = jax.jit(lambda *o: jax.lax.sort(o, num_keys=1))
    print(f"full lax.sort 7 ops:      {timeit(full, key, *pay):9.2f} ms",
          flush=True)
    for B in (32768, 65536, 131072):
        try:
            f = jax.jit(lambda *o, B=B: sort_maybe_ksorted(o, B))
            t = timeit(f, key, *pay)
            fast, ok = jax.jit(
                lambda *o, B=B: sort_ksorted(o, B))(key, *pay)
            print(f"maybe_ksorted B={B:6d}:    {t:9.2f} ms   "
                  f"fastpath_ok={bool(ok)}", flush=True)
        except Exception as e:
            print(f"maybe_ksorted B={B:6d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
    bench_ksorted()
