#!/usr/bin/env python
"""Cross-step sort-reuse feasibility (VERDICT r3 item 3): the
all-or-nothing variant of stale stepping skips the ~0.17 s prepare
sort when NO particle left its cell window since the previous carry
step. This tool measures the actual per-step window-leaver counts of
the bench trajectory, because the machinery only ever pays off if the
count is frequently ZERO.

Also reports the one-sided tolerance angle: the paint/readout windows
already carry HR halo rows, so a FORWARD mover stays paintable from
its old window up to ~HR*128 - span cells; a backward mover never is.
The forward/backward split bounds what a one-sided relaxed check could
save.

Prints one JSON line per step. Env: BENCH_NC, BENCH_B, BENCH_STEPS.
"""

import json
import os

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from fastpm_tpu.mesh import PM
    from fastpm_tpu.benchlib import make_step_fn, example_particles
    from fastpm_tpu.ops.paint_pallas import auto_window_C, base_cell_frac
    from fastpm_tpu.ops.readout_pallas import readout8_geometry

    nc = int(os.environ.get("BENCH_NC", "256"))
    b = int(os.environ.get("BENCH_B", "2"))
    nsteps = int(os.environ.get("BENCH_STEPS", "8"))
    box = 1.0 * nc
    pm = PM(nc * b, box)
    nx, ny, nz = pm.Nmesh
    nyp, nzp = ny + 1, nz + 1
    C = auto_window_C(nyp, nzp)
    _CLh, HR, _RX, _RXL = readout8_geometry(pm, C)
    span = nyp * nzp - ((nyp * nzp) // 128 // 8) * 8 * 128 + nzp + 1
    fwd_tol = HR * 128 - span          # forward halo slack, in cells
    inv_cell = np.asarray(pm.InvCellSize, dtype=np.float32)

    # order-free bench step: outputs stay in the previous sort order
    step = make_step_fn(pm, donate=False, carry_sorted=True)
    x, v = example_particles(nc, box, seed=0)
    coeffs = jnp.asarray([0.05, 0.02], dtype=jnp.float32)

    @jax.jit
    def leavers(x_prev, x_new):
        """Window moves between two states of the SAME row order (both
        cell-sorted by x_prev's step): back/forward window-leaver
        counts + forward moves beyond the halo slack."""
        cp, _ = base_cell_frac(x_prev, inv_cell, nx, ny, nz, nyp, nzp)
        cn, _ = base_cell_frac(x_new, inv_cell, nx, ny, nz, nyp, nzp)
        wp = cp // C
        wn = cn // C
        back = jnp.sum((wn < wp).astype(jnp.int32))
        fwd = jnp.sum((wn > wp).astype(jnp.int32))
        fwd_far = jnp.sum((cn - (wp + 1) * C >= fwd_tol)
                          .astype(jnp.int32))
        return back, fwd, fwd_far

    x1, v1, _ = step(x, v, coeffs)
    print(f"# nc={nc} B={b} C={C} HR={HR} fwd_tol={fwd_tol} cells")
    for i in range(nsteps):
        x2, v2, _ = step(x1, v1, coeffs)
        bk, fw, ff = leavers(x1, x2)
        print(json.dumps({"step": i, "back_leavers": int(bk),
                          "fwd_leavers": int(fw),
                          "fwd_beyond_halo": int(ff),
                          "n": int(x1.shape[0])}), flush=True)
        x1, v1 = x2, v2


if __name__ == "__main__":
    main()
