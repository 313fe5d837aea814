#!/usr/bin/env python
"""Measured late-time halo requirement (VERDICT r4 next #3/#4).

Runs a REAL simulation on the available accelerator (256^3 particles,
B2 force mesh, 10 FastPM steps to z=0 on a production-like box), then
measures ON DEVICE (scalar fetches only):

- the global max |x - q| displacement per axis (Mpc/h),
- the Lagrangian-index-homing halo requirement H (planes any particle
  strays outside its index shard's slab) for P = 8/16/32 slab splits,
- the one-step drift bound (max |v| * du of the last step) that a
  re-homing force's halo must cover on top of the CIC support.

These replace MEMSCALE.md's assumed H=16 with measurements. Usage:
    python tools_measure_halo.py [nc] [box]
"""

import json
import os
import sys


def main():
    nc = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    box = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0 * nc
    import numpy as np
    import jax
    import jax.numpy as jnp
    from fastpm_tpu.cache import enable_compilation_cache
    enable_compilation_cache()
    from fastpm_tpu.cosmology import Cosmology
    from fastpm_tpu.powerspectrum import FuncK
    from fastpm_tpu.solver import Solver, SolverConfig
    from fastpm_tpu.kdk import DriftFactor
    from fastpm_tpu import ic

    steps = list(np.linspace(0.1, 1.0, 10))
    cfg = SolverConfig(nc=nc, boxsize=box, time_step=steps,
                       force_mode="fastpm", pm_nc_factor=2,
                       need_rand=False)
    c = Cosmology(h=0.6774, Omega_m=0.307494, growth_mode="lcdm")
    fixture = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "tests", "fixtures", "powerspec.txt")
    pk = FuncK.from_file(fixture)

    s = Solver(cfg, c)
    dk, _ = ic.linear_field(s.lptpm, c, pk, seed=42, aout=1.0)
    s.setup_lpt(dk, steps[0])
    s.evolve()
    p = s.species["cdm"]

    pm = s.find_pm(1.0)     # the z=0 force mesh (B2)
    n0 = pm.Nmesh[0]
    L = jnp.float32(box)

    @jax.jit
    def metrics(x, v, q):
        # wrapped displacement
        d = x - q
        d = d - jnp.round(d / L) * L
        dmax = jnp.max(jnp.abs(d), axis=0)
        vmax = jnp.max(jnp.abs(v))
        inv0 = jnp.float32(pm.InvCellSize[0])
        bx = jnp.remainder(jnp.floor(x[:, 0] * inv0).astype(jnp.int32),
                           n0)
        npart = x.shape[0]
        hs = []
        for P in (8, 16, 32):
            pper = npart // P
            nloc = n0 // P
            dev = jnp.arange(npart, dtype=jnp.int32) // pper
            rel = jnp.remainder(bx - dev * nloc, n0)
            inside = rel < nloc
            right = rel - (nloc - 1)
            left = n0 - rel
            hs.append(jnp.max(jnp.where(
                inside, 0, jnp.minimum(right, left))))
        return dmax, vmax, tuple(hs)

    q = p.q_from_id()  # lagrangian lattice positions
    dmax, vmax, hs = metrics(p.x, p.v, q)
    dmax = np.asarray(dmax)
    vmax = float(vmax)
    hs = [int(h) for h in hs]

    # one-step drift bound: the LAST step's drift factor du (kdk.py),
    # x(af) = x(ai) + v * dyyy(ai->af)
    df = DriftFactor(cosmology=c, force_mode="fastpm",
                     ai=steps[-2], ac=steps[-2], af=steps[-1])
    du = float(df.lookup(steps[-1])[0])
    cell = box / n0
    out = {
        "nc": nc, "box": box, "B": 2, "mesh": n0,
        "steps": len(steps),
        "max_disp_mpc": [round(float(d), 3) for d in dmax],
        "max_disp_cells_B2": [round(float(d) / cell, 1) for d in dmax],
        "H_measured": {"P8": hs[0], "P16": hs[1], "P32": hs[2]},
        "nloc": {"P8": n0 // 8, "P16": n0 // 16, "P32": n0 // 32},
        "one_step_drift_mpc": round(vmax * du, 4),
        "one_step_drift_cells_B2": round(vmax * du / cell, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
