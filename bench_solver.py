#!/usr/bin/env python
"""Full-solver rate: the REAL Solver (events, state machine, kick/
drift factor tables) at the bench shape, reporting the warm per-force
wall time vs the bare bench step (BENCH_NOTES "Full-solver rate";
VERDICT r3 item 2: kill the ~0.3 s/step host overhead).

Prints ONE JSON line. Env: BENCH_NC (256), BENCH_B (2), BENCH_STEPS
(10 forces)."""

import json
import os
import time

import numpy as np


def main():
    import jax
    if os.environ.get("BENCH_PLATFORM"):
        # JAX_PLATFORMS=cpu alone does NOT work here: the axon plugin
        # wins over the env var; config.update does
        jax.config.update("jax_platforms",
                          os.environ["BENCH_PLATFORM"])
    from fastpm_tpu.cache import enable_compilation_cache
    enable_compilation_cache()
    from fastpm_tpu.powerspectrum import FuncK
    from fastpm_tpu.cosmology import Cosmology
    from fastpm_tpu import ic, prof
    from fastpm_tpu.solver import Solver, SolverConfig

    nc = int(os.environ.get("BENCH_NC", "256"))
    b = int(os.environ.get("BENCH_B", "2"))
    nsteps = int(os.environ.get("BENCH_STEPS", "10"))
    baseline = 1024 ** 3 * 40 / (60.0 * 16)

    cosmo = Cosmology(h=0.6774, Omega_m=0.307494, T_cmb=0.0,
                      growth_mode="lcdm")
    cfg = SolverConfig(nc=nc, boxsize=float(nc) * 4.0,
                       time_step=list(np.linspace(0.1, 1.0,
                                                  nsteps + 1)),
                       force_mode="fastpm", pm_nc_factor=b,
                       lpt_nc_factor=1)
    s = Solver(cfg, cosmo)
    pk = FuncK.from_file(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests/fixtures/powerspec.txt"))
    dk, _var = ic.linear_field(s.lptpm, cosmo, pk, seed=100,
                               aout=1.0, remove_cosmic_variance=True)
    prof.enable_jax_sync(True)
    # effects_barrier does NOT flush pending work on the tunneled
    # platform (the round-3 run recorded a fictitious 0.7 ms "warm
    # force"); make the clock sync a REAL host fetch of the evolving
    # cdm position so every clocked region waits for its device work
    prof._sync = lambda: np.asarray(s.species["cdm"].x[0, 0])
    # record per-call clock samples (the first force call compiles)
    samples = {}
    orig_leave = prof.Clock.leave

    def leave(self):
        t0 = self._t0
        orig_leave(self)
        if t0 is not None:
            samples.setdefault(self.name, []).append(
                time.perf_counter() - t0)
    prof.Clock.leave = leave

    s.setup_lpt(dk, cfg.time_step[0])
    t0 = time.perf_counter()
    s.evolve()
    dt = time.perf_counter() - t0
    out = {"metric": f"solver_{nc}^3_B{b}_evolve",
           "value": round(dt, 1), "unit": "s",
           "vs_baseline": round(
               nc ** 3 * nsteps / dt / baseline, 4),
           "steps": nsteps}
    fkey = next((k for k in samples if k.endswith("force")), None)
    if fkey is not None:
        calls = samples[fkey]
        out["force_calls"] = len(calls)
        out["force_first_s"] = round(calls[0], 2)
        if len(calls) > 1:
            out["force_warm_s"] = round(
                float(np.median(calls[1:])), 4)
    print(json.dumps(out))
    prof.report(printer=lambda line: print("#", line))


if __name__ == "__main__":
    main()
