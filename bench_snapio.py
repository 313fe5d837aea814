#!/usr/bin/env python
"""Snapshot-IO overhead on the real chip (VERDICT r4 next #7).

Runs the PRODUCTION CLI twice at the bench shape -- once without
snapshots, once writing 3 bigfile snapshots through the background
writer pool (cli.SnapshotChecker + io/snapshots async D2H prefetch +
-W writer threads) -- and reports:

- evolve-wall overhead of the 3 snapshots (target: within ~5% of the
  no-snapshot wall; the writes overlap stepping),
- the measured write bandwidth (bytes on disk / background write wall).

Env: BENCH_NC (256), BENCH_B (2), BENCH_STEPS (10), BENCH_W (writers).
"""

import json
import os
import shutil
import time


def write_lua(path, outdir, nc, b, nsteps, snapshots):
    fixture = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "tests", "fixtures", "powerspec.txt")
    body = f"""
nc = {nc}
boxsize = {float(nc) * 4.0}
time_step = linspace(0.1, 1, {nsteps})
output_redshifts = {{1.0, 0.3333333333, 0.0}}
Omega_m = 0.307494
h = 0.6774
read_powerspectrum = "{fixture}"
linear_density_redshift = 0.0
random_seed = 100
particle_fraction = 1.0
force_mode = "fastpm"
pm_nc_factor = {b}
lpt_nc_factor = 1
np_alloc_factor = 1.2
"""
    if snapshots:
        body += f'write_snapshot = "{outdir}/fastpm"\n'
    with open(path, "w") as f:
        f.write(body)


def run_once(lua_path, n_writers, timings):
    from fastpm_tpu import cli
    from fastpm_tpu.io import snapshots as snapio

    orig = snapio.write_snapshot

    def timed(*a, **kw):
        t0 = time.perf_counter()
        out = orig(*a, **kw)
        timings.append(time.perf_counter() - t0)
        return out

    # cli binds write_snapshot at import (from .io.snapshots import
    # write_snapshot): patch BOTH names or the background-thread write
    # wall never registers
    snapio.write_snapshot = timed
    cli.write_snapshot = timed
    try:
        t0 = time.perf_counter()
        cli.main(["-W", str(n_writers), lua_path])
        return time.perf_counter() - t0
    finally:
        snapio.write_snapshot = orig
        cli.write_snapshot = orig


def du(path):
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total


def main():
    nc = int(os.environ.get("BENCH_NC", "256"))
    b = int(os.environ.get("BENCH_B", "2"))
    nsteps = int(os.environ.get("BENCH_STEPS", "10"))
    n_writers = int(os.environ.get("BENCH_W", "8"))

    base = "/tmp/bench_snapio"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)

    lua_a = os.path.join(base, "nosnap.lua")
    lua_b = os.path.join(base, "snap.lua")
    out_b = os.path.join(base, "out")
    write_lua(lua_a, out_b, nc, b, nsteps, snapshots=False)
    write_lua(lua_b, out_b, nc, b, nsteps, snapshots=True)

    # warm the compile cache (first run compiles ~100 s)
    _ = run_once(lua_a, n_writers, [])

    wall_a = run_once(lua_a, n_writers, [])
    tms = []
    wall_b = run_once(lua_b, n_writers, tms)
    nbytes = du(out_b)
    write_wall = sum(tms)

    print(json.dumps({
        "metric": f"snapshot_io_{nc}^3_B{b}",
        "wall_nosnap_s": round(wall_a, 3),
        "wall_3snap_s": round(wall_b, 3),
        "overhead_pct": round(100.0 * (wall_b - wall_a) / wall_a, 2),
        "bytes_written": nbytes,
        "bg_write_wall_s": round(write_wall, 3),
        "write_bw_MBps": round(nbytes / write_wall / 1e6, 1)
        if write_wall else None,
        "n_writers": n_writers,
    }))


if __name__ == "__main__":
    main()
