"""Offline post-processing tools (reference: src/fastpm-fof.c,
src/fastpm-rfof.c): run FOF/RFOF on an existing bigfile snapshot without
re-running the simulation. Parameters are recovered from the snapshot's
stored ParamFile attribute, with CLI overrides.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from .io.bigfile import BigFile
from .io.snapshots import (read_snapshot_header, read_species,
                           write_halo_catalog)
from .cosmology import Cosmology
from .store import Store
from .diagnostics import Log

__all__ = ["main_fof", "main_rfof"]


def _load_snapshot_store(path: str, dataset: str = "1"):
    import jax.numpy as jnp
    hdr = read_snapshot_header(path)
    data = read_species(path, dataset)
    attrs = data["_attrs"]
    n = len(data["x"])
    qsize = int(attrs["q.size"])
    nc = int(round(qsize ** (1 / 3.0)))
    store = Store(
        x=jnp.asarray(data["x"].astype(np.float32)),
        v=jnp.asarray(data["v"].astype(np.float32))
        if "v" in data else None,
        id=jnp.asarray(data["id"].reshape(-1)),
        a_x=float(attrs["a.x"]), a_v=float(attrs["a.v"]),
        M0=float(attrs["M0"]),
        q_scale=tuple(attrs["q.scale"]),
        q_shift=tuple(attrs["q.shift"]),
        q_nc=(nc, nc, nc))
    return hdr, store


def _cosmology_from_header(hdr) -> Cosmology:
    return Cosmology(h=float(hdr["HubbleParam"]),
                     Omega_m=float(hdr["OmegaM"]),
                     T_cmb=0.0, growth_mode="lcdm")


def _recover_params(path: str):
    """Re-evaluate the stored ParamFile text if present."""
    hdr = read_snapshot_header(path)
    if "ParamFile" not in hdr:
        return None
    from .config.params import load_params_from_string
    try:
        return load_params_from_string(hdr["ParamFile"])
    except Exception:
        return None


def main_fof(argv=None):
    ap = argparse.ArgumentParser(
        prog="fastpm-tpu-fof",
        description="Run FOF on an existing snapshot (offline halos)")
    ap.add_argument("snapshot")
    ap.add_argument("-l", "--linking-length", type=float, default=None,
                    help="in units of mean separation (default from "
                    "ParamFile or 0.2)")
    ap.add_argument("-n", "--nmin", type=int, default=None)
    ap.add_argument("-o", "--output", default=None,
                    help="output file (default: append to the snapshot)")
    ns = ap.parse_args(argv)
    log = Log()

    from .fof import find_halos
    hdr, store = _load_snapshot_store(ns.snapshot)
    p = _recover_params(ns.snapshot)
    ll_frac = ns.linking_length or (p.fof_linkinglength if p else 0.2)
    nmin = ns.nmin or int(p.fof_nmin if p else 20)
    boxsize = float(hdr["BoxSize"])
    nc = int(hdr["NC"])
    ll = ll_frac * boxsize / nc

    log.info("FOF with linking length %g (%g x mean separation), nmin %d",
             ll, ll_frac, nmin)
    cat, _ = find_halos(store.wrap(boxsize), ll, boxsize, nmin=nmin)
    out = ns.output or ns.snapshot
    dataset = "LL-%05.3f" % ll_frac
    c = _cosmology_from_header(hdr)
    write_halo_catalog(out, dataset, cat, c, store.a_x, nc, boxsize,
                       M0=store.M0)
    log.info("Writing %d objects.", cat.nhalo)
    return 0


def main_rfof(argv=None):
    ap = argparse.ArgumentParser(
        prog="fastpm-tpu-rfof",
        description="Run RFOF on an existing snapshot (offline halos)")
    ap.add_argument("snapshot")
    ap.add_argument("-o", "--output", default=None)
    ns = ap.parse_args(argv)
    log = Log()

    from .fof import rfof_find_halos
    hdr, store = _load_snapshot_store(ns.snapshot)
    p = _recover_params(ns.snapshot)
    boxsize = float(hdr["BoxSize"])
    nc = int(hdr["NC"])
    sep = boxsize / nc
    c = _cosmology_from_header(hdr)
    z = 1.0 / store.a_x - 1
    kw = dict(nmin=8, linkinglength=0.2 * sep, l1=0.25 * sep,
              l6=0.24 * sep, A1=0.012 * sep, A2=0.06 * sep,
              B1=7.02, B2=6.025)
    if p is not None:
        kw = dict(nmin=int(p.rfof_nmin),
                  linkinglength=p.rfof_linkinglength * sep,
                  l1=p.rfof_l1 * sep, l6=p.rfof_l6 * sep,
                  A1=p.rfof_a1 * sep, A2=p.rfof_a2 * sep,
                  B1=p.rfof_b1, B2=p.rfof_b2)
    log.info("RFOF: assuming z = %g", z)
    cat, _ = rfof_find_halos(store.wrap(boxsize), boxsize, z, c, **kw)
    out = ns.output or ns.snapshot
    write_halo_catalog(out, "RFOF", cat, c, store.a_x, nc, boxsize,
                       M0=store.M0)
    log.info("Writing %d objects.", cat.nhalo)
    return 0


if __name__ == "__main__":
    sys.exit(main_fof())
