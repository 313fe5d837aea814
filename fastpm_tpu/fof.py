"""Friends-of-friends halo finding and catalogs
(reference: libfastpm/fof.c, rfof.c).

The reference runs a distributed kdtree FOF with an iterative cross-rank
minid merge; in this framework halo finding runs on the host over the
gathered snapshot (exact grid-hash union-find in native code, csrc/fof.c).
An on-device label-propagation FOF for pod-scale catalogs is the planned
follow-up (SURVEY.md section 7 "hard parts").

Halo attributes mirror fof.c:820-975: CM position with periodic-safe
averaging, mean velocity, r/v/rv dispersion tensors, length, minid, and
the Lagrangian q average.
"""

from __future__ import annotations

import ctypes
from dataclasses import dataclass
from typing import Optional

import numpy as np

from . import native
from .store import Store

__all__ = ["fof_labels", "HaloCatalog", "find_halos", "rfof_find_halos"]


def _fof_lib():
    lib = native.get_lib()
    if not hasattr(lib, "fof_label"):
        raise RuntimeError("native library missing fof_label")
    lib.fof_label.restype = ctypes.c_int
    lib.fof_label.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_double, ctypes.c_double,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")]
    return lib


def fof_labels(pos: np.ndarray, linking_length: float,
               boxsize: float, periodic: bool = True) -> np.ndarray:
    """Exact FOF labels: each particle gets the minimum particle index of
    its group. Non-periodic mode (lightcone slices) embeds the points in
    a large enough box that wraps never link."""
    pos = np.ascontiguousarray(pos, dtype=np.float32)
    n = len(pos)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if not periodic:
        lo = pos.min(axis=0)
        span = float((pos - lo).max()) if n else 1.0
        boxsize = span + 4.0 * linking_length
        pos = np.ascontiguousarray(pos - lo + linking_length,
                                   dtype=np.float32)
    labels = np.empty(n, dtype=np.int64)
    _fof_lib().fof_label(pos, n, float(linking_length), float(boxsize),
                         labels)
    return labels


def _periodic_mean(x: np.ndarray, labels: np.ndarray, nh: int,
                   counts: np.ndarray, L: float) -> np.ndarray:
    """Per-halo periodic-safe mean of positions (fof.c:periodic_add):
    average offsets relative to a reference member, wrapped to [-L/2,L/2)."""
    # reference position: first (minimum-index) member of each halo
    first = np.full(nh, -1, dtype=np.int64)
    # labels are min particle index -> the reference member IS the label
    # after relabeling; build mapping halo -> a member index
    order = np.argsort(labels, kind="stable")
    starts = np.searchsorted(labels[order], np.arange(nh))
    ref_idx = order[starts]
    ref = x[ref_idx]                       # (nh, d)
    rel = x - ref[labels]
    rel -= np.round(rel / L) * L
    sums = np.zeros((nh, x.shape[1]))
    np.add.at(sums, labels, rel)
    mean = ref + sums / counts[:, None]
    mean -= np.floor(mean / L) * L
    return mean


@dataclass
class HaloCatalog:
    """Halo catalog columns (the LL-%05.3f dataset layout, io.c map)."""
    length: np.ndarray        # i4 (nh,)
    x: np.ndarray             # f8 (nh,3) CM position
    v: np.ndarray             # f4 (nh,3) mean velocity
    minid: np.ndarray         # i8
    q: Optional[np.ndarray]   # f4 (nh,3) mean Lagrangian position
    rdisp: np.ndarray         # f4 (nh,6) xx yy zz xy yz zx
    vdisp: np.ndarray         # f4 (nh,6)
    rvdisp: np.ndarray        # f4 (nh,9)
    aemit: Optional[np.ndarray] = None

    @property
    def nhalo(self) -> int:
        return len(self.length)


def find_halos_device(p: Store, linking_length: float, boxsize: float,
                      nmin: int = 20, periodic: bool = True):
    """Device-side FOF + halo catalog: label propagation
    (ops/fof_device.fof_labels_device_auto, with the mandatory
    occupancy sizing pass) followed by segment-sum attribute
    map-reduce, all on device. Only the compacted nh-row catalog (and
    the scalar nh) crosses the device boundary -- the production path
    for large N where gathering particles to host is the wall
    (reference contract: libfastpm/fof.c:289-420 iterative merge +
    :573-757 MINID-rendezvous attrs).

    Returns (HaloCatalog with numpy columns, ihalo). ihalo stays a
    DEVICE array (fetching an n-sized column over a tunneled link is
    the exact cost this path exists to avoid); np.asarray(ihalo) when
    host logic needs it."""
    import jax
    import jax.numpy as jnp
    from .ops.fof_device import (fof_labels_device_auto,
                                 halo_attrs_device, halo_catalog_device)

    n = p.np_local
    if n == 0:
        return find_halos(p, linking_length, boxsize, nmin=nmin,
                          periodic=periodic)
    x = p.x
    L = float(boxsize)
    if not periodic:
        # embed in a large enough box that wraps never link (same
        # construction as the host fof_labels path)
        lo = jnp.min(x, axis=0)
        span = float(jnp.max(x - lo))
        L = span + 4.0 * linking_length
        x = x - lo + jnp.float32(linking_length)

    lab = fof_labels_device_auto(x, linking_length, L)
    lab = lab.astype(jnp.int32)

    ids = p.id
    q = p.q_from_id(p.id) if (p.id is not None and p.q_nc[0] > 0) else None
    v = p.v if p.v is not None else jnp.zeros_like(p.x)

    attrs_fn = jax.jit(halo_attrs_device,
                       static_argnames=("boxsize", "nmin", "periodic"))
    attrs = attrs_fn(x, v, ids, lab, boxsize=L, nmin=int(nmin),
                     q=q, aemit=p.aemit, periodic=bool(periodic))

    # nh crosses as ONE scalar; the catalog program compiles per
    # power-of-two capacity bucket
    nh = int(jnp.sum(attrs["keep"].astype(jnp.int32)))
    nh_cap = 16
    while nh_cap < nh:
        nh_cap *= 2
    cat_fn = jax.jit(halo_catalog_device, static_argnames=("nh_cap",))
    cat_dev, ihalo_dev, _nh = cat_fn(attrs, lab, nh_cap=nh_cap)

    def fetch(k, dtype=None):
        a = np.asarray(cat_dev[k])[:nh]
        return a.astype(dtype) if dtype is not None else a

    if not periodic:
        # un-embed the CM back to input coordinates
        lo_np = np.asarray(lo, dtype=np.float64)
        cmx = fetch("cm", np.float64) - float(linking_length) + lo_np
    else:
        cmx = fetch("cm", np.float64)
    cat = HaloCatalog(
        length=fetch("counts").astype(np.int32),
        x=cmx,
        v=fetch("vm", np.float32),
        minid=(fetch("minid", np.int64) if "minid" in cat_dev
               else np.zeros(nh, np.int64)),
        q=(fetch("qm", np.float64) if "qm" in cat_dev else None),
        rdisp=fetch("rdisp", np.float32),
        vdisp=fetch("vdisp", np.float32),
        rvdisp=fetch("rvdisp", np.float32),
        aemit=(fetch("am", np.float64) if "am" in cat_dev else None))
    return cat, ihalo_dev


def find_halos(p: Store, linking_length: float, boxsize: float,
               nmin: int = 20, periodic: bool = True,
               labels: Optional[np.ndarray] = None,
               backend: str = "auto"):
    """Run FOF and build the halo catalog.

    Returns (catalog, ihalo) where ihalo maps each particle to its halo
    row (-1 if not in a kept halo), matching fastpm_fof_execute's return.
    linking_length is in simulation distance units (the caller converts
    from the fraction of mean separation, src/fastpm.c:1280).

    backend: 'device' runs the on-device label-propagation FOF +
    segment-reduce attributes (production path; only the catalog is
    fetched); 'host' gathers particles and runs the native union-find
    (the test oracle); 'auto' picks 'device' when p.x already lives on
    an accelerator (gathering it to host would dominate), else 'host'.
    Override with FASTPM_TPU_FOF=device|host."""
    import os
    backend = os.environ.get("FASTPM_TPU_FOF", backend)
    if backend == "auto":
        backend = "host"
        try:
            import jax
            if (labels is None and hasattr(p.x, "devices")
                    and any(d.platform != "cpu" for d in p.x.devices())):
                backend = "device"
        except Exception:
            pass
    if backend == "device" and labels is None:
        return find_halos_device(p, linking_length, boxsize, nmin=nmin,
                                 periodic=periodic)
    x = np.asarray(p.x, dtype=np.float32)
    n = len(x)
    if labels is None:
        labels = fof_labels(x, linking_length, boxsize,
                            periodic=periodic)

    # compact labels
    uniq, compact = np.unique(labels, return_inverse=True)
    counts = np.bincount(compact)
    keep = counts >= nmin
    nh_all = len(uniq)

    # relabel kept halos to consecutive rows, ordered by min particle
    # index (the reference's minid ordering before any sorting)
    keep_rows = np.flatnonzero(keep)
    row_of = np.full(nh_all, -1, dtype=np.int64)
    row_of[keep_rows] = np.arange(len(keep_rows))
    ihalo = row_of[compact]

    sel = ihalo >= 0
    hl = compact[sel]
    hrow = ihalo[sel]
    nh = len(keep_rows)
    if nh == 0:
        empty = lambda *s: np.zeros(s)
        cat = HaloCatalog(length=np.zeros(0, np.int32), x=empty(0, 3),
                          v=empty(0, 3), minid=np.zeros(0, np.int64),
                          q=None, rdisp=empty(0, 6), vdisp=empty(0, 6),
                          rvdisp=empty(0, 9))
        return cat, ihalo

    counts_k = counts[keep_rows].astype(np.float64)
    xs = x[sel].astype(np.float64)
    L = float(boxsize)

    if periodic:
        cm = _periodic_mean(xs, hrow, nh, counts_k, L)
    else:
        cm = np.zeros((nh, 3))
        np.add.at(cm, hrow, xs)
        cm /= counts_k[:, None]

    v = np.asarray(p.v, dtype=np.float64)[sel] if p.v is not None else None
    vm = np.zeros((nh, 3))
    if v is not None:
        np.add.at(vm, hrow, v)
        vm /= counts_k[:, None]

    # relative coordinates (periodic-wrapped)
    rrel = xs - cm[hrow]
    if periodic:
        rrel -= np.round(rrel / L) * L
    vrel = (v - vm[hrow]) if v is not None else np.zeros_like(rrel)

    def disp6(a):
        out = np.zeros((nh, 6))
        comp = np.stack([a[:, 0] * a[:, 0], a[:, 1] * a[:, 1],
                         a[:, 2] * a[:, 2], a[:, 0] * a[:, 1],
                         a[:, 1] * a[:, 2], a[:, 2] * a[:, 0]], axis=-1)
        np.add.at(out, hrow, comp)
        return out / counts_k[:, None]

    rv = np.zeros((nh, 9))
    comp9 = np.stack([rrel[:, d] * vrel[:, (d + k) % 3]
                      for k in range(3) for d in range(3)], axis=-1)
    np.add.at(rv, hrow, comp9)
    rv /= counts_k[:, None]

    minid = np.zeros(nh, dtype=np.int64)
    if p.id is not None:
        ids = np.asarray(p.id, dtype=np.int64)[sel]
        minid = np.full(nh, np.iinfo(np.int64).max)
        np.minimum.at(minid, hrow, ids)
    q = None
    if p.id is not None and p.q_nc[0] > 0:
        qs = np.asarray(p.q_from_id(np.asarray(p.id)), dtype=np.float64)[sel]
        if periodic:
            q = _periodic_mean(qs, hrow, nh, counts_k, L)
        else:
            q = np.zeros((nh, 3))
            np.add.at(q, hrow, qs)
            q /= counts_k[:, None]

    aemit = None
    if p.aemit is not None:
        aemit = np.zeros(nh)
        np.add.at(aemit, hrow, np.asarray(p.aemit, dtype=np.float64)[sel])
        aemit /= counts_k

    cat = HaloCatalog(
        length=counts[keep_rows].astype(np.int32),
        x=cm, v=vm.astype(np.float32), minid=minid, q=q,
        rdisp=disp6(rrel).astype(np.float32),
        vdisp=disp6(vrel).astype(np.float32),
        rvdisp=rv.astype(np.float32),
        aemit=aemit)
    return cat, ihalo


# mass bins of the RFOF acceptance, in particle counts (rfof.c:44-50)
_RFOF_NP = [0, 20, 40, 80, 160, 320, 1 << 30]


def _rfof_linking_length(i, z, l1, l6, A1, A2, base_ll):
    """Per-bin linking length in Mpc/h (rfof.c:61-75)."""
    if i == 1:
        return l1 - A1 / (1 + z)
    if i == 6:
        return max(l6 - A2 / (1 + z), base_ll)
    return ((6 - i) * _rfof_linking_length(1, z, l1, l6, A1, A2, base_ll)
            + (i - 1) * _rfof_linking_length(6, z, l1, l6, A1, A2, base_ll)
            ) / 5.0


def _std_vdisp(M, Ez):
    """Fitted halo velocity dispersion in km/s (rfof.c:83-88)."""
    return (Ez * M / 1e15) ** (1.0 / 3) * 1100.0


def rfof_find_halos(p: Store, boxsize: float, z: float, cosmology,
                    nmin: int = 8, linkinglength: float = 0.0,
                    l1: float = 0.0, l6: float = 0.0,
                    A1: float = 0.0, A2: float = 0.0,
                    B1: float = 7.02, B2: float = 6.025,
                    periodic: bool = True):
    """Relaxed FOF (reference: libfastpm/rfof.c:90-186): 6 rounds of FOF
    with mass-bin-dependent linking lengths l(i, z) and the
    velocity-dispersion rejection vdisp < r0 * sigma_std(M, E(z));
    accepted halos' particles are removed from subsequent rounds, as are
    particles not attached to any candidate halo.

    All lengths (linkinglength, l1, l6, A1, A2) are in Mpc/h; the caller
    multiplies the lua parameters by the mean separation
    (src/fastpm.c:1295-1304). p must be in snapshot units (km/s velocity).
    Returns (catalog, ihalo)."""
    import jax.numpy as jnp

    Ez = cosmology.E(1.0 / (z + 1))
    r0 = B1 - B2 * np.log(1 + z)

    # the per-particle state (active set, halo assignment) stays on
    # DEVICE across the 6 rounds: only the compacted candidate catalog
    # and the active count cross to host each round, so lightcone-slice
    # RFOF never fetches O(N) columns (the reference keeps the whole
    # loop distributed, rfof.c:90-186)
    n = p.np_local
    active = jnp.ones(n, dtype=bool)
    ihalo = jnp.full(n, -1, dtype=jnp.int32)
    parts = []
    nsaved = 0

    for i in range(1, 7):
        ll = _rfof_linking_length(i, z, l1, l6, A1, A2, linkinglength)
        nact = int(jnp.sum(active.astype(jnp.int32)))
        if nact < nmin:
            break
        idx = jnp.nonzero(active, size=nact)[0]
        sub = Store(x=p.x[idx],
                    v=p.v[idx] if p.v is not None else None,
                    id=p.id[idx] if p.id is not None else None,
                    aemit=p.aemit[idx] if p.aemit is not None else None,
                    q_shift=p.q_shift, q_scale=p.q_scale, q_nc=p.q_nc,
                    a_x=p.a_x, a_v=p.a_v, M0=p.M0)
        cat, icand = find_halos(sub, ll, boxsize, nmin=nmin,
                                periodic=periodic)
        icand = jnp.asarray(icand).astype(jnp.int32)

        # acceptance (rfof.c:137-151) -- host math on the small catalog
        if cat.nhalo:
            vdisp = np.sqrt(cat.vdisp[:, 0] + cat.vdisp[:, 1]
                            + cat.vdisp[:, 2])
            M = p.M0 * 1e10 * cat.length.astype(np.float64)
            save = ((cat.length < _RFOF_NP[i])
                    & (vdisp < r0 * _std_vdisp(M, Ez)))
        else:
            save = np.zeros(0, dtype=bool)

        # saved halos: record ihalo, deactivate members; particles not
        # in any candidate halo leave the active set (rfof.c:152-173)
        save_rows = np.flatnonzero(save)
        row_map = np.full(max(cat.nhalo, 1), -1, dtype=np.int32)
        row_map[save_rows] = nsaved + np.arange(len(save_rows))
        mapped = jnp.where(icand >= 0,
                           jnp.asarray(row_map)[jnp.clip(icand, 0, None)],
                           jnp.int32(-1))
        in_saved = mapped >= 0
        not_in_halo = icand < 0
        ihalo = ihalo.at[idx].set(jnp.where(in_saved, mapped,
                                            ihalo[idx]))
        active = active.at[idx].set(
            jnp.where(not_in_halo | in_saved, False, active[idx]))

        if len(save_rows):
            parts.append((cat, save_rows))
            nsaved += len(save_rows)

    if not parts:
        cat = HaloCatalog(length=np.zeros(0, np.int32),
                          x=np.zeros((0, 3)),
                          v=np.zeros((0, 3), np.float32),
                          minid=np.zeros(0, np.int64), q=None,
                          rdisp=np.zeros((0, 6), np.float32),
                          vdisp=np.zeros((0, 6), np.float32),
                          rvdisp=np.zeros((0, 9), np.float32))
        return cat, ihalo

    def cc(field):
        arrs = [getattr(c, field)[rows] for c, rows in parts
                if getattr(c, field) is not None]
        return np.concatenate(arrs) if arrs else None

    cat = HaloCatalog(length=cc("length"), x=cc("x"), v=cc("v"),
                      minid=cc("minid"), q=cc("q"), rdisp=cc("rdisp"),
                      vdisp=cc("vdisp"), rvdisp=cc("rvdisp"),
                      aemit=cc("aemit"))
    return cat, ihalo
