"""Particle lightcone ("unstructured mesh", reference:
libfastpm/lightcone-usmesh.c, horizon.c, spherebox.h).

During every drift interval [a1, a2] the lightcone crossing
|glmatrix (x(a) + tileshift)| = xi(a) is solved per (particle, tile).
The reference uses a per-particle Brent solver (horizon.c:79-146); here
the solve is a fully vectorized fixed-iteration bisection on device --
same accuracy envelope (the drift is a smooth interpolant), massively
parallel.

Crossing particles are recorded with position in observer coordinates,
peculiar velocity (km/s) kicked to a_emit, aemit, id, rand; box tiling
provides periodic replicas; shells are culled against each tile's AABB.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .cosmology import Cosmology
from .kdk import DriftFactor, KickFactor, NSAMPLES
from .store import Store
from .units import HUBBLE_DISTANCE, HUBBLE_CONSTANT
from . import events as ev

__all__ = ["Horizon", "LightCone", "USMesh", "volume_density_from_ell"]


class Horizon:
    """8192-entry lookup tables of comoving distance xi(a) * dh_factor and
    D1(a) (horizon.c:10-26), with linear interpolation."""

    SIZE = 8192

    def __init__(self, cosmology: Cosmology, dh_factor: float = 1.0):
        self.cosmology = cosmology
        self.dh_factor = dh_factor
        a = np.linspace(0.0, 1.0, self.SIZE)
        # cumulative integral chi(a) = int_a^1 da'/(a'^2 E) by per-interval
        # Gauss-Legendre (vectorized; interior nodes avoid the a=0
        # singularity)
        xg, wg = np.polynomial.legendre.leggauss(8)
        mid = 0.5 * (a[1:] + a[:-1])
        half = 0.5 * np.diff(a)
        nodes = mid[:, None] + half[:, None] * xg[None, :]
        E = np.array([cosmology.E(float(v)) for v in nodes.ravel()])
        integ = (1.0 / (nodes.ravel() ** 2 * E)).reshape(nodes.shape)
        seg = (integ * wg[None, :]).sum(axis=1) * half
        chi = np.concatenate([[0.0], np.cumsum(seg[::-1])])[::-1]
        self.xi_a = dh_factor * HUBBLE_DISTANCE * chi
        # D1 table (uses the cosmology's growth machinery; a<a_ode -> 0)
        self.growthfactor_a = np.array(
            [cosmology.growth_info(float(v)).D1 if v > 0 else 0.0
             for v in a])
        self._xi_j = jnp.asarray(self.xi_a, dtype=jnp.float32)

    def distance(self, a):
        """xi at a (vectorized, host float64)."""
        x = np.asarray(a, dtype=np.float64) * (self.SIZE - 1)
        l = np.clip(np.floor(x).astype(int), 0, self.SIZE - 2)
        return self.xi_a[l] * (l + 1 - x) + self.xi_a[l + 1] * (x - l)

    def distance_jax(self, a):
        x = a * (self.SIZE - 1)
        l = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, self.SIZE - 2)
        u = (l + 1).astype(a.dtype) - x
        return self._xi_j[l] * u + self._xi_j[l + 1] * (1.0 - u)

    def growth(self, a):
        x = np.asarray(a, dtype=np.float64) * (self.SIZE - 1)
        l = np.clip(np.floor(x).astype(int), 0, self.SIZE - 2)
        return (self.growthfactor_a[l] * (l + 1 - x)
                + self.growthfactor_a[l + 1] * (x - l))


def volume_density_from_ell(ell_lim: float, z: float,
                            horizon: Horizon) -> float:
    """Particle number density [1/(Mpc/h)^3] resolving multipole ell
    (horizon.c:150-158)."""
    theta_lim = math.pi / ell_lim
    r = float(horizon.distance(1.0 / (1 + z)))
    s_lim = r * theta_lim
    if s_lim == 0.0:
        # z = 0: the C reference computes pow(1/0., 3) = inf (the
        # subsample fraction then clamps to 1: keep everything)
        return math.inf
    return (1.0 / s_lim) ** 3


@dataclass
class LightCone:
    """Observer geometry (api/fastpm/lightcone.h)."""
    cosmology: Cosmology
    glmatrix: np.ndarray = field(
        default_factory=lambda: np.eye(4))
    fov: float = 0.0            # degrees; 0 flat-sky (z), >=360 full sky
    octants: Sequence[bool] = (True,) * 8
    tol: float = 2.0 / 3        # octant tolerance, units of the norm
    dh_factor: float = 1.0

    def __post_init__(self):
        self.glmatrix = np.asarray(self.glmatrix, dtype=np.float64)
        self.glmatrix_inv = np.linalg.inv(self.glmatrix)
        self.horizon = Horizon(self.cosmology, self.dh_factor)

    # ---- host-side geometry ----

    def transform(self, x):
        """Apply the gl matrix to positions (N,3) (fastpm_gldot)."""
        x = np.asarray(x, dtype=np.float64)
        return x @ self.glmatrix[:3, :3].T + self.glmatrix[:3, 3]

    def distance_of(self, xo):
        if self.fov <= 0:
            return xo[..., 2]
        return np.sqrt((xo ** 2).sum(axis=-1))

    def inside(self, xo):
        """Field-of-view + octant acceptance (lightcone-usmesh.c:218-247)."""
        if self.fov <= 0:
            return np.ones(len(xo), dtype=bool)
        ok = np.ones(len(xo), dtype=bool)
        if self.fov < 360:
            dxy = np.sqrt(xo[:, 0] ** 2 + xo[:, 1] ** 2)
            zang = np.degrees(np.arctan2(dxy, xo[:, 2]))
            zang = np.where(zang < 0, zang + 360, zang)
            ok &= zang <= self.fov * 0.5
        if all(self.octants):
            return ok
        norm = np.sqrt((xo ** 2).sum(axis=-1))
        tol = self.tol * norm
        any_oct = np.zeros(len(xo), dtype=bool)
        signs = [(1, 1, 1), (1, 1, -1), (1, -1, 1), (1, -1, -1),
                 (-1, 1, 1), (-1, 1, -1), (-1, -1, 1), (-1, -1, -1)]
        for i, s in enumerate(signs):
            if not self.octants[i]:
                continue
            m = np.ones(len(xo), dtype=bool)
            for d in range(3):
                m &= xo[:, d] * s[d] >= -tol
            any_oct |= m
        return ok & any_oct


def _interp_table(samples, ai, af, a):
    """Linear interpolation in a 32-sample factor table (factors.c:41-70),
    vectorized over a."""
    if af == ai:
        return jnp.full(jnp.shape(a), samples[-1], dtype=jnp.float32)
    ind = (a - ai) / (af - ai) * (NSAMPLES - 1)
    l = jnp.clip(jnp.floor(ind).astype(jnp.int32), 0, NSAMPLES - 2)
    u = (l + 1).astype(a.dtype) - ind
    s = jnp.asarray(samples, dtype=jnp.float32)
    return s[l] * u + s[l + 1] * (1.0 - u)


def _drift_position(drift: DriftFactor, p: Store, a, a_x):
    """x(a) for every particle, vectorized fastpm_drift_one (PGD included).
    `a` has shape (N,)."""
    dyyy = (_interp_table(drift.dyyy, drift.ai, drift.af, a)
            - float(drift.lookup(a_x)[0]))
    da1 = (_interp_table(drift.da1, drift.ai, drift.af, a)
           - float(drift.lookup(a_x)[1]))
    da2 = (_interp_table(drift.da2, drift.ai, drift.af, a)
           - float(drift.lookup(a_x)[2]))
    mode = drift.force_mode
    if mode == "2lpt":
        x = p.x + p.dx1 * da1[:, None] + p.dx2 * da2[:, None]
    elif mode == "za":
        x = p.x + p.dx1 * da1[:, None]
    elif mode in ("fastpm", "pm"):
        x = p.x + p.v * dyyy[:, None]
    elif mode == "cola":
        v = p.v - (p.dx1 * jnp.float32(drift.Dv1)
                   + p.dx2 * jnp.float32(drift.Dv2))
        x = p.x + v * dyyy[:, None]
        x = x + p.dx1 * da1[:, None] + p.dx2 * da2[:, None]
    else:
        raise ValueError(mode)
    if p.pgdc is not None and drift.ai != drift.af:
        x = x + 0.5 * p.pgdc * (dyyy / float(drift.dyyy[-1]))[:, None]
    return x


def _kick_velocity(kick: KickFactor, p: Store, a, a_v):
    """v(a) for every particle, vectorized fastpm_kick_one."""
    dda = (_interp_table(kick.dda, kick.ai, kick.af, a)
           - float(kick.lookup(a_v)[0]))
    if kick.force_mode == "cola":
        Dv1 = (_interp_table(kick.Dv1, kick.ai, kick.af, a)
               - float(kick.lookup(a_v)[1]))
        Dv2 = (_interp_table(kick.Dv2, kick.ai, kick.af, a)
               - float(kick.lookup(a_v)[2]))
        acc = p.acc + p.dx1 * jnp.float32(kick.q1) + p.dx2 * jnp.float32(kick.q2)
        return (p.v + acc * dda[:, None]
                + p.dx1 * Dv1[:, None] + p.dx2 * Dv2[:, None])
    return p.v + p.acc * dda[:, None]


class USMesh:
    """Unstructured-mesh (particle) lightcone buffer
    (fastpm_usmesh_init/intersect)."""

    def __init__(self, lc: LightCone, source_getter, tileshifts,
                 amin: float = 0.0, amax: float = 1.0,
                 target_volume: float = 0.0, np_upper: int = 1 << 62,
                 name: str = "1"):
        self.lc = lc
        self.source_getter = source_getter  # () -> Store (current state)
        self.tileshifts = np.asarray(tileshifts, dtype=np.float64)
        if self.tileshifts.ndim == 1:
            self.tileshifts = self.tileshifts[None, :]
        self.amin = amin
        self.amax = amax
        self.target_volume = target_volume
        self.np_upper = np_upper
        self.name = name
        self.event_handlers = ev.EventHandlers()
        self.buffer: List[dict] = []
        self.np_buffered = 0
        self.np_before = 0
        self.ai = amin
        self.af = amin

    # ---- the vectorized crossing solve ----

    def _solve_tile(self, p: Store, drift: DriftFactor, kick: KickFactor,
                    tileshift, a1: float, a2: float):
        """Returns host dict of crossing records for one tile."""
        lc = self.lc
        M = jnp.asarray(lc.glmatrix[:3, :3], dtype=jnp.float32)
        T = jnp.asarray(lc.glmatrix[:3, 3], dtype=jnp.float32)
        shift = jnp.asarray(tileshift, dtype=jnp.float32)
        fov = lc.fov
        a_x = p.a_x
        a_v = p.a_v

        def f_of(a):
            x = _drift_position(drift, p, a, a_x) + shift
            xo = x @ M.T + T
            if fov <= 0:
                dist = xo[:, 2]
            else:
                dist = jnp.sqrt(jnp.sum(xo * xo, axis=-1))
            return dist - lc.horizon.distance_jax(a)

        n = p.np_local
        lo = jnp.full(n, jnp.float32(a1))
        hi = jnp.full(n, jnp.float32(a2))
        flo = f_of(lo)
        fhi = f_of(hi)
        has_root = flo * fhi <= 0

        def body(_, lohi):
            lo, hi, flo = lohi
            mid = 0.5 * (lo + hi)
            fmid = f_of(mid)
            goes_lo = flo * fmid <= 0
            lo2 = jnp.where(goes_lo, lo, mid)
            hi2 = jnp.where(goes_lo, mid, hi)
            flo2 = jnp.where(goes_lo, flo, fmid)
            return lo2, hi2, flo2

        lo, hi, flo = jax.lax.fori_loop(0, 30, body, (lo, hi, flo))
        aemit = 0.5 * (lo + hi)

        x_at = _drift_position(drift, p, aemit, a_x) + shift
        xo = x_at @ M.T + T
        v_at = _kick_velocity(kick, p, aemit, a_v)
        vo = v_at @ M.T
        vo = vo * (HUBBLE_CONSTANT / aemit)[:, None]

        in_range = (aemit <= self.amax) & (aemit >= self.amin)
        accept = has_root & in_range

        # pull to host for fov/octant culling + compaction
        accept = np.asarray(accept)
        if not accept.any():
            return None
        xo_h = np.asarray(xo, dtype=np.float64)[accept]
        ok = lc.inside(xo_h)
        if not ok.any():
            return None
        sel = np.flatnonzero(accept)[ok]
        rec = dict(
            x=xo_h[ok].astype(np.float32),
            v=np.asarray(vo)[sel].astype(np.float32),
            aemit=np.asarray(aemit)[sel].astype(np.float32),
        )
        if p.id is not None:
            rec["id"] = np.asarray(p.id)[sel]
        if p.rand is not None:
            rec["rand"] = np.asarray(p.rand)[sel]
        return rec

    # ---- driver (fastpm_usmesh_intersect) ----

    def intersect(self, drift, kick, a1: float, a2: float, whence: str):
        a1, a2 = min(a1, a2), max(a1, a2)
        if whence == ev.TIMESTEP_START:
            self.ai = self.af = a1
            self.np_before = 0
            self.emit(whence)
            return
        if whence == ev.TIMESTEP_END:
            self.af = a2
            self.emit(whence)
            return

        if (a1 > self.amax or a1 < self.amin) and \
           (a2 > self.amax or a2 < self.amin):
            # both endpoints outside still allows a range overlap; mirror
            # the per-tile early exit (lightcone-usmesh.c:370-375)
            if not (a1 < self.amin and a2 > self.amin):
                return

        p = self.source_getter()
        hz = self.lc.horizon
        r1 = float(hz.distance(a1))
        r2 = float(hz.distance(a2))
        volume = 4 * math.pi / 3 * abs(r1 ** 3 - r2 ** 3)
        steps = max(1, int(volume / self.target_volume + 0.5)) \
            if self.target_volume > 0 else 1
        da = (a2 - a1) / steps

        # AABB of the source over [a1,a2] for shell culling
        if self.lc.fov > 0:
            xa = np.asarray(_drift_position(
                drift, p, jnp.full(p.np_local, jnp.float32(a1)), p.a_x))
            xb = np.asarray(_drift_position(
                drift, p, jnp.full(p.np_local, jnp.float32(a2)), p.a_x))
            pad = 0.5
            xmin = np.minimum(xa.min(0), xb.min(0)) - pad
            xmax = np.maximum(xa.max(0), xb.max(0)) + pad

        for i in range(steps):
            ai = a1 + da * i
            af = a2 if i + 1 == steps else a1 + da * (i + 1)
            ri = float(hz.distance(ai))
            rf = float(hz.distance(af))
            for t in range(len(self.tileshifts)):
                shift = self.tileshifts[t]
                if self.lc.fov > 0 and not self._shell_hits_bbox(
                        xmin, xmax, shift, rf, ri):
                    continue
                rec = self._solve_tile(p, drift, kick, shift, ai, af)
                if rec is not None:
                    self.buffer.append(rec)
                    self.np_buffered += len(rec["aemit"])
            self.af = af
            if self.np_buffered > 0.5 * self.np_upper:
                self.emit(ev.TIMESTEP_CUR)

    def _shell_hits_bbox(self, xmin, xmax, shift, r1, r2):
        """Conservative shell/AABB cull (spherebox.h semantics): reject
        only when the transformed box is entirely inside the inner sphere
        or entirely outside the outer sphere."""
        corners = np.array([[xmin[0] if i & 4 else xmax[0],
                             xmin[1] if i & 2 else xmax[1],
                             xmin[2] if i & 1 else xmax[2]]
                            for i in range(8)])
        xo = self.lc.transform(corners) + shift
        r = np.sqrt((xo ** 2).sum(axis=1))
        if r.max() < min(r1, r2):     # fully inside inner shell
            return False
        # distance from origin to box: if the closest corner estimate is
        # beyond the outer radius and origin not inside box
        lo, hi = xo.min(0), xo.max(0)
        nearest = np.clip(0, lo, hi)
        dmin = np.sqrt(((nearest) ** 2).sum()) if not (
            (lo <= 0).all() and (hi >= 0).all()) else 0.0
        if dmin > max(r1, r2):
            return False
        return True

    def drain(self) -> Optional[dict]:
        """Concatenate and clear the buffer."""
        if not self.buffer:
            return None
        out = {k: np.concatenate([b[k] for b in self.buffer])
               for k in self.buffer[0]}
        self.buffer = []
        n = self.np_buffered
        self.np_before += n
        self.np_buffered = 0
        return out

    def emit(self, whence: str):
        self.event_handlers.emit(
            ev.EVENT_LIGHTCONE_READY, ev.STAGE_AFTER,
            mesh=self, ai=self.ai, af=self.af, whence=whence,
            a_mid=0.5 * (self.ai + self.af))
        self.ai = self.af
