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

    def distance_jax(self, a, B=lambda x: x):
        x = B(a * (self.SIZE - 1))
        l = B(jnp.clip(B(B(jnp.floor(x)).astype(jnp.int32)), 0,
                       self.SIZE - 2))
        u = B(B((l + 1).astype(a.dtype)) - x)
        return B(B(B(self._xi_j[l]) * u)
                 + B(B(self._xi_j[l + 1]) * B(1.0 - u)))

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


def _interp_table(samples, ai, af, a, dai=None, B=lambda x: x):
    """Linear interpolation in a 32-sample factor table (factors.c:41-70),
    vectorized over a.

    dai: the interval width af - ai COMPUTED IN HOST FLOAT64 then
    rounded to f32 (1 value per factor table). Passing it keeps the
    traced version bit-identical to host evaluation, where the divisor
    was a python-float difference -- f32(af) - f32(ai) computed on
    device can differ by 1 ulp, which is enough to move a crossing
    across a slice boundary.

    B: identity by default; pass jax.lax.optimization_barrier to pin
    the EAGER op granularity (one XLA op per jnp call, no cross-op FMA
    contraction) that the interval-ENDPOINT evaluations of the
    lightcone crossing solve historically ran with -- the golden slice
    counts are sensitive to which side of an interval boundary a
    tangent crossing's f lands on."""
    s = jnp.asarray(samples, dtype=jnp.float32)
    if dai is None:
        dai = jnp.float32(float(af) - float(ai))
    denom = jnp.where(dai == 0, 1.0, dai)
    ind = B(B(B(a - ai) / denom) * (NSAMPLES - 1))
    l = B(jnp.clip(B(B(jnp.floor(ind)).astype(jnp.int32)), 0,
                   NSAMPLES - 2))
    u = B(B((l + 1).astype(a.dtype)) - ind)
    out = B(B(B(s[l]) * u) + B(B(s[l + 1]) * B(1.0 - u)))
    return jnp.where(dai == 0, s[-1], out)


def _drift_args(drift: DriftFactor, a_x: float):
    """Pack a DriftFactor into TRACED jit arguments (tables + scalars)
    so the tile-solve program compiles once per (n, mode) instead of
    once per drift interval."""
    off = drift.lookup(a_x)
    return dict(
        dyyy=jnp.asarray(drift.dyyy, jnp.float32),
        da1=jnp.asarray(drift.da1, jnp.float32),
        da2=jnp.asarray(drift.da2, jnp.float32),
        ai=jnp.float32(drift.ai),
        dai=jnp.float32(float(drift.af) - float(drift.ai)),
        o0=jnp.float32(off[0]), o1=jnp.float32(off[1]),
        o2=jnp.float32(off[2]),
        Dv1=jnp.float32(drift.Dv1), Dv2=jnp.float32(drift.Dv2),
        dyyy_end=jnp.float32(drift.dyyy[-1]))


def _kick_args(kick: KickFactor, a_v: float):
    off = kick.lookup(a_v)
    return dict(
        dda=jnp.asarray(kick.dda, jnp.float32),
        Dv1=jnp.asarray(kick.Dv1, jnp.float32),
        Dv2=jnp.asarray(kick.Dv2, jnp.float32),
        ai=jnp.float32(kick.ai),
        dai=jnp.float32(float(kick.af) - float(kick.ai)),
        o0=jnp.float32(off[0]), o1=jnp.float32(off[1]),
        o2=jnp.float32(off[2]),
        q1=jnp.float32(kick.q1), q2=jnp.float32(kick.q2))


def _drift_position_args(d, mode: str, p: Store, a, B=lambda x: x):
    """x(a) for every particle, vectorized fastpm_drift_one (PGD
    included); d = _drift_args(...). Traceable end to end. B: see
    _interp_table (eager-granularity pinning)."""
    dyyy = B(_interp_table(d["dyyy"], d["ai"], None, a, d["dai"], B)
             - d["o0"])
    da1 = B(_interp_table(d["da1"], d["ai"], None, a, d["dai"], B)
            - d["o1"])
    da2 = B(_interp_table(d["da2"], d["ai"], None, a, d["dai"], B)
            - d["o2"])
    if mode == "2lpt":
        x = B(B(p.x + B(p.dx1 * da1[:, None]))
              + B(p.dx2 * da2[:, None]))
    elif mode == "za":
        x = B(p.x + B(p.dx1 * da1[:, None]))
    elif mode in ("fastpm", "pm"):
        x = B(p.x + B(p.v * dyyy[:, None]))
    elif mode == "cola":
        v = B(p.v - B(B(p.dx1 * d["Dv1"]) + B(p.dx2 * d["Dv2"])))
        x = B(p.x + B(v * dyyy[:, None]))
        x = B(B(x + B(p.dx1 * da1[:, None]))
              + B(p.dx2 * da2[:, None]))
    else:
        raise ValueError(mode)
    if p.pgdc is not None:
        x = B(x + B(jnp.where(
            d["dai"] == 0, 0.0,
            0.5 * (dyyy / d["dyyy_end"]))[:, None] * p.pgdc))
    return x


def _kick_velocity_args(k, mode: str, p: Store, a, B=lambda x: x):
    """v(a) for every particle, vectorized fastpm_kick_one."""
    dda = B(_interp_table(k["dda"], k["ai"], None, a, k["dai"], B)
            - k["o0"])
    if mode == "cola":
        Dv1 = B(_interp_table(k["Dv1"], k["ai"], None, a, k["dai"], B)
                - k["o1"])
        Dv2 = B(_interp_table(k["Dv2"], k["ai"], None, a, k["dai"], B)
                - k["o2"])
        acc = B(B(p.acc + B(p.dx1 * k["q1"])) + B(p.dx2 * k["q2"]))
        return B(B(B(p.v + B(acc * dda[:, None]))
                   + B(p.dx1 * Dv1[:, None]))
                 + B(p.dx2 * Dv2[:, None]))
    return B(p.v + B(p.acc * dda[:, None]))


def _drift_position(drift: DriftFactor, p: Store, a, a_x):
    """Host-convenience wrapper over _drift_position_args."""
    return _drift_position_args(_drift_args(drift, a_x),
                                drift.force_mode, p, a)


def _kick_velocity(kick: KickFactor, p: Store, a, a_v):
    return _kick_velocity_args(_kick_args(kick, a_v),
                               kick.force_mode, p, a)


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
        self._tile_jit = {}
        self._compact_jit = {}
        self._aabb_jit = {}

    # ---- the vectorized crossing solve (DEVICE-side end to end) ----
    #
    # The whole per-tile pipeline -- bisection solve, fov/octant
    # acceptance, compaction to a power-of-two capacity -- runs as two
    # jitted programs; only ONE scalar (the accepted count) crosses the
    # device boundary per tile. The reference does the equivalent work
    # rank-local (lightcone-usmesh.c:351-560); on a tunneled TPU any
    # per-tile host fetch of particle-sized arrays is the wall
    # (BENCH_NOTES fetch pathology).

    def _inside_traced(self, xo):
        """fov/octant acceptance (lightcone-usmesh.c:218-247) as a
        traced function of observer-frame positions (N, 3)."""
        lc = self.lc
        n = xo.shape[0]
        if lc.fov <= 0:
            return jnp.ones(n, dtype=bool)
        ok = jnp.ones(n, dtype=bool)
        if lc.fov < 360:
            dxy = jnp.sqrt(xo[:, 0] ** 2 + xo[:, 1] ** 2)
            zang = jnp.degrees(jnp.arctan2(dxy, xo[:, 2]))
            zang = jnp.where(zang < 0, zang + 360, zang)
            ok &= zang <= lc.fov * 0.5
        if all(lc.octants):
            return ok
        norm = jnp.sqrt(jnp.sum(xo * xo, axis=-1))
        tol = jnp.float32(lc.tol) * norm
        any_oct = jnp.zeros(n, dtype=bool)
        signs = [(1, 1, 1), (1, 1, -1), (1, -1, 1), (1, -1, -1),
                 (-1, 1, 1), (-1, 1, -1), (-1, -1, 1), (-1, -1, -1)]
        for i, s in enumerate(signs):
            if not lc.octants[i]:
                continue
            m = jnp.ones(n, dtype=bool)
            for d in range(3):
                m &= xo[:, d] * s[d] >= -tol
            any_oct |= m
        return ok & any_oct

    def _tile_solver(self, p: Store, mode: str):
        """Cached jit of the full-tile solve: returns (count, accept,
        xo, vo, aemit) with full-n rows on device. Compiles once per
        (n, mode, columns), NOT per drift interval or tile."""
        key = (p.np_local, mode, p.dx1 is not None, p.pgdc is not None)
        fn = self._tile_jit.get(key)
        if fn is not None:
            return fn
        lc = self.lc
        M = jnp.asarray(lc.glmatrix[:3, :3], dtype=jnp.float32)
        T = jnp.asarray(lc.glmatrix[:3, 3], dtype=jnp.float32)
        fov = lc.fov
        amin, amax = self.amin, self.amax

        @jax.jit
        def solve(p, d, k, shift, a1, a2):
            Bx = jax.lax.optimization_barrier

            def f_of(a, B=lambda x: x):
                x = B(_drift_position_args(d, mode, p, a, B) + shift)
                xo = B(B(x @ M.T) + T)
                if fov <= 0:
                    dist = xo[:, 2]
                else:
                    dist = B(jnp.sqrt(B(jnp.sum(B(xo * xo), axis=-1))))
                return B(dist - lc.horizon.distance_jax(a, B))

            n = p.np_local
            lo = jnp.full(n, a1)
            hi = jnp.full(n, a2)
            # ENDPOINT evaluations run at eager op granularity
            # (optimization_barrier after every jnp op): whether a
            # tangent crossing's f(boundary) lands on one side or the
            # other decides which interval books it, and the golden
            # slice counts pin the historical (per-op, no cross-op FMA)
            # behavior. The bisection body stays fused -- it always
            # ran as one compiled fori_loop.
            flo = f_of(lo, Bx)
            fhi = f_of(hi, Bx)
            # Half-open root booking: consecutive sub-intervals share
            # an endpoint, and BOTH evaluate f there (as hi then as
            # lo). When f(endpoint) == 0.0 exactly, flo*fhi <= 0 holds
            # in both intervals and the crossing is double-booked (the
            # reference's GSL brent has the same <=0 set condition,
            # horizon.c:100-105, but f64 never lands on an exact zero
            # there). Book the root in the interval whose LEFT endpoint
            # it is: accept fhi==0 only via the NEXT interval's flo==0.
            has_root = (Bx(Bx(flo * fhi) <= 0)
                        & ((fhi != 0) | (flo == 0)))

            def body(_, lohi):
                lo, hi, flo = lohi
                mid = 0.5 * (lo + hi)
                fmid = f_of(mid)
                goes_lo = flo * fmid <= 0
                return (jnp.where(goes_lo, lo, mid),
                        jnp.where(goes_lo, mid, hi),
                        jnp.where(goes_lo, flo, fmid))

            lo, hi, flo = jax.lax.fori_loop(0, 30, body, (lo, hi, flo))
            aemit = Bx(0.5 * Bx(lo + hi))

            x_at = Bx(_drift_position_args(d, mode, p, aemit, Bx)
                      + shift)
            xo = Bx(Bx(x_at @ M.T) + T)
            v_at = _kick_velocity_args(k, mode, p, aemit, Bx)
            vo = Bx(v_at @ M.T)
            vo = Bx(vo * Bx(HUBBLE_CONSTANT / aemit)[:, None])

            in_range = (aemit <= amax) & (aemit >= amin)
            accept = has_root & in_range & self._inside_traced(xo)
            return (jnp.sum(accept.astype(jnp.int32)), accept, xo, vo,
                    aemit)

        self._tile_jit[key] = solve
        return solve

    def _compactor(self, n: int, cap: int, has_id: bool,
                   has_rand: bool):
        """Cached jit: gather accepted rows into cap slots (rows beyond
        the true count duplicate an arbitrary row; consumers mask by
        iota < n)."""
        key = (n, cap, has_id, has_rand)
        fn = self._compact_jit.get(key)
        if fn is not None:
            return fn

        @jax.jit
        def compact(accept, xo, vo, aemit, pid, prand):
            idx = jnp.nonzero(accept, size=cap, fill_value=n - 1)[0]
            rec = dict(x=xo[idx], v=vo[idx], aemit=aemit[idx])
            if pid is not None:
                rec["id"] = pid[idx]
            if prand is not None:
                rec["rand"] = prand[idx]
            return rec

        self._compact_jit[key] = compact
        return compact

    @staticmethod
    def _cap_for(n: int, lo: int = 1024) -> int:
        c = lo
        while c < n:
            c *= 2
        return c

    def _solve_tile(self, p: Store, drift: DriftFactor, kick: KickFactor,
                    tileshift, a1: float, a2: float, tile_idx=None):
        """Returns a DEVICE record dict {x, v, aemit[, id, rand], n}
        padded to a power-of-two capacity (first n rows valid), or None
        when no particle of this tile crosses in [a1, a2].

        tile_idx identifies the tile within the intersect loop (kept
        for diagnostics; the solve itself is stateless)."""
        mode = drift.force_mode
        solve = self._tile_solver(p, mode)
        d = _drift_args(drift, p.a_x)
        k = _kick_args(kick, p.a_v)
        shift = jnp.asarray(np.asarray(tileshift, dtype=np.float32))
        cnt, accept, xo, vo, aemit = solve(
            p, d, k, shift, jnp.float32(a1), jnp.float32(a2))
        cnt = int(cnt)                  # the one host fetch per tile
        if cnt == 0:
            return None
        cap = self._cap_for(cnt)
        compact = self._compactor(p.np_local, cap, p.id is not None,
                                  p.rand is not None)
        rec = compact(accept, xo, vo, aemit, p.id, p.rand)
        rec["n"] = cnt
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

        # AABB of the source over [a1,a2] for shell culling -- a device
        # reduction fetching SIX scalars, never the positions
        if self.lc.fov > 0:
            mode = drift.force_mode
            key = ("aabb", p.np_local, mode, p.dx1 is not None,
                   p.pgdc is not None)
            fn = self._aabb_jit.get(key)
            if fn is None:
                @jax.jit
                def fn(p, d, a1, a2):
                    Bx = jax.lax.optimization_barrier
                    n = p.np_local
                    xa = _drift_position_args(d, mode, p,
                                              jnp.full(n, a1), Bx)
                    xb = _drift_position_args(d, mode, p,
                                              jnp.full(n, a2), Bx)
                    return (jnp.minimum(xa.min(0), xb.min(0)),
                            jnp.maximum(xa.max(0), xb.max(0)))
                self._aabb_jit[key] = fn
            lo_d, hi_d = fn(p, _drift_args(drift, p.a_x),
                            jnp.float32(a1), jnp.float32(a2))
            # f32 like the pre-device-path host math (bit-compatible
            # tile culling)
            pad = 0.5
            xmin = np.asarray(lo_d) - pad
            xmax = np.asarray(hi_d) + pad

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
                rec = self._solve_tile(p, drift, kick, shift, ai, af,
                                       tile_idx=t)
                if rec is not None:
                    self.buffer.append(rec)
                    self.np_buffered += rec["n"]
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

    def drain_device(self) -> Optional[dict]:
        """Concatenate and clear the buffer, keeping everything ON
        DEVICE: returns {x, v, aemit[, id, rand], n} where arrays are
        padded to a power-of-two capacity and the first n rows are
        valid. The caller (the usmesh ready handler) runs subsample /
        sort / FOF device-side and fetches only write-ready arrays."""
        if not self.buffer:
            return None
        n = self.np_buffered
        cols = [k for k in self.buffer[0] if k != "n"]
        cap = self._cap_for(n)
        parts = self.buffer
        # jit keyed by the entry CAPACITIES only (a bounded power-of-two
        # ladder); the true per-entry counts are traced, so repeated
        # drains reuse the compiled program
        key = ("drain", tuple(b["x"].shape[0] for b in parts),
               tuple(cols), cap)
        fn = self._compact_jit.get(key)
        if fn is None:
            @jax.jit
            def fn(bufs, ns):
                valid = jnp.concatenate([
                    jnp.arange(b["x"].shape[0]) < ns[i]
                    for i, b in enumerate(bufs)])
                idx = jnp.nonzero(valid, size=cap, fill_value=0)[0]
                return {k: jnp.concatenate([b[k] for b in bufs])[idx]
                        for k in cols}
            self._compact_jit[key] = fn
        out = fn([{k: b[k] for k in cols} for b in parts],
                 jnp.asarray([b["n"] for b in parts], jnp.int32))
        out["n"] = n
        self.buffer = []
        self.np_before += n
        self.np_buffered = 0
        return out

    def drain(self) -> Optional[dict]:
        """Legacy host drain: drain_device + fetch, trimmed to n."""
        rec = self.drain_device()
        if rec is None:
            return None
        n = rec.pop("n")
        return {k: np.asarray(v)[:n] for k, v in rec.items()}

    def emit(self, whence: str):
        self.event_handlers.emit(
            ev.EVENT_LIGHTCONE_READY, ev.STAGE_AFTER,
            mesh=self, ai=self.ai, af=self.af, whence=whence,
            a_mid=0.5 * (self.ai + self.af))
        self.ai = self.af
