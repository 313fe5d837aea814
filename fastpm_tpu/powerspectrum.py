"""Power spectrum measurement and k-function tables
(reference: libfastpm/powerspectrum.c).

Measurement is spherical shell binning with integer-|ik| bins of width
k0 = 2 pi / L and hermitian double-count weights (powerspectrum.c:62-124).
The binned sums run on device (bincount); the final normalization and text
output are host-side.
"""

from __future__ import annotations

import io
import math

import numpy as np
import jax
import jax.numpy as jnp

from .mesh import PM

__all__ = ["PowerSpectrum", "FuncK", "measure_power",
           "measure_transfer", "sigma_tophat"]


class FuncK:
    """A tabulated function of k with the reference's log-log interpolation
    (powerspectrum.c:386-428): log-linear interp of (log k, log f), falling
    back to linear when f <= 0; f(0) = 1; constant extrapolation is an
    error in the reference (we clamp to the table ends)."""

    def __init__(self, k, f):
        self.k = np.asarray(k, dtype=np.float64)
        self.f = np.asarray(f, dtype=np.float64)
        if self.k.ndim != 1 or self.k.shape != self.f.shape:
            raise ValueError("k and f must be matching 1D arrays")
        self.size = len(self.k)

    @classmethod
    def from_string(cls, text: str) -> "FuncK":
        """Parse 'k f' pairs, one per line (funck_init_from_string)."""
        ks, fs = [], []
        for line in text.splitlines():
            parts = line.split()
            if len(parts) < 2:
                continue
            try:
                k = float(parts[0])
                f = float(parts[1])
            except ValueError:
                continue
            ks.append(k)
            fs.append(f)
        return cls(np.array(ks), np.array(fs))

    @classmethod
    def from_file(cls, path: str) -> "FuncK":
        with open(path) as fp:
            return cls.from_string(fp.read())

    def __call__(self, k):
        """Vectorized evaluation; matches fastpm_funck_eval semantics.
        Accepts numpy (host, float64) OR jax arrays/tracers -- the jax
        path runs the same formula on device (the host has one CPU
        core; evaluating P(k) on a 512^3 grid in numpy takes minutes)."""
        import jax
        if isinstance(k, jax.Array) or isinstance(
                k, jax.core.Tracer):
            return self._eval_jax(k)
        k = np.asarray(k, dtype=np.float64)
        scalar = k.ndim == 0
        k = np.atleast_1d(k)
        out = np.empty_like(k)

        # bracket with the same binary search bounds: l in [0, size-2]
        r = np.searchsorted(self.k, k, side="right")
        l = np.clip(r - 1, 0, self.size - 2)
        r = l + 1
        k1, k2 = self.k[l], self.k[r]
        f1, f2 = self.f[l], self.f[r]

        loglog = (f1 > 0) & (f2 > 0) & (k1 != 0) & (k2 != 0) & (k > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            lk, lk1, lk2 = np.log(np.where(k > 0, k, 1)), np.log(np.where(k1 > 0, k1, 1)), np.log(np.where(k2 > 0, k2, 1))
            lf1, lf2 = np.log(np.where(f1 > 0, f1, 1)), np.log(np.where(f2 > 0, f2, 1))
            vlog = np.exp(((lk - lk1) * lf2 + (lk2 - lk) * lf1) / (lk2 - lk1))
            vlin = ((k - k1) * f2 + (k2 - k) * f1) / (k2 - k1)
        out = np.where(loglog, vlog, vlin)
        out = np.where(k == 0, 1.0, out)
        return float(out[0]) if scalar else out

    def _eval_jax(self, k):
        """The same interpolation as __call__ in traced jnp ops.

        Conditioning: log k - log k1 at f32 for adjacent table points
        is a catastrophic cancellation (relative error ~1e-5 on the
        interpolation weight), so the weight is computed as
        log1p((k-k1)/k1) / dlogk with the per-segment dlogk and dlogf
        precomputed in float64 on the host -- total error ~1e-7,
        preserving the reference golden digits."""
        import jax.numpy as jnp
        kf = self.k
        ff = self.f
        with np.errstate(divide="ignore", invalid="ignore"):
            lkf = np.log(np.where(kf > 0, kf, 1.0))
            lff = np.log(np.where(ff > 0, ff, 1.0))
        dlogk = np.diff(lkf)
        dlogf = np.diff(lff)
        dlogk = np.where(dlogk != 0, dlogk, 1.0)
        kt = jnp.asarray(kf.astype(np.float32))
        ft = jnp.asarray(ff.astype(np.float32))
        lft = jnp.asarray(lff.astype(np.float32))
        dlkt = jnp.asarray(dlogk.astype(np.float32))
        dlft = jnp.asarray(dlogf.astype(np.float32))
        dkt = jnp.asarray(np.diff(kf).astype(np.float32))

        k = k.astype(jnp.float32)
        r = jnp.searchsorted(kt, k, side="right")
        l = jnp.clip(r - 1, 0, self.size - 2)
        k1 = kt[l]
        f1, f2 = ft[l], ft[l + 1]
        loglog = (f1 > 0) & (f2 > 0) & (k1 != 0) & (kt[l + 1] != 0) \
            & (k > 0)
        safek1 = jnp.where(k1 != 0, k1, 1.0)
        t = jnp.log1p((k - k1) / safek1) / dlkt[l]
        vlog = jnp.exp(lft[l] + t * dlft[l])
        d12 = jnp.where(dkt[l] != 0, dkt[l], 1.0)
        tlin = (k - k1) / d12
        vlin = f1 + tlin * (f2 - f1)
        out = jnp.where(loglog, vlog, vlin)
        return jnp.where(k == 0, 1.0, out)


class PowerSpectrum:
    """Binned P(k) with mode counts and metadata."""

    def __init__(self, k, p, Nmodes, edges, Volume, k0):
        self.k = np.asarray(k, dtype=np.float64)
        self.p = np.asarray(p, dtype=np.float64)
        self.Nmodes = np.asarray(Nmodes, dtype=np.float64)
        self.edges = np.asarray(edges, dtype=np.float64)
        self.Volume = float(Volume)
        self.k0 = float(k0)
        self.size = len(self.k)

    def as_funck(self) -> FuncK:
        return FuncK(self.k, self.p)

    def write(self, filename: str, N: float, boxsize) -> None:
        """Text format 'k p N' + metadata footer (powerspectrum.c:149-168),
        parseable by nbodykit-based checks."""
        if np.isscalar(boxsize):
            boxsize = (boxsize,) * 3
        with open(filename, "w") as fp:
            fp.write(self.to_text(N, boxsize))

    def to_text(self, N: float, boxsize) -> str:
        buf = io.StringIO()
        buf.write("# k p N \n")
        for i in range(self.size):
            buf.write("%g %g %g\n" % (self.k[i], self.p[i], self.Nmodes[i]))
        buf.write("# metadata 7\n")
        buf.write("# volume %g float64\n" % self.Volume)
        buf.write("# shotnoise %g float64\n" % (self.Volume / N))
        buf.write("# N1 %g int\n" % N)
        buf.write("# N2 %g int\n" % N)
        buf.write("# Lz %g float64\n" % boxsize[2])
        buf.write("# Lx %g float64\n" % boxsize[0])
        buf.write("# Ly %g float64\n" % boxsize[1])
        return buf.getvalue()

    def large_scale(self, Nmax: int) -> float:
        """Mode-weighted mean P over k <= Nmax k0, ignoring empty bins
        (powerspectrum.c:170-184)."""
        kmax = Nmax * self.k0
        plin = 0.0
        nm = 0.0
        i = 0
        while i == 0 or (i < self.size and self.k[i] <= kmax):
            plin += self.p[i] * self.Nmodes[i]
            nm += self.Nmodes[i]
            i += 1
        return plin / nm


_MEASURE_CACHE: dict = {}


def _measure_bins_fn(pm: PM):
    """Cached jitted shell-binning program for one PM: the whole
    device side of measure_power runs as ONE dispatch + one small
    fetch (a dozen eager ops each cost a host round trip on a
    tunneled TPU; the per-step P(k) event was paying them all)."""
    key = pm.cache_key
    fn = _MEASURE_CACHE.get(key)
    if fn is not None:
        return fn
    nbins = pm.Nmesh[0] // 2
    k0 = 2 * math.pi / pm.BoxSize[0]

    # kk/weights enter as ARGUMENTS, not closure captures: a captured
    # 512^3-size constant is serialized into the HLO and the tunneled
    # remote-compile service rejects the request (HTTP 413)
    @jax.jit
    def fn(delta1_k, delta2_k, kk, hw):
        # exact isqrt: float sqrt then correct downward/upward so
        # bin^2 <= kk < (bin+1)^2
        bin = jnp.floor(jnp.sqrt(kk.astype(jnp.float32))).astype(
            jnp.int32)
        bin = jnp.where((bin + 1) * (bin + 1) <= kk, bin + 1, bin)
        bin = jnp.where(bin * bin > kk, bin - 1, bin)

        w = hw * jnp.ones(pm.kshape, dtype=pm.dtype)
        # exclude the DC mode
        w = w.at[0, 0, 0].set(0.0)

        value = (delta1_k.real * delta2_k.real
                 + delta1_k.imag * delta2_k.imag)
        k_of_mode = jnp.sqrt(kk.astype(pm.dtype)) * k0

        flat_bin = bin.reshape(-1)
        in_range = flat_bin < nbins
        flat_bin = jnp.where(in_range, flat_bin, nbins)  # overflow bin
        wf = jnp.where(in_range, w.reshape(-1), 0.0)

        Nmodes = jnp.bincount(flat_bin, weights=wf,
                              length=nbins + 1)[:nbins]
        psum = jnp.bincount(flat_bin, weights=wf * value.reshape(-1),
                            length=nbins + 1)[:nbins]
        ksum = jnp.bincount(flat_bin,
                            weights=wf * k_of_mode.reshape(-1),
                            length=nbins + 1)[:nbins]
        return Nmodes, psum, ksum

    _MEASURE_CACHE[key] = fn
    return fn


_FAST_CACHE: dict = {}


def _measure_fast(pm: PM):
    """Two-stage shell binning for accelerator backends, ~5x the
    bincount path (chip: 1.87 s -> ~0.35 s per call at 512^3).

    The bin index of mode (ix, iy, iz) depends on (ikx^2 + iky^2, iz)
    only, so (1) the (Nx*Ny) z-lines are summed into their ~Nx*Ny/8
    distinct rxy^2 CLASSES (a sorted row segment-sum over a static
    host-precomputed line order), and (2) one bincount over the
    (nclass, Nzh) class table -- 150x fewer scatter updates than the
    per-mode bincount. Weights are folded per-z (they depend only on
    kz, mesh._hermitian_weights_np); DC is zeroed explicitly. Summation
    still groups per class/bin (no global cumsum differences), so f32
    precision matches the bincount path's structure. Returns a jitted
    psum(delta1, delta2) function; Nmodes/ksum are delta-independent
    and come from one call of the exact bincount program, cached."""
    key = pm.cache_key
    hit = _FAST_CACHE.get(key)
    if hit is not None:
        return hit
    nx, ny, nzf = pm.Nmesh
    nzh = nzf // 2 + 1
    nbins = nx // 2

    def ik(n, m):
        i = np.arange(m)
        return np.where(i > n // 2, i - n, i).astype(np.int64)

    rxy2 = (ik(nx, nx)[:, None] ** 2
            + ik(ny, ny)[None, :] ** 2).reshape(-1)       # (nlines,)
    order = np.argsort(rxy2, kind="stable").astype(np.int32)
    sv = rxy2[order]
    starts = np.flatnonzero(np.r_[True, sv[1:] != sv[:-1]])
    class_rxy2 = sv[starts]                                # (nclass,)
    nclass = len(starts)
    ids_sorted = np.repeat(np.arange(nclass, dtype=np.int32),
                           np.diff(np.r_[starts, len(sv)]))
    kk_cz = class_rxy2[:, None] + ik(nzf, nzh)[None, :] ** 2
    bins = np.floor(np.sqrt(kk_cz.astype(np.float64))).astype(np.int64)
    bins = np.where((bins + 1) ** 2 <= kk_cz, bins + 1, bins)
    bins = np.where(bins ** 2 > kk_cz, bins - 1, bins)
    bins = np.minimum(bins, nbins).astype(np.int32).reshape(-1)
    wz = np.where((np.arange(nzh) == 0) | (np.arange(nzh) == nzf // 2),
                  1.0, 2.0).astype(np.float32)

    dev_order = jnp.asarray(order)
    dev_ids = jnp.asarray(ids_sorted)
    dev_bins = jnp.asarray(bins)
    dev_wz = jnp.asarray(wz)

    @jax.jit
    def psum_fn(delta1_k, delta2_k, order, ids, bins_flat, wzv):
        value = (delta1_k.real * delta2_k.real
                 + delta1_k.imag * delta2_k.imag)
        value = (value * wzv[None, None, :]).at[0, 0, 0].set(0.0)
        v2 = value.reshape(nx * ny, nzh)[order]
        seg = jax.ops.segment_sum(v2, ids, num_segments=nclass,
                                  indices_are_sorted=True)
        return jnp.bincount(bins_flat, weights=seg.reshape(-1),
                            length=nbins + 1)[:nbins]

    def fast(d1, d2):
        return psum_fn(d1, d2, dev_order, dev_ids, dev_bins, dev_wz)

    hit = {"psum": fast, "nk": None}
    _FAST_CACHE[key] = hit
    return hit


def _on_accel(a) -> bool:
    devs = getattr(a, "devices", None)
    return (devs is not None
            and any(d.platform != "cpu" for d in devs()))


def measure_power(pm: PM, delta1_k, delta2_k=None) -> PowerSpectrum:
    """P(k) of one or two overdensity fields (powerspectrum.c:34-124).

    Shell binning: bin index is the integer part of |ik| (isqrt of the
    integer |ik|^2), bins of width k0 = 2 pi / L, hermitian weight 2 except
    on the kz = 0 / Nyquist planes, DC excluded.
    """
    if delta2_k is None:
        delta2_k = delta1_k
    nbins = pm.Nmesh[0] // 2
    k0 = 2 * math.pi / pm.BoxSize[0]

    if _on_accel(delta1_k):
        hit = _measure_fast(pm)
        if hit["nk"] is None:
            # delta-independent Nmodes/ksum: one exact bincount call
            Nm, _ps, ks = _measure_bins_fn(pm)(
                delta1_k, delta2_k, pm.integer_kk,
                pm.hermitian_weights)
            hit["nk"] = (np.asarray(Nm, dtype=np.float64),
                         np.asarray(ks, dtype=np.float64))
        Nmodes, ksum = hit["nk"]
        psum = hit["psum"](delta1_k, delta2_k)
    else:
        Nmodes, psum, ksum = _measure_bins_fn(pm)(
            delta1_k, delta2_k, pm.integer_kk, pm.hermitian_weights)

    Nmodes = np.asarray(Nmodes, dtype=np.float64)
    psum = np.asarray(psum, dtype=np.float64)
    ksum = np.asarray(ksum, dtype=np.float64)

    good = Nmodes > 0
    kmean = np.where(good, ksum / np.where(good, Nmodes, 1), 0.0)
    p = np.where(good, psum / np.where(good, Nmodes, 1) * pm.Volume, 0.0)
    edges = np.arange(nbins + 1) * k0
    return PowerSpectrum(kmean, p, Nmodes, edges, pm.Volume, k0)


def measure_power_2d(pm: PM, delta1_k, delta2_k=None, Nmu: int = 10):
    """(k, mu) wedge power spectrum with the z axis as the line of
    sight (the nbodykit FFTPower mode='2d' convention used by
    python/comparehalos.py). mu = kz / |k| in [0, 1] by hermitian
    symmetry; Nmu bins over [0, 1]. Returns a dict of (nk, Nmu) arrays
    k, mu, power, Nmodes."""
    import jax.numpy as jnp
    if delta2_k is None:
        delta2_k = delta1_k
    nbins = pm.Nmesh[0] // 2
    k0 = 2 * math.pi / pm.BoxSize[0]

    kk = pm.integer_kk
    bin = jnp.floor(jnp.sqrt(kk.astype(jnp.float32))).astype(jnp.int32)
    bin = jnp.where((bin + 1) * (bin + 1) <= kk, bin + 1, bin)
    bin = jnp.where(bin * bin > kk, bin - 1, bin)

    # integer kz of each mode (the hermitian axis is z)
    nz = pm.Nmesh[2]
    iz = np.arange(nz // 2 + 1)
    kz2 = jnp.asarray((iz * iz).astype(np.int32))[None, None, :]
    mu = jnp.sqrt(kz2.astype(pm.dtype)
                  / jnp.maximum(kk.astype(pm.dtype), 1))
    mu = jnp.where(kk == 0, 0.0, mu)
    mubin = jnp.minimum((mu * Nmu).astype(jnp.int32), Nmu - 1)

    w = pm.hermitian_weights * jnp.ones(pm.kshape, dtype=pm.dtype)
    w = w.at[0, 0, 0].set(0.0)
    value = (delta1_k.real * delta2_k.real
             + delta1_k.imag * delta2_k.imag)
    k_of_mode = jnp.sqrt(kk.astype(pm.dtype)) * k0

    flat = (bin * Nmu + mubin).reshape(-1)
    in_range = bin.reshape(-1) < nbins
    flat = jnp.where(in_range, flat, nbins * Nmu)
    wf = jnp.where(in_range, w.reshape(-1), 0.0)
    length = nbins * Nmu + 1

    Nmodes = jnp.bincount(flat, weights=wf, length=length)[:-1]
    psum = jnp.bincount(flat, weights=wf * value.reshape(-1),
                        length=length)[:-1]
    ksum = jnp.bincount(flat, weights=wf * k_of_mode.reshape(-1),
                        length=length)[:-1]
    musum = jnp.bincount(flat, weights=wf * mu.reshape(-1),
                         length=length)[:-1]

    Nm = np.asarray(Nmodes, np.float64).reshape(nbins, Nmu)
    ps = np.asarray(psum, np.float64).reshape(nbins, Nmu)
    ks = np.asarray(ksum, np.float64).reshape(nbins, Nmu)
    mus = np.asarray(musum, np.float64).reshape(nbins, Nmu)
    good = Nm > 0
    safe = np.where(good, Nm, 1.0)
    return dict(k=np.where(good, ks / safe, 0.0),
                mu=np.where(good, mus / safe, 0.0),
                power=np.where(good, ps / safe * pm.Volume, 0.0),
                Nmodes=Nm)


def _gauss_kronrod(n=20):
    """Nodes/weights of the (2n+1)-point Gauss-Kronrod rule with the
    embedded n-point Gauss weights, from the Stieltjes polynomial
    (roots of E_{n+1}, solved in the Legendre basis)."""
    from numpy.polynomial import legendre as L
    xg, wg = np.polynomial.legendre.leggauss(n)
    xq, wq = np.polynomial.legendre.leggauss(2 * n + 4)
    Pn = L.legvander(xq, n + 1)
    rows, rhs = [], []
    for j in range(n + 1):
        integrand = Pn[:, n] * xq ** j
        row = (wq[:, None] * Pn * integrand[:, None]).sum(axis=0)
        rows.append(row[:n + 1])
        rhs.append(-row[n + 1])
    e = np.linalg.solve(np.array(rows), np.array(rhs))
    xs = L.legroots(np.concatenate([e, [1.0]]))
    xk = np.sort(np.concatenate([xg, np.real(xs)]))
    V = L.legvander(xk, 2 * n).T
    m = np.zeros(2 * n + 1)
    m[0] = 2.0
    wk = np.linalg.solve(V, m)
    wg_full = np.zeros_like(wk)
    wg_full[1::2] = wg          # gauss nodes interleave at odd slots
    return xk, wk, wg_full


_GK41 = None


def _qag(f, a, b, epsabs=0.0, epsrel=1e-4, limit=81920):
    """GSL gsl_integration_qag with GSL_INTEG_GAUSS41: adaptive
    bisection of the largest-error interval using the GK41 rule and
    GSL's qk error rescaling -- digit-compatible with the reference's
    quadrature (fastpm_powerspectrum_sigma, powerspectrum.c:250-279)."""
    import heapq
    global _GK41
    if _GK41 is None:
        _GK41 = _gauss_kronrod(20)
    XK, WK, WGF = _GK41
    eps = np.finfo(float).eps
    tiny = np.finfo(float).tiny

    def qk41(a, b):
        c = 0.5 * (a + b)
        h = 0.5 * (b - a)
        fv = f(c + h * XK)
        rk = np.sum(WK * fv)
        rg = np.sum(WGF * fv)
        resabs = np.sum(WK * np.abs(fv)) * abs(h)
        resasc = np.sum(WK * np.abs(fv - rk * 0.5)) * abs(h)
        err = abs((rk - rg) * h)
        if resasc != 0 and err != 0:
            err = resasc * min(1.0, (200 * err / resasc) ** 1.5)
        if resabs > tiny / (50 * eps):
            err = max(eps * 50 * resabs, err)
        return rk * h, err

    r0, e0 = qk41(a, b)
    if e0 <= max(epsabs, epsrel * abs(r0)):
        return r0
    heap = [(-e0, a, b, r0)]
    errsum, ressum = e0, r0
    for _ in range(limit):
        ne, aa, bb, rr = heapq.heappop(heap)
        mid = 0.5 * (aa + bb)
        r1, er1 = qk41(aa, mid)
        r2, er2 = qk41(mid, bb)
        errsum += er1 + er2 + ne
        ressum += r1 + r2 - rr
        heapq.heappush(heap, (-er1, aa, mid, r1))
        heapq.heappush(heap, (-er2, mid, bb, r2))
        if errsum <= max(epsabs, epsrel * abs(ressum)):
            break
    return sum(h[3] for h in heap)


def sigma_tophat(func: FuncK, R: float) -> float:
    """sigma(R): rms of the density field smoothed with a top-hat of
    radius R (powerspectrum.c:227-279); sigma8 = sigma_tophat(ps, 8).

    Uses the GSL-QAG(GAUSS41, relerr 1e-4) emulation so the printed
    value matches the reference's golden logs to the last digit
    (run-test-nbodykit.check pins 'sigma8 0.815897')."""
    def integrand(k):
        k = np.asarray(k, dtype=np.float64)
        kr = R * k
        safe = np.maximum(kr, 1e-300)
        w = 3 * (np.sin(kr) / safe ** 3 - np.cos(kr) / safe ** 2)
        w = np.where(kr < 1e-8, 0.0, w)
        return np.where(kr < 1e-8, 0.0,
                        4 * math.pi * k * k * w * w * func(k)
                        / (2 * math.pi) ** 3)

    return math.sqrt(float(_qag(integrand, 0.0, 500.0 / R)))


def measure_transfer(pm: PM, src_k, dest_k) -> PowerSpectrum:
    """Binned transfer function sqrt(P_dest / P_src)
    (fastpm_transferfunction_init, powerspectrum.c:125-140)."""
    ps = measure_power(pm, src_k)
    ps2 = measure_power(pm, dest_k)
    good = ps.p > 0
    t = np.where(good, np.sqrt(ps2.p / np.where(good, ps.p, 1.0)), 0.0)
    return PowerSpectrum(ps.k, t, ps.Nmodes, ps.edges, ps.Volume, ps.k0)
