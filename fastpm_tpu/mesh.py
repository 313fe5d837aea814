"""The particle-mesh object: geometry, k tables, FFT conventions.

TPU-native replacement of the reference's PM/pmpfft engine
(libfastpm/pmpfft.c, pmapi.c). A `PM` instance holds only static metadata
(mesh shape, box size, precomputed 1D Fourier tables); fields are plain
jax arrays with shapes:

- real space: (Nx, Ny, Nz) float32
- k space:    (Nx, Ny, Nz//2 + 1) complex64 (numpy rfftn layout; the last
  axis is the halved hermitian axis, matching the reference's z-local
  layout pmpfft.c:198-202)

FFT normalization mirrors pm_r2c (pmpfft.c:370-399): r2c multiplies by
1/Norm so the r2c . c2r round trip is unitary and delta_k amplitudes are
volume-normalized the same way as the reference.

All Fourier-space kernels are products/sums of per-dimension 1D tables
(pm_create_k_factors, pmapi.c:224-275), which broadcast naturally.
"""

from __future__ import annotations

from functools import cached_property

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["PM", "fetch_complex", "put_complex"]


def fetch_complex(x) -> np.ndarray:
    """Device -> host copy of a complex array via separate real/imag
    transfers: the axon TPU tunnel cannot transfer complex64 buffers
    (UNIMPLEMENTED), and two f32 copies cost the same bandwidth."""
    if isinstance(x, np.ndarray):
        return x
    # jit the split so the fetched buffers are real f32 arrays, not
    # lazy views of the complex buffer
    re, im = jax.jit(lambda a: (jnp.real(a), jnp.imag(a)))(x)
    return (np.asarray(re, dtype=np.float64)
            + 1j * np.asarray(im, dtype=np.float64))


def put_complex(x) -> "jnp.ndarray":
    """Host -> device copy of a complex array via separate real/imag
    transfers (the dual of fetch_complex; complex64 uploads are also
    UNIMPLEMENTED over the axon tunnel)."""
    x = np.asarray(x)
    if not np.iscomplexobj(x):
        return jnp.asarray(x)
    re = jnp.asarray(np.ascontiguousarray(x.real, dtype=np.float32))
    im = jnp.asarray(np.ascontiguousarray(x.imag, dtype=np.float32))
    return jax.jit(jax.lax.complex)(re, im)


def _sinc(x: np.ndarray) -> np.ndarray:
    """sin(x)/x with the reference's small-x series (pmapi.c:213-220)."""
    x = np.asarray(x, dtype=np.float64)
    small = np.abs(x) < 1e-5
    xs = np.where(small, 1.0, x)
    return np.where(small, 1.0 - x * x / 6.0 + x ** 4 / 120.0,
                    np.sin(xs) / xs)


def _diff_kernel(w: np.ndarray) -> np.ndarray:
    """Order-1 super-Lanczos finite difference kernel in Fourier space,
    same as GADGET (pmapi.c:222-232)."""
    return 1.0 / 6.0 * (8 * np.sin(w) - np.sin(2 * w))


def _trace_clean() -> bool:
    try:
        from jax._src.core import trace_state_clean
        return trace_state_clean()
    except Exception:
        return False


class PM:
    """Mesh geometry + Fourier tables (no field storage)."""

    def __init__(self, Nmesh, BoxSize, dtype=jnp.float32):
        self._dev_cache = {}
        if np.isscalar(Nmesh):
            Nmesh = (int(Nmesh),) * 3
        if np.isscalar(BoxSize):
            BoxSize = (float(BoxSize),) * 3
        self.Nmesh = tuple(int(n) for n in Nmesh)
        self.BoxSize = tuple(float(b) for b in BoxSize)
        for n in self.Nmesh:
            if n % 2 != 0:
                # pmpfft.c:143-145
                raise ValueError("Nmesh must be even")
        self.dtype = jnp.dtype(dtype)
        self.cdtype = jnp.complex64 if self.dtype == jnp.float32 else jnp.complex128

        self.Norm = float(np.prod(np.array(self.Nmesh, dtype=np.float64)))
        self.Volume = float(np.prod(self.BoxSize))
        self.CellSize = tuple(b / n for b, n in zip(self.BoxSize, self.Nmesh))
        self.InvCellSize = tuple(1.0 / c for c in self.CellSize)

        # shape of the hermitian-compressed k-space array
        self.kshape = (self.Nmesh[0], self.Nmesh[1], self.Nmesh[2] // 2 + 1)
        self.rshape = self.Nmesh

    # ---- k tables (host, float64) ----

    @cached_property
    def _tables(self):
        """Per-dimension 1D tables over the FULL mesh length; axis 2 is
        sliced to the hermitian half when broadcast."""
        k, k_finite, kk, kk_finite, kk_finite2 = [], [], [], [], []
        for d in range(3):
            n = self.Nmesh[d]
            cell = self.CellSize[d]
            i = np.arange(n)
            ii = np.where(i >= n // 2, i - n, i)
            kd = ii * (2 * np.pi / self.BoxSize[d])
            w = kd * cell
            ff1 = _sinc(0.5 * w)
            ff2 = _sinc(w)
            # match the reference: tables are stored at float32 precision
            # (pmapi.c uses float arrays), kernels computed from them
            kd32 = kd.astype(np.float32).astype(np.float64)
            k.append(kd32)
            k_finite.append((_diff_kernel(w) / cell).astype(np.float32).astype(np.float64))
            kk.append((kd * kd).astype(np.float32).astype(np.float64))
            kk_finite.append((kd * kd * ff1 * ff1).astype(np.float32).astype(np.float64))
            kk_finite2.append((kd * kd * (4 / 3.0 * ff1 * ff1 - 1 / 3.0 * ff2 * ff2))
                              .astype(np.float32).astype(np.float64))
        return dict(k=k, k_finite=k_finite, kk=kk,
                    kk_finite=kk_finite, kk_finite2=kk_finite2)

    def table(self, name: str, d: int, half: bool = None) -> np.ndarray:
        """1D table `name` along dimension d. By default axis 2 is sliced
        to the hermitian half-length."""
        t = self._tables[name][d]
        if half is None:
            half = (d == 2)
        if half and d == 2:
            return t[: self.Nmesh[2] // 2 + 1]
        return t

    def broadcast_table(self, name: str, d: int):
        """Table as a jnp array shaped for broadcasting over k-space."""
        t = self.table(name, d)
        shape = [1, 1, 1]
        shape[d] = len(t)
        return jnp.asarray(t.reshape(shape), dtype=self.dtype)

    @cached_property
    def _nyquist_mask_np(self):
        """Boolean (kshape) mask of self-conjugate modes: every coordinate
        is 0 or Nyquist (used to zero odd diff kernels, gravity.c:48-56)."""
        masks = []
        for d in range(3):
            n = self.Nmesh[d]
            i = np.arange(n if d < 2 else n // 2 + 1)
            masks.append((i == (n - i) % n))
        m = (masks[0][:, None, None] & masks[1][None, :, None]
             & masks[2][None, None, :])
        return m

    @cached_property
    def _hermitian_weights_np(self):
        """Float (1,1,Nz/2+1) weights: 2 for modes whose conjugate lives
        outside the compressed array, 1 on the kz=0 and kz=Nyquist planes
        (powerspectrum.c:92-94, pm_compute_variance pmapi.c:290-308)."""
        nz = self.Nmesh[2]
        iz = np.arange(nz // 2 + 1)
        w = np.where((iz == 0) | (iz == nz // 2), 1.0, 2.0)
        return w[None, None, :].astype(np.float32)

    @cached_property
    def _integer_kk_np(self):
        """Integer |ik|^2 on the k grid (int32), for shell binning."""
        out = 0
        for d in range(3):
            n = self.Nmesh[d]
            i = np.arange(n if d < 2 else n // 2 + 1)
            ii = np.where(i > n // 2, i - n, i).astype(np.int64)
            shape = [1, 1, 1]
            shape[d] = len(i)
            out = out + (ii * ii).reshape(shape)
        return out.astype(np.int32)

    def _device_const(self, name: str, np_val):
        """Device-resident copy of a cached numpy constant. Inside a
        jit trace return the NUMPY value (it folds into the program as
        a constant -- materializing a jnp array there would cache a
        tracer on the PM and leak); outside, cache the device array so
        eager callers do not re-upload it every call (134 MB per call
        for a 512^3 mask over the axon tunnel)."""
        if not _trace_clean():
            return np_val
        dev = self._dev_cache.get(name)
        if dev is None:
            dev = jnp.asarray(np_val)
            self._dev_cache[name] = dev
        return dev

    @property
    def nyquist_mask(self):
        return self._device_const("nyquist", self._nyquist_mask_np)

    @cached_property
    def nyquist_masks_1d(self):
        """The three 1D factors of the self-conjugate mask (numpy
        bool); the 3D mask is their outer product."""
        out = []
        for d in range(3):
            n = self.Nmesh[d]
            i = np.arange(n if d < 2 else n // 2 + 1)
            out.append(i == (n - i) % n)
        return tuple(out)

    @property
    def hermitian_weights(self):
        return self._device_const("hweights", self._hermitian_weights_np)

    @property
    def integer_kk(self):
        return self._device_const("ikk", self._integer_kk_np)

    # ---- FFTs (pmpfft.c:370-399) ----

    @cached_property
    def _use_mm_fft(self) -> bool:
        """FASTPM_TPU_FFT routes the FFTs: 'mm' = the matmul
        (Cooley-Tukey einsum) kernels in ops/fftmm.py, 'xla' = jnp.fft,
        'auto' (default) = mm on TPU-family backends (the MXU beats
        XLA's TPU FFT rate, BENCH_NOTES roofline; max rel err 5e-6 on
        the force-shaped spectrum with the 3-pass bf16 split) and xla
        elsewhere. mm falls back to jnp.fft when a mesh side has no
        small-factor split."""
        import os
        mode = os.environ.get("FASTPM_TPU_FFT", "auto")
        if mode == "xla":
            return False
        if mode not in ("mm", "auto"):
            return False
        if mode == "auto":
            try:
                plat = jax.devices()[0].platform.lower()
            except Exception:
                return False
            if plat in ("cpu", "gpu"):
                return False
        from .ops.fftmm import mm_supported
        return mm_supported(self.Nmesh)

    def r2c(self, x):
        """Real -> complex with 1/Norm so the round trip is unitary."""
        if self._use_mm_fft:
            from .ops.fftmm import rfftn_mm, rfftn_direct2, _fwd_mode
            fwd = rfftn_direct2 if _fwd_mode() == "direct2" else rfftn_mm
            return (fwd(x) / self.Norm).astype(self.cdtype)
        return (jnp.fft.rfftn(x) / self.Norm).astype(self.cdtype)

    def c2r(self, k):
        """Complex -> real, inverse of r2c."""
        if self._use_mm_fft:
            from .ops.fftmm import irfftn_mm
            return irfftn_mm(k * self.Norm,
                             self.Nmesh).astype(self.dtype)
        return jnp.fft.irfftn(k * self.Norm, s=self.Nmesh).astype(self.dtype)

    @cached_property
    def pair_ok(self) -> bool:
        """Whether c2r_pair's full complex field fits the memory budget.
        The packed iFFT materializes an (Nx, Ny, Nz) complex64 field
        (8 B/cell) plus comparable FFT workspace; past a threshold this
        OOMs a 16 GB chip (256^3 B3 = 768^3 mesh, BENCH_NOTES). Budget
        override: FASTPM_TPU_PAIR_BYTES (bytes; 0 disables pairing)."""
        import os
        limit = int(os.environ.get("FASTPM_TPU_PAIR_BYTES", 3 * 1024 ** 3))
        return self.Norm * 8 <= limit

    def c2r_pair(self, ka, kb):
        """Two c2r transforms for the price of ~one complex iFFT: pack
        the two hermitian half-spectra as F = expand(ka) + i*expand(kb)
        on the full grid; ifftn(F) = c2r(ka) + i*c2r(kb). Cuts the
        gravity gradient-return FFT work (the reference pays one c2r per
        component, gravity.c:374-426).

        REQUIRES hermitian inputs: the tail planes are reconstructed by
        conjugate symmetry, so a field that is anti-hermitian on the
        Nyquist planes (e.g. an order-0 i*k diff) comes back WRONG --
        use plain c2r there (see c2r_grad3's gradorder gate).

        Falls back to two plain c2r calls when the packed complex field
        exceeds the memory budget (see pair_ok): 2 c2r = ~1.6x the paired
        cost but O(half) the peak memory."""
        if not self.pair_ok:
            return self.c2r(ka), self.c2r(kb)
        nx, ny, nz = self.Nmesh
        nzh = nz // 2 + 1
        front = jax.lax.complex(jnp.real(ka) - jnp.imag(kb),
                                jnp.imag(ka) + jnp.real(kb))
        # tail planes iz in [nzh, nz): expand(k)[ix,iy,iz] =
        # conj(k[(-ix)%nx, (-iy)%ny, nz-iz]), so
        # F[tail] = conj(ka[neg]) + i conj(kb[neg]) = conj(ka - i kb)[neg]
        g = jax.lax.complex(jnp.real(ka) + jnp.imag(kb),
                            jnp.imag(ka) - jnp.real(kb))
        t = g[:, :, 1:nz - nzh + 1]             # iz' = 1 .. nz/2-1
        t = jnp.conj(t[::-1, ::-1, ::-1])
        t = jnp.roll(t, (1, 1), axis=(0, 1))    # [-i mod n] remap in x, y
        F = jnp.concatenate([front, t], axis=2) * self.Norm
        if self._use_mm_fft:
            from .ops.fftmm import ifftn_mm
            out = ifftn_mm(F)
        else:
            out = jnp.fft.ifftn(F)
        return (jnp.real(out).astype(self.dtype),
                jnp.imag(out).astype(self.dtype))

    def c2r_grad3(self, fk, gradorder: int, zext: bool = False,
                  wrap: bool = False):
        """The force step's three gradient returns in one call:
        (c2r(i k_d * fk) for d in x, y, z), with the diff table order
        per kernel (0 = k, 1 = k_finite super-Lanczos) and apply_diff's
        self-conjugate-mode zeroing semantics (gravity.c:34-64).

        On the mm engine this is the fused shared-stage inverse
        (ops/fftmm.grad3_c2r_mm): direct hermitian z-stage, shared
        axis-0 inverse, diff tables fused into the einsum reads --
        replacing [3 transfer passes + packed-pair iFFT + c2r].
        Otherwise: the transfer + c2r_pair + c2r pipeline.

        zext (mm engine only): return (nx, ny, nz+1) fields whose last
        plane is the wrapped z=0 plane -- the CIC readout's pad_canvas
        then skips its z-face concatenate. wrap (direct mode only):
        extend ALL axes, i.e. the readout's full padded layout comes
        straight out of the synthesis matmuls. Callers must tolerate
        every shape (the XLA-FFT path ignores both flags)."""
        from . import transfers
        if self._use_mm_fft:
            from .ops.fftmm import (grad3_c2r_mm, grad3_c2r_direct,
                                    _grad3_mode)
            name = ["k", "k_finite"][gradorder]
            if gradorder == 0:
                # k_finite is zero on every axis-Nyquist/DC plane, so
                # the self-conjugate mask is automatic for order 1;
                # order 0 (plain i k) needs the explicit zeroing
                m0, m1, m2 = (jnp.asarray(m.astype(np.float32))
                              for m in self.nyquist_masks_1d)
                fk = fk * (1.0 - m0[:, None, None] * m1[None, :, None]
                           * m2[None, None, :])
            mode = _grad3_mode()
            if mode in ("direct", "direct2"):
                from .ops.fftmm import grad3_c2r_direct2
                fn = (grad3_c2r_direct2 if mode == "direct2"
                      else grad3_c2r_direct)
                gx, gy, gz = fn(
                    fk * self.Norm, self.Nmesh,
                    self.table(name, 0), self.table(name, 1),
                    self.table(name, 2), zext=zext, wrap=wrap)
            else:
                gx, gy, gz = grad3_c2r_mm(
                    fk * self.Norm, self.Nmesh,
                    self.table(name, 0), self.table(name, 1),
                    self.table(name, 2), zext=zext)
            return (gx.astype(self.dtype), gy.astype(self.dtype),
                    gz.astype(self.dtype))
        fks = [transfers.apply_grad(self, fk, d, gradorder)
               for d in range(3)]
        if gradorder == 0:
            # i*k (order 0) leaves the axis-Nyquist planes
            # ANTI-hermitian (the k table is -k_nyq there), so the
            # packed-pair trick -- which hermitian-completes the tail
            # -- would corrupt kernels 3_2/EASTWOOD/NAIVE; pay the
            # three plain c2r (each implicitly hermitian-completes the
            # stored half exactly like PFFT's c2r does)
            return self.c2r(fks[0]), self.c2r(fks[1]), self.c2r(fks[2])
        f0, f1 = self.c2r_pair(fks[0], fks[1])
        return f0, f1, self.c2r(fks[2])

    # ---- diagnostics ----

    def compute_variance(self, delta_k) -> float:
        """sum of w |delta_k|^2 / Norm (pm_compute_variance,
        pmapi.c:290-308). Per-(x, y) column partial sums reduce on the
        device (each a short f32 tree sum over the hermitian axis); the
        final accumulation runs in float64 on host, preserving the
        8-decimal golden while fetching Nx*Ny floats instead of the
        full complex field (which costs minutes over the axon
        tunnel)."""
        if isinstance(delta_k, np.ndarray):
            w = np.asarray(self.hermitian_weights, dtype=np.float64)
            v = np.sum((delta_k.real.astype(np.float64) ** 2
                        + delta_k.imag.astype(np.float64) ** 2) * w)
            return float(v / self.Norm)
        w32 = jnp.asarray(self._hermitian_weights_np)

        # exact-split compensated reduction: terms y ~ O(1) split into
        # hi (multiples of 2^-10, so per-column f32 sums stay EXACT up
        # to 2^14) and the lo remainder (exact by Sterbenz). Only the
        # (Nx, Ny) partials cross the device boundary; the f64 finish
        # runs on host. Preserves the reference's 8-decimal golden
        # without fetching the full field (minutes over the tunnel).
        @jax.jit
        def partials(dk):
            y = (jnp.real(dk) ** 2 + jnp.imag(dk) ** 2) * w32
            hi = jnp.floor(y * 1024.0) * jnp.float32(1.0 / 1024.0)
            lo = y - hi
            return jnp.sum(hi, axis=2), jnp.sum(lo, axis=2)

        cols_hi, cols_lo = partials(delta_k)
        v = (np.asarray(cols_hi, dtype=np.float64).sum()
             + np.asarray(cols_lo, dtype=np.float64).sum())
        return float(v / self.Norm)

    @property
    def cache_key(self):
        """Hashable geometry identity for kernel caches (id() reuse
        after GC would silently serve kernels for the wrong mesh)."""
        return (self.Nmesh, self.BoxSize, str(self.dtype))

    def __repr__(self):
        return f"PM(Nmesh={self.Nmesh}, BoxSize={self.BoxSize})"
