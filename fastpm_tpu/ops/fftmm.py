"""Matmul (Cooley-Tukey) FFTs for TPU: DFT-by-MXU.

XLA's TPU FFT runs at ~300 GF/s (BENCH_NOTES roofline) -- far below
both the HBM bandwidth bound and the MXU. This module re-expresses
each 1D DFT of length N = N1*N2 as two small-matrix contractions plus
a twiddle multiply (one Cooley-Tukey split), so the work lands on the
MXU as (..., N1) x (N1, N1) einsums:

    n = N2*n1 + n2,  k = k1 + N1*k2
    X[k1 + N1*k2] = sum_{n2} W2[n2,k2] * T[k1,n2] *
                    sum_{n1} x[N2*n1 + n2] * W1[n1,k1]
    W1[n1,k1] = exp(s*2pi*i*n1*k1/N1), W2 likewise over N2,
    T[k1,n2]  = exp(s*2pi*i*k1*n2/N)      (s = -1 fwd, +1 inv)

FLOP count per axis is N_total*(N1+N2) complex MACs instead of the
O(N log N) of a true FFT -- ~2x more arithmetic at N=512 (N1+N2=48 vs
~5*log2(512)=45 per element) but executed at MXU rates instead of the
XLA FFT's scalar-ish rate. All matrices are f32 complex (split into
real/imag einsums with HIGH precision; the one-hot-free contractions
are exact to f32 rounding within ~sqrt(N) ulp).

Used by mesh.PM when FASTPM_TPU_FFT=mm (bench variant `mmfft`).
No reference-code derivation: the reference uses PFFT (MPI FFTW);
this decomposition is the textbook Cooley-Tukey identity.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["rfftn_mm", "irfftn_mm", "ifftn_mm", "fftn_mm",
           "fft_mm_axis", "rfft_mm_axis", "irfft_mm_axis",
           "good_factorization", "mm_supported"]

def _prec():
    """FASTPM_TPU_FFT_PREC: 'highest' (6-pass f32 emulation, default;
    ~2e-7 rel) or 'high' (3-pass bf16 split, ~1e-6 rel, ~2x MXU rate).
    Read per call so bench variants can flip it between compiles."""
    import os
    name = os.environ.get("FASTPM_TPU_FFT_PREC", "highest").upper()
    return getattr(jax.lax.Precision, name)


def good_factorization(N: int, max_factor: int = 64):
    """N = N1*N2 with both factors <= max_factor and N1 ~ sqrt(N).
    Returns None when impossible (prime or pathological N)."""
    best = None
    for n1 in range(2, min(N, max_factor + 1)):
        if N % n1:
            continue
        n2 = N // n1
        if n2 > max_factor:
            continue
        score = abs(n1 - n2)
        if best is None or score < best[2]:
            best = (n1, n2, score)
    if best is None:
        return None
    return best[0], best[1]


@functools.lru_cache(maxsize=64)
def _dft_tables(N: int, sign: int):
    """numpy (cached) W1, T, W2 complex64 tables for one CT split."""
    fac = good_factorization(N)
    if fac is None:
        return None
    N1, N2 = fac
    n1 = np.arange(N1)
    k1 = np.arange(N1)
    W1 = np.exp(sign * 2j * np.pi * np.outer(n1, k1) / N1)
    n2 = np.arange(N2)
    k2 = np.arange(N2)
    W2 = np.exp(sign * 2j * np.pi * np.outer(n2, k2) / N2)
    T = np.exp(sign * 2j * np.pi * np.outer(k1, n2) / N)
    c64 = np.complex64
    return (N1, N2, W1.astype(c64), T.astype(c64), W2.astype(c64))


def _cmul(ar, ai, br, bi):
    if ai is None:       # real * complex
        return ar * br, ar * bi
    return ar * br - ai * bi, ar * bi + ai * br


def _cdot(ar, ai, br, bi, sub):
    """Complex contraction via real einsums: (..., n, m) x (n, k) ->
    (..., k, m) for sub='...nm,nk->...km' etc."""
    def dot(x, w):
        return jnp.einsum(sub, x, w, precision=_prec())
    if ai is None:
        return dot(ar, br), dot(ar, bi)
    return (dot(ar, br) - dot(ai, bi)), (dot(ar, bi) + dot(ai, br))


def _ct_last(xr, xi, N: int, sign: int):
    """One CT DFT over the LAST axis of (real, imag) f32 arrays.
    xi may be None (real input). Returns (real, imag) f32."""
    tabs = _dft_tables(N, sign)
    assert tabs is not None
    N1, N2, W1, T, W2 = tabs
    W1r, W1i = jnp.asarray(W1.real), jnp.asarray(W1.imag)
    Tr, Ti = jnp.asarray(T.real), jnp.asarray(T.imag)
    W2r, W2i = jnp.asarray(W2.real), jnp.asarray(W2.imag)
    lead = xr.shape[:-1]
    xr = xr.reshape(lead + (N1, N2))
    xi = xi.reshape(lead + (N1, N2)) if xi is not None else None
    # stage 1: contract n1 -> k1 (keep n2 in lanes)
    yr, yi = _cdot(xr, xi, W1r, W1i, "...nm,nk->...km")
    # twiddle (k1, n2)
    yr, yi = _cmul(yr, yi, Tr, Ti)
    # stage 2: contract n2 -> k2
    zr, zi = _cdot(yr, yi, W2r, W2i, "...km,mj->...kj")
    # k = k1 + N1*k2: flatten with k1 fastest
    zr = jnp.swapaxes(zr, -1, -2).reshape(lead + (N,))
    zi = jnp.swapaxes(zi, -1, -2).reshape(lead + (N,))
    return zr, zi


def _ct_axis(xr, xi, axis: int, sign: int):
    N = xr.shape[axis]
    if axis in (-1, xr.ndim - 1):
        return _ct_last(xr, xi, N, sign)
    xr = jnp.moveaxis(xr, axis, -1)
    xi = jnp.moveaxis(xi, axis, -1) if xi is not None else None
    zr, zi = _ct_last(xr, xi, N, sign)
    return (jnp.moveaxis(zr, -1, axis), jnp.moveaxis(zi, -1, axis))


def mm_supported(shape) -> bool:
    return all(good_factorization(int(n)) is not None for n in shape)


def rfftn_mm(x):
    """jnp.fft.rfftn equivalent (axes (0,1,2), unnormalized) via
    matmul DFTs. x: real f32 (nx, ny, nz) -> complex64
    (nx, ny, nz//2+1)."""
    nx, ny, nz = x.shape
    nzh = nz // 2 + 1
    zr, zi = _ct_last(x, None, nz, -1)
    zr, zi = zr[..., :nzh], zi[..., :nzh]
    zr, zi = _ct_axis(zr, zi, 1, -1)
    zr, zi = _ct_axis(zr, zi, 0, -1)
    return jax.lax.complex(zr, zi)


def _herm_extend_last(gr, gi, nz: int):
    """Rebuild the full length-nz last axis from nz//2+1 hermitian
    coefficients (per-row symmetry: the inverse over the other axes
    has already been applied, so each row transforms to a real
    signal)."""
    nzh = gr.shape[-1]
    # tail iz in [nzh, nz): full[iz] = conj(g[nz - iz])
    lo = nz - (nz - 1)          # = 1
    hi = nz - nzh               # inclusive upper source index
    tr = gr[..., lo:hi + 1][..., ::-1]
    ti = -gi[..., lo:hi + 1][..., ::-1]
    return (jnp.concatenate([gr, tr], axis=-1),
            jnp.concatenate([gi, ti], axis=-1))


def irfftn_mm(k, s):
    """jnp.fft.irfftn equivalent (scale 1/(nx*ny*nz))."""
    nx, ny, nz = s
    kr, ki = jnp.real(k), jnp.imag(k)
    kr, ki = _ct_axis(kr, ki, 0, +1)
    kr, ki = _ct_axis(kr, ki, 1, +1)
    fr, fi = _herm_extend_last(kr, ki, nz)
    zr, _zi = _ct_last(fr, fi, nz, +1)
    return zr * np.float32(1.0 / (nx * ny * nz))


def fftn_mm(x):
    """jnp.fft.fftn equivalent on complex input."""
    xr, xi = jnp.real(x), jnp.imag(x)
    for ax in range(x.ndim):
        xr, xi = _ct_axis(xr, xi, ax, -1)
    return jax.lax.complex(xr, xi)


def ifftn_mm(x):
    """jnp.fft.ifftn equivalent on complex input (full 1/N scale)."""
    xr, xi = jnp.real(x), jnp.imag(x)
    n_total = 1
    for ax in range(x.ndim):
        n_total *= x.shape[ax]
        xr, xi = _ct_axis(xr, xi, ax, +1)
    scale = np.float32(1.0 / n_total)
    return jax.lax.complex(xr * scale, xi * scale)


# ---- axis-wise variants (the sharded slab/pencil engines do local
# per-axis FFTs around their collective transposes) ----

def fft_mm_axis(x, axis: int, inverse: bool = False):
    """jnp.fft.fft/ifft along one axis of a complex array."""
    xr, xi = jnp.real(x), jnp.imag(x)
    xr, xi = _ct_axis(xr, xi, axis, +1 if inverse else -1)
    if inverse:
        s = np.float32(1.0 / x.shape[axis])
        return jax.lax.complex(xr * s, xi * s)
    return jax.lax.complex(xr, xi)


def rfft_mm_axis(x, axis: int):
    """jnp.fft.rfft along one axis of a real array."""
    n = x.shape[axis]
    nh = n // 2 + 1
    if axis in (-1, x.ndim - 1):
        zr, zi = _ct_last(x, None, n, -1)
        return jax.lax.complex(zr[..., :nh], zi[..., :nh])
    xm = jnp.moveaxis(x, axis, -1)
    zr, zi = _ct_last(xm, None, n, -1)
    return jnp.moveaxis(jax.lax.complex(zr[..., :nh], zi[..., :nh]),
                        -1, axis)


def irfft_mm_axis(k, n: int, axis: int):
    """jnp.fft.irfft along one axis (hermitian input, real output)."""
    kr, ki = jnp.real(k), jnp.imag(k)
    last = axis in (-1, k.ndim - 1)
    if not last:
        kr = jnp.moveaxis(kr, axis, -1)
        ki = jnp.moveaxis(ki, axis, -1)
    fr, fi = _herm_extend_last(kr, ki, n)
    zr, _zi = _ct_last(fr, fi, n, +1)
    zr = zr * np.float32(1.0 / n)
    return zr if last else jnp.moveaxis(zr, -1, axis)
