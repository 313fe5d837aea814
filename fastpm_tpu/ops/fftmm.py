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
    """FASTPM_TPU_FFT_PREC: 'high' (3-pass bf16 split, default) or
    'highest' (6-pass f32 emulation). Chip-measured at 512^3: both
    land at 6.5e-7 max rel err vs the XLA FFT (the f32 input rounding
    dominates), and high is ~6% faster on the r2c (BENCH_NOTES r4).
    Read per call so bench variants can flip it between compiles."""
    import os
    name = os.environ.get("FASTPM_TPU_FFT_PREC", "high").upper()
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


def wide_factorization(N: int, n1_target: int = 128):
    """N = N1*N2 with N1 the largest divisor <= n1_target: the stage-1
    contraction fills the MXU depth (128 rows) and stage 2 degenerates
    to a cheap skinny matmul. The sqrt split contracts over ~sqrt(N)
    (16-32 at PM meshes) -- 1/8..1/4 of the MXU depth -- which is why
    the einsum stages measured dispatch/layout-bound (VERDICT r3)."""
    best = None
    for n1 in range(2, min(N, n1_target) + 1):
        if N % n1 == 0:
            best = n1
    if best is None or best < 2 or N // best > 512:
        return None
    return best, N // best


def _fac(N: int):
    """The active CT split policy (FASTPM_TPU_FFT_FAC: sqrt | wide)."""
    import os
    mode = os.environ.get("FASTPM_TPU_FFT_FAC", "sqrt")
    if mode == "wide":
        return wide_factorization(N) or good_factorization(N)
    return good_factorization(N)


@functools.lru_cache(maxsize=64)
def _dft_tables(N: int, sign: int, fac=None):
    """numpy (cached) W1, T, W2 complex64 tables for one CT split."""
    if fac is None:
        fac = _fac(N)
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
    # resolve the split policy HERE so the lru cache keys on the actual
    # factorization (env flips between compiles must not hit stale tabs)
    tabs = _dft_tables(N, sign, _fac(N))
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


def _direct() -> bool:
    """FASTPM_TPU_FFT_DIRECT (default ON): do the hermitian (last)
    axis as ONE full-depth real-matrix contraction pair instead of the
    CT split + hermitian extension. ~5x the FLOPs of the CT split but
    a 257+-deep MXU contraction (vs 16-32), no twiddle, no
    intermediate materialization, and the c2r direction skips building
    the full-nz complex field entirely. Chip-measured at 512^3: c2r
    86.7 (XLA) / 80.2 (CT) -> 58.5 ms (BENCH_NOTES r4)."""
    import os
    return os.environ.get("FASTPM_TPU_FFT_DIRECT", "1") == "1"


@functools.lru_cache(maxsize=32)
def _r2c_direct_tables(N: int):
    """(N, Nh) cos / -sin f32 matrices: real signal -> hermitian half."""
    n = np.arange(N, dtype=np.int64)[:, None]
    k = np.arange(N // 2 + 1, dtype=np.int64)[None, :]
    ang = 2.0 * np.pi * ((n * k) % N) / N
    return (np.cos(ang).astype(np.float32),
            (-np.sin(ang)).astype(np.float32))


@functools.lru_cache(maxsize=32)
def _c2r_direct_tables(N: int, nout: int | None = None):
    """(Nh, nout) weighted inverse matrices: hermitian half -> real
    signal (the conjugate tail's contribution rides the weight-2 rows).
    nout > N appends wrapped output columns (column n == column n % N
    by the (k*n) % N periodicity) -- the CIC readout's periodic wrap
    face comes out of the same contraction for free."""
    if nout is None:
        nout = N
    k = np.arange(N // 2 + 1, dtype=np.int64)[:, None]
    n = np.arange(nout, dtype=np.int64)[None, :]
    ang = 2.0 * np.pi * ((k * n) % N) / N
    w = np.where((k == 0) | (k == N // 2), 1.0, 2.0)
    return ((w * np.cos(ang)).astype(np.float32),
            (-(w * np.sin(ang))).astype(np.float32))


def _r2c_last_direct(x):
    """Forward DFT of the last (real) axis, hermitian-half output."""
    N = x.shape[-1]
    Cf, Sf = _r2c_direct_tables(N)
    p = _prec()
    zr = jnp.einsum("...n,nk->...k", x, jnp.asarray(Cf), precision=p)
    zi = jnp.einsum("...n,nk->...k", x, jnp.asarray(Sf), precision=p)
    return zr, zi


def _c2r_last_direct(gr, gi, N: int, nout: int | None = None):
    """Inverse DFT of the last (hermitian-half) axis, real output,
    UNSCALED (caller applies 1/N factors)."""
    Ci, Si = _c2r_direct_tables(N, nout)
    p = _prec()
    return (jnp.einsum("...k,kn->...n", gr, jnp.asarray(Ci), precision=p)
            + jnp.einsum("...k,kn->...n", gi, jnp.asarray(Si),
                         precision=p))


def _axis_mode() -> str:
    """FASTPM_TPU_FFT_AXIS: 'move' (default: moveaxis to last, CT
    there, moveaxis back) or 'sub' (contract non-last axes in place
    via einsum subscripts). MEASURED NEGATIVE on chip: sub 30.85M vs
    move 31.46M p-steps/s full-step -- XLA lays out the explicit
    transposes better than the subscripted 4D contractions (the
    'layout-bound' einsum cost is inside dot_general, not the
    moveaxis). Kept as a variant for re-measurement on future
    compilers."""
    import os
    return os.environ.get("FASTPM_TPU_FFT_AXIS", "move")


def _ct_axis_sub(xr, xi, axis: int, sign: int):
    """CT DFT over a NON-last axis without materializing transposes:
    the axis reshapes (free, row-major) to (N1, N2); stage 1 contracts
    N1 and stage 2 contracts N2 via subscripted einsums whose outputs
    land with (k2, k1) adjacent at the original axis position, so the
    final k = k1 + N1*k2 merge is again a free reshape."""
    N = xr.shape[axis]
    tabs = _dft_tables(N, sign, _fac(N))
    assert tabs is not None
    N1, N2, W1, T, W2 = tabs
    W1r, W1i = jnp.asarray(W1.real), jnp.asarray(W1.imag)
    W2r, W2i = jnp.asarray(W2.real), jnp.asarray(W2.imag)
    tshape = (1,) * axis + (N1, N2) + (1,) * (xr.ndim - axis - 1)
    Tr = jnp.asarray(T.real).reshape(tshape)
    Ti = jnp.asarray(T.imag).reshape(tshape)

    dims = "abcdefgh"[:xr.ndim + 1]
    pre, post = dims[:axis], dims[axis + 2:xr.ndim + 1]
    a, b = dims[axis], dims[axis + 1]
    sub1 = f"{pre}{a}{b}{post},{a}k->{pre}k{b}{post}"
    sub2 = f"{pre}k{b}{post},{b}j->{pre}jk{post}"
    shape = xr.shape[:axis] + (N1, N2) + xr.shape[axis + 1:]
    xr = xr.reshape(shape)
    xi = xi.reshape(shape) if xi is not None else None
    yr, yi = _cdot(xr, xi, W1r, W1i, sub1)
    yr, yi = _cmul(yr, yi, Tr, Ti)
    zr, zi = _cdot(yr, yi, W2r, W2i, sub2)
    oshape = zr.shape[:axis] + (N,) + zr.shape[axis + 2:]
    return zr.reshape(oshape), zi.reshape(oshape)


def _ct_axis(xr, xi, axis: int, sign: int):
    N = xr.shape[axis]
    if axis in (-1, xr.ndim - 1):
        return _ct_last(xr, xi, N, sign)
    if _axis_mode() == "sub":
        return _ct_axis_sub(xr, xi, axis, sign)
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
    if _direct():
        zr, zi = _r2c_last_direct(x)
    else:
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
    if _direct():
        zr = _c2r_last_direct(kr, ki, nz)
    else:
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


def grad3_c2r_mm(pk, s, tx, ty, tz, zext: bool = False):
    """The three gradient returns of the force step in ONE fused
    inverse: grad_d = irfftn(i * t_d * pk) for d = x, y, z, where t_d
    is the 1D diff table along axis d (k or k_finite; transfer.c:116,
    gravity.c:374-426 pays one full c2r per component instead).

    Structure (the big wins over 3 independent irfftn / the packed-pair
    ifftn):
      * the z (hermitian) stage is the DIRECT half->real contraction:
        no hermitian extension, no full-nz complex field, so every x/y
        stage works on nz/2+1 planes instead of nz;
      * grad_y and grad_z SHARE the axis-0 inverse U = X(pk) (the diff
        tables along y/z commute with the x-stage);
      * the i*t_d multiplies are elementwise 1D broadcasts that XLA
        fuses into the adjacent einsum reads -- the force step's
        separate transfer passes disappear.

    pk: (nx, ny, nz//2+1) complex64; s = (nx, ny, nz); t* 1D float
    tables of length nx, ny, nz//2+1. Returns (gx, gy, gz) real f32,
    scaled like jnp.fft.irfftn (1/N).

    zext: emit nz+1 output columns on the hermitian axis -- the extra
    column is the wrapped plane z=0 (free in the direct synthesis
    matrix), which the CIC readout's pad_canvas otherwise rebuilds
    with a full-mesh concatenate."""
    nx, ny, nz = s
    nout = nz + 1 if zext else None   # grad3's z-stage is always direct
    pr, pi = jnp.real(pk), jnp.imag(pk)
    txc = jnp.asarray(tx, jnp.float32).reshape(nx, 1, 1)
    tyc = jnp.asarray(ty, jnp.float32).reshape(1, ny, 1)
    tzc = jnp.asarray(tz, jnp.float32).reshape(1, 1, nz // 2 + 1)
    scale = np.float32(1.0 / (nx * ny * nz))

    # shared axis-0 inverse of the potential spectrum
    U_r, U_i = _ct_axis(pr, pi, 0, +1)
    # grad_x: i*tx folds into the x-stage input (fused elementwise)
    Ux_r, Ux_i = _ct_axis(-txc * pi, txc * pr, 0, +1)

    # axis-1 inverses
    Ax_r, Ax_i = _ct_axis(Ux_r, Ux_i, 1, +1)
    Ay_r, Ay_i = _ct_axis(-tyc * U_i, tyc * U_r, 1, +1)
    Az_r, Az_i = _ct_axis(U_r, U_i, 1, +1)

    # hermitian z-stage, direct half->real (i*tz fused for grad_z)
    gx = _c2r_last_direct(Ax_r, Ax_i, nz, nout) * scale
    gy = _c2r_last_direct(Ay_r, Ay_i, nz, nout) * scale
    gz = _c2r_last_direct(-tzc * Az_i, tzc * Az_r, nz, nout) * scale
    return gx, gy, gz


def _grad3_mode() -> str:
    """FASTPM_TPU_GRAD3: 'direct' (default) runs the fused 3-gradient
    inverse as dense per-axis synthesis matmuls (grad3_c2r_direct);
    'direct2' merges the real/imag parts into the contraction (ONE
    GEMM per complex stage, ~1/3 the operand traffic; measurement
    pending); 'ct' keeps the Cooley-Tukey stage pipeline."""
    import os
    return os.environ.get("FASTPM_TPU_GRAD3", "direct")


def _idft_direct_tables(N: int, nout: int, t=None):
    """(N, nout) cos/sin inverse-DFT synthesis matrices, optionally
    with an i*t[k] diff-table fold (t indexed by the frequency row):
    B'[k, n] = i*t[k] * exp(+2pi i k n / N). nout > N appends wrapped
    output columns (periodic in (k*n) % N). numpy f32."""
    k = np.arange(N, dtype=np.int64)[:, None]
    n = np.arange(nout, dtype=np.int64)[None, :]
    ang = 2.0 * np.pi * ((k * n) % N) / N
    Br, Bi = np.cos(ang), np.sin(ang)
    if t is not None:
        tc = np.asarray(t, np.float64)[:, None]
        Br, Bi = -tc * Bi, tc * Br
    return Br.astype(np.float32), Bi.astype(np.float32)


def _c2r_grad_tables(N: int, nout: int, t=None):
    """(N//2+1, nout) hermitian-half -> real synthesis matrices (out =
    gr @ C + gi @ S), optionally with the i*t[k] fold: for g' = i t g,
    out = gr @ (t*S) + gi @ (-t*C)."""
    k = np.arange(N // 2 + 1, dtype=np.int64)[:, None]
    n = np.arange(nout, dtype=np.int64)[None, :]
    ang = 2.0 * np.pi * ((k * n) % N) / N
    w = np.where((k == 0) | (k == N // 2), 1.0, 2.0)
    C = w * np.cos(ang)
    S = -w * np.sin(ang)
    if t is not None:
        tc = np.asarray(t, np.float64)[:, None]
        C, S = tc * S, -tc * C
    return C.astype(np.float32), S.astype(np.float32)


def grad3_c2r_direct(pk, s, tx, ty, tz, zext: bool = False,
                     wrap: bool = False):
    """grad3_c2r_mm with EVERY axis as a dense synthesis matmul.

    The adopted z-direct stage proved the pattern on chip (c2r 86.7 ->
    58.5 ms despite ~5x the CT split's FLOPs): at PM sizes the CT
    stages are dispatch/layout-bound, while a full-depth (N x N+1)
    matrix contraction is one natural-layout MXU dot. This pipeline is
    26 dot_generals and NOTHING else -- no twiddles, no hermitian
    extension, no transposes (each einsum's output order is
    dot_general's natural (lhs-free, rhs-free), so the axis rotation
    x,y,z -> y,z,x -> z,x,y -> x,y,z closes for free), and the i*t_d
    diff tables fold into the matrices.

    wrap=True returns (nx+1, ny+1, nz+1) fields whose last plane along
    EVERY axis is the wrapped 0-plane (free wrapped output columns in
    the synthesis matrices) -- exactly the CIC readout's pad_canvas
    layout, deleting its concatenate/update-slice passes. zext=True
    extends z only (parity with grad3_c2r_mm)."""
    nx, ny, nz = s
    xout = nx + 1 if wrap else nx
    yout = ny + 1 if wrap else ny
    zout = nz + 1 if (wrap or zext) else nz
    p = _prec()
    scale = 1.0 / (nx * ny * nz)

    def dot(a, m, sub):
        return jnp.einsum(sub, a, jnp.asarray(m), precision=p)

    def cstage(ar, ai, mr, mi, sub):
        """Complex contraction (4 real dots, natural output order)."""
        return (dot(ar, mr, sub) - dot(ai, mi, sub),
                dot(ar, mi, sub) + dot(ai, mr, sub))

    pr, pi = jnp.real(pk), jnp.imag(pk)

    # X stage (contract axis 0; outputs land (y, z, x)); the 1/N scale
    # rides the x matrices (constants, free)
    Axr, Axi = _idft_direct_tables(nx, xout)
    Axr, Axi = Axr * np.float32(scale), Axi * np.float32(scale)
    Bxr, Bxi = _idft_direct_tables(nx, xout, tx)
    Bxr, Bxi = Bxr * np.float32(scale), Bxi * np.float32(scale)
    U_r, U_i = cstage(pr, pi, Axr, Axi, "xyz,xw->yzw")     # shared
    Ux_r, Ux_i = cstage(pr, pi, Bxr, Bxi, "xyz,xw->yzw")   # i*tx fold

    # Y stage (contract axis 0 of (y, z, x); outputs land (z, x, y))
    Ayr, Ayi = _idft_direct_tables(ny, yout)
    Byr, Byi = _idft_direct_tables(ny, yout, ty)
    Ax_r, Ax_i = cstage(Ux_r, Ux_i, Ayr, Ayi, "yzw,yu->zwu")
    Ay_r, Ay_i = cstage(U_r, U_i, Byr, Byi, "yzw,yu->zwu")  # i*ty fold
    Az_r, Az_i = cstage(U_r, U_i, Ayr, Ayi, "yzw,yu->zwu")

    # Z stage (hermitian half -> real; outputs land (x, y, z))
    Czr, Czi = _c2r_grad_tables(nz, zout)
    Gzr, Gzi = _c2r_grad_tables(nz, zout, tz)               # i*tz fold
    gx = dot(Ax_r, Czr, "zwu,zn->wun") + dot(Ax_i, Czi, "zwu,zn->wun")
    gy = dot(Ay_r, Czr, "zwu,zn->wun") + dot(Ay_i, Czi, "zwu,zn->wun")
    gz = dot(Az_r, Gzr, "zwu,zn->wun") + dot(Az_i, Gzi, "zwu,zn->wun")
    return gx, gy, gz


def _blk2(Mr, Mi):
    """(2, K, 2, N) merged-component block table for ONE-GEMM complex
    contractions: out[s, n] = sum_{r,k} A[r, k] * T[r, k, s, n] with
    r, s = 0 real / 1 imag reproduces (Ar + iAi) @ (Mr + iMi):
    T[0,:,0]=Mr, T[1,:,0]=-Mi, T[0,:,1]=Mi, T[1,:,1]=Mr."""
    return np.stack([np.stack([Mr, Mi], axis=1),
                     np.stack([-Mi, Mr], axis=1)], axis=0)


def grad3_c2r_direct2(pk, s, tx, ty, tz, zext: bool = False,
                      wrap: bool = False):
    """grad3_c2r_direct with the real/imag components MERGED into the
    contraction: each complex stage is ONE dot_general over (component,
    axis) against a constant 2x2 block table (_blk2) instead of 4 real
    dots. Same FLOPs and identical math (the blocks are the same
    matrices), but the stage input is read once instead of four times
    and no separate subtract/add passes materialize -- the 26-dot
    pipeline becomes 6 GEMMs. Shared sub-pipelines ride wider tables:
    the X stage emits [U, Ux] (4 components) from one GEMM, the U-side
    Y stage emits [Ay(i*ty), Az] likewise."""
    nx, ny, nz = s
    xout = nx + 1 if wrap else nx
    yout = ny + 1 if wrap else ny
    zout = nz + 1 if (wrap or zext) else nz
    p = _prec()
    scale = np.float32(1.0 / (nx * ny * nz))

    def ein(sub, a, t):
        return jnp.einsum(sub, a, jnp.asarray(t, jnp.float32),
                          precision=p)

    # X stage: one GEMM -> (y, z, [U_r, U_i, Ux_r, Ux_i], w); 1/N scale
    # rides the constant tables
    Axr, Axi = _idft_direct_tables(nx, xout)
    Bxr, Bxi = _idft_direct_tables(nx, xout, tx)
    TX = np.concatenate([_blk2(Axr, Axi), _blk2(Bxr, Bxi)],
                        axis=2) * scale
    A = jnp.stack([jnp.real(pk), jnp.imag(pk)])
    O1 = ein("rxyz,rxsw->yzsw", A, TX)
    U, Ux = O1[:, :, 0:2, :], O1[:, :, 2:4, :]

    # Y stage: grad_x continues from Ux; [Ay (i*ty fold), Az] share one
    # GEMM from U
    Ayr, Ayi = _idft_direct_tables(ny, yout)
    Byr, Byi = _idft_direct_tables(ny, yout, ty)
    Ax = ein("yzsw,sycu->zwcu", Ux, _blk2(Ayr, Ayi))
    O2 = ein("yzsw,sycu->zwcu", U,
             np.concatenate([_blk2(Byr, Byi), _blk2(Ayr, Ayi)], axis=2))
    Ay, Az = O2[:, :, 0:2, :], O2[:, :, 2:4, :]

    # Z stage: hermitian half -> real (component contracts with z)
    Czr, Czi = _c2r_grad_tables(nz, zout)
    Gzr, Gzi = _c2r_grad_tables(nz, zout, tz)
    gx = ein("zwcu,czn->wun", Ax, np.stack([Czr, Czi]))
    gy = ein("zwcu,czn->wun", Ay, np.stack([Czr, Czi]))
    gz = ein("zwcu,czn->wun", Az, np.stack([Gzr, Gzi]))
    return gx, gy, gz


@functools.lru_cache(maxsize=32)
def _dft_full_tables(N: int, sign: int):
    """(N, N) full complex DFT matrix as (real, imag) f32 numpy."""
    n = np.arange(N, dtype=np.int64)[:, None]
    k = np.arange(N, dtype=np.int64)[None, :]
    ang = 2.0 * np.pi * ((n * k) % N) / N
    return (np.cos(ang).astype(np.float32),
            (sign * np.sin(ang)).astype(np.float32))


def rfftn_direct2(x):
    """Forward rfftn (unnormalized, = jnp.fft.rfftn) with EVERY axis as
    a dense merged-component matmul: hermitian z-stage first (halves
    all later planes), then full complex DFTs over y and x as one GEMM
    each (see grad3_c2r_direct2). 3 GEMMs total."""
    nx, ny, nz = x.shape
    p = _prec()
    Cf, Sf = _r2c_direct_tables(nz)
    O1 = jnp.einsum("xyn,nsk->xysk", x,
                    jnp.asarray(np.stack([Cf, Sf], axis=1)),
                    precision=p)                    # (nx, ny, 2, nzh)
    Fyr, Fyi = _dft_full_tables(ny, -1)
    O2 = jnp.einsum("xysk,sycu->xkcu", O1,
                    jnp.asarray(_blk2(Fyr, Fyi)),
                    precision=p)                    # (nx, nzh, 2, ky)
    Fxr, Fxi = _dft_full_tables(nx, -1)
    O3 = jnp.einsum("xkcu,cxdw->dwuk", O2,
                    jnp.asarray(_blk2(Fxr, Fxi)),
                    precision=p)                    # (2, kx, ky, kz)
    return jax.lax.complex(O3[0], O3[1])


def _fwd_mode() -> str:
    """FASTPM_TPU_R2C: 'mm' (default: direct hermitian z-stage + CT
    splits over y/x) or 'direct2' (rfftn_direct2: every axis dense,
    merged components; measurement pending)."""
    import os
    return os.environ.get("FASTPM_TPU_R2C", "mm")


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
    last = axis in (-1, x.ndim - 1)
    xm = x if last else jnp.moveaxis(x, axis, -1)
    if _direct():
        zr, zi = _r2c_last_direct(xm)
    else:
        zr, zi = _ct_last(xm, None, n, -1)
        zr, zi = zr[..., :nh], zi[..., :nh]
    out = jax.lax.complex(zr, zi)
    return out if last else jnp.moveaxis(out, -1, axis)


def irfft_mm_axis(k, n: int, axis: int):
    """jnp.fft.irfft along one axis (hermitian input, real output)."""
    kr, ki = jnp.real(k), jnp.imag(k)
    last = axis in (-1, k.ndim - 1)
    if not last:
        kr = jnp.moveaxis(kr, axis, -1)
        ki = jnp.moveaxis(ki, axis, -1)
    if _direct():
        zr = _c2r_last_direct(kr, ki, n)
    else:
        fr, fi = _herm_extend_last(kr, ki, n)
        zr, _zi = _ct_last(fr, fi, n, +1)
    zr = zr * np.float32(1.0 / n)
    return zr if last else jnp.moveaxis(zr, -1, axis)
