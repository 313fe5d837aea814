"""Fourier-space transfer functions (reference: libfastpm/transfer.c).

Every op is a pure function delta_k -> delta_k on the hermitian-compressed
complex array, built from the PM's 1D per-dimension tables by broadcasting.
They are jittable and fuse into surrounding computation under jit.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .mesh import PM

__all__ = [
    "apply_smoothing", "apply_lowpass", "apply_decic", "apply_diff",
    "apply_laplace", "apply_pot", "apply_grad", "apply_any",
    "apply_c2r_weight", "apply_normalize", "set_mode", "get_mode",
]


def _sinc_np(x):
    x = np.asarray(x, dtype=np.float64)
    small = np.abs(x) < 1e-5
    xs = np.where(small, 1.0, x)
    return np.where(small, 1.0 - x * x / 6.0 + x ** 4 / 120.0, np.sin(xs) / xs)


def apply_smoothing(pm: PM, dk, sml: float):
    """Gaussian smoothing exp(-kk sml^2 / 2), separable (transfer.c:7-40)."""
    out = dk
    for d in range(3):
        kk = pm.table("kk", d)
        kern = np.exp(-0.5 * kk * sml * sml)
        shape = [1, 1, 1]
        shape[d] = len(kern)
        out = out * jnp.asarray(kern.reshape(shape), dtype=pm.dtype)
    return out


def apply_lowpass(pm: PM, dk, kth: float):
    """Sharp k-space lowpass at |k| = kth (transfer.c:42-65)."""
    kk = sum(pm.broadcast_table("kk", d) for d in range(3))
    return dk * (kk < kth * kth).astype(pm.dtype)


def apply_decic(pm: PM, dk):
    """Divide by the CIC window squared: per-axis 1/sinc^2(w/2)
    (transfer.c:77-113)."""
    out = dk
    for d in range(3):
        k = pm.table("k", d)
        w = k * pm.BoxSize[d] / pm.Nmesh[d]
        kern = 1.0 / _sinc_np(0.5 * w) ** 2
        shape = [1, 1, 1]
        shape[d] = len(kern)
        out = out * jnp.asarray(kern.reshape(shape), dtype=pm.dtype)
    return out


def apply_diff(pm: PM, dk, dir: int, order: int, zero_nyquist: bool = True):
    """i k[dir] (order 0) or i k_finite[dir] (order 1, the 4-point
    super-Lanczos kernel). Self-conjugate (Nyquist) modes are zeroed so the
    result stays the transform of a real field (gravity.c:34-64).
    """
    name = ["k", "k_finite"][order]
    kd = pm.broadcast_table(name, dir)
    # build i*k on device (lax.complex): a host complex constant would
    # need a complex64 upload, which the axon TPU tunnel rejects
    ik = jax.lax.complex(jnp.zeros_like(kd), kd).astype(pm.cdtype)
    out = dk * ik
    if zero_nyquist:
        # out * (1 - m0 m1 m2): the self-conjugate mask is an outer
        # product of three 1D conditions, so zeroing is expressible
        # with tiny broadcast constants (a materialized 3D mask would
        # inline 134 MB into the compiled program at 512^3)
        m0, m1, m2 = (jnp.asarray(m.astype(np.float32))
                      for m in pm.nyquist_masks_1d)
        out = out * (1.0 - m0[:, None, None] * m1[None, :, None]
                     * m2[None, None, :])
    return out


def apply_laplace(pm: PM, dk, order: int):
    """Inverse Laplacian 1/kk with finite-difference order 0/1/2
    (transfer.c:153-186); the zero mode is zeroed."""
    name = ["kk", "kk_finite", "kk_finite2"][order]
    kk = sum(pm.broadcast_table(name, d) for d in range(3))
    inv = jnp.where(kk != 0, 1.0 / jnp.where(kk != 0, kk, 1.0), 0.0)
    return dk * inv.astype(pm.dtype)


def apply_pot(pm: PM, dk, order: int):
    """-1/kk: Poisson potential from overdensity (gravity.c:13-18)."""
    return -apply_laplace(pm, dk, order)


def apply_grad(pm: PM, dk, dir: int, order: int):
    """Gradient of a potential field: i k (order per kernel type)
    (gravity.c:20-64)."""
    return apply_diff(pm, dk, dir, order, zero_nyquist=True)


def apply_any(pm: PM, dk, fkfunc, host_tables: bool = False):
    """Multiply by a scalar function of |k| (transfer.c:188-210).

    By default |k| is built ON DEVICE from the 1D broadcast tables and
    fkfunc is traced (ufuncs only) -- a host-evaluated 3D kernel would
    inline half a gigabyte of constants into the program at 512^3.
    host_tables=True evaluates fkfunc on the host numpy grid instead
    (for functions like np.interp that cannot trace); use only on
    eager, small-mesh paths."""
    if host_tables:
        kk = sum(np.reshape(pm.table("kk", d),
                            [-1 if i == d else 1 for i in range(3)])
                 for d in range(3))
        k = np.sqrt(kk)
        kern = np.asarray(fkfunc(k), dtype=np.float64)
        return dk * jnp.asarray(kern, dtype=pm.dtype)
    kk = sum(pm.broadcast_table("kk", d) for d in range(3))
    k = jnp.sqrt(kk)
    return dk * jnp.asarray(fkfunc(k), dtype=pm.dtype)


def apply_fk_interp(pm: PM, dk, logk, vals):
    """Multiply by fac(|k|) = 1 + interp(log|k|; logk, vals), the
    jittable form of the neutrino linear-response transfer
    1 + f_nu delta_nu/delta_cdm (lra_neutrinos, gravity.c:431-455,
    494-522): (logk, vals) are 1D DEVICE arrays fed as dynamic
    arguments, so the program compiles once and the per-step table
    rides in as data. The DC mode keeps fac = 1 (matching the host
    nufac's kq <= 0 guard); out-of-range |k| clamps to the table edges
    (jnp.interp semantics == the host np.interp + clip)."""
    kk = sum(pm.broadcast_table("kk", d) for d in range(3))
    k = jnp.sqrt(kk)
    lq = jnp.log(jnp.where(k > 0, k, 1.0))
    fac = 1.0 + jnp.interp(lq, logk, vals)
    fac = jnp.where(kk > 0, fac, 1.0)
    return dk * fac.astype(pm.dtype)


def apply_c2r_weight(pm: PM, dk):
    """Weight each mode by its hermitian multiplicity (transfer.c:250-277)."""
    return dk * pm.hermitian_weights


def apply_normalize(pm: PM, dk):
    """Divide by the DC mode (transfer.c:222-248)."""
    dc = dk[0, 0, 0].real
    return dk / dc


def _conj_index(pm: PM, mode):
    return tuple((pm.Nmesh[d] - mode[d]) % pm.Nmesh[d] for d in range(3))


def set_mode(pm: PM, dk, mode, value: float, method: str = "override"):
    """Set or add to a single mode (and its hermitian conjugate)
    (transfer.c:285-337). mode = (ix, iy, iz, ri) with ri 0=real 1=imag."""
    ix, iy, iz, ri = [int(m) for m in mode]
    conj = _conj_index(pm, (ix, iy, iz))
    self_conj = conj == (ix, iy, iz)
    if self_conj and ri == 1:
        # purely real mode; cannot set imaginary part
        method = "override"
        value = 0.0

    def apply_at(dk, idx, val):
        i, j, l = idx
        if l > pm.Nmesh[2] // 2:
            # lives on the conjugate side of the compressed axis;
            # handled via its conjugate partner
            return dk, False
        cur = dk[i, j, l]
        # assemble on device with lax.complex: eager complex scalar
        # constants would need a complex upload (axon rejects those)
        cre, cim = jnp.real(cur), jnp.imag(cur)
        v = jnp.asarray(val, dtype=pm.dtype)
        if ri == 0:
            nre = v if method == "override" else cre + v
            nim = cim
        else:
            nre = cre
            nim = v if method == "override" else cim + v
        new = jax.lax.complex(nre, nim).astype(pm.cdtype)
        return dk.at[i, j, l].set(new), True

    dk, _ = apply_at(dk, (ix, iy, iz), value)
    if not self_conj:
        cval = value * (1 if ri == 0 else -1)
        dk, _ = apply_at(dk, conj, cval)
    return dk


def get_mode(pm: PM, dk, mode) -> float:
    ix, iy, iz, ri = [int(m) for m in mode]
    if iz > pm.Nmesh[2] // 2:
        ix, iy, iz = _conj_index(pm, (ix, iy, iz))
        v = complex(dk[ix, iy, iz])
        return float(v.real if ri == 0 else -v.imag)
    v = complex(dk[ix, iy, iz])
    return float(v.real if ri == 0 else v.imag)
