"""Initial conditions: Gaussian white-noise field and its shaping
(reference: libfastpm/initialcondition.c, src/fastpm.c:prepare_deltak).

The IC pipeline produces the linear overdensity delta_k at the starting
scale factor:

  white noise (gadget/fast scheme, unit-variance modes)
  -> optional remove-variance ("fixed" ICs: amplitude 1, keep phase)
  -> optional set-mode overrides
  -> optional inversion
  -> induce correlation: multiply by sqrt(P(k)/V)
  -> rescale by D1(a0)/D1(a_input)
  -> force the DC mode to 1.0? (the reference sets delta_k[0]=1 so that
     rho = 1 + delta after c2r; we keep DC = 0 and add the mean where
     needed -- note the reference's modify sets mode (0,0,0) real to 1.)
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from .mesh import PM
from . import native, transfers
from .cosmology import Cosmology
from .powerspectrum import FuncK

__all__ = [
    "gaussian_white_noise", "remove_variance", "induce_correlation",
    "rescale_linear", "linear_field",
]


def gaussian_white_noise(pm: PM, seed: int, scheme: str = "gadget"):
    """Hermitian white noise with unit-variance modes.

    - "gadget": the N-GenIC quadrant-seed-table scheme
      (initialcondition.c:144-273) -- seed-stable across any mesh
      decomposition AND matches the reference sequence generator
      (ranlxd); computed host-side in native code.
    - "fast": per-rank real white noise, r2c (initialcondition.c:275-310).
    """
    if scheme == "gadget":
        wn = native.gadget_white_noise(pm.Nmesh, seed)
        from .mesh import put_complex
        return put_complex(wn.astype(np.complex64))
    elif scheme == "fast":
        # single-device == the reference's rank 0, whose seed jump is a
        # no-op (initialcondition.c:283-289)
        vals = native.ranlxd_uniform(seed, int(pm.Norm))
        # pairs of (phase, ampl) -> two gaussians per pair
        phase = vals[0::2] * 2 * math.pi
        ampl = vals[1::2]
        ampl = np.where(ampl == 0.0, 1.0, ampl)
        ampl = np.sqrt(-2 * np.log(ampl)) * math.sqrt(pm.Norm)
        g = np.empty(int(pm.Norm), dtype=np.float32)
        g[0::2] = (ampl * np.sin(phase)).astype(np.float32)
        g[1::2] = (ampl * np.cos(phase)).astype(np.float32)
        return pm.r2c(jnp.asarray(g.reshape(pm.rshape)))
    elif scheme == "slow":
        # full 3D scan with one global ranlxd stream: per cell draw
        # (phase, ampl) and keep only ampl*sin(phase)
        # (pmic_fill_gaussian_slow, initialcondition.c:312-352);
        # decomposition-independent by construction.
        vals = native.ranlxd_uniform(seed, 2 * int(pm.Norm))
        phase = vals[0::2] * 2 * math.pi
        ampl = vals[1::2]
        # the reference redraws on an exact 0.0 (probability ~N*2^-52);
        # a redraw would shift the stream, so treat it as fatal instead
        if (ampl == 0.0).any():
            raise RuntimeError("ranlxd produced an exact 0.0; the "
                               "reference's redraw loop is not emulated")
        g = (np.sqrt(-2 * np.log(ampl)) * math.sqrt(pm.Norm)
             * np.sin(phase)).astype(np.float32)
        return pm.r2c(jnp.asarray(g.reshape(pm.rshape)))
    raise ValueError(f"unknown white noise scheme {scheme!r}")


def remove_variance(dk):
    """Fix every mode's amplitude to 1, keeping its phase ("fixed" ICs,
    initialcondition.c:66-98)."""
    mag = jnp.abs(dk)
    # real-valued factor (a complex-zero constant would need a complex
    # upload in eager mode, rejected by the axon tunnel)
    return dk * jnp.where(mag == 0, 0.0, 1.0 / jnp.where(mag == 0, 1.0, mag))


def induce_correlation(pm: PM, dk, pk: FuncK):
    """Multiply white noise by sqrt(P(k)/V) (initialcondition.c:42-64)."""
    return transfers.apply_any(pm, dk, lambda k: jnp.sqrt(pk(k) / pm.Volume))


def rescale_linear(pm: PM, dk, c: Cosmology, aout: float,
                   linear_density_redshift: float = 0.0):
    """Evolve the linear field from its input redshift to aout by
    D1(aout)/D1(a_in) (src/fastpm.c:rescale_deltak)."""
    a_in = 1.0 / (linear_density_redshift + 1)
    fac = c.growth_info(aout).D1 / c.growth_info(a_in).D1
    return dk * jnp.asarray(fac, dtype=pm.dtype)


def linear_field(pm: PM, c: Cosmology, pk: FuncK, seed: int, aout: float,
                 scheme: str = "gadget",
                 remove_cosmic_variance: bool = False,
                 inverted: bool = False,
                 set_modes=None,
                 set_mode_method: str = "override",
                 linear_density_redshift: float = 0.0):
    """The full prepare_deltak pipeline (src/fastpm.c:414-591) from a
    random seed. Returns (delta_k at aout, white-noise variance)."""
    dk = gaussian_white_noise(pm, seed, scheme)
    if remove_cosmic_variance:
        dk = remove_variance(dk)
    if set_modes is not None:
        for mode in set_modes:
            dk = transfers.set_mode(pm, dk, mode[:4], mode[4], set_mode_method)
    if inverted:
        dk = -dk
    variance = pm.compute_variance(dk)
    # one jitted program for induce + rescale: eager dispatch is costly
    # over the tunneled device, and the FuncK evaluation traces onto
    # the device (the host has a single CPU core)
    import jax

    @jax.jit
    def _shape(d):
        d = induce_correlation(pm, d, pk)
        return rescale_linear(pm, d, c, aout, linear_density_redshift)

    dk = _shape(dk)
    return dk, variance
