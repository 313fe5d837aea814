"""Particle <-> mesh painting and readout (reference: libfastpm/painter.c,
painter-cic.c).

JAX formulation: paint is a scatter-add of the support^3 kernel-weighted
corner contributions, readout is the matching gather. Both are jittable and
differentiable. There are no ghost particles: the mesh is a single global
(or device-sharded) array and periodic wrapping is index arithmetic.

Kernel types match the reference:
- cic / linear: 1 - |x|            (painter.c:17-29; CIC is support=2)
- quad (TSC-like):                  painter.c:31-61
- lanczos: sinc(x) sinc(x/h)        painter.c:84-125
The generic path normalizes kernel weights per-axis to conserve mass
(painter.c:195-213) and supports gradient readout along one axis
(diffdir, painter.c:178-213).
"""

from __future__ import annotations

from functools import partial
import itertools

import numpy as np
import jax
import jax.numpy as jnp

from .mesh import PM

__all__ = ["Painter"]


def _linear_kernel(x, invh):
    return 1.0 - jnp.abs(x * invh)


def _linear_diff(x, invh):
    return jnp.where(x < 0, invh, -invh)


def _quad_kernel(x, invh):
    x = jnp.abs(x) * invh
    return jnp.where(x <= 0.5, 0.75 - x * x, 0.5 * (1.5 - x) ** 2)


def _quad_diff(x, invh):
    factor = jnp.where(x < 0, -invh, invh)
    ax = jnp.abs(x) * invh
    return factor * jnp.where(ax < 0.5, -2 * ax, -(1.5 - ax))


def _sinc(x):
    x = x * 3.1415927
    small = jnp.abs(x) < 1e-5
    xs = jnp.where(small, 1.0, x)
    return jnp.where(small, 1.0 - x * x / 6.0 + x ** 4 / 120.0,
                     jnp.sin(xs) / xs)


def _dsinc(x):
    x = x * 3.1415927
    r = 3.1415927
    small = jnp.abs(x) < 1e-5
    xs = jnp.where(small, 1.0, x)
    series = -x / 3 + x ** 3 / 30 - x ** 5 / 840 + x ** 7 / 45360
    main = jnp.cos(xs) / xs - jnp.sin(xs) / (xs * xs)
    return r * jnp.where(small, series, main)


def _lanczos_kernel(x, invh):
    return _sinc(x) * _sinc(x * invh)


def _lanczos_diff(x, invh):
    return _sinc(x) * _dsinc(x * invh) * invh + _dsinc(x) * _sinc(x * invh)


_KERNELS = {
    "cic": (_linear_kernel, _linear_diff, 2),
    "linear": (_linear_kernel, _linear_diff, 2),
    "quad": (_quad_kernel, _quad_diff, 3),
    "lanczos": (_lanczos_kernel, _lanczos_diff, None),
}


class Painter:
    """Mass deposit / field readout with a separable kernel of given
    support. `diffdir >= 0` replaces the kernel along that axis with its
    derivative (gradient readout)."""

    def __init__(self, pm: PM, type: str = "cic", support: int = 2,
                 diffdir: int = -1):
        if type not in _KERNELS:
            raise ValueError(f"unknown painter type {type!r}")
        kernel, diff, fixed_support = _KERNELS[type]
        if fixed_support is not None:
            support = fixed_support
        if support > 32:
            raise ValueError("support must be <= 32 (painter.c:221)")
        self.pm = pm
        self.type = type
        self.kernel = kernel
        self.diff = diff
        self.support = int(support)
        self.invh = 1.0 / (0.5 * self.support)
        self.left = (self.support - 1) // 2
        self.shift = 0.0 if self.support % 2 == 0 else 0.5
        self.diffdir = diffdir
        # static corner offsets (support^3, 3)
        self.offsets = np.array(
            list(itertools.product(range(self.support), repeat=3)),
            dtype=np.int32)

    def with_diffdir(self, diffdir: int) -> "Painter":
        return Painter(self.pm, self.type, self.support, diffdir)

    # ---- kernel evaluation ----

    def _corners_and_weights(self, pos):
        """pos (N,3) -> (ipos (N,3) int32 base cell, weights (N, s, 3)).

        weights[:, i, d] is the normalized per-axis kernel value for corner
        offset i along axis d (painter.c:_fill_k).
        """
        pm = self.pm
        inv_cell = jnp.asarray(pm.InvCellSize, dtype=pos.dtype)
        gpos = pos * inv_cell
        ipos = jnp.floor(gpos + self.shift).astype(jnp.int32) - self.left
        dx = gpos - ipos  # (N, 3)
        i = jnp.arange(self.support, dtype=pos.dtype)  # (s,)
        x = dx[:, None, :] - i[None, :, None]          # (N, s, 3)
        k = self.kernel(x, self.invh)
        ksum = jnp.sum(k, axis=1, keepdims=True)
        if self.diffdir >= 0:
            d = self.diffdir
            kd = self.diff(x[..., d], self.invh) * pm.InvCellSize[d]
            k = k.at[..., d].set(kd)
        k = k / ksum
        return ipos, k

    def _flat_indices(self, ipos):
        """(N,3) base cells -> (N, s^3) flattened periodic mesh indices."""
        pm = self.pm
        n = jnp.asarray(pm.Nmesh, dtype=jnp.int32)
        # (N, s^3, 3)
        tgt = ipos[:, None, :] + jnp.asarray(self.offsets)[None, :, :]
        tgt = jnp.remainder(tgt, n)
        return ((tgt[..., 0] * pm.Nmesh[1] + tgt[..., 1]) * pm.Nmesh[2]
                + tgt[..., 2])

    def _corner_weights(self, k):
        """(N, s, 3) per-axis weights -> (N, s^3) product weights."""
        off = self.offsets  # (s^3, 3)
        w = (k[:, off[:, 0], 0] * k[:, off[:, 1], 1] * k[:, off[:, 2], 2])
        return w

    # ---- public API ----

    def paint(self, pos, mass=1.0, canvas=None):
        """Deposit mass (scalar or (N,)) at pos (N,3) into canvas
        (created zero if None). Returns the accumulated canvas."""
        pm = self.pm
        if canvas is None:
            canvas = jnp.zeros(pm.rshape, dtype=pm.dtype)
        ipos, k = self._corners_and_weights(pos)
        flat = self._flat_indices(ipos)        # (N, s^3)
        w = self._corner_weights(k)            # (N, s^3)
        if jnp.ndim(mass) == 0:
            w = w * mass
        else:
            w = w * mass[:, None]
        out = canvas.reshape(-1).at[flat.reshape(-1)].add(
            w.reshape(-1).astype(pm.dtype))
        return out.reshape(pm.rshape)

    def readout(self, canvas, pos):
        """Interpolate canvas at pos (N,3) -> (N,)."""
        ipos, k = self._corners_and_weights(pos)
        flat = self._flat_indices(ipos)
        w = self._corner_weights(k)
        vals = canvas.reshape(-1)[flat.reshape(-1)].reshape(flat.shape)
        return jnp.sum(vals * w, axis=1)
