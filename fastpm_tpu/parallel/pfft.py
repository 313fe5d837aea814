"""Distributed 3D real FFT over a 1D device mesh (slab decomposition).

TPU-native equivalent of the reference's PFFT/FFTW-MPI engine
(pmpfft.c:262-303): per-axis batched FFTs + one all_to_all transpose,
expressed inside shard_map so the collectives ride ICI explicitly.

Layouts (P = number of devices along the 'x' mesh axis):
- real space: global (Nx, Ny, Nz), sharded as x-slabs (Nx/P, Ny, Nz)
- k space:   global (Nx, Ny, Nz/2+1) in "transposed" y-sharded form:
  local shard (Nx, Ny/P, Nzh) -- the analog of the reference's
  transposed-out layout (pmpfft.c:198-202), which keeps all kx on every
  rank for cheap per-axis kernels.

All transfer kernels remain products of 1D tables; the only difference
from the single-device path is that the ky table is sliced per shard.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..mesh import PM

__all__ = ["SlabPM"]


class SlabPM:
    """PM engine sharded over a 1D mesh axis ('x').

    Wraps a host PM (geometry/tables) plus shard-local FFT/transfer
    methods intended to be called INSIDE shard_map over `mesh`.
    """

    def __init__(self, pm: PM, mesh: Mesh, axis: str = "x"):
        self.pm = pm
        self.mesh = mesh
        self.axis = axis
        self.nproc = mesh.shape[axis]
        n0, n1, n2 = pm.Nmesh
        if n0 % self.nproc or n1 % self.nproc:
            raise ValueError("Nmesh must divide the device mesh "
                             "(pm_unbalanced, solver.c:113-121)")
        self.rshard = (n0 // self.nproc, n1, n2)
        self.kshard = (n0, n1 // self.nproc, n2 // 2 + 1)

    # ---- shard-local FFTs (call inside shard_map) ----

    def r2c_local(self, x_slab):
        """x-slab (Nx/P, Ny, Nz) -> y-sharded k (Nx, Ny/P, Nzh),
        normalized by 1/Norm like pm_r2c."""
        pm = self.pm
        nproc = self.nproc
        k_yz = jnp.fft.rfftn(x_slab, axes=(1, 2))      # (nx_loc, Ny, Nzh)
        # transpose x <-> y: split axis 1 into P chunks, all_to_all
        k_t = jax.lax.all_to_all(k_yz, self.axis, split_axis=1,
                                 concat_axis=0, tiled=True)
        # now (Nx, Ny/P, Nzh); FFT along global x
        k_full = jnp.fft.fft(k_t, axis=0)
        return (k_full / pm.Norm).astype(pm.cdtype)

    def c2r_local(self, k_shard):
        """Inverse of r2c_local."""
        pm = self.pm
        k = k_shard * pm.Norm
        k = jnp.fft.ifft(k, axis=0)
        x_t = jax.lax.all_to_all(k, self.axis, split_axis=0,
                                 concat_axis=1, tiled=True)
        x = jnp.fft.irfftn(x_t, axes=(1, 2), s=(pm.Nmesh[1], pm.Nmesh[2]))
        return x.astype(pm.dtype)

    # ---- shard-local k tables ----

    def ktable_local(self, name: str, d: int):
        """1D table for dimension d in the y-sharded k layout: full for
        x (d=0) and z (d=2), the local slice for y (d=1)."""
        t = self.pm.table(name, d)
        if d != 1:
            return jnp.asarray(t, dtype=self.pm.dtype)
        nloc = self.pm.Nmesh[1] // self.nproc
        idx = jax.lax.axis_index(self.axis)
        tj = jnp.asarray(t, dtype=self.pm.dtype)
        return jax.lax.dynamic_slice(tj, (idx * nloc,), (nloc,))

    def broadcast_table_local(self, name: str, d: int):
        t = self.ktable_local(name, d)
        shape = [1, 1, 1]
        shape[d] = t.shape[0]
        return t.reshape(shape)

    def nyquist_mask_local(self):
        masks = []
        for d in range(3):
            n = self.pm.Nmesh[d]
            if d == 0:
                i = jnp.arange(n)
            elif d == 1:
                nloc = n // self.nproc
                i = jax.lax.axis_index(self.axis) * nloc + jnp.arange(nloc)
            else:
                i = jnp.arange(n // 2 + 1)
            masks.append(i == (n - i) % n)
        return (masks[0][:, None, None] & masks[1][None, :, None]
                & masks[2][None, None, :])

    # ---- shard-local transfers (mirror fastpm_tpu.transfers) ----

    def apply_laplace(self, dk, order: int):
        name = ["kk", "kk_finite", "kk_finite2"][order]
        kk = sum(self.broadcast_table_local(name, d) for d in range(3))
        inv = jnp.where(kk != 0, 1.0 / jnp.where(kk != 0, kk, 1.0), 0.0)
        return dk * inv.astype(self.pm.dtype)

    def apply_pot(self, dk, order: int):
        return -self.apply_laplace(dk, order)

    def apply_grad(self, dk, dir: int, order: int):
        name = ["k", "k_finite"][order]
        kd = self.broadcast_table_local(name, dir)
        out = dk * (1j * kd).astype(self.pm.cdtype)
        return jnp.where(self.nyquist_mask_local(), 0.0 + 0.0j, out)

    def apply_decic(self, dk):
        out = dk
        for d in range(3):
            t = self.pm.table("k", d)
            w = t * self.pm.BoxSize[d] / self.pm.Nmesh[d]
            s = np.sinc(0.5 * w / np.pi)  # np.sinc(x) = sin(pi x)/(pi x)
            kern = (1.0 / s ** 2).astype(np.float64)
            tj = jnp.asarray(kern, dtype=self.pm.dtype)
            if d == 1:
                nloc = self.pm.Nmesh[1] // self.nproc
                idx = jax.lax.axis_index(self.axis)
                tj = jax.lax.dynamic_slice(tj, (idx * nloc,), (nloc,))
            shape = [1, 1, 1]
            shape[d] = tj.shape[0]
            out = out * tj.reshape(shape)
        return out
