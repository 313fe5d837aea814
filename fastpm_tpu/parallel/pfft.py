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

__all__ = ["SlabPM", "PencilPM", "make_engine"]


def _grad3_tables(pm, gradorder: int):
    """Shared synthesis matrices for the fused distributed 3-gradient
    inverse (slab AND pencil): per-axis inverse-DFT tables with the
    i*t_d diff fold, the r2c 1/Norm + inverse 1/N normalization folded
    once into the x-stage, and the hermitian z half->real pair.

    Returns (Bx, Gx, By, Gy, Cz, Gz) where each entry is an (r, i)
    numpy table pair."""
    from ..ops import fftmm
    n0, n1, n2 = (int(v) for v in pm.Nmesh)
    name = ["k", "k_finite"][gradorder]
    s = np.float32(float(pm.Norm) / (n0 * n1 * n2))
    Bx = fftmm._idft_direct_tables(n0, n0)
    Gx = fftmm._idft_direct_tables(n0, n0, t=pm.table(name, 0))
    Bx = tuple(m * s for m in Bx)
    Gx = tuple(m * s for m in Gx)
    By = fftmm._idft_direct_tables(n1, n1)
    Gy = fftmm._idft_direct_tables(n1, n1, t=pm.table(name, 1))
    Cz = fftmm._c2r_grad_tables(n2, n2)
    Gz = fftmm._c2r_grad_tables(n2, n2, t=pm.table(name, 2))
    return Bx, Gx, By, Gy, Cz, Gz


def make_engine(pm, mesh):
    """Pick the decomposition by the mesh shape: 1D -> slab (FFTW-MPI
    analog), 2D -> pencil (PFFT analog, pmpfft.c:108-134)."""
    names = tuple(mesh.axis_names)
    if len(names) == 1:
        return SlabPM(pm, mesh, axis=names[0])
    if len(names) == 2:
        return PencilPM(pm, mesh, axes=names)
    raise ValueError("mesh must have 1 (slab) or 2 (pencil) axes, got "
                     f"{names!r}")


class SlabPM:
    """PM engine sharded over a 1D mesh axis ('x').

    Wraps a host PM (geometry/tables) plus shard-local FFT/transfer
    methods intended to be called INSIDE shard_map over `mesh`.
    """

    def __init__(self, pm: PM, mesh: Mesh, axis="x"):
        """axis may be a single mesh axis name or a TUPLE of names --
        the latter treats a multi-axis mesh as one flattened ring
        (collectives and axis_index accept tuples), which lets the
        slab decomposition and its homed halo exchange run on a 2D
        device mesh."""
        self.pm = pm
        self.mesh = mesh
        self.axis = tuple(axis) if isinstance(axis, (tuple, list)) \
            else axis
        if isinstance(self.axis, tuple):
            self.nproc = int(np.prod([mesh.shape[a] for a in self.axis]))
        else:
            self.nproc = mesh.shape[self.axis]
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
        if pm._use_mm_fft:
            from ..ops.fftmm import rfft_mm_axis, fft_mm_axis
            k_yz = fft_mm_axis(rfft_mm_axis(x_slab, 2), 1)
        else:
            k_yz = jnp.fft.rfftn(x_slab, axes=(1, 2))  # (nx_loc,Ny,Nzh)
        # transpose x <-> y: split axis 1 into P chunks, all_to_all
        k_t = jax.lax.all_to_all(k_yz, self.axis, split_axis=1,
                                 concat_axis=0, tiled=True)
        # now (Nx, Ny/P, Nzh); FFT along global x
        if pm._use_mm_fft:
            from ..ops.fftmm import fft_mm_axis
            k_full = fft_mm_axis(k_t, 0)
        else:
            k_full = jnp.fft.fft(k_t, axis=0)
        return (k_full / pm.Norm).astype(pm.cdtype)

    def c2r_local(self, k_shard):
        """Inverse of r2c_local."""
        pm = self.pm
        k = k_shard * pm.Norm
        if pm._use_mm_fft:
            from ..ops.fftmm import fft_mm_axis, irfft_mm_axis
            k = fft_mm_axis(k, 0, inverse=True)
            x_t = jax.lax.all_to_all(k, self.axis, split_axis=0,
                                     concat_axis=1, tiled=True)
            x = irfft_mm_axis(fft_mm_axis(x_t, 1, inverse=True),
                              pm.Nmesh[2], 2)
        else:
            k = jnp.fft.ifft(k, axis=0)
            x_t = jax.lax.all_to_all(k, self.axis, split_axis=0,
                                     concat_axis=1, tiled=True)
            x = jnp.fft.irfftn(x_t, axes=(1, 2),
                               s=(pm.Nmesh[1], pm.Nmesh[2]))
        return x.astype(pm.dtype)

    def c2r_grad3_local(self, pot_k, gradorder: int):
        """The force step's three gradient inverses in ONE fused
        distributed program (the sharded analog of mesh.c2r_grad3 /
        ops/fftmm.grad3_c2r_direct): grad_d = c2r_local(i t_d pot_k).

        Wins over 3x [apply_grad + c2r_local]:
          * grad_y and grad_z SHARE the x-stage inverse AND its
            all_to_all transpose -- 2 local x-stages + 2 transposes
            instead of 3 (33% less ICI traffic for the inverse);
          * the i*t_d diff tables fold into the synthesis matrices
            (no separate transfer passes, no nyquist-mask multiplies
            for order 1);
          * every stage is a dense dot_general in its natural output
            order -- the 3-stage axis rotation (x,yl,zh) -> (yl,zh,x)
            -> [transpose] -> (n1,zh,xl) -> (zh,xl,n1) -> (xl,n1,nz)
            closes with zero transposes, the all_to_all slotting
            between stages positionally;
          * the hermitian z-stage is the direct half->real synthesis
            (the chip-measured winner over CT + hermitian extension).

        Falls back to the unfused pipeline off the mm engine. Input:
        y-sharded k (Nx, Ny/P, Nzh); output: three x-slab (Nx/P, Ny,
        Nz) real fields."""
        pm = self.pm
        if not pm._use_mm_fft:
            fks = [self.apply_grad(pot_k, d, gradorder)
                   for d in range(3)]
            return tuple(self.c2r_local(f) for f in fks)
        from ..ops import fftmm
        if gradorder == 0:
            # k_finite zeroes its Nyquist/DC planes by construction;
            # plain i*k needs the explicit self-conjugate-mode zeroing
            # (same gating as mesh.c2r_grad3)
            pot_k = pot_k * (~self.nyquist_mask_local()).astype(pm.dtype)
        p = fftmm._prec()
        ((Bxr, Bxi), (Gxr, Gxi), (Byr, Byi), (Gyr, Gyi),
         (Czr, Czi), (Gzr, Gzi)) = _grad3_tables(pm, gradorder)

        def dot(a, m):
            # contract the FIRST axis against (K, nout): natural
            # dot_general order (free axes then nout)
            return jnp.einsum("kab,kn->abn", a, jnp.asarray(m),
                              precision=p)

        def cstage(ar, ai, mr, mi):
            return (dot(ar, mr) - dot(ai, mi),
                    dot(ar, mi) + dot(ai, mr))

        kr = jnp.real(pot_k).astype(jnp.float32)
        ki = jnp.imag(pot_k).astype(jnp.float32)
        # x-stages on the local x axis: shared U (grad_y/grad_z) and
        # the tx-folded Ux (grad_x); outputs (Ny/P, Nzh, Nx)
        U_r, U_i = cstage(kr, ki, Bxr, Bxi)
        Ux_r, Ux_i = cstage(kr, ki, Gxr, Gxi)
        # ONE stacked all_to_all moves both transposes: split x (last
        # axis), concatenate onto y (axis 1 of the stack)
        stk = jnp.stack([U_r, U_i, Ux_r, Ux_i])
        stk = jax.lax.all_to_all(stk, self.axis, split_axis=3,
                                 concat_axis=1, tiled=True)
        U_r, U_i, Ux_r, Ux_i = (stk[j] for j in range(4))
        # y-stages on the (now local) full y axis: (Nzh, Nx/P, Ny)
        Ax_r, Ax_i = cstage(Ux_r, Ux_i, Byr, Byi)
        Ay_r, Ay_i = cstage(U_r, U_i, Gyr, Gyi)
        Az_r, Az_i = cstage(U_r, U_i, Byr, Byi)
        # direct hermitian z synthesis: (Nx/P, Ny, Nz)
        gx = dot(Ax_r, Czr) + dot(Ax_i, Czi)
        gy = dot(Ay_r, Czr) + dot(Ay_i, Czi)
        gz = dot(Az_r, Gzr) + dot(Az_i, Gzi)
        return (gx.astype(pm.dtype), gy.astype(pm.dtype),
                gz.astype(pm.dtype))

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
        ik = jax.lax.complex(jnp.zeros_like(kd), kd).astype(self.pm.cdtype)
        out = dk * ik
        return out * (~self.nyquist_mask_local()).astype(self.pm.dtype)

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

    def custom_table_local(self, values, d: int):
        """Slice a caller-provided per-dimension 1D HOST table (full
        mesh length along d, hermitian half for d=2) to the local k
        shard, mirroring ktable_local's layout."""
        t = jnp.asarray(np.asarray(values), dtype=self.pm.dtype)
        if d != 1:
            return t
        nloc = self.pm.Nmesh[1] // self.nproc
        idx = jax.lax.axis_index(self.axis)
        return jax.lax.dynamic_slice(t, (idx * nloc,), (nloc,))

    def apply_fk_interp(self, dk, logk, vals):
        """Shard-local mirror of transfers.apply_fk_interp (the
        jittable neutrino linear-response transfer): fac(|k|) = 1 +
        interp(log|k|; logk, vals), DC mode kept at 1."""
        kk = sum(self.broadcast_table_local("kk", d) for d in range(3))
        k = jnp.sqrt(kk)
        lq = jnp.log(jnp.where(k > 0, k, 1.0))
        fac = 1.0 + jnp.interp(lq, logk, vals)
        fac = jnp.where(kk > 0, fac, 1.0)
        return dk * fac.astype(self.pm.dtype)

    def apply_softening(self, dk, softening_type: str):
        """Shard-local mirror of kernels.apply_softening
        (apply_softening_transfer, gravity.c:243-270)."""
        import math
        pm = self.pm
        if softening_type == "none":
            return dk
        if softening_type == "twothird":
            k_nq = math.pi / pm.BoxSize[0] * pm.Nmesh[0]
            kk = sum(self.broadcast_table_local("kk", d) for d in range(3))
            return dk * (kk <= (2.0 / 3 * k_nq) ** 2).astype(pm.dtype)
        if softening_type in ("gaussian", "gadget_long_range"):
            N = 1.0 if softening_type == "gaussian" else math.sqrt(2) * 1.25
            r0 = N * pm.BoxSize[0] / pm.Nmesh[0]
            out = dk
            for d in range(3):
                kern = np.exp(-0.5 * (pm.table("k", d) * r0) ** 2)
                tj = self.custom_table_local(kern, d)
                shape = [1, 1, 1]
                shape[d] = tj.shape[0]
                out = out * tj.reshape(shape)
            return out
        if softening_type in ("gaussian36", "aggressive"):
            k_nq = math.pi / pm.BoxSize[0] * pm.Nmesh[0]
            kk = sum(self.broadcast_table_local("kk", d) for d in range(3))
            k = jnp.sqrt(kk)
            return dk * jnp.exp(-36.0 * (k / k_nq) ** 36).astype(pm.dtype)
        raise ValueError(f"unknown softening type {softening_type!r}")

    # ---- canvas collectives (paint reduce / readout gather) ----

    def reduce_canvas(self, canvas_full):
        """Full local canvas -> summed x-slab shard (ghost reduce)."""
        return jax.lax.psum_scatter(canvas_full, self.axis,
                                    scatter_dimension=0, tiled=True)

    def gather_canvas(self, local):
        """x-slab shard -> full local canvas (readout gather)."""
        return jax.lax.all_gather(local, self.axis, axis=0, tiled=True)

    @property
    def particle_axes(self):
        return (self.axis,)


class PencilPM:
    """PM engine sharded over a 2D mesh ('x', 'y') -- the analog of the
    reference's default PFFT 2D pencil decomposition (pmpfft.c:108-260),
    which scales the FFT to O(Nmesh^2) devices instead of the slab's
    O(Nmesh).

    Layouts (Px x Py devices):
    - real space: global (Nx, Ny, Nz) as pencils (Nx/Px, Ny/Py, Nz)
    - k space (transposed out): local (Nx, Ny/Px, Nzp/Py) where
      Nzp = Nzh padded up to a multiple of Py (zero modes beyond Nzh;
      the pad rides along through transfers and is dropped by c2r).
      x is fully local on every device -- the same "see all of one
      axis" trick as the reference's transposed layout
      (pmpfft.c:198-202).

    r2c pipeline: rfft(z) -> pad z -> all_to_all over 'y' (z<->y)
    -> fft(y) -> all_to_all over 'x' (y<->x) -> fft(x).
    """

    def __init__(self, pm: PM, mesh: Mesh, axes=("x", "y")):
        self.pm = pm
        self.mesh = mesh
        self.axes = tuple(axes)
        self.ax0, self.ax1 = self.axes
        self.px = mesh.shape[self.ax0]
        self.py = mesh.shape[self.ax1]
        n0, n1, n2 = pm.Nmesh
        nzh = n2 // 2 + 1
        self.nzh = nzh
        self.nzp = ((nzh + self.py - 1) // self.py) * self.py
        if n0 % self.px or n1 % self.py or n1 % self.px:
            raise ValueError("Nmesh must divide the 2D device mesh "
                             "(pm_unbalanced, solver.c:113-121)")
        self.rshard = (n0 // self.px, n1 // self.py, n2)
        self.kshard = (n0, n1 // self.px, self.nzp // self.py)

    # ---- shard-local FFTs (call inside shard_map) ----

    def _fft_axis(self, a, axis, inverse=False):
        """FFT along a non-major axis via moveaxis: the CPU backend's
        fft thunk requires dim0-major layouts (XLA fuses the moves on
        TPU)."""
        if self.pm._use_mm_fft:
            from ..ops.fftmm import fft_mm_axis
            return fft_mm_axis(a, axis, inverse=inverse)
        m = jnp.moveaxis(a, axis, -1)
        m = jnp.fft.ifft(m, axis=-1) if inverse else jnp.fft.fft(m, axis=-1)
        return jnp.moveaxis(m, -1, axis)

    def r2c_local(self, x_pencil):
        pm = self.pm
        if pm._use_mm_fft:
            from ..ops.fftmm import rfft_mm_axis
            h = rfft_mm_axis(x_pencil, 2)            # (nxl, nyl, Nzh)
        else:
            h = jnp.fft.rfft(x_pencil, axis=2)       # (nxl, nyl, Nzh)
        if self.nzp != self.nzh:
            h = jnp.pad(h, ((0, 0), (0, 0), (0, self.nzp - self.nzh)))
        # transpose z <-> y over 'y': (nxl, Ny, Nzp/Py)
        h = jax.lax.all_to_all(h, self.ax1, split_axis=2,
                               concat_axis=1, tiled=True)
        h = self._fft_axis(h, 1)
        # transpose y <-> x over 'x': (Nx, Ny/Px, Nzp/Py)
        h = jax.lax.all_to_all(h, self.ax0, split_axis=1,
                               concat_axis=0, tiled=True)
        h = self._fft_axis(h, 0)
        return (h / pm.Norm).astype(pm.cdtype)

    def c2r_local(self, k_shard):
        pm = self.pm
        k = k_shard * pm.Norm
        k = self._fft_axis(k, 0, inverse=True)
        k = jax.lax.all_to_all(k, self.ax0, split_axis=0,
                               concat_axis=1, tiled=True)
        k = self._fft_axis(k, 1, inverse=True)
        k = jax.lax.all_to_all(k, self.ax1, split_axis=1,
                               concat_axis=2, tiled=True)
        if self.nzp != self.nzh:
            k = k[:, :, :self.nzh]
        if pm._use_mm_fft:
            from ..ops.fftmm import irfft_mm_axis
            x = irfft_mm_axis(k, pm.Nmesh[2], 2)
        else:
            x = jnp.fft.irfft(k, axis=2, n=pm.Nmesh[2])
        return x.astype(pm.dtype)

    def c2r_grad3_local(self, pot_k, gradorder: int):
        """Pencil counterpart of SlabPM.c2r_grad3_local: the three
        gradient inverses as ONE fused two-hop program.

        grad_y/grad_z share the x-stage inverse, both transposes are
        stacked all_to_alls (the 'x' hop moves 2 complex fields
        instead of 3; the 'y' hop moves 3, fused into one dispatch),
        the i*t_d diff tables fold into the synthesis matrices, and
        the z-stage is the direct hermitian half->real contraction on
        the already-cropped kz planes. Input: transposed k shard
        (Nx, Ny/Px, Nzp/Py); output: three real pencils
        (Nx/Px, Ny/Py, Nz)."""
        pm = self.pm
        if not pm._use_mm_fft:
            fks = [self.apply_grad(pot_k, d, gradorder)
                   for d in range(3)]
            return tuple(self.c2r_local(f) for f in fks)
        from ..ops import fftmm
        if gradorder == 0:
            pot_k = pot_k * (~self.nyquist_mask_local()).astype(pm.dtype)
        p = fftmm._prec()
        ((Bxr, Bxi), (Gxr, Gxi), (Byr, Byi), (Gyr, Gyi),
         (Czr, Czi), (Gzr, Gzi)) = _grad3_tables(pm, gradorder)

        def dot(a, m):
            # contract the FIRST axis; free axes keep order, output
            # column appended last (dot_general-natural, zero
            # transposes across the 3-stage axis rotation)
            return jnp.einsum("kab,kn->abn", a, jnp.asarray(m),
                              precision=p)

        def cstage(ar, ai, mr, mi):
            return (dot(ar, mr) - dot(ai, mi),
                    dot(ar, mi) + dot(ai, mr))

        kr = jnp.real(pot_k).astype(jnp.float32)
        ki = jnp.imag(pot_k).astype(jnp.float32)
        # x-stages on the full local x axis: (Ny/Px, Nzp/Py, Nx)
        U_r, U_i = cstage(kr, ki, Bxr, Bxi)
        Ux_r, Ux_i = cstage(kr, ki, Gxr, Gxi)
        # hop 1: ONE stacked all_to_all over 'x' (split x, gather y)
        stk = jnp.stack([U_r, U_i, Ux_r, Ux_i])
        stk = jax.lax.all_to_all(stk, self.ax0, split_axis=3,
                                 concat_axis=1, tiled=True)
        U_r, U_i, Ux_r, Ux_i = (stk[j] for j in range(4))
        # y-stages on the full y axis: (Nzp/Py, Nx/Px, Ny)
        Ax_r, Ax_i = cstage(Ux_r, Ux_i, Byr, Byi)
        Ay_r, Ay_i = cstage(U_r, U_i, Gyr, Gyi)
        Az_r, Az_i = cstage(U_r, U_i, Byr, Byi)
        # hop 2: ONE stacked all_to_all over 'y' (split y, gather z)
        stk = jnp.stack([Ax_r, Ax_i, Ay_r, Ay_i, Az_r, Az_i])
        stk = jax.lax.all_to_all(stk, self.ax1, split_axis=3,
                                 concat_axis=1, tiled=True)
        # crop the kz pad before the z synthesis: (Nzh, Nx/Px, Ny/Py)
        stk = stk[:, :self.nzh]
        Ax_r, Ax_i, Ay_r, Ay_i, Az_r, Az_i = (stk[j] for j in range(6))
        # direct hermitian z synthesis: (Nx/Px, Ny/Py, Nz)
        gx = dot(Ax_r, Czr) + dot(Ax_i, Czi)
        gy = dot(Ay_r, Czr) + dot(Ay_i, Czi)
        gz = dot(Az_r, Gzr) + dot(Az_i, Gzi)
        return (gx.astype(pm.dtype), gy.astype(pm.dtype),
                gz.astype(pm.dtype))

    # ---- shard-local k tables ----

    def _kindex(self, d: int):
        """Global mesh indices along dimension d of the local k shard."""
        n = self.pm.Nmesh[d]
        if d == 0:
            return jnp.arange(n)
        if d == 1:
            nloc = n // self.px
            return jax.lax.axis_index(self.ax0) * nloc + jnp.arange(nloc)
        nloc = self.nzp // self.py
        return jax.lax.axis_index(self.ax1) * nloc + jnp.arange(nloc)

    def ktable_local(self, name: str, d: int):
        t = jnp.asarray(self.pm.table(name, d), dtype=self.pm.dtype)
        idx = self._kindex(d)
        if d == 2:
            # the pad region has no table entry; gather clamped and
            # zero it so padded modes stay zero through transfers
            safe = jnp.minimum(idx, self.nzh - 1)
            return jnp.where(idx < self.nzh, t[safe], 0.0)
        if d == 0:
            return t
        return t[idx]

    def broadcast_table_local(self, name: str, d: int):
        t = self.ktable_local(name, d)
        shape = [1, 1, 1]
        shape[d] = t.shape[0]
        return t.reshape(shape)

    def nyquist_mask_local(self):
        masks = []
        for d in range(3):
            n = self.pm.Nmesh[d]
            i = self._kindex(d)
            masks.append(i == (n - i) % n)
        return (masks[0][:, None, None] & masks[1][None, :, None]
                & masks[2][None, None, :])

    # ---- shard-local transfers ----

    apply_laplace = SlabPM.apply_laplace
    apply_pot = SlabPM.apply_pot
    apply_grad = SlabPM.apply_grad
    apply_softening = SlabPM.apply_softening
    # padded kz modes: kk maps to 0 there -> fac = 1, and the modes
    # themselves are zero, so the interp transfer is pad-safe
    apply_fk_interp = SlabPM.apply_fk_interp

    def custom_table_local(self, values, d: int):
        """Pencil-layout counterpart of SlabPM.custom_table_local; the
        kz pad region maps to zero."""
        t = jnp.asarray(np.asarray(values), dtype=self.pm.dtype)
        idx = self._kindex(d)
        if d == 2:
            safe = jnp.minimum(idx, self.nzh - 1)
            return jnp.where(idx < self.nzh, t[safe], 0.0)
        if d == 0:
            return t
        return t[idx]

    def apply_decic(self, dk):
        out = dk
        for d in range(3):
            t = self.pm.table("k", d)
            w = t * self.pm.BoxSize[d] / self.pm.Nmesh[d]
            s = np.sinc(0.5 * w / np.pi)
            kern = jnp.asarray((1.0 / s ** 2).astype(np.float64),
                               dtype=self.pm.dtype)
            idx = self._kindex(d)
            if d == 2:
                safe = jnp.minimum(idx, self.nzh - 1)
                tj = jnp.where(idx < self.nzh, kern[safe], 0.0)
            elif d == 0:
                tj = kern
            else:
                tj = kern[idx]
            shape = [1, 1, 1]
            shape[d] = tj.shape[0]
            out = out * tj.reshape(shape)
        return out

    # ---- canvas collectives (paint reduce / readout gather) ----

    def reduce_canvas(self, canvas_full):
        """Full local canvas -> summed pencil shard (ghost reduce)."""
        c = jax.lax.psum_scatter(canvas_full, self.ax0,
                                 scatter_dimension=0, tiled=True)
        return jax.lax.psum_scatter(c, self.ax1,
                                    scatter_dimension=1, tiled=True)

    def gather_canvas(self, local):
        """Pencil shard -> full local canvas (readout gather).

        The axis-0 gather runs first: an axis-1 all_gather directly
        consuming the irfft makes XLA:CPU assign the fft a non-major
        layout, which its fft thunk rejects (RET_CHECK
        IsMonotonicWithDim0Major); gathering axis 0 first keeps the
        fft output major and is equivalent."""
        c = jax.lax.all_gather(local, self.ax0, axis=0, tiled=True)
        return jax.lax.all_gather(c, self.ax1, axis=1, tiled=True)

    @property
    def particle_axes(self):
        return self.axes
