"""Particle store: structure-of-arrays container (reference:
libfastpm/store.c, api/fastpm/store.h).

TPU-native shape: a registered-pytree dataclass of jax arrays, so a Store
flows through jit/pjit directly. There is no arena allocator -- XLA buffer
donation replaces it -- and no pack/unpack plans: sharding and collective
permutes replace the MPI exchange.

Column semantics follow the reference:
- x   (N,3) f32  position in Mpc/h, timestamp meta.a_x
- v   (N,3) f32  internal velocity a^2 dx/dt / H0 (Mpc/h), timestamp a_v
- acc (N,3) f32  acceleration from the last force step
- dx1/dx2/dv1 (N,3) f32  LPT displacements
- id  (N,) u32/i64  raveled Lagrangian lattice index; q is recomputable
  from it via the _q_* metadata (store.c:664-692)
- rand (N,) f32  per-particle uniform for subsampling (store.c:695-720)
- mask (N,) bool  selection mask (FOF active set, lightcone, ...)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .mesh import PM
from . import native

__all__ = ["Store", "lattice_store"]


@jax.tree_util.register_dataclass
@dataclass
class Store:
    """Particle columns as jax arrays (None = column not allocated)."""

    x: jnp.ndarray
    v: Optional[jnp.ndarray] = None
    acc: Optional[jnp.ndarray] = None
    dx1: Optional[jnp.ndarray] = None
    dx2: Optional[jnp.ndarray] = None
    dv1: Optional[jnp.ndarray] = None
    id: Optional[jnp.ndarray] = None
    rand: Optional[jnp.ndarray] = None
    mask: Optional[jnp.ndarray] = None
    potential: Optional[jnp.ndarray] = None
    tidal: Optional[jnp.ndarray] = None
    pgdc: Optional[jnp.ndarray] = None
    mass: Optional[jnp.ndarray] = None
    aemit: Optional[jnp.ndarray] = None
    # rehomed (migrating) stores: fixed-capacity per-device rows with
    # an explicit liveness flag (u8 0/1); dead rows are padding that
    # weighs zero in the force and is dropped at IO/compaction
    # (parallel/psolver._force_local_homed_rehome). None = dense store
    # (every row is a particle).
    alive: Optional[jnp.ndarray] = None
    # static B of the rehomed layout: each device owns R = cap + 2B
    # rows (cap = R - 2B); None for dense stores
    rehome_bucket: Optional[int] = dataclasses.field(
        default=None, metadata=dict(static=True))

    # metadata (static leaves)
    a_x: float = dataclasses.field(default=0.0, metadata=dict(static=True))
    a_v: float = dataclasses.field(default=0.0, metadata=dict(static=True))
    M0: float = dataclasses.field(default=1.0, metadata=dict(static=True))
    q_shift: tuple = dataclasses.field(default=(0.0, 0.0, 0.0),
                                       metadata=dict(static=True))
    q_scale: tuple = dataclasses.field(default=(1.0, 1.0, 1.0),
                                       metadata=dict(static=True))
    q_nc: tuple = dataclasses.field(default=(0, 0, 0),
                                    metadata=dict(static=True))
    name: str = dataclasses.field(default="1", metadata=dict(static=True))
    # row-order contract for spatial homing (parallel/psolver.py):
    # None = x-major lattice order (index-sharding = x-slab homes);
    # (px, py) = pencil-blocked order (index block b = i*py + j holds
    # the lattice sites of x-block i, y-block j)
    home_blocks: Optional[tuple] = dataclasses.field(
        default=None, metadata=dict(static=True))

    @property
    def np_local(self) -> int:
        return self.x.shape[0]

    def q_from_id(self, id=None):
        """Recompute the Lagrangian position q from the particle id
        (store.c:664-681)."""
        if id is None:
            id = self.id
        n0, n1, n2 = self.q_nc
        # constants typed to the id dtype: a bare Python int >= 2^31
        # (any mesh past 1290^3) would fail weak-type parsing even
        # though it fits uint32/int64
        qsize = jnp.asarray(n0 * n1 * n2, id.dtype)
        s0 = jnp.asarray(n1 * n2, id.dtype)
        s1 = jnp.asarray(n2, id.dtype)
        # split species encode the split index above q_size (store.c:669)
        id = id % qsize
        i0 = id // s0
        i1 = (id - i0 * s0) // s1
        i2 = id - i0 * s0 - i1 * s1
        q = jnp.stack([i0, i1, i2], axis=-1).astype(jnp.float32)
        scale = jnp.asarray(self.q_scale, dtype=jnp.float32)
        shift = jnp.asarray(self.q_shift, dtype=jnp.float32)
        return q * scale + shift

    def wrap(self, boxsize) -> "Store":
        """Periodic wrap of positions into [0, L) (store.c:447-475)."""
        L = jnp.asarray(boxsize if not np.isscalar(boxsize)
                        else (boxsize,) * 3, dtype=self.x.dtype)
        x = self.x - jnp.floor(self.x / L) * L
        return dataclasses.replace(self, x=x)

    def replace(self, **kwargs) -> "Store":
        return dataclasses.replace(self, **kwargs)

    def compact(self) -> "Store":
        """Drop the dead rows of a rehomed store (fetches the alive
        mask once; an IO/observer-boundary operation, not for the hot
        loop). Dense stores (alive is None) return self."""
        if self.alive is None:
            return self
        m = np.asarray(self.alive) > 0
        updates = dict(alive=None, rehome_bucket=None)
        for f in dataclasses.fields(self):
            if f.metadata.get("static") or f.name == "alive":
                continue
            col = getattr(self, f.name)
            if col is not None:
                updates[f.name] = jnp.asarray(np.asarray(col)[m])
        return dataclasses.replace(self, **updates)

    def summary(self, column: str):
        """Per-component (min, std, mean, max)
        (fastpm_store_summary, store.c:808+).

        On an accelerator backend the reduction runs ON DEVICE as one
        jitted program (two-pass std for f32 robustness) and fetches
        12 scalars -- np.asarray of a 16.7M-row column over a tunneled
        TPU moves ~200 MB and was the dominant cost of every logged
        force step (round-5 CLI profile: ~56 s/force, almost all in
        the three per-step summaries). The CPU path keeps the host
        float64 math bit-for-bit (golden-log values are pinned on it).
        """
        a = getattr(self, column)
        devs = getattr(a, "devices", None)
        on_accel = (devs is not None
                    and any(d.platform != "cpu" for d in devs()))
        if on_accel:
            out = np.asarray(_summary_device(a), dtype=np.float64)
            return out[0], out[1], out[2], out[3]
        arr = np.asarray(a, dtype=np.float64)
        if arr.ndim == 1:
            arr = arr[:, None]
        mean = arr.mean(axis=0)
        std = np.sqrt((arr ** 2).mean(axis=0) - mean ** 2)
        return arr.min(axis=0), std, mean, arr.max(axis=0)

    def subsample_mask(self, fraction: float):
        """Boolean keep-mask from the rand column (store.c:fill_subsample)."""
        if fraction >= 1.0:
            return jnp.ones(self.np_local, dtype=bool)
        # the reference keeps on rand <= fraction (store.c:977)
        return self.rand <= fraction


@jax.jit
def _summary_device(a):
    """(4, ncomp) f32 [min, std, mean, max] of one column, one program
    + one 12-scalar fetch (see Store.summary). Two-pass std: E[x^2] -
    E[x]^2 cancels catastrophically in f32 when mean >> std (positions:
    mean ~L/2, std ~L/3 is fine, but generality is cheap here)."""
    if a.ndim == 1:
        a = a[:, None]
    a = a.astype(jnp.float32)
    mean = jnp.mean(a, axis=0)
    std = jnp.sqrt(jnp.mean((a - mean) ** 2, axis=0))
    return jnp.stack([jnp.min(a, axis=0), std, mean,
                      jnp.max(a, axis=0)])


def x64_ids_enabled() -> bool:
    """True when jnp.int64 is really 64-bit (jax_enable_x64 on, via
    config or the jax.experimental.enable_x64 context)."""
    from jax import dtypes as _dtypes
    return _dtypes.canonicalize_dtype(np.int64) == np.dtype(np.int64)


def ensure_id_capacity(n: int) -> None:
    """Refuse to build device-side ids that would silently wrap.

    Under default JAX config jnp.int64 truncates to int32, so id
    values >= 2^32 (beyond uint32) require jax_enable_x64 -- the
    reference is i8 end-to-end (store.h ID column). n is the exclusive
    upper bound of the id values (lattice site count, or
    nsplit * q_size for split species)."""
    if n <= 2 ** 32:
        return
    if not x64_ids_enabled():
        raise RuntimeError(
            f"particle ids reach {n - 1} >= 2^32 but jax_enable_x64 is "
            "off: jnp.int64 would silently truncate to int32 and ids/"
            "FOF labels/segment keys would wrap. Enable 64-bit ids "
            "first: jax.config.update('jax_enable_x64', True) before "
            "any tracing (the fastpm-tpu CLI does this automatically "
            "when nc^3 needs it), or run under "
            "jax.experimental.enable_x64().")


def id_dtype(n: int):
    """Device dtype for particle ids with values in [0, n): uint32
    through 2^32 sites (covers every mesh to 1625^3 without x64),
    jnp.int64 beyond -- which requires jax_enable_x64 (checked, never
    silent)."""
    if n <= 2 ** 32:
        return jnp.uint32
    ensure_id_capacity(n)
    return jnp.int64


def _pencil_procmesh(ntask: int):
    """The reference's near-square 2D process mesh factorization
    (pm_init, pmpfft.c:118-134): smallest Ny with Ny^2 >= NTask, backed
    off to a divisor."""
    ny = 1
    while ny * ny < ntask:
        ny += 1
    while ny >= 1:
        if ntask % ny == 0:
            break
        ny -= 1
    return ntask // ny, ny


def _rank_emulated_rand(Nc, seed: int, ntask: int) -> np.ndarray:
    """The reference's rand column, _fastpm_store_fill_rand
    (store.c:693-718): rank 0 seeds ranlxd1 with `seed` directly; rank
    k draws 8k uniforms from a seed-seeded generator and re-seeds with
    0x7fffffff * (the last draw). Each rank fills its (x, y) PENCIL of
    the lattice (the default PFFT 2D decomposition, rank = cx*Ny + cy)
    in row-major (ix, iy, iz) order, so emulating ntask ranks
    reproduces the rand values of an ntask-process reference run
    exactly. ntask=1 is the plain stream. Returns the values in global
    x-major lattice order."""
    n = int(np.prod(Nc))
    if ntask <= 1:
        return native.ranlxd_uniform(seed, n)
    nx_p, ny_p = _pencil_procmesh(ntask)
    n0, n1, n2 = Nc
    out = np.empty(n, dtype=np.float64)
    view = out.reshape(n0, n1, n2)
    for r in range(ntask):
        if r == 0:
            seed_r = seed
        else:
            u = native.ranlxd_uniform(seed, 8 * r)
            seed_r = int(0x7fffffff * u[-1])
        cx, cy = r // ny_p, r % ny_p
        x0, x1 = cx * n0 // nx_p, (cx + 1) * n0 // nx_p
        y0, y1 = cy * n1 // ny_p, (cy + 1) * n1 // ny_p
        nr = (x1 - x0) * (y1 - y0) * n2
        view[x0:x1, y0:y1, :] = native.ranlxd_uniform(
            seed_r, nr).reshape(x1 - x0, y1 - y0, n2)
    return out


def lattice_store(pm: PM, Nc=None, shift=0.0, columns=("v", "acc", "id", "rand"),
                  rand_seed: int = 1231584, M0: float = 1.0,
                  name: str = "1", rand_ntask: int = 1,
                  blocks=None) -> Store:
    """Uniform Lagrangian lattice of Nc^3 particles (fastpm_store_fill,
    store.c:723-805): id = raveled lattice index, x = q = id*scale+shift.
    The rand column reproduces the reference's rank-0 ranlxd stream.

    blocks=(px, py): emit rows in PENCIL-BLOCKED order -- contiguous
    row block b = i*py + j holds the lattice sites with ix in x-block i
    (width Nc0/px) and iy in y-block j (width Nc1/py), x-major within
    the block. Index-sharding such a store over a (px, py) device mesh
    makes each device own exactly its spatial pencil (the 2D analog of
    the x-major fill's slab homing; fastpm_store_fill restricts to the
    rank's IRegion the same way, store.c:764-767). ids stay the global
    raveled lattice index, so q_from_id and sorted-by-ID output are
    unchanged."""
    if Nc is None:
        Nc = pm.Nmesh
    if np.isscalar(Nc):
        Nc = (int(Nc),) * 3
    if np.isscalar(shift):
        shift = (float(shift),) * 3
    n = int(np.prod(Nc))
    scale = tuple(pm.BoxSize[d] / Nc[d] for d in range(3))

    # generate the lattice ON DEVICE: host meshgrid + upload of an
    # (N, 3) float array dominates init time at 256^3+ over the axon
    # tunnel. Positions use the f64 formula's rounding (idx * scale in
    # f64 then cast) via an exact integer split: i * scale_f32 is exact
    # whenever scale is a dyadic rational (every power-of-two grid),
    # and the f32 fma path matches the old numpy values elsewhere to
    # 1 ulp.
    dtype_id = id_dtype(n)
    s01 = Nc[1] * Nc[2]
    if blocks is not None:
        px, py = int(blocks[0]), int(blocks[1])
        if Nc[0] % px or Nc[1] % py:
            raise ValueError(f"Nc {Nc} must divide blocks {blocks}")
        bx, by = Nc[0] // px, Nc[1] // py

    @jax.jit
    def make_lattice():
        # uint32 covers [2^31, 2^32) without x64 (int32 would wrap
        # there); id_dtype() has already vetted the int64 case
        it = jnp.int32 if n < 2 ** 31 else (
            jnp.uint32 if n <= 2 ** 32 else jnp.int64)
        i = jnp.arange(n, dtype=it)
        if blocks is None:
            i0 = i // s01
            r = i - i0 * s01
            i1 = r // Nc[2]
            i2 = r - i1 * Nc[2]
        else:
            bsz = bx * by * Nc[2]
            b = i // bsz
            w = i - b * bsz
            bi = b // py
            bj = b - bi * py
            l0 = w // (by * Nc[2])
            rr = w - l0 * (by * Nc[2])
            l1 = rr // Nc[2]
            i2 = rr - l1 * Nc[2]
            i0 = bi * bx + l0
            i1 = bj * by + l1
        idx = jnp.stack([i0, i1, i2], axis=-1).astype(jnp.float32)
        x = idx * jnp.asarray(scale, jnp.float32) \
            + jnp.asarray(shift, jnp.float32)
        lid = (i0 * Nc[1] + i1) * Nc[2] + i2
        return x, lid.astype(dtype_id)

    x, ids = make_lattice()

    kw = dict(
        x=x,
        a_x=0.0, a_v=0.0, M0=M0,
        q_shift=tuple(shift), q_scale=scale, q_nc=tuple(Nc), name=name,
        home_blocks=(None if blocks is None
                     else (int(blocks[0]), int(blocks[1]))),
    )
    if "v" in columns:
        kw["v"] = jnp.zeros((n, 3), dtype=jnp.float32)
    if "acc" in columns:
        kw["acc"] = jnp.zeros((n, 3), dtype=jnp.float32)
    if "id" in columns:
        kw["id"] = ids
    if "rand" in columns:
        rand = _rank_emulated_rand(Nc, rand_seed,
                                   rand_ntask).astype(np.float32)
        if blocks is not None:
            # rand is generated in x-major lattice order; carry each
            # particle's own value through the blocked row order
            rand = rand[np.asarray(ids)]
        kw["rand"] = jnp.asarray(rand)
    if "mask" in columns:
        kw["mask"] = jnp.zeros(n, dtype=bool)
    if "potential" in columns:
        kw["potential"] = jnp.zeros(n, dtype=jnp.float32)
    if "tidal" in columns:
        kw["tidal"] = jnp.zeros((n, 6), dtype=jnp.float32)
    return Store(**kw)
