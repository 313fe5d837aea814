"""SPMD force + KDK step over a device mesh (the multi-chip hot loop).

Design (v1, correctness-first):
- particles are index-sharded (block of N/P particles per device); no
  spatial homing is required for correctness
- paint: each device scatters its particles into a full-size local canvas,
  then one psum_scatter sums and shards the canvas into x-slabs -- the
  analog of the reference's ghost reduction (pmghosts.c), done as a single
  XLA collective
- FFT: slab pencil via SlabPM (all_to_all transposes)
- readout: per force component, all_gather the x-slabs and gather locally
  (the analog of ghost readout)
- kick/drift: purely local

The whole step is one jitted, donated-buffer SPMD program.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from ..mesh import PM
from ..painter import Painter
from ..kernels import kernel_orders
from .pfft import SlabPM, PencilPM, make_engine

__all__ = ["make_sharded_step", "sharded_force_fn", "particle_spec",
           "deltak_spec"]


def _force_local(spm: SlabPM, painter: Painter, x, kernel_type: str,
                 return_delta_k: bool = False):
    """Shard-local body: positions (Nloc,3) -> acc (Nloc,3)
    [, delta_k shard]. Runs INSIDE shard_map; collectives are explicit.
    """
    pm = spm.pm
    potorder, gradorder, difforder, _ = kernel_orders(kernel_type)

    canvas_full = painter.paint(x, 1.0)              # (Nx, Ny, Nz) local
    # sum over devices and shard (ghost reduce analogue)
    canvas = spm.reduce_canvas(canvas_full)
    ntotal = jnp.float32(x.shape[0])
    for ax in spm.particle_axes:
        ntotal = jax.lax.psum(ntotal, ax)
    canvas = canvas / (ntotal / pm.Norm)

    delta_k = spm.r2c_local(canvas)

    accs = []
    for d in range(3):
        fk = spm.apply_pot(delta_k, potorder)
        fk = spm.apply_grad(fk, d, gradorder)
        local = spm.c2r_local(fk)
        full = spm.gather_canvas(local)
        accs.append(painter.readout(full, x))
    acc = jnp.stack(accs, axis=-1)
    if return_delta_k:
        return acc, delta_k
    return acc


def particle_spec(mesh: Mesh) -> P:
    """Particles are index-sharded over every mesh axis jointly."""
    names = tuple(mesh.axis_names)
    return P(names if len(names) > 1 else names[0])


def deltak_spec(spm) -> P:
    """PartitionSpec of the transposed k layout produced by the
    engine: slab -> (None, 'x', None); pencil -> (None, 'x', 'y')."""
    if hasattr(spm, "axes"):
        return P(None, spm.ax0, spm.ax1)
    return P(None, spm.axis, None)


def sharded_force_fn(pm: PM, mesh: Mesh, kernel_type: str = "1_4",
                     painter_type: str = "cic", painter_support: int = 2):
    """Jitted SPMD function positions (N,3) -> accelerations (N,3),
    sharded over the mesh's axes."""
    spm = make_engine(pm, mesh)
    painter = Painter(pm, painter_type, painter_support)
    spec = particle_spec(mesh)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=spec, out_specs=spec)
    def force(x):
        return _force_local(spm, painter, x, kernel_type)

    return force


def make_sharded_step(pm: PM, mesh: Mesh, kernel_type: str = "1_4",
                      painter_type: str = "cic", painter_support: int = 2):
    """The full multi-chip training step: force -> kick -> drift -> wrap.

    Returns a jitted function step(x, v, coeffs) -> (x, v, acc) where
    coeffs = [dda, dyyy] are the kick/drift factors for this step
    (computed host-side from the factor tables). Buffers are donated.
    """
    spm = make_engine(pm, mesh)
    painter = Painter(pm, painter_type, painter_support)
    L = jnp.asarray(pm.BoxSize, dtype=jnp.float32)
    spec = particle_spec(mesh)

    def step_local(x, v, coeffs):
        acc = _force_local(spm, painter, x, kernel_type)
        v = v + acc * coeffs[0]
        x = x + v * coeffs[1]
        x = x - jnp.floor(x / L) * L
        return x, v, acc

    sharded = jax.shard_map(step_local, mesh=mesh,
                            in_specs=(spec, spec, P()),
                            out_specs=(spec, spec, spec))
    return jax.jit(sharded, donate_argnums=(0, 1))
