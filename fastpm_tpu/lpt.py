"""2LPT initial displacements (reference: libfastpm/pm2lpt.c).

Pure array program: ~10 FFTs + readouts, jittable end to end. The ghost
machinery of the reference disappears -- readout is a global gather.

Conventions (pm_2lpt_solve):
- dx1_d = readout_q[ c2r( diff_d( laplace(delta_k) ) ) ]
- 2LPT source = sum_d [ phi,d1d1 phi,d2d2 - phi,d1d2^2 ] with
  (d1,d2) in {(1,2),(2,0),(0,1)} computed via double-diff fields
- dx2_d = 3/7 * readout_q[ c2r( diff_d( laplace( r2c(source) ) ) ) ]
- laplace order = potorder of the kernel type, diff order = difforder
  (gravity.c:110-171); particles are de-shifted before readout.

pm_2lpt_evolve: x = q + D1 dx1 + D2 dx2,
v = (dx1 f1 D1 + dx2 f2 D2) a^2 E (internal velocity units).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .mesh import PM
from . import transfers
from .painter import Painter
from .kernels import kernel_orders
from .cosmology import Cosmology
from .store import Store

__all__ = ["lpt_solve", "lpt_evolve"]


def lpt_solve(pm: PM, delta_k, q, kernel_type: str = "1_4",
              growth_rate_func_k=None):
    """Compute (dx1, dx2[, dv1]) at Lagrangian positions q (N,3).

    q should already include any half-cell shift handling: the reference
    de-shifts before readout (pm2lpt.c:27-34); pass the unshifted lattice.
    Returns f32 arrays (N,3).
    """
    potorder, gradorder, difforder, deconvolveorder = kernel_orders(kernel_type)
    painter = Painter(pm, "cic")

    def pot(dk):
        return transfers.apply_laplace(pm, dk, potorder)

    def diff(dk, d):
        return transfers.apply_diff(pm, dk, d, difforder)

    # 1LPT
    dx1 = []
    dv1 = [] if growth_rate_func_k is not None else None
    for d in range(3):
        w = diff(pot(delta_k), d)
        dx1.append(painter.readout(pm.c2r(w), q))
        if dv1 is not None:
            wv = transfers.apply_any(pm, w, growth_rate_func_k)
            dv1.append(painter.readout(pm.c2r(wv), q))
    dx1 = jnp.stack(dx1, axis=-1)

    # 2LPT source
    D1 = (1, 2, 0)
    D2 = (2, 0, 1)
    phi_ii = [pm.c2r(diff(diff(pot(delta_k), d), d)) for d in range(3)]
    source = (phi_ii[D1[0]] * phi_ii[D2[0]]
              + phi_ii[D1[1]] * phi_ii[D2[1]]
              + phi_ii[D1[2]] * phi_ii[D2[2]])
    for d in range(3):
        d1, d2 = D1[d], D2[d]
        phi_ij = pm.c2r(diff(diff(pot(delta_k), d1), d2))
        source = source - phi_ij * phi_ij
    source_k = pm.r2c(source)

    dx2 = []
    for d in range(3):
        w = pm.c2r(diff(pot(source_k), d)) * (3.0 / 7)
        dx2.append(painter.readout(w, q))
    dx2 = jnp.stack(dx2, axis=-1)

    if dv1 is not None:
        return dx1, dx2, jnp.stack(dv1, axis=-1)
    return dx1, dx2


def lpt_evolve(c: Cosmology, a0: float, store: Store, za_only: bool = False):
    """Set positions/velocities from the LPT displacements at a0
    (pm_2lpt_evolve, pm2lpt.c:166-210). Returns the updated store with
    a_x = a_v = a0."""
    gi = c.growth_info(a0)
    E = c.E(a0)
    D1, D2, f1, f2 = gi.D1, gi.D2, gi.f1, gi.f2
    dv1_prefac = D1 * a0 * a0 * E
    Dv1 = dv1_prefac * f1
    Dv2 = D2 * a0 * a0 * E * f2
    if za_only:
        D2 = 0.0
        Dv2 = 0.0

    x = store.x + jnp.float32(D1) * store.dx1 + jnp.float32(D2) * store.dx2
    v = store.v + jnp.float32(Dv2) * store.dx2
    if store.dv1 is not None:
        v = v + jnp.float32(dv1_prefac) * store.dv1
    else:
        v = v + jnp.float32(Dv1) * store.dx1
    return store.replace(x=x, v=v, a_x=a0, a_v=a0)
