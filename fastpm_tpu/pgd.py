"""PGD (potential-gradient-descent) correction
(reference: libfastpm/pgdcorrection.c).

Sharpens halo interiors by an extra displacement along the gradient of a
band-filtered potential: alpha(a) * exp(-kl^2/k^2 - k^4/ks^4) / k^2 with
alpha(a) = alpha0 * 10^(A a^2 - B a). Computed each force step from the
same delta_k; consumed during the drift (factors.c:108-113).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from .mesh import PM
from .painter import Painter
from . import transfers

__all__ = ["PGDCorrection"]


@dataclass
class PGDCorrection:
    alpha0: float = 0.8
    A: float = 4.0
    B: float = 8.0
    kl: float = 2.0
    ks: float = 10.0
    painter_type: str = "cic"
    painter_support: int = 2

    def alpha(self, a: float) -> float:
        return self.alpha0 * 10 ** (self.A * a * a - self.B * a)

    def _pot_transfer_alpha(self, pm: PM, dk, alpha):
        """alpha may be a traced scalar (jit-friendly)."""
        kk = sum(pm.broadcast_table("kk", d) for d in range(3))
        kl2 = self.kl ** 2
        ks4 = self.ks ** 4
        safe = jnp.where(kk > 0, kk, 1.0)
        weight = jnp.where(
            kk > 0,
            alpha * jnp.exp(-kl2 / safe - safe * safe / ks4) / safe,
            0.0)
        return dk * weight.astype(pm.dtype)

    def compute_with_alpha(self, pm: PM, pos, delta_k, alpha_fac):
        """Per-particle pgdc displacement (N,3) from delta_k with
        alpha(a)*fac passed as a (possibly traced) scalar
        (fastpm_pgdc_calculate)."""
        painter = Painter(pm, self.painter_type, self.painter_support)
        pot = self._pot_transfer_alpha(pm, delta_k, alpha_fac)
        out = []
        for d in range(3):
            # PGD was calibrated with difforder=1 (pgdcorrection.c:103)
            fk = transfers.apply_diff(pm, pot, d, order=1)
            out.append(painter.readout(pm.c2r(fk), pos))
        return jnp.stack(out, axis=-1)

    def compute(self, pm: PM, pos, delta_k, a: float, fac: float = 1.0):
        """Per-particle pgdc displacement (N,3) from delta_k
        (fastpm_pgdc_calculate)."""
        return self.compute_with_alpha(pm, pos, delta_k,
                                       self.alpha(a) * fac)
