"""fastpm_tpu: a TPU-native cosmological particle-mesh N-body framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the C/MPI
FastPM reference (see SURVEY.md). The compute path (painting, FFT Poisson
solve, kick/drift application) is JAX; scalar cosmology/time-integration
math is host-side float64 numpy/scipy, mirroring the reference where that
math is also host-side double precision.
"""

__version__ = "0.1.0"

from .cosmology import Cosmology, GrowthInfo, FIDUCIAL
from .kdk import KickFactor, DriftFactor
from .timemachine import StateTable, Transition
