"""Multi-device (TPU pod) execution: sharded FFTs and the SPMD force step.

The reference scales with a 2D pencil domain decomposition over MPI
(pmpfft.c); here the same math rides jax.sharding + shard_map with XLA
collectives over ICI: slab/pencil FFT transposes are all_to_all, the paint
reduction is psum_scatter, readout gathers are all_gather.
"""

from .pfft import SlabPM  # noqa: F401
