"""IO subsystem: bigfile containers, snapshots, complex-field dumps.

The on-disk formats are byte-compatible with the reference
(libfastpmio/io.c + depends/bigfile) so nbodykit-based tooling reads our
outputs unchanged.
"""

from .bigfile import BigFile, BigBlock  # noqa: F401
