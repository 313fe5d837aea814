"""Complex-field (delta_k) dumps: LinearDensityK / WhiteNoiseK / DensityK
blocks (reference: libfastpmio/io.c:641-826).

Format: a bigfile block of dtype c8, rows in C order of the global
(Nmesh, Nmesh, Nmesh/2+1) hermitian array, with ndarray.* shape attrs.
Our k-layout is already that order, so the write is a flat dump (the
reference needs an mpsort rendezvous; we don't)."""

from __future__ import annotations

import numpy as np

from .bigfile import BigFile
from ..mesh import PM, fetch_complex

__all__ = ["write_complex", "read_complex", "write_real", "read_real"]


def write_complex(pm: PM, data, filename: str, blockname: str,
                  Nfile: int = 1):
    arr = np.ascontiguousarray(fetch_complex(data), dtype=np.complex64)
    nm = pm.Nmesh[0]
    bf = BigFile(filename, create=True)
    block = bf.create_block(blockname, arr.reshape(-1, 1), Nfile=Nfile)
    block.attrs.set("ndarray.ndim", np.int32(3), "i4")
    block.attrs.set("ndarray.strides",
                    np.asarray([nm * (nm // 2 + 1), nm // 2 + 1, 1],
                               dtype=np.int64), "i8")
    block.attrs.set("ndarray.shape",
                    np.asarray([nm, nm, nm // 2 + 1], dtype=np.int64), "i8")
    block.attrs.set("Nmesh", np.int32(nm), "i4")
    block.attrs.set("BoxSize", float(pm.BoxSize[0]), "f8")


def read_complex(pm: PM, filename: str, blockname: str) -> np.ndarray:
    bf = BigFile(filename)
    block = bf.open_block(blockname)
    arr = block.read_all().reshape(pm.kshape)
    return arr.astype(np.complex64)


def write_real(pm: PM, data, filename: str, blockname: str,
               Nfile: int = 1):
    """Real-space field block (the write_linearr path,
    src/fastpm.c:685-689)."""
    arr = np.ascontiguousarray(np.asarray(data), dtype=np.float32)
    nm = pm.Nmesh[0]
    bf = BigFile(filename, create=True)
    block = bf.create_block(blockname, arr.reshape(-1, 1), Nfile=Nfile)
    block.attrs.set("ndarray.ndim", np.int32(3), "i4")
    block.attrs.set("ndarray.strides",
                    np.asarray([nm * nm, nm, 1], dtype=np.int64), "i8")
    block.attrs.set("ndarray.shape",
                    np.asarray([nm, nm, nm], dtype=np.int64), "i8")
    block.attrs.set("Nmesh", np.int32(nm), "i4")
    block.attrs.set("BoxSize", float(pm.BoxSize[0]), "f8")


def read_real(pm: PM, filename: str, blockname: str) -> np.ndarray:
    bf = BigFile(filename)
    block = bf.open_block(blockname)
    return block.read_all().reshape(pm.rshape).astype(np.float32)
