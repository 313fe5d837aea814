"""Minimal HEALPix RING pixelization (ang2pix/pix2ang/nside2npix).

Standard HEALPix math (Gorski et al. 2005), implemented vectorized in
numpy -- replaces the reference's vendored chealpix for lightcone maps
(io.c:1073-1227) and the ncdm sphere split. No external healpix
dependency is available in this environment.
"""

from __future__ import annotations

import numpy as np

__all__ = ["nside2npix", "ang2pix_ring", "vec2pix_ring",
           "ang2pix_nest", "vec2pix_nest"]


def nside2npix(nside: int) -> int:
    return 12 * nside * nside


def ang2pix_ring(nside: int, theta, phi):
    """Colatitude theta [0, pi], longitude phi [0, 2pi) -> RING pixel."""
    theta = np.asarray(theta, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    z = np.cos(theta)
    za = np.abs(z)
    tt = np.mod(phi, 2 * np.pi) * (2.0 / np.pi)  # in [0,4)

    pix = np.empty(theta.shape, dtype=np.int64)

    eq = za <= 2.0 / 3.0
    # equatorial region
    if np.any(eq):
        temp1 = nside * (0.5 + tt[eq])
        temp2 = nside * z[eq] * 0.75
        jp = (temp1 - temp2).astype(np.int64)  # ascending edge line
        jm = (temp1 + temp2).astype(np.int64)  # descending edge line
        ir = nside + 1 + jp - jm               # ring number counted from z=2/3
        kshift = 1 - (ir & 1)
        ip = (jp + jm - nside + kshift + 1) // 2
        ip = np.mod(ip, 4 * nside)
        pix[eq] = nside * (nside - 1) * 2 + (ir - 1) * 4 * nside + ip

    pol = ~eq
    if np.any(pol):
        tp = tt[pol] - np.floor(tt[pol])
        tmp = nside * np.sqrt(3 * (1 - za[pol]))
        jp = (tp * tmp).astype(np.int64)
        jm = ((1.0 - tp) * tmp).astype(np.int64)
        ir = jp + jm + 1                       # ring number from the pole
        ip = (tt[pol] * ir).astype(np.int64)
        ip = np.mod(ip, 4 * ir)
        north = z[pol] > 0
        ppix = np.empty(ir.shape, dtype=np.int64)
        ppix[north] = 2 * ir[north] * (ir[north] - 1) + ip[north]
        ppix[~north] = (12 * nside * nside - 2 * ir[~north] * (ir[~north] + 1)
                        + ip[~north])
        pix[pol] = ppix
    return pix


def vec2pix_ring(nside: int, vec):
    """Unit(ish) vectors (N,3) -> RING pixels."""
    vec = np.asarray(vec, dtype=np.float64)
    r = np.sqrt((vec ** 2).sum(axis=-1))
    theta = np.arccos(np.clip(vec[..., 2] / np.where(r > 0, r, 1), -1, 1))
    phi = np.arctan2(vec[..., 1], vec[..., 0])
    phi = np.where(phi < 0, phi + 2 * np.pi, phi)
    return ang2pix_ring(nside, theta, phi)


def _spread_bits(v):
    """Interleave-ready bit spread: bit i of v moves to bit 2i
    (supports nside up to 2^16)."""
    v = v.astype(np.int64)
    v = (v | (v << 16)) & 0x0000FFFF0000FFFF
    v = (v | (v << 8)) & 0x00FF00FF00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v << 2)) & 0x3333333333333333
    v = (v | (v << 1)) & 0x5555555555555555
    return v


def ang2pix_nest(nside: int, theta, phi):
    """Colatitude/longitude -> NESTED pixel (standard HEALPix face +
    bit-interleave construction, Gorski et al. 2005; the scheme the
    reference's lightcone maps use, io.c:1130 vec2pix_nest64)."""
    theta = np.asarray(theta, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    z = np.cos(theta)
    za = np.abs(z)
    tt = np.mod(phi, 2 * np.pi) * (2.0 / np.pi)    # [0, 4)

    face = np.empty(theta.shape, dtype=np.int64)
    ix = np.empty(theta.shape, dtype=np.int64)
    iy = np.empty(theta.shape, dtype=np.int64)

    eq = za <= 2.0 / 3.0
    if np.any(eq):
        temp1 = nside * (0.5 + tt[eq])
        temp2 = nside * z[eq] * 0.75
        jp = (temp1 - temp2).astype(np.int64)
        jm = (temp1 + temp2).astype(np.int64)
        ifp = jp // nside
        ifm = jm // nside
        f = np.where(ifp == ifm, (ifp & 3) + 4,
                     np.where(ifp < ifm, ifp & 3, (ifm & 3) + 8))
        face[eq] = f
        ix[eq] = jm & (nside - 1)
        iy[eq] = nside - (jp & (nside - 1)) - 1

    pol = ~eq
    if np.any(pol):
        ntt = np.minimum(tt[pol].astype(np.int64), 3)
        tp = tt[pol] - ntt
        tmp = nside * np.sqrt(3.0 * (1.0 - za[pol]))
        jp = np.minimum((tp * tmp).astype(np.int64), nside - 1)
        jm = np.minimum(((1.0 - tp) * tmp).astype(np.int64), nside - 1)
        north = z[pol] >= 0
        face[pol] = np.where(north, ntt, ntt + 8)
        ix[pol] = np.where(north, nside - jm - 1, jp)
        iy[pol] = np.where(north, nside - jp - 1, jm)

    return (face * (nside * nside)
            + _spread_bits(ix) + (_spread_bits(iy) << 1))


def vec2pix_nest(nside: int, vec):
    """Vectors (N,3) -> NESTED pixels."""
    vec = np.asarray(vec, dtype=np.float64)
    r = np.sqrt((vec ** 2).sum(axis=-1))
    theta = np.arccos(np.clip(vec[..., 2] / np.where(r > 0, r, 1), -1, 1))
    phi = np.arctan2(vec[..., 1], vec[..., 0])
    phi = np.where(phi < 0, phi + 2 * np.pi, phi)
    return ang2pix_nest(nside, theta, phi)


def paint_hpmap_nest(pos, aemit, v, mass, nside: int, nslices: int):
    """Paint lightcone particles onto HEALPix shell maps exactly as the
    reference (fastpm_snapshot_paint_hpmap, io.c:1105-1227): NEST
    pixels, slice_id = int(aemit * nslices) WITHOUT clipping (aemit = 1
    opens an extra slice), mass and radial momentum accumulated per
    (slice, pixel), duplicate pixels combined.

    Returns (ids, mass_map, rmom_map, aemit_mid) sorted by id."""
    pos = np.asarray(pos, dtype=np.float64)
    aemit = np.asarray(aemit, dtype=np.float64)
    npix = nside2npix(nside)
    islice = (aemit * nslices).astype(np.int64)
    ipix = vec2pix_nest(nside, pos)
    ids = islice * npix + ipix
    r = np.sqrt((pos ** 2).sum(axis=-1))
    vv = np.asarray(v, dtype=np.float64)
    rmom = mass * (vv * pos).sum(axis=-1) / np.where(r > 0, r, 1.0)

    uids, inverse = np.unique(ids, return_inverse=True)
    mass_map = np.zeros(len(uids))
    np.add.at(mass_map, inverse, np.broadcast_to(
        np.asarray(mass, dtype=np.float64), len(ids)))
    rmom_map = np.zeros(len(uids))
    np.add.at(rmom_map, inverse, rmom)
    amid = (uids // npix + 0.5) / nslices
    return uids, mass_map, rmom_map, amid


def paint_hpmap(pos, aemit, nside: int, nslices: int, weights=None):
    """Paint lightcone particles onto HEALPix shell maps
    (fastpm_snapshot_paint_hpmap, io.c:1073-1227).

    Returns (ids, values, aemit_mid) arrays where id = slice * npix + ipix
    and value is the summed weight in that (slice, pixel) cell; duplicate
    pixels are combined.
    """
    pos = np.asarray(pos, dtype=np.float64)
    aemit = np.asarray(aemit, dtype=np.float64)
    npix = nside2npix(nside)
    edges = np.linspace(0.0, 1.0, nslices + 1)
    islice = np.clip(np.searchsorted(edges, aemit, side="right") - 1,
                     0, nslices - 1)
    ipix = vec2pix_ring(nside, pos)
    ids = islice.astype(np.int64) * npix + ipix
    w = (np.ones(len(pos)) if weights is None
         else np.asarray(weights, dtype=np.float64))
    uids, inverse = np.unique(ids, return_inverse=True)
    values = np.zeros(len(uids))
    np.add.at(values, inverse, w)
    amid = 0.5 * (edges[(uids // npix)] + edges[(uids // npix) + 1])
    return uids, values, amid
