"""The `fastpm-tpu` command-line driver (reference: src/fastpm.c).

Runs a Lua parameter file: IC pipeline -> 2LPT -> evolution with event
handlers for per-step power spectra and interpolated snapshots.

CLI flags mirror the reference where meaningful; MPI-machinery flags
(-T threads, -y NprocY, -m memory bound) are accepted and ignored with a
note, since XLA owns threading/memory here.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from .config.params import load_params, Params
from .cosmology import Cosmology
from .solver import Solver, SolverConfig
from .powerspectrum import FuncK, sigma_tophat
from .diagnostics import attach_standard_handlers, Log
from . import ic, events as ev, transfers
from .io.snapshots import write_snapshot
from .io.fields import write_complex, read_complex

__all__ = ["main", "run_fastpm", "build_cosmology", "build_config"]


def build_cosmology(p: Params) -> Cosmology:
    return Cosmology(
        h=p.h, Omega_m=p.Omega_m, Omega_k=p.Omega_k, T_cmb=p.T_cmb,
        w0=p.w0, wa=p.wa, N_eff=p.N_eff, N_nu=p.N_nu,
        m_ncdm=tuple(p.m_ncdm or ()),
        ncdm_matterlike=p.ncdm_matterlike,
        ncdm_freestreaming=p.ncdm_freestreaming,
        ncdm_linearresponse=p.ncdm_linearresponse,
        growth_mode=p.growth_mode.lower(),
    )


def build_config(p: Params) -> SolverConfig:
    pmf = p.pm_nc_factor
    if isinstance(pmf, list) and pmf and isinstance(pmf[0], list):
        pm_nc_factor = [(row[0], row[1]) for row in pmf]
    elif isinstance(pmf, list):
        pm_nc_factor = pmf[0]
    else:
        pm_nc_factor = pmf
    return SolverConfig(
        nc=p.nc, boxsize=p.boxsize, time_step=list(p.time_step),
        force_mode=p.force_mode, kernel_type=p.kernel_type,
        softening_type=p.force_softening_type,
        painter_type=p.painter_type, painter_support=p.painter_support,
        pm_nc_factor=pm_nc_factor, lpt_nc_factor=p.lpt_nc_factor,
        use_shift=p.shift, za=p.za,
        compute_potential=p.compute_potential,
        compute_tidal=bool(p.get("compute_tidal", False)),
        np_alloc_factor=p.np_alloc_factor,
        rand_ntask=int(p.get("rand_ntask", 1)),
        # rand is consumed by subsampled snapshots and lightcone
        # subsampling only (src/fastpm.c:1025-1046, 1453)
        need_rand=bool(p.particle_fraction < 1
                       or p.lc_write_usmesh),
        pgdc=p.pgdc, pgdc_alpha0=p.pgdc_alpha0, pgdc_A=p.pgdc_A,
        pgdc_B=p.pgdc_B, pgdc_kl=p.pgdc_kl, pgdc_ks=p.pgdc_ks,
        # the reference's pm_check_values runs on every CLI run
        # (gravity.c:350-383); the in-program flag + deferred fetch
        # make it free here (the P(k) handler fetches scalars per
        # step anyway)
        check_values=True,
    )


def prepare_deltak(solver: Solver, p: Params, log: Log):
    """The IC pipeline (src/fastpm.c:prepare_deltak), delta_k normalized
    at z=0 on the lptpm mesh."""
    pm = solver.lptpm
    c = solver.cosmology

    if p.read_lineark:
        log.info("Reading Fourier space linear overdensity from %s",
                 p.read_lineark)
        import jax.numpy as jnp
        from .mesh import put_complex
        dk = put_complex(read_complex(pm, p.read_lineark, "LinearDensityK"))
        if p.inverted_ic:
            dk = -dk
        dk = ic.rescale_linear(pm, dk, c, 1.0, p.linear_density_redshift)
        return dk, None

    if not p.read_powerspectrum:
        raise SystemExit("Need a power spectrum to start the simulation.")

    log.info("Powerspecectrum file: %s", p.read_powerspectrum)
    pk = FuncK.from_file(p.read_powerspectrum)
    log.info("Found %d pairs of values in input spectrum table", pk.size)
    sigma8_input = sigma_tophat(pk, 8.0)
    log.info("Input power spectrum sigma8 %f", sigma8_input)
    if p.sigma8 > 0:
        log.info("Expected power spectrum sigma8 %g; correction applied.",
                 p.sigma8)
        pk = FuncK(pk.k, pk.f * (p.sigma8 / sigma8_input) ** 2)

    import jax.numpy as jnp
    if p.read_whitenoisek:
        log.info("Reading Fourier white noise file from '%s'.",
                 p.read_whitenoisek)
        from .mesh import put_complex as _pc
        dk = _pc(read_complex(pm, p.read_whitenoisek, "WhiteNoiseK"))
    else:
        dk = ic.gaussian_white_noise(pm, p.random_seed, "gadget")

    if p.remove_cosmic_variance:
        log.info("Remove Cosmic variance from initial condition.")
        dk = ic.remove_variance(dk)

    if p.set_mode:
        method = "add" if p.set_mode_method == "add" else "override"
        log.info("SetMode is %s", method)
        for i, m in enumerate(p.set_mode):
            dk = transfers.set_mode(pm, dk, m[:4], m[4], method)
            got = transfers.get_mode(pm, dk, m[:4])
            log.info("SetMode %d : %d %d %d %d value = %g, to = %g",
                     i, int(m[0]), int(m[1]), int(m[2]), int(m[3]),
                     m[4], got)

    if p.inverted_ic:
        dk = -dk

    variance = pm.compute_variance(dk)
    log.info("Variance of input white noise is %0.8f, expectation is %0.8f",
             variance, 1.0 - 1.0 / pm.Norm)

    if p.write_whitenoisek:
        log.info("Writing Fourier white noise to file '%s'.",
                 p.write_whitenoisek)
        write_complex(pm, dk, p.write_whitenoisek, "WhiteNoiseK")

    if p.f_nl_type != "none":
        from .png import PNGaussian
        kmax = (p.nc / 2.0 * 2.0 * np.pi / p.boxsize
                * p.kmax_primordial_over_knyquist)
        log.info("Will set Phi_Gaussian(k)=0 for k>=%f.", kmax)
        log.info("Inducing non gaussian correlation to the white noise.")
        png = PNGaussian(fNL=p.f_nl, kmax_primordial=kmax, pk=pk,
                         h=p.h, scalar_amp=p.scalar_amp,
                         scalar_pivot=p.scalar_pivot,
                         scalar_spectral_index=p.scalar_spectral_index,
                         type=p.f_nl_type)
        dk = png.induce_correlation(pm, dk)
    else:
        log.info("Inducing correlation to the white noise.")
        dk = ic.induce_correlation(pm, dk, pk)
    dk = ic.rescale_linear(pm, dk, c, 1.0, p.linear_density_redshift)

    # set the mean to 1.0 (src/fastpm.c:561-565)
    dk = transfers.set_mode(pm, dk, (0, 0, 0, 0), 1.0, "override")

    if p.constraints:
        from .constrained import apply_constraints
        log.info("Applying %d constraints.", len(p.constraints))
        for i, cns in enumerate(p.constraints):
            log.info("Constraint %d : %g %g %g peak-sigma = %g", i,
                     cns[0], cns[1], cns[2], cns[3])
        if p.write_lineark:
            log.info("Writing fourier space linear field before "
                     "constraints to %s", p.write_lineark)
            write_complex(pm, dk, p.write_lineark,
                          "UnconstrainedLinearDensityK")
        dk = apply_constraints(pm, dk, p.constraints, pk, log)
    elif p.write_lineark:
        log.info("Writing fourier space linear field to %s", p.write_lineark)
        write_complex(pm, dk, p.write_lineark, "LinearDensityK")
    if p.write_linearr:
        # real-space linear field (src/fastpm.c:685-689)
        log.info("Writing real space linear field to %s", p.write_linearr)
        from .io.fields import write_real
        write_real(pm, pm.c2r(dk), p.write_linearr, "LinearDensityR")
    return dk, pk


class SnapshotChecker:
    """Interpolation-event handler writing snapshots at each aout
    (check_snapshots, src/fastpm.c:1144-1209)."""

    def __init__(self, solver: Solver, p: Params, log: Log,
                 n_writers: int = 0):
        self.solver = solver
        self.p = p
        self.log = log
        self.aout = sorted(p.aout or [])
        self.iout = 0
        self.n_writers = n_writers  # CLI -W: concurrent writer threads
        # the particle-snapshot write runs on this background thread so
        # evolve() continues stepping while the O(N) column fetch +
        # file IO drain (io.c:349-360 writer-throttling analog; the
        # snapshot stores are fresh interpolated copies, so the solver
        # is free to keep mutating its own species meanwhile)
        self._io_pool = None
        self._io_futures = []

    def _submit_io(self, fn):
        if self._io_pool is None:
            from concurrent.futures import ThreadPoolExecutor
            self._io_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="snapshot-io")
        self._check_io()
        self._io_futures.append(self._io_pool.submit(fn))

    def _check_io(self):
        done = [f for f in self._io_futures if f.done()]
        for f in done:
            self._io_futures.remove(f)
            f.result()  # re-raise background write failures

    def flush(self):
        """Join all in-flight snapshot writes (end of run)."""
        for f in list(self._io_futures):
            f.result()
        self._io_futures = []
        if self._io_pool is not None:
            self._io_pool.shutdown(wait=True)
            self._io_pool = None

    def __call__(self, event):
        log = self.log
        log.info("Checking Snapshots (%0.4f %0.4f)", event.a1, event.a2)
        # mirror src/fastpm.c:1165-1205: scan pending aouts; ranges are
        # semi-closed (a1, a2] except the zero-length initial/final events
        for iout in range(self.iout, len(self.aout)):
            aout = self.aout[iout]
            if event.a1 == event.a2:
                if event.a1 != aout:
                    continue
            else:
                if event.a1 >= aout or event.a2 < aout:
                    continue
            self.write_one(aout, event)
            self.iout = iout + 1

    def write_one(self, aout, event):
        p, log, s = self.p, self.log, self.solver
        gi = s.cosmology.growth_info(aout)
        snapshot = {}
        for name in s.iter_species():
            snapshot[name] = s.set_snapshot(s.species[name], event.drift,
                                            event.kick, aout)
        cdm = snapshot["cdm"]
        log.info("Snapshot a_x = %6.4f, a_v = %6.4f", cdm.a_x, cdm.a_v)
        log.info("Growth factor of snapshot %6.4f (a=%0.4f)", gi.D1, aout)
        log.info("Growth rate of snapshot %6.4f (a=%0.4f)", gi.f1, aout)

        if p.write_runpb_snapshot:
            # RunPB only has CDM (src/fastpm.c:1533-1545)
            from .io.legacy import write_runpb_snapshot
            path = "%s_%0.04f.bin" % (p.write_runpb_snapshot, aout)
            v_internal = np.asarray(cdm.v) * aout / 100.0
            write_runpb_snapshot(path, np.asarray(cdm.x), v_internal,
                                 np.asarray(cdm.id).reshape(-1), aout,
                                 s.cosmology.E(aout), p.boxsize)
            log.info("runpb snapshot %s written z = %6.4f a = %6.4f",
                     path, 1.0 / aout - 1, aout)
        if p.write_snapshot:
            path = "%s_%0.04f" % (p.write_snapshot, aout)
            log.info("Writing a snapshot header to %s", path)
            if s.lra is not None and s.lra.init_done:
                # persist the neutrino linear-response state with every
                # snapshot so LRA runs restart exactly
                # (ncdm_lr_save_neutrinos; io.c:591-596,
                # neutrinos_lra.c:329-473). Written NOW (the history
                # grows as evolve() continues) -- only the particle
                # columns ride the background thread.
                from .io.bigfile import BigFile
                s.lra.save(BigFile(path, create=True))
                log.info("Saved neutrino linear-response state "
                         "(%d history entries)", len(s.lra.scalefact))

            def do_write(path=path, snapshot=snapshot):
                rsd = write_snapshot(path, s.cosmology, snapshot,
                                     p.nc, p.boxsize,
                                     param_text=p.source,
                                     sort_by_id=p.sort_snapshot,
                                     particle_fraction=p.particle_fraction,
                                     n_writers=self.n_writers)
                log.info("RSD factor %e", rsd)
                log.info("Writing %d objects.",
                         snapshot["cdm"].np_local)

            # off the critical path: evolve() keeps stepping while the
            # fetch+write drains; run_fastpm flushes at the end
            self._submit_io(do_write)
        if p.write_fof:
            from .fof import find_halos
            from .io.snapshots import write_halo_catalog
            ll = p.fof_linkinglength * p.boxsize / p.nc
            cat, _ = find_halos(snapshot["cdm"].wrap(p.boxsize), ll,
                                p.boxsize, nmin=int(p.fof_nmin))
            dataset = "LL-%05.3f" % p.fof_linkinglength
            path = "%s_%0.04f" % (p.write_fof, aout)
            log.info("Writing a catalog to %s [%s]", path, dataset)
            write_halo_catalog(path, dataset, cat, s.cosmology,
                               aout, p.nc, p.boxsize,
                               M0=snapshot["cdm"].M0)
            log.info("Writing %d objects.", cat.nhalo)
        if p.write_rfof:
            from .fof import rfof_find_halos
            from .io.snapshots import write_halo_catalog
            sep = p.boxsize / p.nc
            z = 1.0 / aout - 1.0
            cat, _ = rfof_find_halos(
                snapshot["cdm"].wrap(p.boxsize), p.boxsize, z, s.cosmology,
                nmin=int(p.rfof_nmin),
                linkinglength=p.rfof_linkinglength * sep,
                l1=p.rfof_l1 * sep, l6=p.rfof_l6 * sep,
                A1=p.rfof_a1 * sep, A2=p.rfof_a2 * sep,
                B1=p.rfof_b1, B2=p.rfof_b2)
            path = "%s_%0.04f" % (p.write_rfof, aout)
            log.info("Writing a catalog to %s [RFOF]", path)
            write_halo_catalog(path, "RFOF", cat, s.cosmology,
                               aout, p.nc, p.boxsize,
                               M0=snapshot["cdm"].M0)
            log.info("Writing %d objects.", cat.nhalo)
        if p.write_nonlineark:
            from .gravity import paint_delta_k
            from .painter import Painter
            pm = s.basepm
            painter = Painter(pm, s.config.painter_type,
                              s.config.painter_support)
            dk = paint_delta_k(pm, painter, [snapshot["cdm"].wrap(pm.BoxSize)])
            path = "%s_%0.04f" % (p.write_nonlineark, aout)
            log.info("Writing nonlinear density K to %s", path)
            write_complex(pm, dk, path, "DensityK")


def _prepare_time_step(all_steps, a0):
    """Truncate the timestep list for a restart at a0
    (prepare_time_step, src/fastpm.c:593-613)."""
    i = -1
    for j, a in enumerate(all_steps):
        if a > a0 + 1e-7:
            break
        i = j
    return [a0] + [a for a in all_steps[i + 1:] if a > a0 + 1e-7]


def prepare_runpbic(solver: Solver, path: str, a0: float, log: Log):
    """Initialize from a RunPB TPM IC set (read_runpb_ic,
    src/runpb.c:150-299): recover the ZA/2LPT displacements from the
    file's (position, velocity) pair using the fitting growth rates
    f1 = Omega^(4/7), f2 = Omega^(6/11), reset particles to the
    half-cell-shifted lattice, then evolve with 2LPT to a0."""
    import jax.numpy as jnp
    from .io.legacy import read_runpb_snapshot

    data = read_runpb_snapshot(path)
    aa = float(data["aa"])
    log.info("RunPB IC at a = %g from %s", aa, path)
    c = solver.cosmology
    nc = solver.config.nc
    boxsize = solver.config.boxsize
    D = c.growth_info(aa).D1
    omega = c.Omega_cdm_a(aa)
    f1 = omega ** (4.0 / 7)
    f2 = omega ** (6.0 / 11)

    ids = data["id"].astype(np.int64)
    x = data["x"].astype(np.float64)          # box units [0,1)
    v = data["v"].astype(np.float64)          # RunPB RSD units
    strides = np.array([nc * nc, nc, 1], dtype=np.int64)
    lattice = np.stack([(ids // strides[d]) % nc for d in range(3)],
                       axis=-1)
    opos = lattice * (1.0 / nc) + 0.5 / nc
    disp = x - opos
    disp = np.where(disp < -0.5, disp + 1.0, disp)
    disp = np.where(disp > 0.5, disp - 1.0, disp)
    dx1 = (v - disp * 2 * f2) / (f1 - 2 * f2) / D * boxsize
    dx2 = (v - disp * f1) / (2 * f2 - f1) / (D * D) * boxsize
    q = np.remainder(opos * boxsize, boxsize)
    log.info("dx1 disp: %g %g %g", *np.sqrt((dx1 ** 2).mean(axis=0)))
    log.info("dx2 disp: %g %g %g", *np.sqrt((dx2 ** 2).mean(axis=0)))

    p = solver.species["cdm"]
    cell = boxsize / nc
    p = p.replace(x=jnp.asarray(q.astype(np.float32)),
                  v=jnp.zeros_like(p.v),
                  id=jnp.asarray(ids),
                  dx1=jnp.asarray(dx1.astype(np.float32)),
                  dx2=jnp.asarray(dx2.astype(np.float32)),
                  q_shift=(0.5 * cell,) * 3,
                  q_scale=(cell,) * 3, q_nc=(nc, nc, nc))
    solver.species["cdm"] = p
    solver.setup_lpt(None, a0)


def restore_species(solver: Solver, path: str, dataset: str, log: Log):
    """Read a species back from a snapshot, inverting the unit
    conversion (prepare_cdm restart path, src/fastpm.c:616-648)."""
    import jax.numpy as jnp
    from .io.snapshots import read_species
    data = read_species(path, dataset)
    attrs = data["_attrs"]
    a_x = float(attrs["a.x"])
    a_v = float(attrs["a.v"])
    if abs(a_x - a_v) > 1e-12:
        raise SystemExit("restart snapshot must be synced (a_x == a_v)")
    x = jnp.asarray(data["x"].astype(np.float32))
    # snapshot velocity is peculiar km/s; internal = v * a / 100
    v = jnp.asarray((data["v"] * a_x / 100.0).astype(np.float32))
    ids = data["id"].reshape(-1)
    nc = solver.config.nc
    store = solver.species["cdm"].replace(
        x=x, v=v,
        id=jnp.asarray(ids.astype(np.uint32 if ids.max() < 2 ** 32
                                  else np.int64)),
        a_x=a_x, a_v=a_v, M0=float(attrs["M0"]),
        q_scale=tuple(attrs["q.scale"]),
        q_shift=tuple(attrs["q.shift"]),
    )
    log.info("Restarted species %s at a = %0.4f with %d particles",
             dataset, a_x, store.np_local)
    return store, a_x


def prepare_lc(solver: Solver, p: Params, log: Log):
    """Set up the particle lightcone (prepare_lc, src/fastpm.c:860-975)
    and its ready handler (usmesh_ready_handler, src/fastpm.c:982-1140)."""
    from .lightcone import (LightCone, USMesh, volume_density_from_ell)
    from .io.snapshots import write_snapshot_header
    from .io.bigfile import BigFile

    if not p.lc_write_usmesh:
        return None

    octants = [False] * 8
    for o in (p.lc_octants or []):
        octants[int(o) % 8] = True
        log.info("Using Octant %d", int(o))

    lc = LightCone(cosmology=solver.cosmology,
                   glmatrix=np.asarray(p.lc_glmatrix, dtype=np.float64),
                   fov=p.lc_fov, octants=tuple(octants),
                   dh_factor=p.dh_factor)

    lc_amin = p.lc_amin if p.lc_amin else p.time_step[0]
    lc_amax = p.lc_amax if p.lc_amax else p.time_step[-1]
    log.info("Unstructured Lightcone amin= %g amax=%g", lc_amin, lc_amax)

    tiles = np.asarray(p.lc_usmesh_tiles, dtype=np.float64) * p.boxsize
    # global capacity = sum of per-rank capacities: lc_usmesh_alloc *
    # (CDM np_upper = nc^3 * np_alloc_factor); sets the ready-flush
    # threshold (lightcone-usmesh.c:584 checks np > 0.5 np_upper)
    nupper = int(p.lc_usmesh_alloc_factor * p.np_alloc_factor
                 * p.nc ** 3)
    mesh = USMesh(lc, lambda: solver.species["cdm"], tiles,
                  amin=lc_amin, amax=lc_amax,
                  target_volume=p.lc_usmesh_alloc_factor * p.boxsize ** 3,
                  np_upper=nupper)

    nslices = int(p.lc_usmesh_nslices)
    log.info("Generating an AemitIndex with %d layers for usmesh. ",
             nslices)
    edges = np.linspace(0.0, 1.0, nslices + 1)
    counts = np.zeros(nslices + 2, dtype=np.int64)
    fof_counts = {k: np.zeros(nslices + 2, dtype=np.int64)
                  for k in ("fof", "rfof")}
    state = {"first": True, "tail_fof": None, "tail_rfof": None,
             "first_fof": True, "first_rfof": True}
    filebase = p.lc_write_usmesh
    density = (p.nc / p.boxsize) ** 3

    def lightcone_fof(rec_d, nrec, af, kind="fof"):
        """usmesh FOF with tail carry-over (run_usmesh_fof,
        src/fastpm.c:1334-1400, _halos_ready:1211-1260).  kind="rfof"
        runs the relaxed finder instead (deviation: each finder keeps
        its own tail; the reference shares one tail store between the
        two, which only matters when both are enabled at once).

        The batch and the carried tail stay DEVICE arrays end-to-end
        (the reference keeps all slice work distributed,
        src/fastpm.c:982-1135): only the compacted halo catalog, the
        boundary-risky radius rows (host-f64 patch of the tail cut),
        and a few scalars cross to host -- no O(N_slice) x/v fetch."""
        import jax.numpy as jnp
        from .fof import find_halos, rfof_find_halos
        from .store import Store

        cols = ("x", "v", "id", "aemit")
        if rec_d is not None and nrec > 0:
            new = {k: (rec_d[k][:nrec].reshape(-1) if k == "id"
                       else rec_d[k][:nrec]) for k in cols}
        else:
            new = {"x": jnp.zeros((0, 3), jnp.float32),
                   "v": jnp.zeros((0, 3), jnp.float32),
                   "id": jnp.zeros((0,), jnp.uint32),
                   "aemit": jnp.zeros((0,), jnp.float32)}
        tail = state["tail_" + kind]
        have_tail = tail is not None and int(tail["aemit"].shape[0])
        if have_tail and int(new["aemit"].shape[0]):
            comb = {k: jnp.concatenate([new[k], tail[k]]) for k in cols}
        elif have_tail:
            comb = {k: tail[k] for k in cols}
        else:
            comb = new
        if int(comb["aemit"].shape[0]) == 0:
            return
        st = Store(x=comb["x"], v=comb["v"], id=comb["id"],
                   aemit=comb["aemit"])
        if kind == "rfof":
            # "Use the average redshift -- this is bad if the slices
            # are large!" (src/fastpm.c:1319).  The reference reads
            # meta.a_x of the usmesh store; we use the mean aemit of
            # the combined batch, which is that average.
            # np.mean over a host copy of the one aemit column,
            # bit-identical to the pre-device-tail behavior (4 B/row,
            # rfof-only; aemit is host-fetched per slice anyway)
            a_avg = float(np.mean(np.asarray(comb["aemit"])))
            sep = p.boxsize / p.nc
            cat, ihalo = rfof_find_halos(
                st, p.boxsize, 1.0 / a_avg - 1.0, solver.cosmology,
                nmin=int(p.rfof_nmin),
                linkinglength=p.rfof_linkinglength * sep,
                l1=p.rfof_l1 * sep, l6=p.rfof_l6 * sep,
                A1=p.rfof_a1 * sep, A2=p.rfof_a2 * sep,
                B1=p.rfof_b1, B2=p.rfof_b2, periodic=False)
        else:
            ll = p.fof_linkinglength * p.boxsize / p.nc
            cat, ihalo = find_halos(st, ll, p.boxsize,
                                    nmin=int(p.fof_nmin), periodic=False)
        padding = p.lc_usmesh_fof_padding
        rmin = float(lc.horizon.distance(af))
        r_h = lc.distance_of(cat.x)
        established = r_h > rmin + 0.5 * padding

        # device radius with host-f64 patching of boundary-risky rows:
        # the f32 |x| can flip a particle across the tail threshold
        # relative to the old host-f64 cut, so rows within an error
        # margin are refetched (few) and decided exactly
        thresh = rmin + padding
        if lc.fov <= 0:
            r_p = comb["x"][:, 2]
        else:
            r_p = jnp.sqrt(jnp.sum(comb["x"] * comb["x"], axis=-1))
        near_tail = r_p <= jnp.float32(thresh)
        eps = jnp.float32(max(4e-7 * abs(thresh), 1e-4))
        risky = jnp.abs(r_p - jnp.float32(thresh)) < eps
        nrisky = int(jnp.sum(risky.astype(jnp.int32)))
        if nrisky:
            ridx = jnp.nonzero(risky, size=nrisky)[0]
            xr = np.asarray(comb["x"][ridx], dtype=np.float64)
            near_h = lc.distance_of(xr) <= thresh
            near_tail = near_tail.at[ridx].set(jnp.asarray(near_h))
        ih = jnp.asarray(ihalo)
        inh = ih >= 0
        if len(established):
            in_est = jnp.where(
                inh, jnp.asarray(established)[jnp.clip(ih, 0, None)],
                False)
        else:
            in_est = jnp.zeros_like(inh)
        keep_for_tail = near_tail & ~in_est
        ntail = int(jnp.sum(keep_for_tail.astype(jnp.int32)))
        tidx = jnp.nonzero(keep_for_tail, size=ntail)[0]
        state["tail_" + kind] = {k: v[tidx] for k, v in comb.items()}
        log.info("%d particles will be reused in next batch for "
                 "usmesh FOF", ntail)

        rows = np.flatnonzero(established)
        order = rows[np.argsort(cat.aemit[rows], kind="stable")] \
            if cat.aemit is not None else rows
        dataset = "RFOF" if kind == "rfof" \
            else "LL-%05.3f" % p.fof_linkinglength
        counts_k = fof_counts[kind]
        bf = BigFile(filebase, create=True)
        blocks = (("Length", cat.length[order].astype(np.int32)),
                  ("Position", cat.x[order].astype(np.float32)),
                  ("Velocity", cat.v[order].astype(np.float32)),
                  ("MinID", cat.minid[order].astype(np.int64)),
                  ("Aemit", (cat.aemit[order]
                             if cat.aemit is not None
                             else np.zeros(len(order))).astype(np.float32)))
        if state["first_" + kind]:
            for name, arr in blocks:
                bf.create_block(f"{dataset}/{name}", arr)
            state["first_" + kind] = False
        else:
            for name, arr in blocks:
                bf.open_block(f"{dataset}/{name}").append(arr)
        if cat.aemit is not None and len(order):
            idx = np.searchsorted(edges, cat.aemit[order], side="right")
            counts_k[:] += np.bincount(idx, minlength=nslices + 2)
        root = bf.open_block(dataset)
        root.attrs.set("aemitIndex.edges", edges, "f8")
        root.attrs.set("aemitIndex.size", counts_k[:nslices + 2], "i8")
        root.attrs.set("aemitIndex.offset",
                       np.concatenate([[0], np.cumsum(counts_k)]), "i8")
        log.info("Writing a catalog to %s [%s]", filebase, dataset)
        log.info("Writing %d objects.", len(order))

    # device slice pipeline state: jitted subsample+sort+compact
    # programs cached per (cap, cap_out) power-of-two bucket
    slice_jits = {}

    def slice_sort_compact(rec_d, keep_host):
        """Subsample + aemit-sort + compaction ON DEVICE; only the
        write-ready arrays are fetched (the reference keeps all slice
        work distributed, src/fastpm.c:982-1135). keep_host is the
        host-f64 subsample mask over the first n rows."""
        import jax
        import jax.numpy as jnp
        n = rec_d["n"]
        cap = rec_d["aemit"].shape[0]
        cols = [k for k in ("x", "v", "id", "aemit", "rand")
                if k in rec_d]
        keep = np.zeros(cap, dtype=bool)
        keep[:n] = keep_host
        keep_d = jnp.asarray(keep)
        key = ("sort", cap, tuple(cols))
        fn = slice_jits.get(key)
        if fn is None:
            @jax.jit
            def fn(rec, keep):
                a = jnp.where(keep, rec["aemit"], jnp.inf)
                payload = [rec[k] for k in cols]
                # row payloads sort as separate scalar keys
                flat = []
                for v in payload:
                    if v.ndim == 2:
                        flat += [v[:, i] for i in range(v.shape[1])]
                    else:
                        flat.append(v)
                out = jax.lax.sort((a,) + tuple(flat), num_keys=1)
                return out[1:], jnp.sum(keep.astype(jnp.int32))
            slice_jits[key] = fn
        flat_sorted, nk = fn({k: rec_d[k] for k in cols}, keep_d)
        nkeep = int(nk)
        # fetch only a power-of-two envelope of the KEPT rows (the
        # padded capacity can be far larger after heavy subsampling)
        cap2 = 1024
        while cap2 < nkeep:
            cap2 *= 2
        cap2 = min(cap2, cap)

        def fetch(a):
            return np.asarray(a[:cap2])[:nkeep]

        out = {}
        i = 0
        for k in cols:
            v = rec_d[k]
            if v.ndim == 2:
                w = np.stack([fetch(flat_sorted[i + j])
                              for j in range(v.shape[1])], axis=-1)
                i += v.shape[1]
            else:
                w = fetch(flat_sorted[i])
                i += 1
            out[k] = w
        return out, nkeep

    def ready(event):
        rec_d = event.mesh.drain_device()
        n = 0 if rec_d is None else rec_d["n"]
        log.info("Unstructured LightCone ready : ai = %g af = %g, n = %d",
                 event.ai, event.af, n)
        if rec_d is None:
            rec = dict(x=np.zeros((0, 3), np.float32),
                       v=np.zeros((0, 3), np.float32),
                       aemit=np.zeros(0, np.float32),
                       id=np.zeros(0, np.int64),
                       rand=np.zeros(0, np.float32))
        else:
            # host copies of the SMALL columns driving the subsample
            # math (bit-identical f64 fractions); x/v stay on device --
            # the FOF tail and healpix painting are device-resident
            rec = {k: np.asarray(v)[:n] for k, v in rec_d.items()
                   if k in ("aemit", "rand", "id")}
        # HEALPix shell maps from the PRE-subsample crossings
        # (src/fastpm.c:1009-1012; io.c:1105-1227): NEST pixels, Mass +
        # radial momentum per (slice, pixel). Painted ON DEVICE with
        # exact-host patching of boundary-risky rows -- no O(N_slice)
        # x/v fetch (the reference keeps maps distributed, io.c:1073)
        nside = int(p.lc_usmesh_healpix_nside)
        if nside > 0 and rec_d is not None and n > 0:
            from .healpix import paint_hpmap_nest_device, nside2npix
            M0 = solver.species["cdm"].M0
            ids, mass_map, rmom_map, amid = paint_hpmap_nest_device(
                rec_d["x"], rec_d["aemit"], rec_d["v"], n, M0,
                nside, nslices)
            blocks = (("ID", ids.astype(np.int64)),
                      ("Aemit", amid.astype(np.float32)),
                      ("Mass", mass_map.astype(np.float32)),
                      ("Rmom", rmom_map.astype(np.float32)))
            bf = BigFile(filebase, create=True)
            if not bf.has_block("HEALPIX/ID"):
                for name, arr in blocks:
                    bf.create_block("HEALPIX/" + name, arr)
            else:
                for name, arr in blocks:
                    bf.open_block("HEALPIX/" + name).append(arr)
            mroot = bf.open_block("HEALPIX")
            mroot.attrs.set("healpix.nside", np.int64(nside), "i8")
            mroot.attrs.set("healpix.npix",
                            np.int64(nside2npix(nside)), "i8")
            mroot.attrs.set("healpix.nslices", np.int64(nslices), "i8")
            mroot.attrs.set("healpix.scheme", "NEST")
            idx = np.searchsorted(edges, amid, side="right")
            counts_hp = fof_counts.setdefault(
                "healpix", np.zeros(nslices + 2, dtype=np.int64))
            counts_hp += np.bincount(idx, minlength=nslices + 2)
            mroot.attrs.set("aemitIndex.edges", edges, "f8")
            mroot.attrs.set("aemitIndex.size",
                            counts_hp[:nslices + 2], "i8")
            mroot.attrs.set("aemitIndex.offset",
                            np.concatenate([[0], np.cumsum(counts_hp)]),
                            "i8")
            log.info("Writing a catalog to %s [HEALPIX]", filebase)
            log.info("Writing %d objects.", len(ids))

        for kind, want in (("fof", p.write_fof), ("rfof", p.write_rfof)):
            tail = state["tail_" + kind]
            flush = (event.whence == ev.TIMESTEP_END and tail is not None
                     and int(tail["aemit"].shape[0]))
            if want and (n > 0 or flush):
                lightcone_fof(rec_d, n, event.af, kind)

        # subsample (ell-limited or uniform; src/fastpm.c:1025-1046).
        # The keep mask is host float64 (bit-identical to the
        # reference's per-particle doubles); sort + compaction run on
        # device (slice_sort_compact).
        if p.lc_usmesh_ell_limit > 0:
            # vectorized volume_density_from_ell, op-for-op the scalar
            # formula (horizon.c:150-158) so the f64 rounding matches
            m = np.maximum(rec["aemit"].astype(np.float64), 1e-3)
            z = 1.0 / m - 1.0
            r = lc.horizon.distance(1.0 / (1 + z))
            s_lim = r * (np.pi / p.lc_usmesh_ell_limit)
            with np.errstate(divide="ignore"):
                dens = (1.0 / s_lim) ** 3
            frac = np.minimum(1.0, dens / density)
            if len(frac):
                log.info("Subsampling to density %g (a = %06.4f) ~ %g "
                         "(a = %06.4f), ",
                         min(1.0, volume_density_from_ell(
                             p.lc_usmesh_ell_limit,
                             1 / max(event.ai, 1e-3) - 1,
                             lc.horizon) / density),
                         event.ai,
                         min(1.0, volume_density_from_ell(
                             p.lc_usmesh_ell_limit,
                             1 / max(event.af, 1e-3) - 1,
                             lc.horizon) / density),
                         event.af)
            # reference keeps on rand <= fraction (store.c:993)
            keep = rec["rand"] <= frac if "rand" in rec else \
                np.ones(len(frac), dtype=bool)
        elif p.particle_fraction < 1:
            keep = rec["rand"] <= p.particle_fraction
        else:
            keep = np.ones(n, dtype=bool)

        if rec_d is not None:
            rec, nkeep = slice_sort_compact(rec_d, keep)
        else:
            rec = {k: v[keep] for k, v in rec.items()}
            order = np.argsort(rec["aemit"], kind="stable")
            rec = {k: v[order] for k, v in rec.items()}
            nkeep = int(keep.sum())
        idx = np.searchsorted(edges, rec["aemit"], side="right")
        counts[:] += np.bincount(idx, minlength=nslices + 2)

        bf = BigFile(filebase, create=True)
        if state["first"]:
            log.info("Creating usmesh catalog in %s", filebase)
            write_snapshot_header(bf, solver.cosmology,
                                  p.time_step[-1], p.nc, p.boxsize,
                                  solver.species)
            bf.open_block("Header").attrs.set("ParamFile", p.source)
            for name, arr, dtype in (
                    ("Position", rec["x"], "f4"),
                    ("Velocity", rec["v"], "f4"),
                    ("ID", rec["id"], "i8"),
                    ("Aemit", rec["aemit"], "f4"),
                    ("Rand", rec.get("rand", np.zeros(0, np.float32)), "f4")):
                bf.create_block("1/" + name, arr.astype(dtype))
            state["first"] = False
        else:
            log.info("Appending usmesh catalog to %s", filebase)
            for name, arr, dtype in (
                    ("Position", rec["x"], "f4"),
                    ("Velocity", rec["v"], "f4"),
                    ("ID", rec["id"], "i8"),
                    ("Aemit", rec["aemit"], "f4"),
                    ("Rand", rec.get("rand", np.zeros(0, np.float32)), "f4")):
                bf.open_block("1/" + name).append(arr.astype(dtype))
        # aemit index attrs (io.c:1001-1050)
        root = (bf.open_block("1") if bf.has_block("1")
                else bf.create_block("1"))
        root.attrs.set("aemitIndex.edges", edges, "f8")
        root.attrs.set("aemitIndex.size", counts[:nslices + 2], "i8")
        offset = np.concatenate([[0], np.cumsum(counts)])
        root.attrs.set("aemitIndex.offset", offset, "i8")
        log.info("Writing %d objects.", nkeep)

    mesh.event_handlers.on(ev.EVENT_LIGHTCONE_READY, ev.STAGE_AFTER, ready)

    def check_lightcone(event):
        mesh.intersect(event.drift, event.kick, event.a1, event.a2,
                       event.whence)

    solver.event_handlers.on(ev.EVENT_INTERPOLATION, ev.STAGE_BEFORE,
                             check_lightcone)
    return mesh


def make_device_mesh(nprocy: int = 0, log=None):
    """Build the jax device mesh for SPMD execution (the analog of the
    reference's 2D process mesh, pmpfft.c:108-134 with -y NprocY).
    Returns None on a single device. nprocy=0 picks a near-square 2D
    pencil for >= 4 devices, else a 1D slab."""
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()
    n = len(devs)
    if n <= 1:
        return None
    if nprocy == 0:
        ny = 1
        if n >= 4:
            ny = int(np.sqrt(n))
            while n % ny:
                ny -= 1
    else:
        ny = int(nprocy)
        if n % ny:
            raise SystemExit(f"-y {ny} does not divide {n} devices")
    arr = np.array(devs)
    if ny == 1:
        mesh = Mesh(arr, ("x",))
    else:
        mesh = Mesh(arr.reshape(n // ny, ny), ("x", "y"))
    if log is not None:
        log.info("Using a %s device mesh over %d devices",
                 dict(mesh.shape), n)
    return mesh


def run_fastpm(p: Params, log=None, restart: str = None,
               memory_bound_mb: int = 0, nprocy: int = 0,
               n_writers: int = 0) -> Solver:
    """The full run (src/fastpm.c:run_fastpm)."""
    if log is None:
        log = Log()
    c = build_cosmology(p)
    cfg = build_config(p)
    if restart:
        if p.particle_fraction != 1:
            raise SystemExit("Cannot restart because subsampling of "
                             "particles is enabled.")
        from .io.snapshots import read_snapshot_header
        hdr = read_snapshot_header(restart)
        a0 = float(hdr["ScalingFactor"])
        cfg.time_step = _prepare_time_step(list(p.time_step), a0)
        log.info("Restarting from %s at a = %0.4f", restart, a0)
    solver = Solver(cfg, c, mesh=make_device_mesh(nprocy, log))
    if p.ncdm_linearresponse:
        z_t = (p.ncdm_transfer_redshift
               if p.ncdm_transfer_redshift is not None
               else 1.0 / p.time_step[0] - 1)
        solver.setup_linear_response(z_t, p.ncdm_transfer_nu_file)
        log.info("Neutrino linear response enabled at z_transfer = %g",
                 z_t)
    attach_standard_handlers(solver, log,
                             write_powerspectrum=p.write_powerspectrum,
                             enforce_broadband_kmax=p.enforce_broadband_kmax)

    # per-transition banner + memory report (print_transition,
    # src/fastpm.c:1576-1601; report_memory:1604-1646)
    from .memory import MemoryMonitor
    monitor = MemoryMonitor(bound_bytes=(int(memory_bound_mb) << 20)
                            if memory_bound_mb else None)

    def print_transition(event):
        t = event.transition
        log.info("==== -> [%03d %03d %03d] a_i = %6.4f a_f = %6.4f "
                 "a_r = %6.4f Action = %s ====",
                 t.i_i, t.i_f, t.i_r,
                 t.a_i, t.a_f, t.a_r, t.action.upper())
        monitor.report(log)

    solver.event_handlers.on(ev.EVENT_TRANSITION, ev.STAGE_BEFORE,
                             print_transition)

    checker = SnapshotChecker(solver, p, log, n_writers=n_writers)
    solver.event_handlers.on(ev.EVENT_INTERPOLATION, ev.STAGE_BEFORE, checker)

    if p.lc_write_usmesh:
        if restart:
            raise SystemExit("FIXME: Restarting and lightcone are "
                             "currently incompatible.")
        prepare_lc(solver, p, log)

    if restart:
        store, a0 = restore_species(solver, restart, "1", log)
        solver.species["cdm"] = store
        # do not rewrite snapshots at or before the restart time
        checker.iout = sum(1 for a in checker.aout if a <= a0 + 1e-7)
        if solver.lra is not None:
            # restore the neutrino linear-response history; without it
            # a restarted LRA run would re-seed delta_nu from the
            # z_transfer input, which is wrong past z_transfer
            # (io.c:591-596; neutrinos_lra.c:329-473)
            from .io.bigfile import BigFile
            bf = BigFile(restart)
            if bf.has_block("Neutrino"):
                solver.lra.load(bf)
                log.info("Restored neutrino linear-response state "
                         "(%d history entries)",
                         len(solver.lra.scalefact))
            else:
                log.info("WARNING: LRA restart without a Neutrino "
                         "block; delta_nu history re-seeds from the "
                         "transfer input")
    elif p.read_runpbic:
        a0 = p.time_step[0]
        prepare_runpbic(solver, p.read_runpbic, a0, log)
    else:
        dk, pk = prepare_deltak(solver, p, log)
        a0 = p.time_step[0]
        solver.setup_lpt(dk, a0)
        prepare_ncdm(solver, p, a0, log)
    solver.evolve(cfg.time_step)
    checker.flush()   # join in-flight background snapshot writes
    # teardown report (run_fastpm end, src/fastpm.c:388-396)
    monitor._old_device_peak = -1   # force a final line
    monitor.report(log)
    from . import prof
    prof.report(printer=lambda s: log.info("%s", s))
    return solver


def prepare_ncdm(solver: Solver, p: Params, a0: float, log: Log):
    """Massive-neutrino particle species setup
    (prepare_ncdm, src/fastpm.c:716-847): staggered coarse lattice,
    Fermi-Dirac split, own linear field, own 2LPT."""
    if not p.m_ncdm or p.n_shell == 0:
        return
    from .ncdm import NcdmInitData, split_ncdm
    from .store import lattice_store

    every = int(p.every_ncdm)
    nc_ncdm = p.nc // every
    if p.nc % every != 0:
        raise SystemExit("nc must be divisible by every_ncdm")

    z_ref = 1.0 / p.time_step[0] - 1
    log.info("ncdm reference redshift = %g", z_ref)
    nid = NcdmInitData(boxsize=p.boxsize, cosmology=solver.cosmology,
                       z=z_ref, n_shells=int(p.n_shell),
                       n_side=int(p.n_side), lvk=p.lvk,
                       sphere_scheme=p.ncdm_sphere_scheme)

    shift0 = p.boxsize / nc_ncdm * 0.5 if p.shift else 0.0
    sites = lattice_store(solver.lptpm, Nc=nc_ncdm, shift=shift0,
                          columns=("v", "acc", "id", "rand"), name="ncdm")
    # stagger wrt the cdm grid by half a cdm cell (src/fastpm.c:785-792)
    import jax.numpy as jnp
    stag = jnp.float32(p.boxsize / p.nc * 0.5)
    sites = sites.replace(x=sites.x + stag,
                          q_shift=tuple(s + float(stag)
                                        for s in sites.q_shift))

    ncdm = split_ncdm(nid, sites)
    ncdm = ncdm.wrap(p.boxsize)
    log.info("average mass of a ncdm particle is %g",
             float(np.asarray(ncdm.mass).mean()) / max(1, len(p.m_ncdm)))
    solver.species["ncdm"] = ncdm

    # own linear field (fall back to cdm's inputs with a warning)
    if not p.read_lineark_ncdm and not p.read_powerspectrum_ncdm:
        log.info("WARNING: No ncdm powerspectrum input; using cdm's "
                 "instead.")
        dk, _ = prepare_deltak(solver, p, log)
    else:
        ns = dict(p.asdict())
        ns["read_lineark"] = p.read_lineark_ncdm
        ns["read_powerspectrum"] = p.read_powerspectrum_ncdm
        ns["linear_density_redshift"] = p.linear_density_redshift_ncdm
        p2 = Params(ns, source=p.source, filename=p.filename)
        dk, _ = prepare_deltak(solver, p2, log)

    growth_rate_func_k = None
    if p.read_linear_growth_rate_ncdm:
        from .powerspectrum import FuncK
        fk = FuncK.from_file(p.read_linear_growth_rate_ncdm)
        growth_rate_func_k = fk
        log.info("Reading ncdm linear growth rate from file: %s",
                 p.read_linear_growth_rate_ncdm)
    solver.setup_lpt(dk, a0, species="ncdm",
                     growth_rate_func_k=growth_rate_func_k)


def main(argv=None):
    from .cache import enable_compilation_cache
    enable_compilation_cache()

    ap = argparse.ArgumentParser(
        prog="fastpm-tpu",
        description="TPU-native FastPM cosmological N-body solver")
    ap.add_argument("-T", type=int, default=0, help="ignored (XLA threads)")
    ap.add_argument("-W", type=int, default=0, help="number of IO writers")
    ap.add_argument("-f", dest="fftw", action="store_true",
                    help="force the 1D slab decomposition (the FFTW-MPI "
                         "analog; same as -y 1)")
    ap.add_argument("-y", dest="nprocy", type=int, default=0,
                    help="2nd dimension of the device mesh (NprocY): "
                         "0 = auto (1D slab over all devices; near-"
                         "square 2D pencil when devices >= 4)")
    ap.add_argument("-m", dest="memory_bound_mb", type=int, default=0,
                    help="abort cleanly when memory usage exceeds this "
                         "many MB (0 = unbounded)")
    ap.add_argument("-r", dest="restart", default=None,
                    help="restart from snapshot path")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax profiler trace of the evolution "
                         "to DIR (view with xprof/tensorboard); the "
                         "CLOCK()-style phase clocks print regardless")
    ap.add_argument("params", help="Lua parameter file")
    ap.add_argument("args", nargs="*", help="extra arguments exposed as "
                    "`args` in the parameter file")
    ns = ap.parse_args(argv)

    import faulthandler
    faulthandler.enable()  # crash backtraces (src/stacktrace.c)
    p = load_params(ns.params, ns.args)
    if ns.profile:
        import contextlib
        import jax as _jax
        ctx = _jax.profiler.trace(ns.profile)
    else:
        import contextlib
        ctx = contextlib.nullcontext()
    with ctx:
        run_fastpm(p, restart=ns.restart,
                   memory_bound_mb=ns.memory_bound_mb,
                   nprocy=1 if ns.fftw else ns.nprocy,
                   n_writers=ns.W)
    return 0


def main_lua(argv=None):
    """fastpm-lua equivalent (src/fastpm-lua.c): compile a parameter
    file -- executing its `main` function if one is defined -- and
    print the bound parameters; -H dumps the schema instead."""
    from .config.schema import SCHEMA, SchemaError

    ap = argparse.ArgumentParser(
        prog="fastpm-tpu-lua",
        description="compile a fastpm Lua parameter file and print "
                    "the resolved parameters")
    ap.add_argument("-H", dest="dump_schema", action="store_true",
                    help="print the supported parameters and exit")
    ap.add_argument("params", nargs="?", help="Lua parameter file")
    ap.add_argument("args", nargs="*", help="extra arguments exposed "
                    "as `args` in the parameter file")
    ns = ap.parse_args(argv)

    if ns.dump_schema:
        print("Supported Parameters are: ")
        for name, ent in sorted(SCHEMA.items()):
            req = "required" if ent.required else \
                "default=%r" % (ent.default,)
            print("  %-32s %-8s %s" % (name, ent.type, req))
        return 0
    if not ns.params:
        ap.error("parameterfile is required")
    try:
        p = load_params(ns.params, ns.args, runmain=True)
    except (OSError, SchemaError) as e:
        print("fastpm-tpu-lua: %s" % e, file=sys.stderr)
        return 1
    print("Compiled parameters are: ")
    for k, v in sorted(p.asdict().items()):
        print("%s = %r" % (k, v))
    return 0


if __name__ == "__main__":
    sys.exit(main())
