-- End-to-end lightcone golden config: same physics parameters as the
-- reference regression run (reference tests/lightcone.lua;
-- run-test-lightcone.check pins the per-slice usmesh object counts).
nc = 64
boxsize = 512
time_step = linspace(0.1, 1, 8)
output_redshifts = {0.0}

Omega_m = 0.307494
h       = 0.6774

read_powerspectrum = "/root/repo/tests/fixtures/powerspec.txt"
random_seed = 100
remove_cosmic_variance = true

force_mode = "fastpm"
growth_mode = "LCDM"
pm_nc_factor = 1
lpt_nc_factor = 1
np_alloc_factor = 2.0
-- the reference golden log was produced with mpirun -n 4, and the
-- rand subsample column is rank-dependent (store.c:693-718)
rand_ntask = 4

write_snapshot = "OUTDIR/fastpm"
write_rfof = "OUTDIR/rfof"

particle_fraction = 1.0
dh_factor = 0.1

lc_fov = 360
lc_amin = 0.1
lc_amax = 1.0

lc_write_usmesh = "OUTDIR/usmesh"
lc_usmesh_tiles = fastpm.outerproduct({-2, -1, 0, 1}, {-2, -1, 0, 1}, {-2, -1, 0, 1})
lc_usmesh_fof_padding = 20.0
lc_usmesh_alloc_factor = 2.0
lc_usmesh_ell_limit = 200
