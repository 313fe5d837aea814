-- End-to-end FOF golden config: same physics parameters as the
-- reference regression run (reference tests/nbodykit.lua;
-- run-test-nbodykit.sh pins 'Writing 1894 objects.' / '1668 objects.')
nc = 128
boxsize = 384.0
time_step = linspace(0.1, 1, 3)
output_redshifts = {0.0, 0.5}

Omega_m = 0.307494
h       = 0.6774

read_powerspectrum = "/root/repo/tests/fixtures/powerspec.txt"
linear_density_redshift = 0.0
random_seed = 100
particle_fraction = 1.0

force_mode = "fastpm"
kernel_type = "1_4"
growth_mode = "LCDM"

pm_nc_factor = 2
lpt_nc_factor = 1
np_alloc_factor = 4.0

write_snapshot = "OUTDIR/fastpm"
write_powerspectrum = "OUTDIR/powerspec"
write_fof = "OUTDIR/fastpm"
