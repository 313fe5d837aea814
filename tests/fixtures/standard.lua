-- A small end-to-end example run (see the reference's tests/standard.lua
-- for the full argument-branching version).
nc = 64
boxsize = 256.0
time_step = linspace(0.1, 1, 10)
output_redshifts = {1.0, 0.0}
Omega_m = 0.307494
h = 0.6774
pm_nc_factor = 2
force_mode = "fastpm"
growth_mode = "LCDM"
np_alloc_factor = 2.0
read_powerspectrum = "/root/repo/tests/fixtures/powerspec.txt"
random_seed = 100
write_snapshot = "output/fastpm"
write_powerspectrum = "output/powerspec"
write_fof = "output/fof"
fof_linkinglength = 0.2
fof_nmin = 20
