-- Small end-to-end ncdm (massive neutrino particles) run: the physics
-- parameters of the reference's tests/ncdm.lua scaled down to a
-- CPU-runnable box (the reference pins no golden numbers for it; this
-- exercises the Fermi-Dirac split, the multi-species force, and the
-- REPS-style dual-power-spectrum ICs end-to-end).
nc = 16
boxsize = 128

n_steps_log = 2
n_steps_lin = 3
z_i = 99
z_m = 19
a_i = 1. / (1. + z_i)
a_m = 1. / (1. + z_m)
a_f = 1
time_step = loglinspace(a_i, a_m, a_f, n_steps_log, n_steps_lin)

output_redshifts = {0}

Omega_m = 0.3175
h       = 0.6711
T_cmb   = 2.7255
N_eff   = 3.046
N_nu    = 3
m_ncdm  = {0.12, 0.06, 0.02}
n_shell = 4
ncdm_sphere_scheme = "fibonacci"
n_side  = 2
every_ncdm = 4
lvk = true
ncdm_freestreaming = false
ncdm_matterlike = false

read_powerspectrum = "/root/repo/tests/fixtures/Pcb.txt"
read_powerspectrum_ncdm = "/root/repo/tests/fixtures/Pncdm.txt"
read_linear_growth_rate = "/root/repo/tests/fixtures/fcb.txt"
read_linear_growth_rate_ncdm = "/root/repo/tests/fixtures/fncdm.txt"
linear_density_redshift = z_i
linear_density_redshift_ncdm = z_i

random_seed = 100
particle_fraction = 1.0

force_mode = "fastpm"
growth_mode = "ODE"
pm_nc_factor = 2
np_alloc_factor = 4.0

write_snapshot = "OUTDIR/fastpm"
write_powerspectrum = "OUTDIR/powerspec"
