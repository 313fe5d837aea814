/* RANLXD: Luscher's double-precision RANLUX generator, implementing the
 * algorithm of M. Luscher, Comput. Phys. Commun. 79 (1994) 100, in the
 * variant used by GSL's gsl_rng_ranlxd1 (luxury p=202) so that the GADGET
 * initial-condition seed sequences of the reference FastPM
 * (libfastpm/initialcondition.c:144-273) are reproduced bit-exactly.
 *
 * The generator is a subtract-with-borrow recurrence over 12 doubles each
 * holding 48 random bits: x[i] <- x[(i+7) mod 12] - x[i] - carry, with
 * luxury-level decimation (only 12 of every `pr` values are delivered).
 *
 * Also contains the GADGET N-GenIC white-noise filler: a per-(i,j) seed
 * table covering the four conjugate quadrants, Rayleigh amplitude +
 * uniform phase sampling, hermitian self-conjugate handling. It is
 * embarrassingly parallel over (i,j) columns (each re-seeds its own
 * generators), so we thread over i with OpenMP.
 */

#include <math.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#ifdef _OPENMP
#include <omp.h>
#endif

#define ONE_BIT (1.0 / 281474976710656.0) /* 1/2^48 */

typedef struct {
    double xdbl[12];
    double carry;
    int ir;
    int jr;
    int ir_old;
    int pr;
} ranlxd_t;

static const int next12[12] = {1,2,3,4,5,6,7,8,9,10,11,0};

#define RANLUX_STEP(x1, x2, i1, i2, i3)     \
    x1 = xdbl[i1] - xdbl[i2];               \
    if (x2 < 0) { x1 -= ONE_BIT; x2 += 1; } \
    xdbl[i3] = x2

static void increment_state(ranlxd_t *state)
{
    int k, kmax;
    double y1, y2, y3;
    double *xdbl = state->xdbl;
    double carry = state->carry;
    int ir = state->ir;
    int jr = state->jr;

    for (k = 0; ir > 0; ++k) {
        y1 = xdbl[jr] - xdbl[ir];
        y2 = y1 - carry;
        if (y2 < 0) { carry = ONE_BIT; y2 += 1; } else carry = 0;
        xdbl[ir] = y2;
        ir = next12[ir];
        jr = next12[jr];
    }

    kmax = state->pr - 12;

    for (; k <= kmax; k += 12) {
        y1 = xdbl[7] - xdbl[0];
        y1 -= carry;
        RANLUX_STEP(y2, y1, 8, 1, 0);
        RANLUX_STEP(y3, y2, 9, 2, 1);
        RANLUX_STEP(y1, y3, 10, 3, 2);
        RANLUX_STEP(y2, y1, 11, 4, 3);
        RANLUX_STEP(y3, y2, 0, 5, 4);
        RANLUX_STEP(y1, y3, 1, 6, 5);
        RANLUX_STEP(y2, y1, 2, 7, 6);
        RANLUX_STEP(y3, y2, 3, 8, 7);
        RANLUX_STEP(y1, y3, 4, 9, 8);
        RANLUX_STEP(y2, y1, 5, 10, 9);
        RANLUX_STEP(y3, y2, 6, 11, 10);
        if (y3 < 0) { carry = ONE_BIT; y3 += 1; } else carry = 0;
        xdbl[11] = y3;
    }

    kmax = state->pr;

    for (; k < kmax; ++k) {
        y1 = xdbl[jr] - xdbl[ir];
        y2 = y1 - carry;
        if (y2 < 0) { carry = ONE_BIT; y2 += 1; } else carry = 0;
        xdbl[ir] = y2;
        ir = next12[ir];
        jr = next12[jr];
    }
    state->ir = ir;
    state->ir_old = ir;
    state->jr = jr;
    state->carry = carry;
}

void ranlxd_set(ranlxd_t *state, unsigned long int s)
{
    int ibit, jbit, i, k, l, xbit[31];
    double x, y;
    long int seed;

    state->pr = 202; /* luxury level 1 */

    if (s == 0)
        s = 1;
    seed = s;
    i = seed & 0xFFFFFFFFUL;

    for (k = 0; k < 31; ++k) {
        xbit[k] = i % 2;
        i /= 2;
    }

    ibit = 0;
    jbit = 18;

    for (k = 0; k < 12; ++k) {
        x = 0;
        for (l = 1; l <= 48; ++l) {
            y = (double)((xbit[ibit] + 1) % 2);
            x += x + y;
            xbit[ibit] = (xbit[ibit] + xbit[jbit]) % 2;
            ibit = (ibit + 1) % 31;
            jbit = (jbit + 1) % 31;
        }
        state->xdbl[k] = ONE_BIT * x;
    }

    state->carry = 0;
    state->ir = 11;
    state->jr = 7;
    state->ir_old = 0;
}

double ranlxd_get_double(ranlxd_t *state)
{
    int ir = state->ir;
    state->ir = next12[ir];
    if (state->ir == state->ir_old)
        increment_state(state);
    return state->xdbl[state->ir];
}

unsigned long int ranlxd_get(ranlxd_t *state)
{
    return (unsigned long int)(ranlxd_get_double(state) * 4294967296.0);
}

/* self-test hook: n-th ranlxd_get value after seeding */
unsigned long int ranlxd_selftest(unsigned long int seed, int n)
{
    ranlxd_t st;
    unsigned long int v = 0;
    ranlxd_set(&st, seed);
    for (int i = 0; i < n; i++)
        v = ranlxd_get(&st);
    return v;
}

/* fill `out` with n uniform doubles from the given seed (for testing and
 * for the store's per-particle rand column, store.c:695-720). */
void ranlxd_fill_uniform(unsigned long int seed, long n, double *out)
{
    ranlxd_t st;
    ranlxd_set(&st, seed);
    for (long i = 0; i < n; i++)
        out[i] = ranlxd_get_double(&st);
}

/* ------------------------------------------------------------------ */
/* GADGET-scheme gaussian white-noise fill                            */
/* ------------------------------------------------------------------ */

static void sample_ampl_phase(ranlxd_t *rng, double *ampl, double *phase)
{
    /* initialcondition.c:136-142 */
    *phase = ranlxd_get_double(rng) * 2 * M_PI;
    *ampl = 0;
    do { *ampl = ranlxd_get_double(rng); } while (*ampl == 0);
}

/* Build the (n0 x n1) seed table with the reference's 8-fold spiral fill
 * order (initialcondition.c:162-171). The reference stores each seed in
 * four quadrant-mirrored tables; storing once and mirroring on read is
 * equivalent for a non-distributed (full-grid) fill. */
static unsigned int *build_seedtable(int n0, int n1, unsigned int seed)
{
    unsigned int *table = (unsigned int *)calloc((size_t)n0 * n1, sizeof(unsigned int));
    ranlxd_t rng;
    ranlxd_set(&rng, seed);
#define SETSEED(I, J) \
    table[(size_t)(I) * n1 + (J)] = (unsigned int)(0x7fffffff * ranlxd_get_double(&rng))
    for (int i = 0; i < n0 / 2; i++) {
        int j;
        for (j = 0; j < i; j++) SETSEED(i, j);
        for (j = 0; j < i + 1; j++) SETSEED(j, i);
        for (j = 0; j < i; j++) SETSEED(n0 - 1 - i, j);
        for (j = 0; j < i + 1; j++) SETSEED(n1 - 1 - j, i);
        for (j = 0; j < i; j++) SETSEED(i, n1 - 1 - j);
        for (j = 0; j < i + 1; j++) SETSEED(j, n0 - 1 - i);
        for (j = 0; j < i; j++) SETSEED(n0 - 1 - i, n1 - 1 - j);
        for (j = 0; j < i + 1; j++) SETSEED(n1 - 1 - j, n0 - 1 - i);
    }
#undef SETSEED
    return table;
}

/* Fill the hermitian-compressed complex white-noise field delta_k of shape
 * (n0, n1, n2/2+1), interleaved float32 re/im, C order.
 * i0/i0_size select a slab [i0, i0+i0_size) of the first axis so the fill
 * can be distributed/parallelized externally. Pass 0, n0 for the full grid.
 */
void gadget_ic_fill(int n0, int n1, int n2, unsigned int seed,
                    int i0_start, int i0_size, float *delta_k)
{
    int nzh = n2 / 2 + 1;
    unsigned int *seedtable = build_seedtable(n0, n1, seed);

    memset(delta_k, 0, sizeof(float) * 2 * (size_t)i0_size * n1 * nzh);

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 1)
#endif
    for (int i = i0_start; i < i0_start + i0_size; i++) {
        ranlxd_t lower_rng, this_rng;
        int ci = n0 - i;
        if (ci >= n0) ci -= n0;

        for (int j = 0; j < n1; j++) {
            int d = 0; /* 1 if (i,j) is in an upper quadrant */
            int cj = n1 - j;
            if (cj >= n1) cj -= n1;

            if ((ci == i && cj < j) || (ci < i))
                d = 1;

            unsigned int seed_conj = d ? seedtable[(size_t)ci * n1 + cj]
                                       : seedtable[(size_t)i * n1 + j];
            unsigned int seed_this = seedtable[(size_t)i * n1 + j];
            ranlxd_set(&lower_rng, seed_conj);
            ranlxd_set(&this_rng, seed_this);

            for (int k = 0; k <= n2 / 2; k++) {
                int use_conj = d && (k == 0 || k == n2 / 2);
                double ampl, phase;
                if (use_conj) {
                    /* on the k=0 and Nyquist planes use the lower-quadrant
                     * generator, then hermit-transform */
                    sample_ampl_phase(&this_rng, &ampl, &phase);
                    sample_ampl_phase(&lower_rng, &ampl, &phase);
                } else {
                    sample_ampl_phase(&lower_rng, &ampl, &phase);
                    sample_ampl_phase(&this_rng, &ampl, &phase);
                }

                size_t ip = (((size_t)(i - i0_start) * n1 + j) * nzh + k);
                float *mode = delta_k + 2 * ip;

                /* two numbers of std ~ 1/sqrt(2) (initialcondition.c:236) */
                ampl = sqrt(-log(ampl));

                mode[0] = (float)(ampl * cos(phase));
                mode[1] = (float)(ampl * sin(phase));
                if (use_conj)
                    mode[1] *= -1;

                if ((n0 - i) % n0 == i && (n1 - j) % n1 == j
                    && (n2 - k) % n2 == k) {
                    /* self-conjugate: must be real */
                    mode[1] = 0;
                    mode[0] = (float)(ampl * cos(phase));
                }
                if (i == 0 && j == 0 && k == 0) {
                    mode[0] = 0;
                    mode[1] = 0;
                }
            }
        }
    }
    free(seedtable);
}
