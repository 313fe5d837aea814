/* Friends-of-friends halo finder: grid-hash union-find.
 *
 * Replaces the reference's distributed kdtree FOF (libfastpm/fof.c) for
 * the host-side path: an exact cell-list FOF with path-compressed
 * union-find. Periodic box. Cells of size >= linking length; pairs are
 * checked across each particle's 27-cell neighborhood.
 *
 * The iterative minid-merge of the reference (fof.c:289-420) exists
 * because particles are distributed across ranks; in a single address
 * space plain union-find is exact and O(N alpha(N)).
 */

#include <math.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef int64_t i64;

static inline i64 find_root(i64 *parent, i64 i)
{
    i64 r = i;
    while (parent[r] != r)
        r = parent[r];
    /* path compression */
    while (parent[i] != r) {
        i64 next = parent[i];
        parent[i] = r;
        i = next;
    }
    return r;
}

static inline void unite(i64 *parent, i64 a, i64 b)
{
    i64 ra = find_root(parent, a);
    i64 rb = find_root(parent, b);
    if (ra == rb) return;
    /* lower index wins: labels end up as the min particle index, which
     * matches the reference's minid semantics (fof.c:289-420) */
    if (ra < rb) parent[rb] = ra;
    else parent[ra] = rb;
}

/* pos: (n,3) float32 positions in [0, L); ll: linking length;
 * boxsize: L (cubic); labels_out: (n) int64 root particle index.
 * Returns 0 on success. */
int fof_label(const float *pos, i64 n, double ll, double boxsize,
              i64 *labels_out)
{
    if (n <= 0) return 0;
    double ll2 = ll * ll;

    int ncell = (int)floor(boxsize / ll);
    if (ncell < 1) ncell = 1;
    if (ncell > 1024) ncell = 1024; /* cap the grid memory */
    double cellsize = boxsize / ncell;
    (void) cellsize;
    i64 ncell3 = (i64)ncell * ncell * ncell;

    /* counting sort of particles into cells */
    i64 *cell_of = malloc(sizeof(i64) * n);
    i64 *count = calloc(ncell3 + 1, sizeof(i64));
    for (i64 i = 0; i < n; i++) {
        int c[3];
        for (int d = 0; d < 3; d++) {
            double x = pos[3 * i + d] / boxsize;
            x -= floor(x);
            int ic = (int)(x * ncell);
            if (ic >= ncell) ic = ncell - 1;
            if (ic < 0) ic = 0;
            c[d] = ic;
        }
        i64 cc = ((i64)c[0] * ncell + c[1]) * ncell + c[2];
        cell_of[i] = cc;
        count[cc + 1]++;
    }
    for (i64 c = 0; c < ncell3; c++)
        count[c + 1] += count[c];
    i64 *order = malloc(sizeof(i64) * n);
    {
        i64 *cursor = malloc(sizeof(i64) * ncell3);
        memcpy(cursor, count, sizeof(i64) * ncell3);
        for (i64 i = 0; i < n; i++)
            order[cursor[cell_of[i]]++] = i;
        free(cursor);
    }

    i64 *parent = labels_out;
    for (i64 i = 0; i < n; i++)
        parent[i] = i;

    /* half-neighborhood: 13 neighbor offsets + self to avoid double work */
    static const int HALF[14][3] = {
        {0,0,0},
        {0,0,1}, {0,1,-1}, {0,1,0}, {0,1,1},
        {1,-1,-1}, {1,-1,0}, {1,-1,1},
        {1,0,-1}, {1,0,0}, {1,0,1},
        {1,1,-1}, {1,1,0}, {1,1,1},
    };

    double L = boxsize;
    double Lh = 0.5 * boxsize;

    for (i64 cc = 0; cc < ncell3; cc++) {
        i64 s0 = count[cc], e0 = count[cc + 1];
        if (s0 == e0) continue;
        int cz = cc % ncell;
        int cy = (cc / ncell) % ncell;
        int cx = cc / ((i64)ncell * ncell);
        for (int h = 0; h < 14; h++) {
            int nx = cx + HALF[h][0];
            int ny = cy + HALF[h][1];
            int nz = cz + HALF[h][2];
            nx = (nx + ncell) % ncell;
            ny = (ny + ncell) % ncell;
            nz = (nz + ncell) % ncell;
            i64 nc_ = ((i64)nx * ncell + ny) * ncell + nz;
            if (h > 0 && nc_ == cc) continue; /* tiny grids alias */
            i64 s1 = count[nc_], e1 = count[nc_ + 1];
            for (i64 a = s0; a < e0; a++) {
                i64 ia = order[a];
                const float *pa = pos + 3 * ia;
                i64 bstart = (h == 0) ? a + 1 : s1;
                for (i64 b = bstart; b < e1; b++) {
                    i64 ib = order[b];
                    const float *pb = pos + 3 * ib;
                    double r2 = 0;
                    for (int d = 0; d < 3; d++) {
                        double dd = pa[d] - pb[d];
                        if (dd > Lh) dd -= L;
                        if (dd < -Lh) dd += L;
                        r2 += dd * dd;
                    }
                    if (r2 < ll2)
                        unite(parent, ia, ib);
                }
            }
        }
    }

    /* flatten to roots */
    for (i64 i = 0; i < n; i++)
        labels_out[i] = find_root(parent, i);

    free(order);
    free(count);
    free(cell_of);
    return 0;
}
