/* Bulk .base.gz row formatter for screen-resolved ("easy") sites.
 *
 * The reference caller prints one .base row per site
 * (pecaller.c:1675-1714 write path; format "\n%s\t%d\t%c" then
 * "\t%c\t%g" per sample).  For sites resolved by the device screen the
 * per-sample posterior is exactly 1.0 (prints as "1"), so rows reduce to
 * fixed fragments + a decimal position + per-sample call characters —
 * formatted here at C speed instead of per-row Python.
 */

#include <stdint.h>
#include <string.h>

static const char INT_TO_GEN[16] = "ACGTDIMRWSYKEHN?";

/* Write rows for sites [0, n) into out; returns bytes written, or -1 if
 * out_cap would overflow.  calls: (n, indiv) int8 genotype ints (14=N);
 * active: (n, indiv) uint8 (0 -> force "N\t1"). */
int64_t format_base_rows(const char *frag, int64_t frag_len,
                         const int64_t *pos, const uint8_t *refc,
                         const int8_t *calls, const uint8_t *active,
                         int64_t n, int32_t indiv,
                         char *out, int64_t out_cap)
{
    char *p = out;
    char *end = out + out_cap;
    for (int64_t s = 0; s < n; s++) {
        /* worst case: 1 + frag + 1 + 20 + 2 + indiv*4 */
        if (p + 24 + frag_len + (int64_t)indiv * 4 > end)
            return -1;
        *p++ = '\n';
        memcpy(p, frag, frag_len);
        p += frag_len;
        *p++ = '\t';
        {
            char tmp[20];
            int k = 0;
            int64_t v = pos[s];
            if (v <= 0) {
                *p++ = '0';      /* positions are >= 1 in practice */
            } else {
                while (v > 0) { tmp[k++] = (char)('0' + v % 10); v /= 10; }
                while (k > 0) *p++ = tmp[--k];
            }
        }
        *p++ = '\t';
        *p++ = (char)refc[s];
        const int8_t *cr = calls + s * indiv;
        const uint8_t *ar = active + s * indiv;
        for (int32_t i = 0; i < indiv; i++) {
            *p++ = '\t';
            *p++ = ar[i] ? INT_TO_GEN[cr[i] & 15] : 'N';
            *p++ = '\t';
            *p++ = '1';
        }
    }
    return (int64_t)(p - out);
}

/* Format MANY fast runs in one call (the per-window fast rows are
 * fragmented into thousands of runs by interleaved variant sites; one
 * ctypes round-trip per run was the caller write phase's hot spot).
 * frags: concatenated fragment names with frag_off offsets;
 * run_start/run_end index rows of the gathered pos/refc/calls/active
 * arrays; run_out_off (n_runs+1) receives each run's byte offset in
 * out.  Returns total bytes, or -1 on overflow. */
int64_t format_base_runs(const char *frags, const int64_t *frag_off,
                         const int32_t *frag_of_run,
                         const int64_t *run_start, const int64_t *run_end,
                         int64_t n_runs, const int64_t *pos,
                         const uint8_t *refc, const int8_t *calls,
                         const uint8_t *active, int32_t indiv,
                         char *out, int64_t out_cap,
                         int64_t *run_out_off)
{
    int64_t total = 0;
    for (int64_t r = 0; r < n_runs; r++) {
        run_out_off[r] = total;
        int32_t f = frag_of_run[r];
        int64_t flen = frag_off[f + 1] - frag_off[f];
        int64_t a = run_start[r], b = run_end[r];
        int64_t wrote = format_base_rows(
            frags + frag_off[f], flen, pos + a, refc + a,
            calls + a * indiv, active + a * indiv, b - a, indiv,
            out + total, out_cap - total);
        if (wrote < 0)
            return -1;
        total += wrote;
    }
    run_out_off[n_runs] = total;
    return total;
}
