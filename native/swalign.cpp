// Banded affine Smith-Waterman batch kernel (host native path).
//
// Exact semantic twin of savont_tpu/ops/align.py::banded_sw + _traceback:
// same prefix-max E formulation, same tie-breaking, same NM definition.
// Parallel over pairs with OpenMP.  Built by savont_tpu/ops/native_build.py
// and loaded via ctypes; the NumPy implementation is the fallback and the
// correctness oracle (tests/test_native.py asserts equality).
//
// CIGAR ops: 0 = M, 1 = I (consumes query), 2 = D (consumes target).
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int32_t MATCH = 2;
constexpr int32_t MISMATCH = -4;
constexpr int32_t GAP_OPEN = 4;
constexpr int32_t GAP_EXT = 2;
constexpr int32_t NEG = -20000;

struct Result {
    int32_t score, q0, q1, t0, t1, nm, cigar_len, overflow;
};

// Reused across pairs within a thread: rows 1..m are fully overwritten each
// call, so only row 0 of H (zeros) and F (NEG) needs initialization — this
// avoids ~1.5 MB of value-init per pair.
struct Scratch {
    std::vector<int16_t> H, E, F, G, twin;
    std::vector<int16_t> A, P, T, je2;
    std::vector<uint8_t> ops;
};

void align_one(const uint8_t* q, int32_t m, const uint8_t* t, int32_t n,
               const int64_t* lo_full /* m+1 */, int32_t band,
               Result* res, uint32_t* cigar_out, int32_t max_cigar,
               Scratch& sc) {
    res->score = 0;
    res->cigar_len = 0;
    res->overflow = 0;
    if (m <= 0 || n <= 0) return;

    const size_t cells = (size_t)(m + 1) * band;
    sc.H.resize(cells);
    sc.E.resize(cells);
    sc.F.resize(cells);
    sc.G.resize(cells);
    sc.twin.resize(band + 2);
    std::vector<int16_t>& H = sc.H;
    std::vector<int16_t>& E = sc.E;
    std::vector<int16_t>& F = sc.F;
    std::vector<int16_t>& G = sc.G;
    std::vector<int16_t>& twin = sc.twin;
    std::fill(H.begin(), H.begin() + band, (int16_t)0);
    std::fill(F.begin(), F.begin() + band, (int16_t)NEG);
    sc.A.resize(band);
    sc.P.resize(band);
    sc.T.resize(band);
    if ((int32_t)sc.je2.size() != band) {
        sc.je2.resize(band);
        for (int32_t j = 0; j < band; j++) sc.je2[j] = (int16_t)(GAP_EXT * j);
    }
    int16_t* __restrict A = sc.A.data();
    int16_t* __restrict P = sc.P.data();
    int16_t* __restrict T = sc.T.data();
    const int16_t* __restrict je2 = sc.je2.data();

    int32_t best = 0, best_r = 0, best_j = 0;
    for (int32_t r = 1; r <= m; r++) {
        const int16_t qc = (int16_t)q[r - 1];
        const int64_t l = lo_full[r];
        const int32_t dl = (int32_t)(l - lo_full[r - 1]);
        const int16_t* __restrict Hp = &H[(size_t)(r - 1) * band];
        const int16_t* __restrict Fp = &F[(size_t)(r - 1) * band];
        int16_t* __restrict Hr = &H[(size_t)r * band];
        int16_t* __restrict Er = &E[(size_t)r * band];
        int16_t* __restrict Fr = &F[(size_t)r * band];
        int16_t* __restrict Gr = &G[(size_t)r * band];

        // gather this row's target codes once (padding code 255 mismatches)
        for (int32_t j = 0; j < band; j++) {
            const int64_t col = l + j;
            twin[j] = (col < n) ? (int16_t)t[col] : (int16_t)255;
        }

        // G and F pass — branch-free over the interior, vectorizable
        const int32_t interior = std::max(0, band - dl);  // j where j+dl < band
        const int32_t dstart = (dl >= 1) ? 0 : 1;         // j where j+dl-1 >= 0
        // boundary cells handled scalar below
#ifdef _OPENMP
#pragma omp simd
#endif
        for (int32_t j = dstart; j < interior; j++) {
            const int32_t up = j + dl;
            const int16_t hup = Hp[up];
            const int16_t fup = Fp[up];
            int16_t f = (int16_t)(std::max<int16_t>((int16_t)(hup - GAP_OPEN), fup) - GAP_EXT);
            f = std::max<int16_t>(f, (int16_t)NEG);
            const int16_t hdiag = Hp[up - 1];
            const int16_t tc = twin[j];
            const int16_t s = (tc == qc && qc < 4) ? (int16_t)MATCH : (int16_t)MISMATCH;
            int16_t g = std::max<int16_t>(std::max<int16_t>(0, (int16_t)(hdiag + s)), f);
            Fr[j] = f;
            Gr[j] = g;
        }
        // left boundary (dl == 0, j == 0): diagonal is the free zero column
        if (dstart == 1) {
            const int32_t up = dl;  // == 0
            const int32_t hup = Hp[up], fup = Fp[up];
            int32_t f = std::max(hup - GAP_OPEN, fup) - GAP_EXT;
            if (f < NEG) f = NEG;
            const int32_t hdiag = (l == 0) ? 0 : NEG;
            const int16_t tc = twin[0];
            const int32_t s = (tc == qc && qc < 4) ? MATCH : MISMATCH;
            Fr[0] = (int16_t)f;
            Gr[0] = (int16_t)std::max(std::max(0, hdiag + s), f);
        }
        // right tail (j + dl >= band): previous row out of band
        for (int32_t j = interior; j < band; j++) {
            const int32_t hdiag = (j + dl - 1 < band) ? Hp[j + dl - 1] : NEG;
            const int16_t tc = twin[j];
            const int32_t s = (tc == qc && qc < 4) ? MATCH : MISMATCH;
            int32_t f = NEG;
            Fr[j] = (int16_t)f;
            Gr[j] = (int16_t)std::max(std::max(0, hdiag + s), f);
        }

        // E as an exclusive prefix max of A[j] = G[j] + ext*j (pre-override
        // G, matching the NumPy oracle), computed with log-step shifted-max
        // passes so the whole row stays SIMD.
#ifdef _OPENMP
#pragma omp simd
#endif
        for (int32_t j = 0; j < band; j++) A[j] = (int16_t)(Gr[j] + je2[j]);
        P[0] = (int16_t)NEG;
        for (int32_t j = 1; j < band; j++) P[j] = A[j - 1];
        for (int32_t s = 1; s < band; s <<= 1) {
#ifdef _OPENMP
#pragma omp simd
#endif
            for (int32_t j = s; j < band; j++)
                T[j] = std::max(P[j], P[j - s]);
            for (int32_t j = 0; j < s; j++) T[j] = P[j];
            std::swap(P, T);
        }
        // e/h pass: valid columns are j < n - l (lo is clipped, so this is
        // the only place the target end can cut into the band)
        const int32_t jmax =
            (int32_t)std::min<int64_t>(band, std::max<int64_t>(n - l, 0));
#ifdef _OPENMP
#pragma omp simd
#endif
        for (int32_t j = 0; j < band; j++) {
            int16_t e = (int16_t)(P[j] - GAP_OPEN - je2[j]);
            e = std::max<int16_t>(e, (int16_t)NEG);
            const int16_t g = Gr[j];
            int16_t h = std::max<int16_t>(g, e);
            const bool valid = j < jmax;
            Er[j] = e;
            Hr[j] = valid ? h : (int16_t)NEG;
            Gr[j] = valid ? g : (int16_t)NEG;
        }
        int16_t row_best = NEG;
#ifdef _OPENMP
#pragma omp simd reduction(max : row_best)
#endif
        for (int32_t j = 0; j < band; j++)
            row_best = std::max(row_best, Hr[j]);
        if (row_best > best) {
            int32_t row_best_j = 0;
            while (Hr[row_best_j] != row_best) row_best_j++;
            best = row_best;
            best_r = r;
            best_j = row_best_j;
        }
    }

    res->score = best;
    if (best <= 0) return;

    // traceback (same preference order as the Python _traceback)
    std::vector<uint8_t>& ops = sc.ops;  // end -> start
    ops.clear();
    ops.reserve(m + 256);
    int32_t r = best_r, j = best_j;
    int state = 0;  // 0=H 1=G 2=E 3=F
    while (r > 0 && j >= 0 && j < band) {
        const int64_t l = lo_full[r];
        const int32_t dl = (int32_t)(l - lo_full[r - 1]);
        const int16_t* Hrow = &H[(size_t)r * band];
        const int16_t* Erow = &E[(size_t)r * band];
        const int16_t* Frow = &F[(size_t)r * band];
        const int16_t* Grow = &G[(size_t)r * band];
        if (state == 0) {
            state = (Hrow[j] == Grow[j]) ? 1 : 2;
            continue;
        }
        if (state == 1) {
            const int32_t g = Grow[j];
            if (g == 0) break;
            if (g == Frow[j]) { state = 3; continue; }
            ops.push_back(0);
            r -= 1;
            j = j + dl - 1;
            state = 0;
            if (j < 0) break;
            continue;
        }
        if (state == 2) {
            ops.push_back(2);
            if (j - 1 >= 0 && Erow[j] == Grow[j - 1] - GAP_OPEN - GAP_EXT) state = 1;
            j -= 1;
            continue;
        }
        // state == 3 (F)
        ops.push_back(1);
        {
            const int32_t up = j + dl;
            const int16_t* Hprev = &H[(size_t)(r - 1) * band];
            if (up < band && Frow[j] == Hprev[up] - GAP_OPEN - GAP_EXT) state = 0;
            r -= 1;
            j = up;
            if (j >= band) break;
        }
    }

    int32_t q_len = 0, t_len = 0;
    for (uint8_t o : ops) {
        if (o != 2) q_len++;
        if (o != 1) t_len++;
    }
    const int32_t q_end = best_r;
    const int64_t t_end = lo_full[best_r] + best_j + 1;
    const int32_t q_start = q_end - q_len;
    const int64_t t_start = t_end - t_len;
    res->q0 = q_start;
    res->q1 = q_end;
    res->t0 = (int32_t)t_start;
    res->t1 = (int32_t)t_end;

    // run-length encode from start to end; compute NM
    int32_t nm = 0;
    int32_t clen = 0;
    int64_t qp = q_start, tp = t_start;
    for (int64_t i = (int64_t)ops.size() - 1; i >= 0;) {
        const uint8_t op = ops[i];
        int64_t jend = i;
        while (jend >= 0 && ops[jend] == op) jend--;
        const int32_t len = (int32_t)(i - jend);
        if (op == 0) {
            for (int32_t x = 0; x < len; x++) {
                const uint8_t qb = q[qp + x], tb = t[tp + x];
                if (qb != tb || (qb == 4 && tb == 4)) nm++;
            }
            qp += len;
            tp += len;
        } else if (op == 1) {
            nm += len;
            qp += len;
        } else {
            nm += len;
            tp += len;
        }
        if (clen < max_cigar) cigar_out[clen] = ((uint32_t)len << 4) | op;
        else res->overflow = 1;
        clen++;
        i = jend;
    }
    res->nm = nm;
    res->cigar_len = std::min(clen, max_cigar);
}

}  // namespace

extern "C" {

// q: concatenated query codes; q_off/q_len per pair.  t likewise.
// lo: concatenated (len = q_len+1 per pair) band lower bounds.
// out_meta: (B, 8) int32; out_cigar: (B, max_cigar) uint32.
void sw_banded_batch(
    const uint8_t* q, const int64_t* q_off, const int32_t* q_len,
    const uint8_t* t, const int64_t* t_off, const int32_t* t_len,
    const int64_t* lo, const int64_t* lo_off,
    int32_t n_pairs, int32_t band,
    int32_t* out_meta, uint32_t* out_cigar, int32_t max_cigar,
    int32_t n_threads) {
#ifdef _OPENMP
    const int nt_ = (n_threads > 0) ? n_threads
                    : (n_pairs > 1 ? omp_get_max_threads() : 1);
#pragma omp parallel num_threads(nt_)
#endif
    {
        Scratch sc;
#ifdef _OPENMP
#pragma omp for schedule(dynamic)
#endif
        for (int32_t i = 0; i < n_pairs; i++) {
            Result res{};
            align_one(q + q_off[i], q_len[i], t + t_off[i], t_len[i],
                      lo + lo_off[i], band, &res,
                      out_cigar + (size_t)i * max_cigar, max_cigar, sc);
            int32_t* m = out_meta + (size_t)i * 8;
            m[0] = res.score; m[1] = res.q0; m[2] = res.q1;
            m[3] = res.t0; m[4] = res.t1; m[5] = res.nm;
            m[6] = res.cigar_len; m[7] = res.overflow;
        }
    }
}

}  // extern "C"
