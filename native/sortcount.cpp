// Parallel strand-split k-mer counting: sort-by-bare-value + run-length
// count of a bit63-flagged canonical k-mer stream.
//
// Replaces the reference's sharded hash-map counting (seq_parse.rs
// second_iteration, kmer % threads shards) with the sort/segment-reduce
// formulation: radix sort the flagged stream by its bare (low-63-bit)
// value, then count flag[0]/flag[1] occurrences per run of equal bare
// values.  Output order (bare ascending) matches np.unique, so the NumPy
// fallback in ops/kmers.py is bit-identical.
//
// LSD radix, one byte per pass, only over bytes that are actually
// populated (k<=31 split k-mers occupy 2k <= 62 low bits; 16S k=17 needs
// just 5 passes).  Histograms are per-thread; scatter offsets come from a
// bucket-major exclusive scan so each thread writes disjoint slices.
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#else
static int omp_get_max_threads() { return 1; }
static int omp_get_thread_num() { return 0; }
#endif

static const uint64_t BARE_MASK = ~(1ULL << 63);

extern "C" int64_t count_flagged_u64(const uint64_t *keys, int64_t n,
                                     uint64_t *out_uniq, uint32_t *out_counts,
                                     int threads) {
  if (n <= 0)
    return 0;
  if (threads < 1)
    threads = 1;

  std::vector<uint64_t> a(keys, keys + n), b(n);
  uint64_t *src = a.data(), *dst = b.data();

  uint64_t maxbare = 0;
#pragma omp parallel for reduction(max : maxbare) num_threads(threads)
  for (int64_t i = 0; i < n; i++) {
    uint64_t v = src[i] & BARE_MASK;
    if (v > maxbare)
      maxbare = v;
  }
  int passes = 1;
  while (passes < 8 && (maxbare >> (8 * passes)))
    passes++;

  // chunking: fixed per-thread ranges shared by histogram + scatter
  std::vector<int64_t> lo(threads + 1);
  for (int t = 0; t <= threads; t++)
    lo[t] = n * t / threads;

  std::vector<int64_t> hist((size_t)threads * 256);
  for (int p = 0; p < passes; p++) {
    int shift = 8 * p;
    std::memset(hist.data(), 0, hist.size() * sizeof(int64_t));
#pragma omp parallel num_threads(threads)
    {
      int t = omp_get_thread_num();
      int64_t *h = &hist[(size_t)t * 256];
      for (int64_t i = lo[t]; i < lo[t + 1]; i++)
        h[((src[i] & BARE_MASK) >> shift) & 255]++;
    }
    // bucket-major exclusive scan: offset for (bucket, thread)
    int64_t run = 0;
    for (int bkt = 0; bkt < 256; bkt++)
      for (int t = 0; t < threads; t++) {
        int64_t c = hist[(size_t)t * 256 + bkt];
        hist[(size_t)t * 256 + bkt] = run;
        run += c;
      }
#pragma omp parallel num_threads(threads)
    {
      int t = omp_get_thread_num();
      int64_t *off = &hist[(size_t)t * 256];
      for (int64_t i = lo[t]; i < lo[t + 1]; i++)
        dst[off[((src[i] & BARE_MASK) >> shift) & 255]++] = src[i];
    }
    uint64_t *tmp = src;
    src = dst;
    dst = tmp;
  }

  // parallel run-length count over runs of equal bare value
  std::vector<int64_t> start(threads + 1), nuniq(threads);
  for (int t = 0; t <= threads; t++) {
    int64_t s = n * t / threads;
    // advance to the first element starting a new run
    while (s > 0 && s < n &&
           (src[s] & BARE_MASK) == (src[s - 1] & BARE_MASK))
      s++;
    start[t] = s;
  }
  start[threads] = n;
#pragma omp parallel num_threads(threads)
  {
    int t = omp_get_thread_num();
    int64_t cnt = 0;
    uint64_t prev = 0;
    bool first = true;
    for (int64_t i = start[t]; i < start[t + 1]; i++) {
      uint64_t v = src[i] & BARE_MASK;
      if (first || v != prev) {
        cnt++;
        prev = v;
        first = false;
      }
    }
    nuniq[t] = cnt;
  }
  std::vector<int64_t> ubase(threads + 1, 0);
  for (int t = 0; t < threads; t++)
    ubase[t + 1] = ubase[t] + nuniq[t];
#pragma omp parallel num_threads(threads)
  {
    int t = omp_get_thread_num();
    int64_t u = ubase[t] - 1;
    uint64_t prev = 0;
    bool first = true;
    for (int64_t i = start[t]; i < start[t + 1]; i++) {
      uint64_t v = src[i] & BARE_MASK;
      if (first || v != prev) {
        u++;
        out_uniq[u] = v;
        out_counts[2 * u] = 0;
        out_counts[2 * u + 1] = 0;
        prev = v;
        first = false;
      }
      out_counts[2 * u + (src[i] >> 63)]++;
    }
  }
  return ubase[threads];
}
