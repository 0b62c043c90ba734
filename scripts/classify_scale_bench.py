"""SILVA-scale classify validation (VERDICT r3 #7, classify.rs:152-189).

Synthesizes a 100k-reference DB (2k families x 50 variants at ~2%
divergence — the hard case for a prefilter: many near-identical refs),
then measures:

  1. PREFILTER RECALL: for error-laden query reads, does the minimizer
     candidate set (DbMinimizerTable.candidates) contain a ref achieving
     the exhaustive min-NM over the WHOLE DB (ground truth = the same
     seed-chain-extend aligner run against all refs, which is what the
     reference's minimap2-vs-whole-DB mapping produces)?
  2. WALL: DB table build + per-query candidate+align time at 100k refs.

Writes CLASSIFY_SCALE.json.  Usage:
    python scripts/classify_scale_bench.py [n_refs] [n_queries]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    n_refs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    L = 1500
    n_fam = max(n_refs // 50, 1)

    from savont_tpu.ops.align_batch import align_pairs_nm_values_indexed
    from savont_tpu.pipeline.classify import DbMinimizerTable

    rng = np.random.default_rng(7)
    BASES = np.frombuffer(b"ACGT", dtype=np.uint8)

    print(f"synthesizing {n_refs} refs ({n_fam} families)...", flush=True)
    t0 = time.time()
    fams = rng.integers(0, 4, (n_fam, L)).astype(np.uint8)
    refs: list[bytes] = []
    per_fam = -(-n_refs // n_fam)
    LUT = np.frombuffer(b"ACGT", dtype=np.uint8)
    for f in range(n_fam):
        base = fams[f]
        for v in range(per_fam):
            if len(refs) >= n_refs:
                break
            r = base.copy()
            muts = rng.choice(L, int(0.02 * L), replace=False)
            r[muts] = (r[muts] + rng.integers(1, 4, len(muts))) % 4
            refs.append(LUT[r].tobytes())
    t_synth = time.time() - t0
    print(f"  {t_synth:.1f}s", flush=True)

    print("building DB minimizer table...", flush=True)
    t0 = time.time()
    table = DbMinimizerTable(refs)
    t_table = time.time() - t0
    print(f"  {t_table:.1f}s ({len(table.hashes)} entries)", flush=True)

    # queries: reads at ~5% error from random refs
    src = rng.choice(n_refs, n_queries, replace=False)
    queries = []
    for s in src:
        q = np.frombuffer(refs[s], dtype=np.uint8).copy()
        muts = rng.choice(L, int(0.05 * L), replace=False)
        code = np.zeros(L, np.uint8)
        for i, b in enumerate(b"ACGT"):
            code[q == b] = i
        code[muts] = (code[muts] + rng.integers(1, 4, len(muts))) % 4
        queries.append(LUT[code].tobytes())

    # prefilter candidates + wall
    t0 = time.time()
    cand_sets, dropped = [], []
    for q in queries:
        c, d = table.candidates(q)
        cand_sets.append(c)
        dropped.append(d)
    t_cand = time.time() - t0
    cand_sizes = [len(c) for c in cand_sets]
    print(f"candidates: {t_cand:.2f}s for {n_queries} queries; "
          f"sizes min/med/max = {min(cand_sizes)}/{int(np.median(cand_sizes))}/{max(cand_sizes)}; "
          f"dropped-by-floor med {int(np.median(dropped))}", flush=True)

    # candidate alignment wall (the classify hot loop)
    t0 = time.time()
    qi_c = np.concatenate([np.full(len(c), i, np.int64) for i, c in enumerate(cand_sets)])
    ti_c = np.concatenate(cand_sets).astype(np.int64)
    nm_cand = align_pairs_nm_values_indexed(queries, refs, qi_c, ti_c)
    t_align = time.time() - t0
    print(f"candidate align: {t_align:.2f}s for {len(qi_c)} pairs", flush=True)

    # ground truth: exhaustive min-NM over the WHOLE DB
    print(f"exhaustive oracle: {n_queries} x {n_refs} pairs...", flush=True)
    t0 = time.time()
    min_nm_all = np.full(n_queries, -1, np.int64)
    argmin_refs: list[set] = [set() for _ in range(n_queries)]
    chunk = 2_000_000
    all_ti = np.arange(n_refs, dtype=np.int64)
    for qx in range(n_queries):
        for s in range(0, n_refs, chunk):
            e = min(s + chunk, n_refs)
            qi = np.zeros(e - s, np.int64)
            nm = align_pairs_nm_values_indexed([queries[qx]], refs[s:e], qi, all_ti[: e - s])
            ok = nm >= 0
            if ok.any():
                m = int(nm[ok].min())
                if min_nm_all[qx] < 0 or m < min_nm_all[qx]:
                    min_nm_all[qx] = m
                    argmin_refs[qx] = set((np.flatnonzero(ok & (nm == m)) + s).tolist())
                elif m == min_nm_all[qx]:
                    argmin_refs[qx] |= set((np.flatnonzero(ok & (nm == m)) + s).tolist())
        print(f"  q{qx}: min_nm={min_nm_all[qx]} over {n_refs} refs "
              f"({time.time()-t0:.0f}s cum)", flush=True)
    t_oracle = time.time() - t0

    # recall: candidate set achieves the exhaustive min NM
    hits = 0
    misses = []
    off = 0
    for qx, c in enumerate(cand_sets):
        nmq = nm_cand[off : off + len(c)]
        off += len(c)
        ok = nmq >= 0
        best_cand = int(nmq[ok].min()) if ok.any() else -1
        if min_nm_all[qx] < 0 or best_cand == min_nm_all[qx]:
            hits += 1
        else:
            misses.append({"q": qx, "cand_best": best_cand, "true_best": int(min_nm_all[qx])})
    recall = hits / n_queries
    print(f"RECALL = {recall:.3f} ({hits}/{n_queries}); misses: {misses}", flush=True)

    rec = {
        "n_refs": n_refs, "n_queries": n_queries, "L": L,
        "families": n_fam, "recall": recall, "misses": misses,
        "cand_size_median": int(np.median(cand_sizes)),
        "cand_size_max": max(cand_sizes),
        "dropped_by_floor_median": int(np.median(dropped)),
        "t_table_build_s": round(t_table, 2),
        "t_candidates_s": round(t_cand, 3),
        "t_candidate_align_s": round(t_align, 2),
        "t_exhaustive_oracle_s": round(t_oracle, 1),
        "per_query_classify_ms": round((t_cand + t_align) * 1000 / n_queries, 1),
    }
    with open("CLASSIFY_SCALE.json", "w") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
