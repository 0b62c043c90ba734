#!/usr/bin/env python
"""One-shot planner cost profiler at N reads (default 100k).

Wraps the SoA planner's internal phases (minimizer pools, target indexes,
anchor keys, chaining, query encoding, DP) with direct perf_counter timers
(cProfile misattributes native wall — CLAUDE.md) and prints a JSON split.
"""
import json
import logging
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100000

ACC: dict[str, list[float]] = {}
STAGE: dict[str, float] = {}


def timed(label, fn):
    def inner(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        dt = time.perf_counter() - t0
        e = ACC.setdefault(label, [0.0, 0])
        e[0] += dt
        e[1] += 1
        return r

    return inner


def main() -> int:
    logging.basicConfig(level=logging.WARNING)

    from savont_tpu.ops import align, align_batch
    from savont_tpu.ops import kmers_native as kn
    from savont_tpu.pipeline import (
        stage4_consensus,
        stage5_merge,
        stage7_em,
    )

    # planner internals
    orig_wmfb = align.window_minimizers_flat_batch
    mini_stats = {"hits": 0, "misses": 0, "queries": 0}

    def wmfb(queries, w, k):
        t0 = time.perf_counter()
        if w == 10 and k == 15 and len(queries) >= 2048:
            ents = [align._IDMINI_CACHE.get(id(q)) for q in queries]
            miss = sum(
                1 for i, e in enumerate(ents) if e is None or e[0] is not queries[i]
            )
            mini_stats["misses"] += miss
            mini_stats["hits"] += len(queries) - miss
            mini_stats["queries"] += len(queries)
        r = orig_wmfb(queries, w, k)
        e = ACC.setdefault("mini_pools", [0.0, 0])
        e[0] += time.perf_counter() - t0
        e[1] += 1
        return r

    align.window_minimizers_flat_batch = wmfb
    align_batch.window_minimizers_flat_batch = wmfb

    align.TargetIndex.build_singletons = classmethod(
        timed("build_singletons", align.TargetIndex.build_singletons.__func__)
    )
    kn.anchor_keys_indexed_native = timed(
        "anchor_keys", kn.anchor_keys_indexed_native
    )
    kn.chain_band_native = timed("chain_band", kn.chain_band_native)
    align_batch._qcodes_cached_batch = timed(
        "qcodes", align_batch._qcodes_cached_batch
    )
    align_batch._soa_dp_and_winners = timed("dp", align_batch._soa_dp_and_winners)
    align_batch._plan_soa_indexed = timed("plan_total", align_batch._plan_soa_indexed)
    align_batch._run_indexed_slabs = timed("indexed_slabs", align_batch._run_indexed_slabs)
    align_batch.run_jobs = timed("run_jobs_tb", align_batch.run_jobs)
    stage7_em.map_batch = timed("s7_map_batch", stage7_em.map_batch)

    # per-stage wall
    for mod, name in [
        (stage4_consensus, "align_and_consensus"),
        (stage5_merge, "merge_similar_consensuses"),
        (stage7_em, "refine_asv_depths_with_em"),
    ]:
        fn = getattr(mod, name)

        def mk(fn=fn, name=name):
            def inner(*a, **k):
                t0 = time.perf_counter()
                r = fn(*a, **k)
                STAGE[name] = STAGE.get(name, 0.0) + time.perf_counter() - t0
                return r

            return inner

        setattr(mod, name, mk())

    bench.N_SYNTH = N
    work = Path(tempfile.mkdtemp(prefix="savont_prof_"))
    synth = work / "synth.fq.gz"
    bench._gen_synth(synth)
    out = work / "out"
    try:
        t0 = time.perf_counter()
        c0 = os.times()
        bench._run_once(synth, out)
        wall = time.perf_counter() - t0
        c1 = os.times()
        print(
            json.dumps(
                {
                    "n": N,
                    "wall_s": round(wall, 2),
                    "cpu_s": round(c1.user - c0.user + c1.system - c0.system, 2),
                    "stages": {k: round(v, 2) for k, v in STAGE.items()},
                    "planner": {
                        k: [round(v[0], 3), v[1]] for k, v in sorted(ACC.items())
                    },
                    "mini_cache": mini_stats,
                },
                indent=1,
            )
        )
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
