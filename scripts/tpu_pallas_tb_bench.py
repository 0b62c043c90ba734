"""Pallas-forward traceback on the real TPU: parity vs host + timing.

Usage: python scripts/tpu_pallas_tb_bench.py [B] [L] [band]
Appends one JSON line to TB_TPU_BENCH.json.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import os

os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    band = int(sys.argv[3]) if len(sys.argv) > 3 else 48

    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from savont_tpu.ops.align import TargetIndex
    from savont_tpu.ops.align_batch import plan_jobs_batch, run_jobs
    from savont_tpu.ops.align_pallas import (
        PAIR_BLOCK, UNROLL, _pallas_tb_combined, _pack_jobs_pallas_streams,
        sw_traceback_pallas_jobs,
    )

    rng = np.random.default_rng(42)
    BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
    jobs = []
    while len(jobs) < B:
        t = rng.choice(BASES, L).astype(np.uint8).tobytes()
        q = bytearray(t)
        for p in rng.choice(len(q), int(0.04 * len(q)), replace=False):
            q[p] = b"ACGT"[rng.integers(4)]
        for _ in range(4):
            p = int(rng.integers(10, len(q) - 10))
            if rng.random() < 0.5:
                del q[p : p + int(rng.integers(1, 4))]
            else:
                q[p:p] = rng.choice(BASES, int(rng.integers(1, 4))).tobytes()
        js, _ = plan_jobs_batch(TargetIndex([t]), [bytes(q)], band=band, min_anchors=2)
        jobs.extend(js)
    jobs = jobs[:B]

    t0 = time.time()
    dev = sw_traceback_pallas_jobs(jobs, band=band)
    t_first = time.time() - t0
    print(f"first call (compile+run): {t_first:.1f}s", flush=True)

    host = run_jobs(jobs, band=band)
    bad = 0
    for h, d in zip(host, dev):
        if (h is None) != (d is None):
            bad += 1
            continue
        if h is None:
            continue
        hh = (h[0], h[1], h[2], h[3], h[4], np.asarray(h[5], np.uint32).tolist(), h[6])
        dd = (d[0], d[1], d[2], d[3], d[4], np.asarray(d[5], np.uint32).tolist(), d[6])
        if hh != dd:
            if bad < 3:
                print("MISMATCH", hh[:5], dd[:5])
            bad += 1
    print(f"parity vs host native: {len(host) - bad}/{len(host)} exact", flush=True)

    # difference-method timing of the combined dispatch on packed streams
    streams = _pack_jobs_pallas_streams(jobs, band)
    (q_rows, new_rows, dl_rows, locur_rows, tlen_row, init_win, lo2,
     Lt, new2_rows) = streams
    Lq4 = q_rows.shape[0]
    ops_max = Lq4 + Lt
    args_d = [jnp.asarray(a) for a in (q_rows, new_rows, dl_rows, locur_rows, tlen_row, init_win, lo2, new2_rows)]

    @jax.jit
    def chained(qr, k):
        def body(i, carry):
            qr2, acc = carry
            o = _pallas_tb_combined(
                qr2, *args_d[1:], band=band, ops_max=ops_max, maxrun=512,
                interpret=False,
            )
            qr2 = qr2.at[0, 0].set((qr2[0, 0] + (o["nm"][0] & 1)) % 5)
            return qr2, acc + o["score"].sum() + o["cigar"].astype(jnp.int32).sum()

        _, acc = jax.lax.fori_loop(0, k, body, (qr, jnp.int32(0)))
        return acc

    def timed(k, reps=3):
        best = 1e9
        for r in range(reps):
            qv = jnp.asarray((q_rows + r) % 5)
            st = time.time()
            _ = int(chained(qv, k))
            best = min(best, time.time() - st)
        return best

    t1 = timed(1)
    t8 = timed(8)
    per_call = (t8 - t1) / 7
    npairs = q_rows.shape[1]
    rec = {
        "kernel": "pallas_fwd+xla_walk", "B": npairs, "Lq4": Lq4, "band": band,
        "parity_exact": len(host) - bad, "parity_total": len(host),
        "first_call_s": round(t_first, 1),
        "per_call_ms": round(per_call * 1000, 2),
        "ms_per_pair": round(per_call * 1000 / npairs, 5),
    }
    with open("TB_TPU_BENCH.json", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
