"""Validate + time the device traceback kernel on the real TPU (axon).

Measurement discipline (CLAUDE.md round-3 traps): block_until_ready does
NOT wait through the tunnel — only value fetches force completion; identical
(executable, args) pairs are memoized server-side — inputs vary per rep;
kernel time uses the DIFFERENCE method (K chained data-dependent runs,
slope between K=1 and K=K2 fetch times).

Usage: python scripts/tpu_tb_bench.py [B] [L] [band]
Writes TB_TPU_BENCH.json (appends one JSON line).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    band = int(sys.argv[3]) if len(sys.argv) > 3 else 48

    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from savont_tpu.ops.align import TargetIndex
    from savont_tpu.ops.align_batch import plan_jobs_batch, run_jobs
    from savont_tpu.ops.align_jax import _pack_jobs, sw_traceback_full

    rng = np.random.default_rng(42)
    BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
    # realistic amplicon pairs: ~1.5 kb, ~4% subs + small indels
    targets, queries = [], []
    for i in range(B):
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
        targets.append(t)
        queries.append(bytes(q))

    jobs = []
    for t, q in zip(targets, queries):
        js, _ = plan_jobs_batch(TargetIndex([t]), [q], band=band, min_anchors=2)
        jobs.extend(js)
    print(f"{len(jobs)} jobs", flush=True)

    q, t, lo, tlens = _pack_jobs(jobs, band)
    Lq, Lt = q.shape[1], t.shape[1]
    ops_max, maxrun = Lq + Lt, 512

    # ── correctness on-device vs host native ────────────────────────────
    t0 = time.time()
    out = sw_traceback_full(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(lo), jnp.asarray(tlens),
        band=band, ops_max=ops_max, maxrun=maxrun,
    )
    dev = {k: np.asarray(v) for k, v in out.items()}  # value fetch = sync
    t_first = time.time() - t0
    print(f"first call (compile+run+fetch): {t_first:.1f}s", flush=True)

    host = run_jobs(jobs, band=band)
    bad = 0
    for i, h in enumerate(host):
        if h is None:
            if dev["score"][i] > 0:
                bad += 1
            continue
        nr = int(dev["n_runs"][i])
        d = (
            int(dev["score"][i]), int(dev["q_start"][i]), int(dev["q_end"][i]),
            int(dev["t_start"][i]), int(dev["t_end"][i]),
            dev["cigar"][i, :nr].tolist(), int(dev["nm"][i]),
        )
        hh = (h[0], h[1], h[2], h[3], h[4], np.asarray(h[5], np.uint32).tolist(), h[6])
        if hh != d:
            bad += 1
            if bad < 4:
                print("MISMATCH", i, hh[:5], d[:5])
    print(f"parity vs host native: {len(host) - bad}/{len(host)} exact", flush=True)

    # ── difference-method timing ────────────────────────────────────────
    @jax.jit
    def chained(q0, t0_, lo0, tl0, k):
        def body(i, carry):
            qq, acc = carry
            o = sw_traceback_full(qq, t0_, lo0, tl0, band=band, ops_max=ops_max, maxrun=maxrun)
            # data-dependent perturbation of ONE base: chains the runs
            # without degrading the batch into no-alignment pairs
            qq = qq.at[0, 0].set((qq[0, 0] + (o["nm"][0] & 1)) % 5)
            return qq, acc + o["score"].sum() + o["cigar"].astype(jnp.int32).sum()
        _, acc = jax.lax.fori_loop(0, k, body, (q0, jnp.int32(0)))
        return acc

    def timed(k, reps=3):
        best = 1e9
        for r in range(reps):
            qv = jnp.asarray((q + r) % 5)  # vary input: defeat memoization
            st = time.time()
            acc = chained(qv, jnp.asarray(t), jnp.asarray(lo), jnp.asarray(tlens), k)
            _ = int(acc)  # value fetch = sync
            best = min(best, time.time() - st)
        return best

    try:
        t1 = timed(1)
        t8 = timed(8)
        per_call = (t8 - t1) / 7
        npairs = q.shape[0]
        ms_pair = per_call * 1000 / npairs
        cells = npairs * Lq * band
        gcps = cells / per_call / 1e9 if per_call > 0 else float("nan")
        print(f"K=1 {t1:.3f}s K=8 {t8:.3f}s -> {per_call*1000:.1f} ms/call, "
              f"{ms_pair:.4f} ms/pair, {gcps:.1f} Gcells/s (fwd only)", flush=True)
        rec = {
            "kernel": "sw_traceback_full", "B": npairs, "Lq": Lq, "Lt": Lt,
            "band": band, "ops_max": ops_max, "parity_exact": len(host) - bad,
            "parity_total": len(host), "first_call_s": round(t_first, 2),
            "per_call_ms": round(per_call * 1000, 3),
            "ms_per_pair": round(ms_pair, 5), "gcells_s_fwd": round(gcps, 2),
        }
    except Exception as e:  # timing infra failure still records parity
        print("timing failed:", e, flush=True)
        rec = {
            "kernel": "sw_traceback_full", "B": q.shape[0], "Lq": Lq, "Lt": Lt,
            "band": band, "parity_exact": len(host) - bad, "parity_total": len(host),
            "first_call_s": round(t_first, 2), "timing_error": str(e)[:200],
        }
    with open("TB_TPU_BENCH.json", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
