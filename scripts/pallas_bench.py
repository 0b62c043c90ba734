#!/usr/bin/env python
"""Pallas banded-SW kernel timing on the real chip.

Stage-7-like shapes: 256 pairs x Lq 1500, band 64.  Appends a JSON line to
PALLAS_BENCH.json at the repo root.

MEASUREMENT PITFALLS on the axon-tunneled dev rig (all hit in round 3):
  - block_until_ready() returns WITHOUT waiting; only a value fetch
    (np.asarray / int()) forces completion,
  - identical (executable, args) executions are memoized server-side, so
    repeat timings must vary an input,
  - every fetch pays a ~36 ms tunnel roundtrip, which dwarfs the kernel.
The honest on-device number therefore comes from the DIFFERENCE method:
jit one function that chains K data-dependent kernel runs, fetch-time it
at K=1 and K=64, and divide the slope.  Round-2's recorded 0.095 ms/pair
"pipelined" number was tunnel-latency-bound; the same kernel measures
~0.002 ms/pair on-device."""
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")


def main() -> int:
    import jax
    import numpy as np

    print(f"devices: {jax.devices()}", flush=True)
    import jax.numpy as jnp

    t0 = time.time()
    jnp.zeros(8).block_until_ready()
    print(f"warmup: {time.time() - t0:.1f}s", flush=True)

    from savont_tpu.ops.align_pallas import sw_forward_pallas, sw_forward_pallas_traced

    rng = np.random.default_rng(7)
    band = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    B, Lq, Lt = 256, 1500, 1500
    q = rng.integers(0, 4, (B, Lq)).astype(np.int32)
    t = rng.integers(0, 4, (B, Lt)).astype(np.int32)
    lo = np.clip(np.arange(Lq + 1)[None, :] - band // 2, 0, Lt - band).astype(np.int32) * np.ones((B, 1), np.int32)
    tlens = np.full(B, Lt, np.int32)

    # legacy number: one blocking host-facing call END TO END through the
    # tunnel (inputs re-uploaded each call; varies q so nothing is memoized)
    t0 = time.time()
    out = sw_forward_pallas(q, t, lo, tlens, band=band)
    compile_s = time.time() - t0
    print(f"compile+first: {compile_s:.1f}s", flush=True)
    best = 9e9
    for i in range(3):
        q2 = np.ascontiguousarray(np.roll(q, i + 1, axis=0))
        t0 = time.time()
        out = sw_forward_pallas(q2, t, lo, tlens, band=band)
        best = min(best, time.time() - t0)
    print(f"blocking e2e: {best:.3f}s = {best / B * 1e3:.3f} ms/pair (tunnel-bound)", flush=True)

    # on-device rate via the difference method
    td, lod, tld = jnp.asarray(t), jnp.asarray(lo), jnp.asarray(tlens)

    def mk(K):
        def many(q0):
            acc = jnp.int32(0)
            qq = q0
            for _ in range(K):
                o = sw_forward_pallas_traced(qq, td, lod, tld, band=band)
                acc = acc + o["score"][0]
                qq = qq.at[0, 0].set(o["score"][0] % 4)
            return acc

        return jax.jit(many)

    fetch = {}
    for K in (1, 64):
        fn = mk(K)
        qs = [jnp.asarray(rng.integers(0, 4, (B, Lq)).astype(np.int32)) for _ in range(4)]
        int(fn(qs[3]))  # compile + warm (fetch forces completion)
        times = []
        for i in range(3):
            t0 = time.time()
            int(fn(qs[i]))
            times.append(time.time() - t0)
        fetch[K] = min(times)
        print(f"K={K}: fetch {fetch[K]*1e3:.1f} ms", flush=True)
    per_run = (fetch[64] - fetch[1]) / 63
    ms_pair = per_run / B * 1e3
    gcells = B * Lq * band / per_run / 1e9
    print(f"on-device: {ms_pair:.4f} ms/pair, {gcells:.1f} Gcells/s, roundtrip ~{fetch[1]*1e3:.0f} ms", flush=True)

    rec = {
        "kernel": "sw_forward_pallas",
        "batch": B, "len": Lq, "band": band,
        "ms_per_pair_blocking_e2e": round(best / B * 1e3, 3),
        "ms_per_pair_device": round(ms_pair, 4),
        # alias: the difference method IS the fully-pipelined rate (64
        # chained kernel runs in flight inside one jit, zero host gaps)
        "ms_per_pair_pipelined": round(ms_pair, 4),
        "pairs_per_s_device": round(B / per_run, 1),
        "gcells_per_s_device": round(gcells, 1),
        "roundtrip_ms": round(fetch[1] * 1e3, 1),
        "method": "difference K=1 vs K=64 chained jit, fetch-forced",
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
        "unroll": int(os.environ.get("SAVONT_PALLAS_UNROLL", "8")),
    }
    with open(REPO / "PALLAS_BENCH.json", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
