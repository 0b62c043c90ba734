#!/usr/bin/env python
"""Pallas banded-SW kernel timing on the real chip (VERDICT round-1 item 4).

Stage-7-like shapes: 256 pairs x Lq 1500, band 64.  First call pays the
Mosaic compile (3-8 min through the axon remote-compile service); the
steady number is the best of 3 subsequent calls.  Appends a JSON line to
PALLAS_BENCH.json at the repo root."""
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

    from savont_tpu.ops.align_pallas import sw_forward_pallas

    rng = np.random.default_rng(7)
    B, Lq, Lt, band = 256, 1500, 1500, 64
    q = rng.integers(0, 4, (B, Lq)).astype(np.int32)
    t = rng.integers(0, 4, (B, Lt)).astype(np.int32)
    # smooth diagonal band
    lo = np.clip(np.arange(Lq + 1)[None, :] - band // 2, 0, Lt - band).astype(np.int32) * np.ones((B, 1), np.int32)
    tlens = np.full(B, Lt, np.int32)

    t0 = time.time()
    out = sw_forward_pallas(q, t, lo, tlens, band=band)
    compile_s = time.time() - t0
    print(f"compile+first: {compile_s:.1f}s", flush=True)
    best = 9e9
    for i in range(3):
        t0 = time.time()
        out = sw_forward_pallas(q, t, lo, tlens, band=band)
        dt = time.time() - t0
        best = min(best, dt)
        print(f"steady {i}: {dt:.3f}s = {dt / B * 1e3:.3f} ms/pair", flush=True)
    # pipelined: dispatch several batches before blocking, so the axon
    # tunnel's ~70 ms per-call roundtrip amortizes away — this is the
    # number a non-tunneled TPU host sees.  Uses the traced entry (the
    # mesh stage-7 path) under jit: the host wrapper blocks internally
    # (np.asarray), so it cannot pipeline.
    from functools import partial

    from savont_tpu.ops.align_pallas import sw_forward_pallas_traced

    fn = jax.jit(partial(sw_forward_pallas_traced, band=band))
    n_pipe = 8
    qs = [jnp.asarray(np.ascontiguousarray(np.roll(q, i, axis=0))) for i in range(n_pipe)]
    td, lod, tld = jnp.asarray(t), jnp.asarray(lo), jnp.asarray(tlens)
    fn(qs[0], td, lod, tld)["score"].block_until_ready()  # compile
    t0 = time.time()
    outs = [fn(qq, td, lod, tld) for qq in qs]
    for o in outs:
        o["score"].block_until_ready()
    pipe_dt = time.time() - t0
    print(
        f"pipelined x{n_pipe}: {pipe_dt:.3f}s = "
        f"{pipe_dt / (n_pipe * B) * 1e3:.3f} ms/pair", flush=True,
    )
    rec = {
        "kernel": "sw_forward_pallas",
        "batch": B, "len": Lq, "band": band,
        "ms_per_pair": round(best / B * 1e3, 3),
        "pairs_per_s": round(B / best, 1),
        "ms_per_pair_pipelined": round(pipe_dt / (n_pipe * B) * 1e3, 3),
        "pairs_per_s_pipelined": round(n_pipe * B / pipe_dt, 1),
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
        "unroll": 8,
    }
    with open(REPO / "PALLAS_BENCH.json", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
