#!/usr/bin/env python
"""Diagnose where the Pallas DP kernel's time goes on the real chip:
band scaling (compute-bound would halve at band 32) and UNROLL sweep
(loop/carry overhead).  Pipelined dispatch (8 in flight) like the bench."""
import os
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")


def measure(band, unroll):
    os.environ["SAVONT_PALLAS_UNROLL"] = str(unroll)
    # reload to pick up UNROLL
    import importlib

    import savont_tpu.ops.align_pallas as ap
    importlib.reload(ap)
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(7)
    B, Lq, Lt = 256, 1500, 1500
    q = rng.integers(0, 4, (B, Lq)).astype(np.int32)
    t = rng.integers(0, 4, (B, Lt)).astype(np.int32)
    lo = np.clip(np.arange(Lq + 1)[None, :] - band // 2, 0, Lt - band).astype(np.int32) * np.ones((B, 1), np.int32)
    tlens = np.full(B, Lt, np.int32)
    fn = jax.jit(partial(ap.sw_forward_pallas_traced, band=band))
    qs = [jnp.asarray(np.ascontiguousarray(np.roll(q, i, axis=0))) for i in range(8)]
    td, lod, tld = jnp.asarray(t), jnp.asarray(lo), jnp.asarray(tlens)
    t0 = time.time()
    fn(qs[0], td, lod, tld)["score"].block_until_ready()
    comp = time.time() - t0
    best = 9e9
    for _ in range(2):
        t0 = time.time()
        outs = [fn(qq, td, lod, tld) for qq in qs]
        for o in outs:
            o["score"].block_until_ready()
        best = min(best, time.time() - t0)
    ms = best / (8 * B) * 1e3
    print(f"band={band} unroll={unroll}: compile {comp:.1f}s, pipelined {ms:.3f} ms/pair", flush=True)
    return ms


if __name__ == "__main__":
    for band, unroll in ((64, 8), (32, 8), (64, 16), (64, 4)):
        try:
            measure(band, unroll)
        except Exception as e:
            print(f"band={band} unroll={unroll}: FAIL {str(e).splitlines()[0][:100]}", flush=True)
