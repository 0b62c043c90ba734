"""Pallas roofline: measured VPU peak vs the banded-SW kernel, plus the
2x16-bit-in-i32 SWAR packing probe (VERDICT r3 #5).

Three Mosaic micro-kernels on (band, 128) i32 registers, timed with the
difference method (CLAUDE.md axon traps):

  peak   — a pure dependent max/add chain: the empirical VPU elementwise
           ceiling in ops/s (no memory traffic, no layout changes).
  swar   — the same logical work on TWO int16 values packed per i32 lane
           (biased-unsigned SWAR max: xor-bias + masked compare-select).
           Values/s beats the unpacked chain only if SWAR's op inflation
           is < 2x.
  (the production kernel's Gcells/s comes from scripts/pallas_bench.py)

Appends one JSON line to PALLAS_ROOFLINE.json.
"""
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")

BAND, P = 64, 128
INNER = 16          # unrolled ops per loop iteration
ITERS = 60000       # fori_loop trip count (long enough to rise above RPC jitter)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"devices: {jax.devices()}", flush=True)
    jnp.zeros(8).block_until_ready()

    def peak_kernel(x_ref, y_ref, o_ref):
        x = x_ref[:, :]
        y = y_ref[:, :]

        def body(i, c):
            x, y = c
            for _ in range(INNER // 2):
                x = jnp.maximum(x, y)   # 1 op
                y = y + x               # 1 op
            return x, y

        x, y = lax.fori_loop(0, ITERS, body, (x, y))
        o_ref[:, :] = x + y

    def swar_kernel(x_ref, y_ref, o_ref):
        # two biased-unsigned 16-bit halves per i32: max via masked
        # compare-select per half (the cheapest correct SWAR max we know
        # of on VPU ops: 2 xors amortized + hi/lo splits + 2 cmps + 2
        # selects + repack ~= 8 ops per packed max = 4 ops/value)
        x = x_ref[:, :]
        y = y_ref[:, :]
        M_LO = jnp.int32(0x0000FFFF)

        def max16x2(a, b):
            alo = a & M_LO
            blo = b & M_LO
            ahi = jax.lax.shift_right_logical(a, 16)
            bhi = jax.lax.shift_right_logical(b, 16)
            lo = jnp.maximum(alo, blo)      # biased-unsigned halves
            hi = jnp.maximum(ahi, bhi)
            return jax.lax.shift_left(hi, 16) | lo

        def add16x2(a, b):
            # carry-isolated per-half add
            lo = (a & M_LO) + (b & M_LO)
            hi = jax.lax.shift_right_logical(a, 16) + jax.lax.shift_right_logical(b, 16)
            return jax.lax.shift_left(hi, 16) | (lo & M_LO)

        def body(i, c):
            x, y = c
            for _ in range(INNER // 2):
                x = max16x2(x, y)
                y = add16x2(y, x)
            return x, y

        x, y = lax.fori_loop(0, ITERS, body, (x, y))
        o_ref[:, :] = x + y

    def build(kern):
        call = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((BAND, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BAND, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BAND, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BAND, P), jnp.int32),
        )
        return jax.jit(lambda x, y: call(x, y))

    rng = np.random.default_rng(3)
    x0 = rng.integers(0, 1000, (BAND, P)).astype(np.int32)
    y0 = rng.integers(0, 1000, (BAND, P)).astype(np.int32)

    def timed(fn, label, chain=(1, 32)):
        xd, yd = jnp.asarray(x0), jnp.asarray(y0)

        def mk(K):
            def many(x):
                acc = jnp.int32(0)
                for _ in range(K):
                    o = fn(x, yd)
                    acc = acc + o[0, 0]
                    x = x.at[0, 0].set(o[0, 0] & 3)
                return acc
            return jax.jit(many)

        fetch = {}
        for K in chain:
            f = mk(K)
            t0 = time.time()
            int(f(xd))
            print(f"  {label} K={K} compile+run {time.time()-t0:.1f}s", flush=True)
            best = 9e9
            for i in range(3):
                t0 = time.time()
                int(f(jnp.asarray(x0 + i + 1)))
                best = min(best, time.time() - t0)
            fetch[K] = best
        per = (fetch[chain[1]] - fetch[chain[0]]) / (chain[1] - chain[0])
        return per

    peak = build(peak_kernel)
    swar = build(swar_kernel)

    t_peak = timed(peak, "peak")
    total_ops = ITERS * INNER * BAND * P
    peak_ops = total_ops / t_peak
    print(f"peak i32 chain: {t_peak*1e3:.2f} ms/run -> {peak_ops/1e12:.2f} T op/s", flush=True)

    t_swar = timed(swar, "swar")
    # swar does INNER logical packed ops per iter; each = 2 values
    swar_vals = ITERS * INNER * BAND * P * 2 / t_swar
    plain_vals = peak_ops  # 1 value per op in the plain chain
    print(f"swar 2x16-in-i32: {t_swar*1e3:.2f} ms/run -> {swar_vals/1e12:.2f} T values/s "
          f"(plain {plain_vals/1e12:.2f}) -> {'ACCEPT' if swar_vals > plain_vals else 'REJECT'}",
          flush=True)

    # place the production kernel against the measured peak.
    # Hand-count of the kernel body (ops/align_pallas.py `body`): ~60
    # always-on (band,P) elementwise ops per row + log2(band) prefix-scan
    # stages x ~6 ops -> ~96 ops/cell at band 64, ~90 at band 48.
    ops_per_cell = 60 + 6 * (BAND - 1).bit_length()
    rec = {
        "band": BAND, "P": P,
        "measured_vpu_peak_tops": round(peak_ops / 1e12, 3),
        "swar16x2_tvalues": round(swar_vals / 1e12, 3),
        "swar_vs_plain": round(swar_vals / plain_vals, 3),
        "swar_verdict": "accept" if swar_vals > plain_vals else "reject",
        "kernel_ops_per_cell_est": ops_per_cell,
        "method": "difference K=1 vs K=32 chained jit, fetch-forced",
    }
    # fold in the latest kernel Gcells/s if present
    try:
        last = json.loads(open(REPO / "PALLAS_BENCH.json").read().splitlines()[-1])
        gc = last.get("gcells_per_s_device")
        if gc:
            rec["kernel_gcells_s"] = gc
            rec["kernel_eff_tops"] = round(gc * 1e9 * ops_per_cell / 1e12, 3)
            rec["pct_of_measured_peak"] = round(
                100 * gc * 1e9 * ops_per_cell / peak_ops, 1
            )
    except Exception:
        pass
    with open(REPO / "PALLAS_ROOFLINE.json", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
