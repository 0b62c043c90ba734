#!/usr/bin/env python
"""Probe the cost of sublane rotates on v5e: tpu.dynamic_rotate
(pltpu.roll) vs static slice+concat, 2000 dependent applications each."""
import os
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 2000


def mk(mode):
    def kernel(x_ref, out_ref):
        x = x_ref[:, :]

        def step(i, x):
            if mode == "roll":
                y = pltpu.roll(x, 1, axis=0)
            elif mode == "concat":
                y = jnp.concatenate([x[-1:], x[:-1]], axis=0)
            elif mode == "add":
                y = x
            return y + 1

        x = lax.fori_loop(0, N, step, x)
        out_ref[:, :] = x

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((64, 128), lambda: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, 128), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
    )


def main():
    jnp.zeros(8).block_until_ready()
    x = np.arange(64 * 128, dtype=np.int32).reshape(64, 128)
    for mode in ("add", "roll", "concat"):
        try:
            fn = jax.jit(mk(mode))
            out = np.asarray(fn(jnp.asarray(x)))  # compile + sanity
            best = 9e9
            for _ in range(3):
                t0 = time.time()
                fn(jnp.asarray(x)).block_until_ready()
                best = min(best, time.time() - t0)
            print(f"{mode}: {best*1e6/N:.2f} us/op  (total {best*1e3:.2f} ms, out[0,0]={out[0,0]})", flush=True)
        except Exception as e:
            print(f"{mode}: FAIL {str(e).splitlines()[0][:110]}", flush=True)


if __name__ == "__main__":
    main()
