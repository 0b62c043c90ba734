#!/usr/bin/env python
"""One-off probe: verify tpu.bitcast i16<->i32 sublane pairing on the real
chip so _roll_sub's odd-shift halfword formula can be written correctly.

Emits three candidate roll-by-1 implementations of out[j] = x[j-1] over the
sublane axis for an int16 (64, 128) iota and prints which (if any) matches.
"""
import os
import sys
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


def kernel(x_ref, out_ref):
    x = x_ref[:, :]  # (64, 128) i16
    w = pltpu.bitcast(x, jnp.int32)  # (32, 128)
    # even roll by 2 sublanes = word roll by 1
    even = pltpu.bitcast(pltpu.roll(w, 1, axis=0), jnp.int16)
    # odd roll by 1, formula A: lo half of word m is x[2m]
    wr = pltpu.roll(w, 1, axis=0)
    ya = (w << 16) | lax.shift_right_logical(wr, 16)
    odd_a = pltpu.bitcast(ya, jnp.int16)
    # odd roll by 1, formula B (opposite pairing)
    yb = lax.shift_right_logical(w, 16) | (wr << 16)
    odd_b = pltpu.bitcast(yb, jnp.int16)
    out_ref[0:64, :] = even
    out_ref[64:128, :] = odd_a
    out_ref[128:192, :] = odd_b


def main():
    x = (np.arange(64, dtype=np.int16)[:, None] + np.zeros((1, 128), np.int16))
    fn = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((64, 128), lambda: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((192, 128), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((192, 128), jnp.int16),
    )
    out = np.asarray(jax.jit(fn)(jnp.asarray(x)))
    want_even = np.roll(x, 2, axis=0)
    want_odd = np.roll(x, 1, axis=0)
    print("even(word-roll) ok:", bool((out[0:64] == want_even).all()))
    print("odd formula A ok: ", bool((out[64:128] == want_odd).all()))
    print("odd formula B ok: ", bool((out[128:192] == want_odd).all()))
    print("sample col0:", out[64:72, 0], "want", want_odd[:8, 0])


if __name__ == "__main__":
    main()
