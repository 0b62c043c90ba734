#!/usr/bin/env python
"""Probe which int16 vector ops Mosaic supports on this chip: maxsi, cmpi
(slt/eq), select by i16-born mask, add/sub/shifts.  Each variant compiles
separately so one failure doesn't mask the rest."""
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


def run(tag, body):
    def kernel(x_ref, y_ref, out_ref):
        out_ref[:, :] = body(x_ref[:, :], y_ref[:, :]).astype(jnp.int32)

    fn = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((64, 128), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 128), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((64, 128), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
    )
    x = np.arange(64 * 128, dtype=np.int16).reshape(64, 128) % 97
    y = (np.arange(64 * 128, dtype=np.int16).reshape(64, 128) * 7) % 89
    try:
        out = np.asarray(jax.jit(fn)(jnp.asarray(x), jnp.asarray(y)))
        print(f"{tag}: OK  sample {out[0, :3]}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"{tag}: FAIL {msg}", flush=True)


run("maxsi_i16", lambda x, y: jnp.maximum(x, y))
run("cmp_slt_i16", lambda x, y: (x < y).astype(jnp.int16))
run("cmp_eq_i16", lambda x, y: (x == y).astype(jnp.int16))
run("select_i16mask", lambda x, y: jnp.where(x < y, x, y))
run("shrai_i16", lambda x, y: lax.shift_right_arithmetic(x - y, 15))
run("bitsel_i16", lambda x, y: ((m := lax.shift_right_arithmetic(y - x - 1, 15)) & x) | (~m & y))
