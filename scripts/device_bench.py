#!/usr/bin/env python
"""Device-path end-to-end bench (VERDICT round-1 item 2 evidence).

Runs on whatever jax backend the process gets (on the build VM: one real
TPU chip through the axon tunnel; the ~100-200 s first-use warmup and
3-8 min Mosaic compiles are per-process one-time costs and are excluded
from the steady-state numbers).

Two measurements, written to DEVICE_BENCH.json at the repo root:
  1. the FULL Zymo pipeline with SAVONT_STAGE7_BACKEND=mesh (production
     stage-7 align+tie-set+EM on-device), correctness-gated at 18/18 NM=0;
  2. steady-state mesh_stage7_tie_break pairs/s at Zymo-like shapes
     (second call, compile cached).
"""
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

READS = "/root/reference/tests/data/ont_zymo_1000.trimmed.fq.gz"
REF_ASVS = "/root/reference/tests/data/zymo_ref_asvs.fa.gz"


def main() -> int:
    os.environ["SAVONT_STAGE7_BACKEND"] = "mesh"
    import jax
    import numpy as np

    devices = [str(d) for d in jax.devices()]
    print(f"devices: {devices}", flush=True)

    # pay the one-time axon tunnel warmup (~100-200 s worst case) OUTSIDE
    # the timed sections
    import jax.numpy as jnp

    t0 = time.time()
    jnp.zeros(8).block_until_ready()
    print(f"device warmup: {time.time() - t0:.1f}s", flush=True)

    from savont_tpu.config import ClusterArgs
    from savont_tpu.pipeline.asv import run_cluster
    from savont_tpu.validate import validate_asvs

    out = Path(tempfile.mkdtemp(prefix="savont_devbench_"))
    try:
        # first run pays the XLA compiles (and any residual tunnel warmup);
        # the steady-state number is the best of 4 warm runs (tunnel RPC
        # times vary 26-36 ms and the VM shows ~8% steal)
        def _run_pipeline_walls(n_runs: int) -> list[float]:
            walls = []
            for _ in range(n_runs):
                shutil.rmtree(out, ignore_errors=True)
                from savont_tpu.pipeline import stage1_kmers

                stage1_kmers._READ_CACHE.clear()
                t0 = time.time()
                run_cluster(ClusterArgs(input_files=[READS], output_dir=str(out), threads=4))
                walls.append(time.time() - t0)
            return walls

        walls = _run_pipeline_walls(6)
        wall = min(walls[1:])
        results = validate_asvs(str(out / "final_asvs.fasta"), REF_ASVS)
        ok = bool(results) and all(r.nm == 0 for r in results)
        print(f"pipeline: cold {walls[0]:.1f}s, warm {wall:.1f}s, {len(results)} ASVs, all_nm0={ok}", flush=True)

        # FULL-device configuration: every CIGAR/NM-producing alignment in
        # stages 4-6 routed through the device kernels (run_jobs via
        # SAVONT_ALIGN_BACKEND=jax, byte-identical per
        # tests/test_device_traceback.py), stage-4 pileups + stage-7 on the
        # mesh.  Honest number THROUGH THE TUNNEL: stages 4-6 issue many
        # small dispatches, each paying the ~30 ms RPC floor, so this
        # config only wins on locally-attached chips.
        # On TPU the pallas backend runs the Mosaic payload forward for
        # stage 4-6 CIGAR work (0.17 ms/pair vs 0.86 for the XLA forward,
        # TB_TPU_BENCH.json) with the exact XLA kernel for band-jump jobs;
        # stage-4 mesh pileups likewise auto-pick the Mosaic payload
        # forward for dl<=2 corridors.  Correctness-gated at 18/18 NM=0.
        fd_backend = "pallas" if jax.default_backend() == "tpu" else "jax"
        os.environ["SAVONT_ALIGN_BACKEND"] = fd_backend
        os.environ["SAVONT_STAGE4_BACKEND"] = "mesh"
        try:
            walls_fd = _run_pipeline_walls(3)
            wall_fd = min(walls_fd[1:])
            results_fd = validate_asvs(str(out / "final_asvs.fasta"), REF_ASVS)
            ok_fd = bool(results_fd) and all(r.nm == 0 for r in results_fd)
        finally:
            os.environ.pop("SAVONT_ALIGN_BACKEND", None)
            os.environ.pop("SAVONT_STAGE4_BACKEND", None)
        print(
            f"pipeline FULL-device: cold {walls_fd[0]:.1f}s, warm {wall_fd:.1f}s, "
            f"{len(results_fd)} ASVs, all_nm0={ok_fd}", flush=True,
        )

        # steady-state kernel pairs/s at Zymo-like shapes
        from savont_tpu.parallel.mesh import (
            device_roundtrip_ms,
            make_mesh,
            mesh_stage7_tie_break,
        )

        _rt = device_roundtrip_ms()

        rng = np.random.default_rng(11)
        BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
        A, L, B = 18, 1500, 256
        # second measurement at 4x the batch: the axon tunnel costs ~1.2 s
        # of fixed per-call round-trips, so pairs/s scales with batch until
        # kernel time dominates — B2 shows the amortized rate
        B2 = 1024
        asvs = [rng.choice(BASES, L).tobytes() for _ in range(A)]
        pairs, rr, ca = [], [], []
        for r in range(B2):
            b = bytearray(asvs[r % A])
            for p in rng.choice(L, 20, replace=False):
                b[p] = b"ACGT"[rng.integers(4)]
            pairs.append((bytes(b), asvs[r % A]))
            rr.append(r)
            ca.append(r % A)
        rr, ca = np.array(rr), np.array(ca)
        mesh = make_mesh()
        t0 = time.time()
        mesh_stage7_tie_break(pairs[:B], rr[:B], ca[:B], B, A, mesh=mesh)
        warm = time.time() - t0
        t0 = time.time()
        _, abund, count = mesh_stage7_tie_break(pairs[:B], rr[:B], ca[:B], B, A, mesh=mesh)
        steady = time.time() - t0
        assert count == B
        print(f"kernel: warm {warm:.1f}s, steady {steady:.2f}s = {B / steady:.0f} pairs/s", flush=True)
        mesh_stage7_tie_break(pairs, rr, ca, B2, A, mesh=mesh)  # warm B2 shapes
        t0 = time.time()
        _, _, count2 = mesh_stage7_tie_break(pairs, rr, ca, B2, A, mesh=mesh)
        steady2 = time.time() - t0
        assert count2 == B2
        print(f"kernel B={B2}: steady {steady2:.2f}s = {B2 / steady2:.0f} pairs/s", flush=True)

        # production-scale batch (the 100k-read run ships ~173k candidate
        # pairs through stage 7, so multi-thousand-pair batches are the
        # realistic shape); amortizes the fixed link roundtrips
        B3 = 4096
        pairs3, rr3, ca3 = [], [], []
        for r in range(B3):
            b = bytearray(asvs[r % A])
            for p in rng.choice(L, 20, replace=False):
                b[p] = b"ACGT"[rng.integers(4)]
            pairs3.append((bytes(b), asvs[r % A]))
            rr3.append(r)
            ca3.append(r % A)
        rr3, ca3 = np.array(rr3), np.array(ca3)
        mesh_stage7_tie_break(pairs3, rr3, ca3, B3, A, mesh=mesh)  # warm
        t0 = time.time()
        _, _, count3 = mesh_stage7_tie_break(pairs3, rr3, ca3, B3, A, mesh=mesh)
        steady3 = time.time() - t0
        assert count3 == B3
        print(f"kernel B={B3}: steady {steady3:.2f}s = {B3 / steady3:.0f} pairs/s", flush=True)

        # device k-mer extraction at scale (SURVEY §2.3 "device
        # sort/segment-reduce wins at large N" claim): stage-1 split-kmer
        # scan on-chip vs the host native scan, same 20k synthetic reads
        import gzip as _gzip

        from savont_tpu.ops.encode import encode_seq
        from savont_tpu.ops.kmers_jax import device_split_kmers
        from savont_tpu.ops.kmers_native import get_scan_lib, split_kmers_flat_native

        n_dk = 20000
        reads = []
        for r in range(n_dk):
            b = bytearray(asvs[r % A])
            for p in rng.choice(L, 20, replace=False):
                b[p] = b"ACGT"[rng.integers(4)]
            reads.append(bytes(b))
        codes_dk = [encode_seq(s) for s in reads]
        phred_dk = [None] * n_dk
        bytes_in = sum(len(c) for c in codes_dk)
        device_split_kmers(codes_dk[:256], phred_dk[:256], 17, 5)  # compile
        t0 = time.time()
        dev_kmers = device_split_kmers(codes_dk, phred_dk, 17, 5)
        dk_wall = time.time() - t0
        hk_wall = None
        if get_scan_lib() is not None:
            t0 = time.time()
            host_flat = split_kmers_flat_native(codes_dk, None, 17, 5, 4)
            hk_wall = time.time() - t0
            import numpy as _np

            dev_flat = _np.concatenate(dev_kmers) if dev_kmers else _np.zeros(0, "u8")
            assert len(dev_flat) == len(host_flat)
            if len(dev_flat):  # device path is bit-exact vs the host scan
                assert (_np.sort(dev_flat) == _np.sort(host_flat)).all()
        msg = (f"device kmers: {n_dk} reads ({bytes_in / 1e6:.0f} MB codes) in "
               f"{dk_wall:.2f}s = {n_dk / dk_wall:.0f} reads/s")
        if hk_wall:
            msg += f"; host native scan {hk_wall:.2f}s = {n_dk / hk_wall:.0f} reads/s"
        print(msg, flush=True)

        record = {
            "backend": jax.default_backend(),
            "devices": devices,
            "stage7_backend": "mesh",
            "pipeline_wall_s": round(wall, 2),
            "pipeline_full_device_wall_s": round(wall_fd, 2),
            "pipeline_full_device_all_nm0": ok_fd,
            "full_device_backend": fd_backend,
            "full_device_note": (
                f"SAVONT_ALIGN_BACKEND={fd_backend} + "
                "SAVONT_STAGE4_BACKEND=mesh + stage-7 mesh: every "
                "alignment (CIGARs incl.) on device.  Stage 4-6 dispatches "
                "are megabatched on high-latency links (1024-job tb "
                "buckets; stage-4 pileups one dispatch); on TPU the "
                "forwards run on the Mosaic payload kernel (dl<=2 "
                "corridors; exact XLA barrel-shift for band-jump jobs)"
            ),
            "jax_persistent_cache": True,
            "device_kmers_reads_per_s": round(n_dk / dk_wall, 1),
            "device_kmers_wall_s": round(dk_wall, 2),
            "device_kmers_bytes_in": bytes_in,
            "host_kmers_reads_per_s": round(n_dk / hk_wall, 1) if hk_wall else None,
            "n_asvs": len(results),
            "all_nm0": ok,
            "kernel_pairs_per_s_steady": round(B / steady, 1),
            "kernel_batch": B,
            "kernel_pairs_per_s_batch4x": round(B2 / steady2, 1),
            "kernel_batch4x": B2,
            "kernel_pairs_per_s_batch16x": round(B3 / steady3, 1),
            "kernel_batch16x": B3,
            "device_roundtrip_ms": round(_rt, 1),
            "note": (
                "kernel_pairs_per_s numbers are END-TO-END through the dev "
                "rig's tunneled device (fixed ~26-36 ms per RPC, executes "
                "do not overlap); the kernel itself runs at ~489k pairs/s "
                "on-device (PALLAS_BENCH.json, difference-method)"
            ),
            "kernel_len": L,
            "kernel_warm_s": round(warm, 1),
            "mesh_kernel": os.environ.get("SAVONT_MESH_KERNEL")
            or ("pallas" if jax.default_backend() == "tpu" else "scan"),
        }
        (REPO / "DEVICE_BENCH.json").write_text(json.dumps(record) + "\n")
        print(json.dumps(record), flush=True)
        return 0 if ok else 1
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
