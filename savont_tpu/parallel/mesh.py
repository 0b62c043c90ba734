"""Multi-chip scale-out: data-parallel read batches over a device Mesh.

The reference is a single-host rayon-thread tool (SURVEY.md §2.3); the
TPU-native equivalent shards fixed-shape read batches across chips with
jax.sharding + shard_map and reduces EM statistics with psum over ICI:

  - reads (queries) are sharded on the batch axis ("dp"),
  - the ASV/reference panel (targets) is replicated per device,
  - each chip runs the banded-DP kernel on its shard,
  - per-ASV EM numerators are psum-reduced across the mesh.

This is the full device side of stage 7 (and `classify`): candidate NM
matrices -> equivalence weights -> one EM iteration, all under one jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.align_jax import sw_forward_meta


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def sharded_align_em_step(
    mesh: Mesh,
    band: int = 128,
):
    """Build a jitted, mesh-sharded (align + EM-iteration) step.

    Step signature:
      reads   (R, Lq) int32   — sharded over "dp"
      lo      (R, Lq+1) int32 — per-read band offsets, sharded
      targets (A, Lt) int32   — replicated ASV panel
      tlens   (A,) int32      — replicated
      abund   (A,) f32        — replicated EM abundances
    Returns (new_abund (A,) f32, nm (R, A) int32).

    Each read aligns against EVERY target (the candidate prefilter happens
    host-side; here shapes are dense/fixed).  Equivalence weights use the
    best-NM tie set per read; the M-step numerator is psum-reduced.
    """
    axis = mesh.axis_names[0]

    def per_shard(reads, lo, targets, tlens, abund):
        R, Lq = reads.shape
        A, Lt = targets.shape

        # align all (read, target) pairs in this shard: tile to (R*A, ...)
        q = jnp.repeat(reads, A, axis=0)
        lo_t = jnp.repeat(lo, A, axis=0)
        t = jnp.tile(targets, (R, 1))
        tl = jnp.tile(tlens, R)
        out = sw_forward_meta(q, t, lo_t, tl, band=band)
        nm = out["nm"].reshape(R, A)
        score = out["score"].reshape(R, A)

        # reads with no positive-score hit are unassigned
        valid = score > 0
        nm_eff = jnp.where(valid, nm, 1 << 20)
        best_nm = nm_eff.min(axis=1, keepdims=True)
        in_tie = (nm_eff == best_nm) & valid
        assigned = in_tie.any(axis=1)

        # E-step: responsibilities proportional to abundance within the tie set
        w = jnp.where(in_tie, abund[None, :], 0.0)
        denom = w.sum(axis=1, keepdims=True)
        resp = jnp.where(denom > 0, w / jnp.maximum(denom, 1e-30), 0.0)
        local_num = (resp * assigned[:, None]).sum(axis=0)
        local_count = assigned.sum()

        num = lax.psum(local_num, axis)
        count = lax.psum(local_count, axis)
        new_abund = jnp.where(count > 0, num / jnp.maximum(count, 1), abund)
        return new_abund, nm

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(None, None), P(None), P(None)),
        out_specs=(P(None), P(axis, None)),
    )
    return jax.jit(sharded)


def sharded_classify_nm(mesh: Mesh, band: int = 128):
    """Build a jitted classify scoring step: queries (ASVs) replicated, the
    REFERENCE PANEL sharded over the mesh ("dp" axis = DB shards, the
    `classify` scale-out in BASELINE.json config 5).  Each device aligns
    every query against its local reference shard with the banded kernel;
    the (Q, R) NM/score matrices come back sharded on R.

    Step signature:
      queries (Q, Lq) int32 replicated
      lo      (Q, Lq+1) int32 replicated (smooth band offsets)
      refs    (R, Lt) int32 sharded on "dp"
      rlens   (R,) int32 sharded
    Returns (nm (Q, R) int32, score (Q, R) int32), R-axis sharded.
    """
    axis = mesh.axis_names[0]

    def per_shard(queries, lo, refs, rlens):
        Q, Lq = queries.shape
        R, Lt = refs.shape
        q = jnp.repeat(queries, R, axis=0)
        lo_t = jnp.repeat(lo, R, axis=0)
        t = jnp.tile(refs, (Q, 1))
        tl = jnp.tile(rlens, Q)
        out = sw_forward_meta(q, t, lo_t, tl, band=band)
        return out["nm"].reshape(Q, R), out["score"].reshape(Q, R)

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(None, None), P(None, None), P(axis, None), P(axis)),
        out_specs=(P(None, axis), P(None, axis)),
    )
    return jax.jit(sharded)


def sharded_sintax_scores(mesh: Mesh, query_kmers: np.ndarray):
    """Build a jitted SINTAX scoring step with the DATABASE sharded over the
    mesh (the "sintax DB shards per device" sweep — sintax.rs:219-273 is an
    embarrassingly parallel max-reduce over references).

    query_kmers (P, S) uint32: the S=32 subsampled k-mers per (asv, iter)
    pair, replicated to every device (a few hundred KB).  Rows of empty
    ASVs hold the 0xFFFFFFFE sentinel, which never matches a reference.

    The returned step takes one reference chunk:
      refk (R, L) uint32 — per-reference sorted unique k-mers padded with
                           0xFFFFFFFF, sharded on the mesh axis
      ridx (R,)  uint32 — kept-reference stream ordinals (< 2^26)
    and returns a replicated (P,) uint32 key vector:
      key = (score << 26) | (0x3FFFFFF - ordinal), or 0 when score == 0.
    Maximizing the key reproduces the host stream's tie-break exactly
    (strictly-greater score wins; equal scores keep the EARLIEST reference),
    so chunks and shards can be max-reduced in any order (lax.pmax over
    ICI here, np.maximum across chunks on host).
    """
    axis = mesh.axis_names[0]
    qk = jnp.asarray(query_kmers, jnp.uint32)
    n_pairs, S = qk.shape
    flat = qk.reshape(-1)

    def per_shard(refk, ridx):
        def row_key(row, ri):
            pos = jnp.searchsorted(row, flat)
            hit = row[jnp.clip(pos, 0, row.shape[0] - 1)] == flat
            score = hit.reshape(n_pairs, S).sum(axis=1).astype(jnp.uint32)
            return jnp.where(
                score > 0, (score << jnp.uint32(26)) | (jnp.uint32(0x3FFFFFF) - ri),
                jnp.uint32(0),
            )

        keys = jax.vmap(row_key)(refk, ridx)  # (R/D, P)
        local = keys.max(axis=0)
        return lax.pmax(local, axis)

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=P(),
    )
    return jax.jit(sharded)


def shard_reads(mesh: Mesh, reads: np.ndarray, axis: str = "dp"):
    """Place a host batch with batch-axis sharding over the mesh."""
    return jax.device_put(reads, NamedSharding(mesh, P(axis) if reads.ndim == 1 else P(axis, *([None] * (reads.ndim - 1)))))
