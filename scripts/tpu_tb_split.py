"""Split timing: forward-payload scan vs walk vs RLE on the real TPU.
Difference method per CLAUDE.md (vary inputs, value-fetch to sync)."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    band = int(sys.argv[3]) if len(sys.argv) > 3 else 48

    import jax
    import jax.numpy as jnp
    from functools import partial

    from savont_tpu.ops.align import TargetIndex
    from savont_tpu.ops.align_batch import plan_jobs_batch
    from savont_tpu.ops.align_jax import _forward_payload, _pack_jobs, _walk_ops, sw_forward_meta

    rng = np.random.default_rng(42)
    BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
    jobs = []
    while len(jobs) < B:
        t = rng.choice(BASES, L).astype(np.uint8).tobytes()
        q = bytearray(t)
        for p in rng.choice(len(q), int(0.04 * len(q)), replace=False):
            q[p] = b"ACGT"[rng.integers(4)]
        js, _ = plan_jobs_batch(TargetIndex([t]), [bytes(q)], band=band, min_anchors=2)
        jobs.extend(js)
    jobs = jobs[:B]
    q, t, lo, tlens = _pack_jobs(jobs, band)
    Lq = q.shape[1]
    ops_max = Lq + t.shape[1]

    @partial(jax.jit, static_argnames=())
    def fwd_only(qa, ta, loa, tla):
        payload, score, ri, bj = _forward_payload(qa, ta, loa, tla, band)
        return score.sum() + payload.astype(jnp.int32).sum() + ri.sum() + bj.sum()

    @jax.jit
    def fwd_meta(qa, ta, loa, tla):
        out = sw_forward_meta(qa, ta, loa, tla, band=band, smooth=False)
        return out["score"].sum() + out["nm"].sum()

    @jax.jit
    def fwd_walk(qa, ta, loa, tla):
        payload, score, ri, bj = _forward_payload(qa, ta, loa, tla, band)
        dl_tab = jnp.minimum(loa[:, 1:] - loa[:, :-1], band + 1).astype(jnp.uint8)
        ops, cnt, nm, nins, ndel = _walk_ops(payload, dl_tab, score, ri, bj, band, ops_max)
        return score.sum() + cnt.sum() + nm.sum() + ops.astype(jnp.int32).sum()

    def timed(fn, label, reps=3, chaink=(1, 4)):
        ta_, loa_, tla_ = jnp.asarray(t), jnp.asarray(lo), jnp.asarray(tlens)

        def run_k(k):
            best = 1e9
            for rep in range(reps):
                st = time.time()
                prev = None
                for i in range(k):
                    # vary inputs each call: defeats server-side memoization
                    prev = fn(jnp.asarray((q + rep * 7 + i) % 5), ta_, loa_, tla_)
                _ = int(prev)  # value fetch = the only real sync on axon
                best = min(best, time.time() - st)
            return best
        t1 = run_k(chaink[0])
        t2 = run_k(chaink[1])
        per = (t2 - t1) / (chaink[1] - chaink[0])
        print(f"{label}: K{chaink[0]}={t1:.3f}s K{chaink[1]}={t2:.3f}s -> "
              f"{per*1000:.1f} ms/call, {per*1000/B:.4f} ms/pair", flush=True)
        return per

    # warm up compiles
    for fn in (fwd_only, fwd_meta, fwd_walk):
        _ = int(fn(jnp.asarray(q), jnp.asarray(t), jnp.asarray(lo), jnp.asarray(tlens)))
        print("compiled one", flush=True)

    timed(fwd_meta, "fwd_meta(raw)")
    timed(fwd_only, "fwd_payload ")
    timed(fwd_walk, "fwd+walk    ")


if __name__ == "__main__":
    main()
