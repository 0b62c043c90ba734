"""Parity tests for the vectorized EM (ops/em.py) vs the reference-shaped
dict loops (alignment.rs:1951-2003, classify.rs:24-117)."""
import numpy as np
import pytest

from savont_tpu.ops.em import em_abundances, em_abundances_jax, groups_to_rows


def _dict_loop_em(eq_classes, n_asvs, total, conv, max_iter):
    """The original dict-of-tuples loop (stage7_em oracle)."""
    abund = np.full(n_asvs, 1.0 / n_asvs)
    for _ in range(max_iter):
        new = np.zeros(n_asvs)
        for asvs, count in eq_classes.items():
            denom = sum(abund[a] for a in asvs)
            if denom > 0:
                for a in asvs:
                    new[a] += count * abund[a] / denom
        if new.sum() > 0:
            new /= total
        max_change = float(np.abs(abund - new).max())
        abund = new
        if max_change < conv:
            break
    return abund


def _random_eq_classes(rng, n_asvs, n_groups):
    eq = {}
    for _ in range(n_groups):
        size = int(rng.integers(1, min(6, n_asvs) + 1))
        members = tuple(sorted(rng.choice(n_asvs, size, replace=False).tolist()))
        eq[members] = eq.get(members, 0) + int(rng.integers(1, 50))
    return eq


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n_asvs,n_groups", [(3, 5), (18, 40), (120, 400)])
def test_em_bit_identical_to_dict_loop(seed, n_asvs, n_groups):
    rng = np.random.default_rng(seed)
    eq = _random_eq_classes(rng, n_asvs, n_groups)
    total = sum(eq.values())
    conv = 0.01 / total
    oracle = _dict_loop_em(eq, n_asvs, total, conv, 100)
    gids, iids, w = groups_to_rows((m, c) for m, c in eq.items())
    got = em_abundances(gids, iids, w, n_asvs, float(total), conv, 100)
    # same accumulation order -> exactly equal, not just close
    assert np.array_equal(oracle, got)


def test_em_empty_and_zero_denom():
    # no groups: uniform stays
    got = em_abundances(np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0), 4, 1.0, 1e-3, 10)
    assert np.allclose(got, 0.25)
    # a group whose members all have zero abundance after iter 1 must not NaN
    eq = {(0,): 10, (1,): 0}
    gids, iids, w = groups_to_rows((m, c) for m, c in eq.items())
    got = em_abundances(gids, iids, w, 2, 10.0, 1e-9, 50)
    assert np.isfinite(got).all()


def test_em_duplicate_members_counted_like_dict_loop():
    """classify can map one ASV to the same tax idx via several DB refs;
    duplicates must contribute multiply, as in the reference loop."""
    eq = {(0, 0, 1): 9, (1,): 3}
    oracle = _dict_loop_em(eq, 2, 12, 1e-6, 100)
    gids, iids, w = groups_to_rows((m, c) for m, c in eq.items())
    got = em_abundances(gids, iids, w, 2, 12.0, 1e-6, 100)
    assert np.array_equal(oracle, got)


def test_em_jax_matches_numpy():
    rng = np.random.default_rng(7)
    eq = _random_eq_classes(rng, 30, 80)
    total = sum(eq.values())
    conv = 0.01 / total
    gids, iids, w = groups_to_rows((m, c) for m, c in eq.items())
    ref = em_abundances(gids, iids, w, 30, float(total), conv, 100)
    import jax

    got = np.asarray(
        jax.jit(em_abundances_jax, static_argnums=(3, 6))(
            gids, iids, w, 30, float(total), conv, 100
        )
    )
    assert np.allclose(ref, got, atol=2e-5)


def test_refine_em_no_aligned_candidates(tmp_path):
    """A read set where NO read has an aligned candidate (e.g. a per-sample
    pass over a file whose reads fail SNPmer candidate selection) must
    return total=0 instead of crashing (regression: empty-array indexing
    in the vectorized tie-break)."""
    import numpy as np

    from savont_tpu.config import ClusterArgs
    from savont_tpu.core import ConsensusSequence, KmerGlobalInfo, TwinRead
    from savont_tpu.pipeline.stage7_em import refine_asv_depths_with_em

    args = ClusterArgs(input_files=["x"], output_dir=str(tmp_path), threads=1)
    (tmp_path / "temp").mkdir(parents=True, exist_ok=True)
    # one consensus, reads with zero snpmers/minimizers -> zero candidates
    seq = np.frombuffer(b"ACGT" * 50, np.uint8).copy()
    cons = ConsensusSequence(
        sequence=seq, hp_lengths=np.ones(len(seq), np.uint8),
        depth=1, id=0, cluster=[0],
    )
    reads = [
        TwinRead(
            id=f"r{i}", base_id=f"r{i}",
            codes=np.zeros(60, np.uint8), k=17, l=3,
            snp_pos=np.zeros(0, np.uint32), snp_kmers_all=np.zeros(0, np.uint64),
            mini_pos=np.zeros(0, np.uint32), mini_kmers_all=np.zeros(0, np.uint64),
        )
        for i in range(3)
    ]
    ki = KmerGlobalInfo(
        snpmer_info=[], high_freq_kmers=np.zeros(0, np.uint64),
        high_freq_thresh=0.0, read_files=["x"],
    )

    def build_asv_trs():
        tr = TwinRead(
            id="a0", base_id="a0", codes=np.zeros(60, np.uint8), k=17, l=3,
            snp_pos=np.zeros(0, np.uint32), snp_kmers_all=np.zeros(0, np.uint64),
            mini_pos=np.zeros(0, np.uint32), mini_kmers_all=np.zeros(0, np.uint64),
        )
        return [tr]

    out, eq, total = refine_asv_depths_with_em(reads, [cons], ki, args, build_asv_trs)
    assert total == 0 and eq == {}
