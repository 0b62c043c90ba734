"""Validation oracle: check emitted ASVs against a reference ASV set.

Mirrors the reference's primary acceptance test
(tests/integration_test.rs:91-160): every produced ASV must align to some
reference ASV with NM=0 (minimap2 map_ont as oracle there; our banded
aligner here, plus an exact-substring fast path which is strictly stronger).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .io.fastx import read_fastx
from .ops.align import TargetIndex, map_query
from .ops.encode import revcomp_bytes


@dataclass
class AsvValidation:
    header: str
    nm: int | None  # None = unmapped
    exact_substring: bool
    ref_hit: str | None


def validate_asvs(asv_fasta: str, ref_fasta: str) -> list[AsvValidation]:
    refs = [(r.id, r.seq.upper()) for r in read_fastx(ref_fasta)]
    asvs = [(r.id, r.seq.upper()) for r in read_fastx(asv_fasta)]
    index = TargetIndex([np.frombuffer(s, dtype=np.uint8) for _, s in refs])

    results = []
    for header, seq in asvs:
        rc = revcomp_bytes(seq)
        exact = None
        for rid, rseq in refs:
            if seq in rseq or rc in rseq or rseq in seq or rseq in rc:
                exact = rid
                break
        if exact is not None:
            results.append(AsvValidation(header, 0, True, exact))
            continue
        hits = map_query(index, seq)
        if not hits:
            results.append(AsvValidation(header, None, False, None))
        else:
            best = min(hits, key=lambda m: m.nm)
            results.append(AsvValidation(header, best.nm, False, refs[best.target_id][0]))
    return results


def main() -> None:
    import sys

    res = validate_asvs(sys.argv[1], sys.argv[2])
    perfect = sum(1 for r in res if r.nm == 0)
    print(f"{perfect}/{len(res)} ASVs perfect (NM=0)")
    for r in res:
        status = "EXACT" if r.exact_substring else (f"NM={r.nm}" if r.nm is not None else "UNMAPPED")
        print(f"  {status:10} {r.header.split()[0]} -> {r.ref_hit}")
    sys.exit(0 if perfect == len(res) and res else 1)


if __name__ == "__main__":
    main()
