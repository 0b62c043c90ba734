#!/usr/bin/env python
"""Tag BAM reads with their savont-tpu cluster id for IGV haplotype coloring.

Equivalent of the reference helper (scripts/tag_bam_with_clusters.py):
parses final_clusters.tsv and writes HP:i:<cluster> tags.  Requires pysam
(not bundled in this image; the script degrades to a clear error).

Usage: tag_bam_with_clusters.py final_clusters.tsv in.bam out.bam
"""
from __future__ import annotations

import sys


def parse_cluster_file(path: str) -> dict[str, int]:
    """final_clusters.tsv: header lines `final_cluster_<id>\tsize_...` followed
    by one `read_id est_id` line per member."""
    read_to_cluster: dict[str, int] = {}
    cluster_id = None
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            if "\t" in line and line.split("\t")[0].endswith(tuple("0123456789")) and "_cluster_" in line:
                cluster_id = int(line.split("\t")[0].rsplit("_", 1)[1])
                continue
            if cluster_id is not None:
                read_id = line.split()[0]
                # base id = first whitespace token of the read header
                read_to_cluster[read_id] = cluster_id
    return read_to_cluster


def tag_bam_file(cluster_tsv: str, in_bam: str, out_bam: str) -> None:
    try:
        import pysam
    except ImportError:
        sys.exit("pysam is required for BAM tagging: pip install pysam")
    mapping = parse_cluster_file(cluster_tsv)
    n_tagged = 0
    with pysam.AlignmentFile(in_bam, "rb") as fin:
        with pysam.AlignmentFile(out_bam, "wb", template=fin) as fout:
            for read in fin:
                cid = mapping.get(read.query_name)
                if cid is not None:
                    read.set_tag("HP", cid, value_type="i")
                    n_tagged += 1
                fout.write(read)
    print(f"tagged {n_tagged} reads across {len(set(mapping.values()))} clusters")


if __name__ == "__main__":
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    tag_bam_file(sys.argv[1], sys.argv[2], sys.argv[3])
