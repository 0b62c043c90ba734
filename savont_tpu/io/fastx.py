"""FASTQ/FASTA ingestion (the reference's needletail role, seq_parse.rs).

Pure-Python host parser with gzip support.  The hot per-base work happens in
vector kernels downstream, so parsing is IO-bound; a C++ extension
(native/fastx.cpp) accelerates this path when built, with this module as the
always-available fallback.
"""
from __future__ import annotations

import gzip
import io
import os
from dataclasses import dataclass


@dataclass
class FastxRecord:
    id: str  # full header line without '>'/'@'
    seq: bytes
    qual: bytes | None  # ASCII quality string, None for FASTA


def _open(path: str):
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return io.BufferedReader(gzip.GzipFile(fileobj=f), buffer_size=1 << 20)
    return io.BufferedReader(f, buffer_size=1 << 20)


def read_fastx(path: str):
    """Yield FastxRecord from a FASTA/FASTQ(.gz) file."""
    try:
        from savont_tpu.io import _native_fastx  # type: ignore

        yield from _native_fastx.read(path)
        return
    except ImportError:
        pass
    with _open(path) as f:
        first = f.peek(1)[:1]
        if first == b"@":
            while True:
                h = f.readline()
                if not h:
                    break
                seq = f.readline().rstrip(b"\r\n")
                f.readline()  # +
                qual = f.readline().rstrip(b"\r\n")
                yield FastxRecord(h[1:].rstrip(b"\r\n").decode(), seq, qual)
        elif first == b">":
            header = None
            chunks: list[bytes] = []
            for line in f:
                if line.startswith(b">"):
                    if header is not None:
                        yield FastxRecord(header, b"".join(chunks), None)
                    header = line[1:].rstrip(b"\r\n").decode()
                    chunks = []
                else:
                    chunks.append(line.strip())
            if header is not None:
                yield FastxRecord(header, b"".join(chunks), None)
        elif first == b"":
            return
        else:
            raise ValueError(f"{path}: not FASTA/FASTQ")


def write_fasta(path: str | os.PathLike, records: list[tuple[str, bytes]]) -> None:
    with open(path, "w") as f:
        for header, seq in records:
            f.write(f">{header}\n")
            f.write(seq.decode() if isinstance(seq, bytes) else seq)
            f.write("\n")
