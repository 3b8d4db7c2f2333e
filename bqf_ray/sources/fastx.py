"""FASTA/FASTQ record sources (closes SURVEY §2 S3).

The reference parses reads with the bundled FQFeeder
(/root/reference/bundled/FQFeeder, consumed at
/root/reference/src/bqf_cf.cpp:45-54): one reader thread assembles
records — multi-line FASTA sequences, strict 4-line FASTQ — and worker
threads consume them.  The Ray-Data analog parallelizes across FILES:
``read_binary_files`` ships each file's bytes to a task that assembles
records vectorized (newline scan via numpy, per-record slicing only).
Records therefore never straddle task boundaries — the failure mode of a
line-oriented ``read_text`` parse.  Intra-file parallelism is not
attempted (matches the reference's single reader per file); at cluster
scale inputs arrive as many files/chunks, which is where the parallelism
lives.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _line_starts(arr: np.ndarray) -> np.ndarray:
    """Start offset of every line in a byte array (0 plus each pos after
    a newline, excluding a trailing one)."""
    nl = np.flatnonzero(arr == 0x0A)
    starts = np.concatenate([[0], nl + 1])
    return starts[starts < len(arr)]


def parse_fasta_bytes(data: bytes) -> tuple[list[str], list[str]]:
    """(names, sequences) — multi-line sequences concatenated, '\\r'
    tolerated, names cut at the first whitespace (FQFeeder behavior)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if len(arr) == 0:
        return [], []
    starts = _line_starts(arr)
    last = len(arr) - (1 if arr[-1] == 0x0A else 0)
    ends = np.concatenate([starts[1:] - 1, [last]])   # drop the \n
    # tolerate \r\n
    ends = ends - (arr[np.maximum(ends - 1, 0)] == 0x0D)
    is_hdr = arr[starts] == ord(">")
    hdr_idx = np.flatnonzero(is_hdr)
    names, seqs = [], []
    for hi, h in enumerate(hdr_idx):
        name = bytes(arr[starts[h] + 1:ends[h]]).decode().split()[0] \
            if ends[h] > starts[h] + 1 else ""
        nxt = hdr_idx[hi + 1] if hi + 1 < len(hdr_idx) else len(starts)
        parts = [bytes(arr[starts[li]:ends[li]]) for li in range(h + 1, nxt)]
        names.append(name)
        seqs.append(b"".join(parts).decode())
    return names, seqs


def parse_fastq_bytes(data: bytes) -> tuple[list[str], list[str], list[str]]:
    """(names, sequences, qualities) — strict 4-line records
    (@name / seq / + / qual), the reference's FASTQ layout."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if len(arr) == 0:
        return [], [], []
    starts = _line_starts(arr)
    last = len(arr) - (1 if arr[-1] == 0x0A else 0)
    ends = np.concatenate([starts[1:] - 1, [last]])
    ends = ends - (arr[np.maximum(ends - 1, 0)] == 0x0D)
    # drop a trailing blank line
    while len(starts) and ends[-1] <= starts[-1]:
        starts, ends = starts[:-1], ends[:-1]
    if len(starts) % 4 != 0:
        raise ValueError(f"FASTQ is not 4-line records ({len(starts)} lines)")
    names, seqs, quals = [], [], []
    for r in range(0, len(starts), 4):
        if arr[starts[r]] != ord("@"):
            raise ValueError(f"FASTQ record {r // 4} does not start with @")
        if arr[starts[r + 2]] != ord("+"):
            raise ValueError(f"FASTQ record {r // 4} missing + separator")
        names.append(bytes(arr[starts[r] + 1:ends[r]]).decode().split()[0]
                     if ends[r] > starts[r] + 1 else "")
        seqs.append(bytes(arr[starts[r + 1]:ends[r + 1]]).decode())
        quals.append(bytes(arr[starts[r + 3]:ends[r + 3]]).decode())
    return names, seqs, quals


def read_fastx(paths, include_quality: bool = False, parallelism: int = -1):
    """Dataset[(name, seq[, qual])] over FASTA/FASTQ files (format sniffed
    per file from the first byte: '>' FASTA, '@' FASTQ)."""
    import ray

    ds = ray.data.read_binary_files(paths, include_paths=True,
                                    override_num_blocks=(
                                        None if parallelism == -1
                                        else parallelism))

    def parse(batch: pa.Table) -> pa.Table:
        names, seqs, quals = [], [], []
        for data in batch.column("bytes").to_pylist():
            head = bytes(data[:1])
            if head == b">":
                n, s = parse_fasta_bytes(data)
                q = [""] * len(n)
            elif head == b"@":
                n, s, q = parse_fastq_bytes(data)
            elif len(data) == 0:
                n, s, q = [], [], []
            else:
                raise ValueError("not FASTA/FASTQ: first byte "
                                 f"{head!r}")
            names.extend(n)
            seqs.extend(s)
            quals.extend(q)
        cols = {"name": pa.array(names, pa.string()),
                "seq": pa.array(seqs, pa.string())}
        if include_quality:
            cols["qual"] = pa.array(quals, pa.string())
        return pa.table(cols)

    return ds.map_batches(parse, batch_format="pyarrow")
