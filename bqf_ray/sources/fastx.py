"""FASTA/FASTQ record sources (closes SURVEY §2 S3).

The reference parses reads with the bundled FQFeeder
(/root/reference/bundled/FQFeeder, consumed at
/root/reference/src/bqf_cf.cpp:45-54): one reader thread assembles
records — multi-line FASTA sequences, strict 4-line FASTQ — and worker
threads consume them.  The Ray-Data analog parallelizes BOTH across
files AND within a file: ``read_fastx`` cuts each file into
``split_size`` byte ranges, and every task resynchronizes its range to
the next record boundary (FASTA: the first ``\\n>``; FASTQ: 4-line
phase lock on the ``@``/``+`` line pattern) — adjacent tasks compute
the SAME sync point for their shared boundary, so records never split,
drop, or duplicate.  That is the distributed replacement for
FQFeeder's single reader thread + lock-free queue
(bundled/FQFeeder/include/FastxParser.hpp:144-173): a 7.7 GB FASTQ
(the reference's flagship input, README.md:89-91) becomes ~120
independent 64 MB parses instead of one task.

Record assembly is fully VECTORIZED: line offsets from one newline
scan, record payloads gathered with boolean-mask slicing, and the
Arrow string columns built directly from (offsets, values) buffers —
zero Python per record.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

DEFAULT_SPLIT = 64 << 20           # 64 MB byte-range per parse task
_SYNC_WIN = 1 << 20                # sync scan window (doubles on miss)


# ---------------------------------------------------------------------------
# vectorized record assembly
# ---------------------------------------------------------------------------

def _line_spans(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) byte offsets of every line — '\\n' terminated,
    '\\r\\n' tolerated, trailing newline not a line."""
    nl = np.flatnonzero(arr == 0x0A)
    starts = np.concatenate([[0], nl + 1])
    starts = starts[starts < len(arr)]
    last = len(arr) - (1 if len(arr) and arr[-1] == 0x0A else 0)
    ends = np.concatenate([starts[1:] - 1, [last]]) if len(starts) \
        else np.empty(0, dtype=np.int64)
    if len(ends):
        ends = ends - (arr[np.maximum(ends - 1, 0)] == 0x0D)
        ends = np.maximum(ends, starts)
    return starts.astype(np.int64), ends.astype(np.int64)


def _mask_gather(arr: np.ndarray, starts: np.ndarray,
                 ends: np.ndarray) -> np.ndarray:
    """Concatenate ``arr[s:e]`` for every span, order-preserving,
    without a Python loop (diff-trick boolean mask)."""
    d = np.zeros(len(arr) + 1, dtype=np.int32)
    np.add.at(d, starts, 1)
    np.add.at(d, ends, -1)
    return arr[np.cumsum(d[:-1]) > 0]


def _string_from_spans(arr: np.ndarray, starts: np.ndarray,
                       ends: np.ndarray) -> pa.Array:
    """Arrow utf8 array whose i-th value is ``arr[starts[i]:ends[i]]``
    — built straight from (offsets, values) buffers."""
    lens = (ends - starts).astype(np.int64)
    if lens.sum() > np.iinfo(np.int32).max:
        raise ValueError(
            "fastx: a single parse block exceeds 2 GiB of record bytes "
            "(int32 Arrow string offsets) — lower split_size so each "
            "byte range stays under 2 GiB")
    offsets = np.zeros(len(lens) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    values = _mask_gather(arr, starts, ends)
    out = pa.Array.from_buffers(
        pa.utf8(), len(lens),
        [None, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(np.ascontiguousarray(values).tobytes())])
    out.validate(full=True)          # utf8 check (decode() parity)
    return out


def _name_spans(arr: np.ndarray, hstart: np.ndarray, hend: np.ndarray
                ) -> tuple[np.ndarray, np.ndarray]:
    """Header span → name span: cut at the first space/tab (FQFeeder
    behavior)."""
    ws = np.flatnonzero((arr == 0x20) | (arr == 0x09))
    if len(ws):
        idx = np.searchsorted(ws, hstart)
        cand = ws[np.minimum(idx, len(ws) - 1)]
        name_end = np.where((idx < len(ws)) & (cand < hend), cand, hend)
    else:
        name_end = hend
    return hstart, np.maximum(name_end, hstart)


def parse_fasta_table(data: bytes) -> pa.Table:
    """FASTA bytes → Table(name, seq), multi-line sequences
    concatenated — one newline scan + mask gathers, no per-record
    Python."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if len(arr) == 0:
        return pa.table({"name": pa.array([], pa.string()),
                         "seq": pa.array([], pa.string())})
    starts, ends = _line_spans(arr)
    is_hdr = arr[starts] == ord(">")
    hdr_idx = np.flatnonzero(is_hdr)
    if not len(hdr_idx):
        return pa.table({"name": pa.array([], pa.string()),
                         "seq": pa.array([], pa.string())})
    ns, ne = _name_spans(arr, starts[hdr_idx] + 1, ends[hdr_idx])
    names = _string_from_spans(arr, ns, ne)
    # sequence bytes per line (0 for header lines and pre-header junk)
    line_len = np.where(is_hdr, 0, ends - starts)
    line_len[:hdr_idx[0]] = 0
    pre = np.zeros(len(starts) + 1, dtype=np.int64)
    np.cumsum(line_len, out=pre[1:])
    nxt = np.concatenate([hdr_idx[1:], [len(starts)]])
    seq_lens = pre[nxt] - pre[hdr_idx + 1] \
        if len(starts) else np.empty(0, dtype=np.int64)
    # clamp: a header as the last line has hdr_idx+1 == len(starts)
    seq_lens = np.maximum(seq_lens, 0)
    offsets = np.zeros(len(hdr_idx) + 1, dtype=np.int32)
    np.cumsum(seq_lens, out=offsets[1:])
    keep = ~is_hdr
    keep[:hdr_idx[0]] = False
    values = _mask_gather(arr, starts[keep], ends[keep])
    seqs = pa.Array.from_buffers(
        pa.utf8(), len(hdr_idx),
        [None, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(np.ascontiguousarray(values).tobytes())])
    seqs.validate(full=True)
    return pa.table({"name": names, "seq": seqs})


def parse_fastq_table(data: bytes) -> pa.Table:
    """FASTQ bytes → Table(name, seq, qual) — strict 4-line records
    (@name / seq / + / qual), vectorized, loud on malformed input."""
    arr = np.frombuffer(data, dtype=np.uint8)
    empty = pa.table({"name": pa.array([], pa.string()),
                      "seq": pa.array([], pa.string()),
                      "qual": pa.array([], pa.string())})
    if len(arr) == 0:
        return empty
    starts, ends = _line_spans(arr)
    # drop trailing blank lines
    while len(starts) and ends[-1] <= starts[-1]:
        starts, ends = starts[:-1], ends[:-1]
    if not len(starts):
        return empty
    if len(starts) % 4 != 0:
        raise ValueError(f"FASTQ is not 4-line records ({len(starts)} lines)")
    at_ok = arr[starts[0::4]] == ord("@")
    if not at_ok.all():
        r = int(np.flatnonzero(~at_ok)[0])
        raise ValueError(f"FASTQ record {r} does not start with @")
    plus_ok = arr[starts[2::4]] == ord("+")
    if not plus_ok.all():
        r = int(np.flatnonzero(~plus_ok)[0])
        raise ValueError(f"FASTQ record {r} missing + separator")
    ns, ne = _name_spans(arr, starts[0::4] + 1, ends[0::4])
    return pa.table({
        "name": _string_from_spans(arr, ns, ne),
        "seq": _string_from_spans(arr, starts[1::4], ends[1::4]),
        "qual": _string_from_spans(arr, starts[3::4], ends[3::4])})


def parse_fasta_bytes(data: bytes) -> tuple[list[str], list[str]]:
    """(names, sequences) — list view of :func:`parse_fasta_table`."""
    t = parse_fasta_table(data)
    return t.column("name").to_pylist(), t.column("seq").to_pylist()


def parse_fastq_bytes(data: bytes) -> tuple[list[str], list[str], list[str]]:
    """(names, sequences, qualities) — list view of
    :func:`parse_fastq_table`."""
    t = parse_fastq_table(data)
    return (t.column("name").to_pylist(), t.column("seq").to_pylist(),
            t.column("qual").to_pylist())


# ---------------------------------------------------------------------------
# byte-range splits with record-boundary resync
# ---------------------------------------------------------------------------

def _sync_fasta(path: str, pos: int, fsize: int) -> int:
    """First FASTA record start at-or-after ``pos`` (a '>' at offset 0
    or right after a newline).  Deterministic in ``(path, pos)``, so
    the task ending at a boundary and the task starting there agree."""
    if pos <= 0:
        return 0
    win = _SYNC_WIN
    with open(path, "rb") as f:
        while pos - 1 < fsize:
            f.seek(pos - 1)
            chunk = f.read(win)
            if not chunk:
                return fsize
            hit = chunk.find(b"\n>")
            if hit >= 0:
                return pos - 1 + hit + 1
            pos = pos - 1 + max(len(chunk) - 1, 1) + 1
            win *= 2
    return fsize


def _sync_fastq(path: str, pos: int, fsize: int) -> int:
    """First FASTQ RECORD start at-or-after ``pos`` — 4-line phase lock:
    the earliest line start whose line begins '@', whose +2 line begins
    '+', and whose +4/+6 lines (when present) repeat the pattern.  '@'
    is a legal quality character, so a single-line check can misphase;
    the two-record lookahead disambiguates every non-adversarial
    input (the seqkit/bgzf splitting convention)."""
    if pos <= 0:
        return 0
    win = max(_SYNC_WIN, 1 << 16)
    while True:
        with open(path, "rb") as f:
            f.seek(max(pos - 1, 0))
            chunk = f.read(win)
        if not chunk:
            return fsize
        base = max(pos - 1, 0)
        arr = np.frombuffer(chunk, dtype=np.uint8)
        nl = np.flatnonzero(arr == 0x0A)
        ls = nl + 1                      # line starts within the chunk
        if pos == 0:
            ls = np.concatenate([[0], ls])
        ls = ls[ls < len(arr)]
        at_eof = base + len(chunk) >= fsize
        L = len(ls)
        if at_eof:
            # strip trailing blank lines so the 4-line phase count is
            # exact to EOF
            while L and arr[ls[L - 1]] in (0x0A, 0x0D):
                L -= 1
        for i in range(L):
            if arr[ls[i]] != ord("@"):
                continue
            if at_eof:
                # EOF pins the phase exactly: a true record start has
                # (lines to EOF) ≡ 0 mod 4, while a quality/'+'/seq
                # line sits at offset 3/2/1 — so the remainder test
                # alone rejects a quality line that begins '@' (Phred
                # 31), which a pattern-only check would misphase on
                rem = L - i
                if rem % 4 != 0 or rem < 4:
                    continue
                if arr[ls[i + 2]] != ord("+"):
                    continue
                if i + 4 < L and arr[ls[i + 4]] != ord("@"):
                    continue
                if i + 6 < L and arr[ls[i + 6]] != ord("+"):
                    continue
                return base + int(ls[i])
            if i + 6 >= len(ls):
                break                    # need the full lookahead
            if arr[ls[i + 2]] != ord("+"):
                continue
            if arr[ls[i + 4]] != ord("@"):
                continue
            if arr[ls[i + 6]] != ord("+"):
                continue
            return base + int(ls[i])
        if at_eof:
            return fsize
        win *= 2
        if win > (64 << 20):
            raise ValueError(
                f"fastx: no FASTQ record boundary within 64 MB after "
                f"offset {pos} of {path} — malformed input?")


def read_fastx(paths, include_quality: bool = False,
               parallelism: int = -1,
               split_size: int | None = DEFAULT_SPLIT):
    """Dataset[(name, seq[, qual])] over FASTA/FASTQ files (format
    sniffed per file from the first byte: '>' FASTA, '@' FASTQ).

    ``split_size`` (default 64 MB) enables INTRA-file parallelism:
    each file is cut into byte ranges, and each task parses the
    records that START inside its range — resolving both of its
    boundaries with the shared deterministic sync functions, so
    adjacent tasks agree and no record is lost or doubled.  Pass
    ``split_size=None`` to parse each file as one task (the old
    behavior).  ``parallelism`` (when > 0) overrides ``split_size``
    with ``ceil(total_bytes / parallelism)`` — the requested task
    count, the old ``override_num_blocks`` meaning."""
    import math

    import ray

    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    if parallelism and parallelism > 0:
        total = sum(os.path.getsize(str(p)) for p in paths)
        split_size = max(1, math.ceil(total / int(parallelism)))
    specs = {"path": [], "offset": [], "size": [], "fsize": [],
             "fmt": []}
    for p in paths:
        p = str(p)
        fsize = os.path.getsize(p)
        with open(p, "rb") as f:
            head = f.read(1)
        if head == b">":
            fmt = "fasta"
        elif head == b"@":
            fmt = "fastq"
        elif not head:
            continue
        else:
            raise ValueError(f"not FASTA/FASTQ: first byte {head!r} "
                             f"in {p}")
        step = fsize if not split_size else int(split_size)
        for off in range(0, fsize, max(step, 1)):
            specs["path"].append(p)
            specs["offset"].append(off)
            specs["size"].append(min(step, fsize - off))
            specs["fsize"].append(fsize)
            specs["fmt"].append(fmt)
    if not specs["path"]:
        cols = {"name": pa.array([], pa.string()),
                "seq": pa.array([], pa.string())}
        if include_quality:
            cols["qual"] = pa.array([], pa.string())
        return ray.data.from_arrow(pa.table(cols))

    spec_tbl = pa.table({k: pa.array(v) for k, v in specs.items()})

    def parse(batch: pa.Table) -> pa.Table:
        outs = []
        for row in batch.to_pylist():
            p, off, size, fsize, fmt = (row["path"], row["offset"],
                                        row["size"], row["fsize"],
                                        row["fmt"])
            sync = _sync_fasta if fmt == "fasta" else _sync_fastq
            start = sync(p, off, fsize)
            end = sync(p, off + size, fsize) \
                if off + size < fsize else fsize
            if start >= end:
                continue
            with open(p, "rb") as f:
                f.seek(start)
                data = f.read(end - start)
            t = (parse_fasta_table(data) if fmt == "fasta"
                 else parse_fastq_table(data))
            if fmt == "fasta":
                t = t.append_column(
                    "qual", pa.array([""] * len(t), pa.string()))
            outs.append(t)
        if not outs:
            return pa.table({"name": pa.array([], pa.string()),
                             "seq": pa.array([], pa.string()),
                             "qual": pa.array([], pa.string())})
        return pa.concat_tables(outs)

    n_tasks = len(specs["path"])
    ds = (ray.data.from_arrow(spec_tbl)
          .repartition(n_tasks)
          .map_batches(parse, batch_format="pyarrow", batch_size=1))
    if not include_quality:
        ds = ds.select_columns(["name", "seq"])
    return ds
