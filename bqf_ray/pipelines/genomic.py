"""Genomic tool pipelines — Ray-Data forms of the reference's three CLI
tools (/root/reference/src/main.cpp:12-14):

- :func:`build_from_counted_smers` ≙ ``bqf build``: stream a counted-s-mer
  table ("<smer> <count>" lines or a (smer, count) parquet) into a
  partitioned BqfEc/BqfOom (/root/reference/src/abstract_bqf.cpp:22-52).
- :func:`query_sequences` ≙ ``bqf query``: per-sequence fimpera stats
  against a built index (/root/reference/src/abstract_bqf.cpp:169-248).
- :func:`filter_fastx` ≙ ``bqf filter``: stream reads, emit each canonical
  k-mer on its second occurrence (/root/reference/src/bqf_cf.cpp:45-77) —
  output modes text (ACGT strings) or binary (uint64 codes), as a Dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from bqf_ray.functions.dna import (bfc_hash_64, decode, sequence_kmer_hashes,
                                   sequence_kmers)
from bqf_ray.functions.hashing import bfc_hash_64_inv
from bqf_ray.sketches.base import MergeableSketch
from bqf_ray.sketches.bqf import BqfCf, BqfEc, BqfOom, fimpera_from_abundances
from bqf_ray.stages.sketch_stage import PartitionedSketch, build_partitioned


def _smer_key_fn(smer_col: str, count_col: str | None, s: int):
    def key_fn(batch: pa.Table):
        from bqf_ray.functions.dna import encode_batch
        keys = bfc_hash_64(encode_batch(batch.column(smer_col), s), 2 * s)
        counts = (np.asarray(batch.column(count_col), dtype=np.int64)
                  .astype(np.uint64) if count_col else None)
        return keys, counts

    return key_fn


def build_from_counted_smers(ds, s: int, *, smer_col: str = "smer",
                             count_col: str | None = "count",
                             codec: str = "ec", count_size: int = 5,
                             q: int = 10, num_partitions: int = 8,
                             checkpoint_dir: str | None = None):
    """``bqf build`` over a counted-s-mer Dataset → PartitionedSketch.

    Validation mirrors the reference: smer length must equal ``s``
    (abstract_bqf.cpp:30-38) — enforced per batch."""

    def validate(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        lens = pc.utf8_length(batch.column(smer_col))
        bad = pc.any(pc.not_equal(lens, s)).as_py()
        if bad:
            raise ValueError(f"smer length != s={s} in input")
        return batch

    factory = (lambda: BqfEc(q=q, count_size=count_size, hash_bits=2 * s)) \
        if codec == "ec" else \
        (lambda: BqfOom(q=q, count_size=count_size, hash_bits=2 * s))
    blob_ds = build_partitioned(
        ds.map_batches(validate, batch_format="pyarrow"),
        _smer_key_fn(smer_col, count_col, s), factory,
        num_partitions=num_partitions, sink_dir=checkpoint_dir)
    if checkpoint_dir is not None:
        meta = blob_ds.take_all()        # blobs were written in-task
        from bqf_ray.state.checkpoint import SketchCheckpoint
        config = {"tool": "build", "s": s, "codec": codec,
                  "count_size": count_size, "q": q,
                  "num_partitions": num_partitions}
        ckpt = SketchCheckpoint(checkpoint_dir, config)
        for r in meta:
            ckpt.manifest.partitions[str(int(r["part"]))] = {
                "n_keys": int(r["n_keys"]), "bytes": int(r["bytes"]),
                "sha256": r.get("sha256"), "fragments": [], "ts": 0.0,
            }
        ckpt.write_manifest()
        return PartitionedSketch({
            int(r["part"]): SketchCheckpoint.load_partition(
                checkpoint_dir, int(r["part"]),
                ckpt.manifest.partitions[str(int(r["part"]))]["sha256"])
            for r in meta}, num_partitions)
    return PartitionedSketch.from_dataset(blob_ds, num_partitions)


def query_sequences(ds, psketch: PartitionedSketch, *, k: int, s: int,
                    seq_col: str = "seq", id_col: str = "query_id",
                    concurrency: int = 2):
    """``bqf query``: per-sequence {minimum, maximum, average,
    presence_ratio} via fimpera (k-mer = min over its z+1 = k−s+1
    constituent s-mers)."""
    import ray

    z = k - s
    ref = ray.put(psketch)

    class Probe:
        def __init__(self):
            self.sk = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            seqs = batch.column(seq_col).to_pylist()
            abundances = []
            offsets = [0]
            for seq in seqs:
                h = sequence_kmer_hashes(seq, s)      # s-mers, canonical
                ab = self.sk.query_batch(h) if len(h) else \
                    np.empty(0, dtype=np.uint64)
                abundances.append(ab)
                offsets.append(offsets[-1] + len(ab))
            ab = np.concatenate(abundances) if abundances else \
                np.empty(0, dtype=np.uint64)
            mins, maxs, avgs, ratios = fimpera_from_abundances(
                ab, np.array(offsets), z)
            return pa.table({
                id_col: batch.column(id_col),
                "minimum": pa.array(mins.astype(np.int64)),
                "maximum": pa.array(maxs.astype(np.int64)),
                "average": pa.array(avgs),
                "presence_ratio": pa.array(ratios),
            })

    return ds.map_batches(Probe, batch_format="pyarrow", batch_size=512,
                          concurrency=concurrency)


def filter_fastx(ds, k: int, *, seq_col: str = "seq", mode: str = "text",
                 num_partitions: int = 8, q: int = 12):
    """``bqf filter``: canonical k-mers occurring ≥ 2 times across all
    reads (the first-repeat stream's final content,
    /root/reference/src/bqf_cf.cpp:56-77).

    Output modes (reference bqf_cf.hpp:6-8):
    - ``text``   → ACGT strings (batch: partitioned BqfCf build + extract)
    - ``binary`` → uint64 2-bit codes (same plan)
    - ``stream`` → k-mers are emitted AS their second occurrence arrives:
      reads stream through ``map_batches`` tasks that route key slices to
      per-shard BqfCf actors; each shard reports the keys that crossed
      count 2 in that slice, in arrival order.  Emission order is
      per-shard-stream (the reference's single-threaded global order is
      not preserved across parallel tasks — documented deviation); the
      emitted SET is identical to the batch modes.  Fault tolerance:
      shard-actor state is in-memory only, so an actor death mid-stream
      loses counts — the batch modes (stateless tasks + one shuffle) are
      the fault-tolerant path; stream mode trades that for emission
      latency, like the reference's stdout stream."""

    def key_fn(batch: pa.Table):
        seqs = batch.column(seq_col).to_pylist()
        hs = [sequence_kmer_hashes(seq, k) for seq in seqs]
        keys = np.concatenate(hs) if hs else np.empty(0, dtype=np.uint64)
        return keys, None

    def codes_table(keys: np.ndarray) -> pa.Table:
        # invertible hash → recover the k-mer losslessly (zero-FP property)
        codes = bfc_hash_64_inv(keys, 2 * k)
        if mode == "binary":
            return pa.table({"kmer_code": pa.array(codes.astype(np.int64))})
        return pa.table({"kmer": pa.array([decode(int(c), k) for c in codes],
                                          pa.string())})

    if mode == "stream":
        import ray
        from bqf_ray.state.shard_actors import ShardedSketchService
        service = ShardedSketchService(lambda: BqfCf(q=q, hash_bits=2 * k),
                                       num_shards=num_partitions)
        handles = service.shards
        P = service.P

        def stream_filter(batch: pa.Table) -> pa.Table:
            keys, _ = key_fn(batch)
            part = (keys % np.uint64(P)).astype(np.int64)
            futs = []
            for p in range(P):
                m = part == p
                if m.any():
                    futs.append(handles[p].update_report_new.remote(keys[m]))
            news = ray.get(futs)
            out = np.concatenate(news) if news else \
                np.empty(0, dtype=np.uint64)
            return codes_table(out)

        return ds.map_batches(stream_filter, batch_format="pyarrow")

    blob_ds = build_partitioned(ds, key_fn, lambda: BqfCf(q=q, hash_bits=2 * k),
                                num_partitions=num_partitions)

    def extract(batch: pa.Table) -> pa.Table:
        out = []
        for blob in batch.column("blob").to_pylist():
            sk = MergeableSketch.from_bytes(blob)
            out.append(sk.second_occurrence_keys())
        keys = np.concatenate(out) if out else np.empty(0, dtype=np.uint64)
        return codes_table(keys)

    return blob_ds.map_batches(extract, batch_format="pyarrow")
