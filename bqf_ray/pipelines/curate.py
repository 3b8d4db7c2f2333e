"""End-to-end training-data curation — the canonical 100 TB chain,
composed from the engine's operators:

    documents → language id → quality score → filter
              → exact dedup (content-prefix key, keep min id)
              → near-dup removal (MinHash-LSH banding + distributed
                exact-Jaccard verify; drop the larger id of each pair)
              → survivors (+ optional resumable partitioned sink)

Every stage is the distributed form already oracle-checked on its own;
the composition is deterministic, so the per-stage survivor counts are
themselves SQL-oracle-checkable (driver query ``curation_stats``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def curate_corpus(ds, *, lang_min_score: float = 0.05,
                  min_quality: float = 0.5, prefix_tokens: int = 8,
                  near_threshold: float = 0.8, s: int = 3,
                  cluster_removal: bool = False,
                  out_dir: str | None = None, out_buckets: int = 16):
    """Returns ``(stats, survivors_ds)``: stats is a list of
    (stage, n_docs) tuples — input, lang_quality, exact_dedup, near_dedup
    — and survivors_ds the curated Dataset.  With ``out_dir`` the
    survivors are written through the resumable partitioned sink."""
    from bqf_ray.pipelines.dedup import exact_dedup, minhash_lsh_pairs
    from bqf_ray.pipelines.relational import semi_join
    from bqf_ray.pipelines.text_stats import LangId, QualityScore

    stats: list[tuple[str, int]] = [("input", ds.count())]

    def keep_scored(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.and_(
            pc.not_equal(batch.column("pred_lang"), "und"),
            pc.greater_equal(batch.column("quality"), min_quality))
        return batch.filter(keep).select(["doc_id", "text"])

    filtered = (ds.map_batches(LangId, batch_format="pyarrow",
                               concurrency=2, num_cpus=0.5)
                .map_batches(QualityScore, batch_format="pyarrow",
                             concurrency=2, num_cpus=0.5)
                .map_batches(keep_scored, batch_format="pyarrow"))
    # the chain re-reads this frontier three times (dedup, pairs, output)
    filtered = filtered.materialize()
    stats.append(("lang_quality", filtered.count()))

    deduped = exact_dedup(filtered, prefix_tokens=prefix_tokens).materialize()
    stats.append(("exact_dedup", deduped.count()))

    pairs = minhash_lsh_pairs(deduped, threshold=near_threshold, s=s)
    if cluster_removal:
        # transitive policy: connected components of the pair graph,
        # keep the min-id doc per component (Lee et al. 2022 shape)
        from bqf_ray.pipelines.graph import near_dup_removal
        survivors = near_dup_removal(
            deduped, pairs.select_columns(["doc_a", "doc_b"]))
    else:
        # pairwise policy: drop the LARGER id of every verified
        # near-dup pair (doc_b > doc_a by construction) — a one-pass
        # anti semi-join; keeps a doc whose only matches are larger ids
        # even when it is transitively connected to a smaller one
        drops = pairs.select_columns(["doc_b"])
        survivors = semi_join(deduped, drops, "doc_id", "doc_b",
                              num_buckets=16, anti=True)
    if out_dir is not None:
        from bqf_ray.state.output import resumable_write_parquet
        survivors = survivors.materialize()
        resumable_write_parquet(survivors, out_dir, "doc_id",
                                num_buckets=out_buckets)
    else:
        survivors = survivors.materialize()
    stats.append(("near_dedup", survivors.count()))
    return stats, survivors
