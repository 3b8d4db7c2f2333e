"""Incremental exact dedup against a persisted content-key index."""
import numpy as np
import pyarrow as pa
import pytest

from bqf_ray.pipelines.build_index import build_bqf_index
from bqf_ray.pipelines.dedup import dedup_incremental


def _ds(ids, texts):
    import ray
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
        "text": pa.array(list(texts))})).repartition(3)


def test_incremental_dedup_crawl_loop(ray_session, tmp_path):
    ck = str(tmp_path / "seen")
    corpus_a = [f"seed document {i} body" for i in range(40)]
    build_bqf_index(_ds(range(40), corpus_a), key_kind="content_prefix",
                    num_partitions=8, checkpoint_dir=ck)

    # shard B: 10 docs duplicating A, 5 intra-shard dup pairs, 10 fresh
    b_texts = (corpus_a[:10]
               + [f"fresh b {i}" for i in range(5)] * 2
               + [f"unique b {i}" for i in range(10)])
    b_ids = np.arange(100, 100 + len(b_texts))
    got = dedup_incremental(_ds(b_ids, b_texts), ck).to_pandas()
    # survivors: 5 intra-dup representatives (min ids 110..114) + 10 unique
    assert len(got) == 15
    assert set(got["text"]) == ({f"fresh b {i}" for i in range(5)}
                                | {f"unique b {i}" for i in range(10)})
    assert sorted(got[got["text"].str.startswith("fresh")]["doc_id"]) == \
        list(range(110, 115))

    # shard C: duplicates of B's survivors must now be dropped too
    c_texts = ["fresh b 0", "unique b 3", "brand new c"]
    got_c = dedup_incremental(_ds([200, 201, 202], c_texts), ck).to_pandas()
    assert got_c["text"].tolist() == ["brand new c"]


def test_incremental_dedup_no_update(ray_session, tmp_path):
    ck = str(tmp_path / "seen")
    build_bqf_index(_ds([0], ["base doc"]), key_kind="content_prefix",
                    num_partitions=4, checkpoint_dir=ck)
    s1 = dedup_incremental(_ds([1], ["novel one"]), ck,
                           update_index=False).to_pandas()
    assert len(s1) == 1
    # index unchanged → the same doc survives again
    s2 = dedup_incremental(_ds([2], ["novel one"]), ck,
                           update_index=False).to_pandas()
    assert len(s2) == 1


def test_incremental_dedup_rejects_shingle_index(ray_session, tmp_path):
    ck = str(tmp_path / "shingle")
    build_bqf_index(_ds([0], ["a b c d e"]), s=2, num_partitions=4,
                    checkpoint_dir=ck)
    with pytest.raises(ValueError):
        dedup_incremental(_ds([1], ["x"]), ck)


def test_soft_dedup_weights_and_keep_best(ray_session):
    """Weights: 1/cluster_size, singletons 1.0; keep-best survives the
    highest-quality member per cluster (tie → min id)."""
    import pyarrow as pa
    import ray

    from bqf_ray.pipelines.dedup import (near_dup_keep_best,
                                         soft_dedup_weights)
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "chars": pa.array([10, 50, 50, 7, 9, 3], pa.int64())}))
    # clusters: {1,2,3} and {4,5}; 6 is a singleton
    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([1, 2, 4], pa.int64()),
        "doc_b": pa.array([2, 3, 5], pa.int64())}))
    w = (soft_dedup_weights(docs, pairs).to_pandas()
         .set_index("doc_id").sort_index())
    assert w.loc[1, "cluster_n"] == 3 and w.loc[1, "weight"] == 1 / 3
    assert w.loc[4, "cluster_n"] == 2 and w.loc[5, "weight"] == 0.5
    assert w.loc[6, "cluster_n"] == 1 and w.loc[6, "weight"] == 1.0
    assert (w.loc[[1, 2, 3], "cluster_id"] == 1).all()

    kept = (near_dup_keep_best(docs, pairs, "chars").to_pandas()
            .sort_values("doc_id"))
    # cluster {1,2,3}: 2 and 3 tie on chars=50 → min id 2 survives;
    # cluster {4,5}: 5 (9 chars) beats 4; singleton 6 survives
    assert kept["doc_id"].tolist() == [2, 5, 6]
