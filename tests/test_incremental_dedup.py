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
