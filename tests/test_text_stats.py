"""Text normalization (CCNet-style canonical form)."""
import numpy as np
import pyarrow as pa




def test_normalize_text_golden(ray_session):
    import ray

    from bqf_ray.pipelines.text_stats import normalize_text
    cases = [
        ("Hello, World!  It's 2024.", "hello world its 0000"),
        ("  A--B  \t c_d\n", "ab c_d"),
        ("", ""),
        ("...", ""),
        ("Price: $19.99 (sale)", "price 0000 sale"),
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(cases), dtype=np.int64)),
        "text": pa.array([c[0] for c in cases])}))
    got = normalize_text(ds).to_pandas().sort_values("doc_id")
    assert got["text_norm"].tolist() == [c[1] for c in cases]


def test_dedup_lines_within(ray_session):
    import ray
    from bqf_ray.pipelines.dedup import dedup_lines_within
    texts = ["a\nb\na\nc\nb", "x\nx\nx", "", "only", None]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = (dedup_lines_within(ray.data.from_arrow(t)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["text"].tolist() == ["a\nb\nc", "x", "", "only", ""]
    assert got["n_removed"].tolist() == [2, 2, 0, 0, 0]
    assert got["n_lines"].tolist() == [5, 3, 1, 1, 0]
