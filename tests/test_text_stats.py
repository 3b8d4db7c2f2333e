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
