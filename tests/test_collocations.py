"""postings (inverted index) and collocations (PMI lift) vs sequential
references, including hash-collision safety and plan parity."""

import numpy as np
import pyarrow as pa
import pytest

from bqf_ray.pipelines.text_stats import collocations, postings


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import random

    import ray
    random.seed(5)
    vocab = [f"w{i}" for i in range(40)]
    texts, ids = [], []
    for d in range(300):
        n = random.randint(0, 30)
        texts.append(" ".join(random.choices(vocab, k=n)))
        ids.append(d)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts)})
    return ray.data.from_arrow(t).repartition(8), texts


def test_postings_exact(docs_ds):
    ds, texts = docs_ds
    got = postings(ds, "text", "doc_id").to_pandas()
    ref = {}
    for d, txt in enumerate(texts):
        for tok in set(txt.split()):
            ref.setdefault(tok, []).append(d)
    assert len(got) == len(ref)
    for _, row in got.iterrows():
        docs = sorted(ref[row["token"]])
        assert row["df"] == len(docs)
        assert row["postings"] == ",".join(str(x) for x in docs)


def test_collocations_exact_both_plans(docs_ds):
    ds, texts = docs_ds
    from collections import Counter
    uni, bg = Counter(), Counter()
    for txt in texts:
        toks = txt.split()
        uni.update(toks)
        bg.update(zip(toks, toks[1:]))
    N = sum(uni.values())
    ref = sorted(
        ((float(c * N) / (uni[a] * uni[b]), a, b, c, uni[a], uni[b])
         for (a, b), c in bg.items() if c >= 3),
        key=lambda r: (-r[0], r[1], r[2]))[:20]

    for budget in (2_000_000, 0):       # broadcast plan / bucketed plan
        got = (collocations(ds, min_count=3, top=20,
                            broadcast_budget=budget).to_pandas()
               .sort_values(["lift", "token_a", "token_b"],
                            ascending=[False, True, True])
               .reset_index(drop=True))
        assert len(got) == len(ref)
        for i, (lift, a, b, c, ca, cb) in enumerate(ref):
            row = got.iloc[i]
            assert (row["token_a"], row["token_b"]) == (a, b)
            assert (row["c_ab"], row["c_a"], row["c_b"]) == (c, ca, cb)
            assert row["lift"] == lift


def test_postings_collision_safety(ray_session):
    """Two different tokens forced into the same bucket (num_buckets=1)
    must not merge posting lists."""
    import ray
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["aa bb", "bb cc"])})
    got = (postings(ray.data.from_arrow(t), "text", "doc_id",
                    num_buckets=1).to_pandas()
           .set_index("token")["postings"].to_dict())
    assert got == {"aa": "1", "bb": "1,2", "cc": "2"}
