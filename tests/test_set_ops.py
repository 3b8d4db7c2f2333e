"""token_set_overlap — exact + KMV set-operation cardinalities."""
import numpy as np
import pyarrow as pa


def test_token_set_overlap_partial(ray_session):
    import ray
    from bqf_ray.pipelines.set_ops import token_set_overlap
    rng = np.random.default_rng(3)
    # A: words 0..599, B: words 400..999 -> inter 200, union 1000
    def mk(lo, hi, n_docs):
        words = [f"w{i}" for i in range(lo, hi)]
        docs = [" ".join(rng.choice(words, 40)) for _ in range(n_docs)]
        # ensure every word appears at least once
        docs.append(" ".join(words))
        return ray.data.from_items([{"text": t} for t in docs])
    a = mk(0, 600, 50)
    b = mk(400, 1000, 50)
    out = token_set_overlap(a, b, k=256).iloc[0]
    assert out["n_a"] == 600 and out["n_b"] == 600
    assert out["n_inter"] == 200 and out["n_union"] == 1000
    # k=256 < 1000 distinct: the estimators actually estimate here
    assert out["union_ok"] and out["inter_ok"]


def test_token_set_overlap_disjoint_and_empty(ray_session):
    import ray
    from bqf_ray.pipelines.set_ops import token_set_overlap
    a = ray.data.from_items([{"text": "x y z"}])
    b = ray.data.from_items([{"text": "p q"}])
    out = token_set_overlap(a, b, k=64).iloc[0]
    assert (out["n_a"], out["n_b"], out["n_inter"], out["n_union"]) == \
        (3, 2, 0, 5)
    assert out["union_ok"] and out["inter_ok"]
    empty = ray.data.from_items([{"text": ""}])
    out2 = token_set_overlap(empty, b, k=64).iloc[0]
    assert (out2["n_a"], out2["n_inter"], out2["n_union"]) == (0, 0, 2)
