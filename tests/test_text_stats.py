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


def test_grouped_top_terms_matches_reference(ray_session):
    """Exact per-key top-k with tie-breaks, invariant to partitioning
    and bucket count."""
    import ray
    import pandas as pd
    from bqf_ray.pipelines.text_stats import grouped_top_terms

    rng = np.random.RandomState(4)
    words = ["apple", "pear", "fig", "plum", "kiwi", "apple pie", "zz"]
    rows = []
    for i in range(300):
        src = f"site{i % 4}"
        rows.append((src, " ".join(rng.choice(
            [w.split()[0] for w in words], rng.randint(0, 20)))))
    tbl = pa.table({"source": pa.array([r[0] for r in rows]),
                    "text": pa.array([r[1] for r in rows])})

    ref = {}
    for src, text in rows:
        for t in text.split():
            ref[(src, t)] = ref.get((src, t), 0) + 1
    refdf = pd.DataFrame([(s, t, c) for (s, t), c in ref.items()],
                         columns=["source", "token", "cnt"])
    refdf["rank"] = (refdf.sort_values(["cnt", "token"],
                                       ascending=[False, True])
                     .groupby("source").cumcount() + 1)
    want = (refdf[refdf["rank"] <= 3]
            .sort_values(["source", "rank"]).reset_index(drop=True))

    for parts, nb in [(1, 4), (8, 32)]:
        ds = ray.data.from_arrow(tbl).repartition(parts)
        got = (grouped_top_terms(ds, key_col="source", k=3,
                                 num_buckets=nb).to_pandas()
               .sort_values(["source", "rank"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["source", "token", "cnt", "rank"]],
            want[["source", "token", "cnt", "rank"]],
            check_dtype=False)


def test_grouped_top_terms_separator_and_null_keys(ray_session):
    """Keys containing the internal separator byte must not corrupt
    results (review finding: joined-pair splitting truncated such keys),
    and null-key rows are excluded."""
    import ray
    from bqf_ray.pipelines.text_stats import grouped_top_terms

    tbl = pa.table({"source": pa.array(["d\x1fw", "d\x1fw", "d", None]),
                    "text": pa.array(["x x y", "x", "w w w", "z z"])})
    got = (grouped_top_terms(ray.data.from_arrow(tbl), key_col="source",
                             k=2, num_buckets=4).to_pandas()
           .sort_values(["source", "rank"]).reset_index(drop=True))
    rows = list(map(tuple, got[["source", "token", "cnt", "rank"]].values))
    assert rows == [("d", "w", 3, 1),
                    ("d\x1fw", "x", 3, 1), ("d\x1fw", "y", 1, 2)]


def test_grouped_distinct_hll_separator_and_null_keys(ray_session):
    import ray
    from bqf_ray.pipelines.aggregates import grouped_distinct_hll

    tbl = pa.table({"lang": pa.array(["a\x1fb", "a\x1fb", None]),
                    "text": pa.array(["x y z", "x q", "dropme"])})
    out = grouped_distinct_hll(ray.data.from_arrow(tbl), key_col="lang")
    assert list(out["lang"]) == ["a\x1fb"]
    assert list(out["n_distinct_exact"]) == [4]
    assert bool(out["within_bound"][0])


def test_bm25_components_reference(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from bqf_ray.pipelines.text_stats import bm25_components
    docs = ["a b a c", "b b d", "", "a a a a", "zz"]
    tbl = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                    "text": pa.array(docs, pa.string())})
    got = bm25_components(ray.data.from_arrow(tbl).repartition(3),
                          ["a", "b", "missing"]).to_pandas() \
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    # matched rows: (0,a,2) (0,b,1) (1,b,2) (3,a,4); dl: 4,3,0,4,1
    assert [tuple(r) for r in got[["doc_id", "term", "tf", "dl"]]
            .to_numpy()] == [(0, "a", 2, 4), (0, "b", 1, 4),
                             (1, "b", 2, 3), (3, "a", 4, 4)]
    assert got["n_docs"].unique().tolist() == [5]
    assert got["sum_dl"].unique().tolist() == [12]
    df = dict(zip(got["term"], got["df"]))
    assert df == {"a": 2, "b": 2}


def test_docs_with_all_terms(ray_session):
    import pyarrow as pa
    import ray

    from bqf_ray.pipelines.text_stats import docs_with_all_terms
    docs = ["a b c", "a a b", "c", "b c a d", ""]
    tbl = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                    "text": pa.array(docs, pa.string())})
    got = docs_with_all_terms(ray.data.from_arrow(tbl).repartition(3),
                              ["a", "b", "c"]).to_pandas()
    assert sorted(got["doc_id"]) == [0, 3]
    assert set(got["n_terms_hit"]) == {3}


def test_cap_per_key_trailing_nul_and_none_keys(ray_session):
    """Keys differing only in a trailing NUL, a null key, and the
    LITERAL string "None" are four distinct capping groups (the
    astype("U") regression merged them)."""
    import ray
    import pyarrow as pa
    from bqf_ray.pipelines.text_stats import cap_per_key
    keys = ["a", "a", "a\x00", "a\x00", None, None, "None", "None"]
    tbl = pa.table({"source": pa.array(keys, pa.string()),
                    "doc_id": pa.array(range(8), pa.int64())})
    out = cap_per_key(ray.data.from_arrow(tbl), "source", "doc_id",
                      max_rows=1).to_pandas()
    # one survivor per distinct key -> 4 rows, lowest id each
    assert sorted(out["doc_id"]) == [0, 2, 4, 6]


def test_distinctive_terms_trailing_nul_token_order(ray_session):
    """Token tie-break must order by full byte content: 'b' < 'b\\x00'
    (astype("U") stripped the NUL, making them compare equal)."""
    import ray
    import pyarrow as pa
    from bqf_ray.pipelines.text_stats import distinctive_terms
    # one doc, two tokens equal on (tf, df) so the token string is the
    # deciding tie-break for top=1
    tbl = pa.table({"doc_id": pa.array([1], pa.int64()),
                    "text": pa.array(["b\x00 b"], pa.string())})
    out = distinctive_terms(ray.data.from_arrow(tbl),
                            top=1).to_pandas()
    assert len(out) == 1 and out.loc[0, "token"] == "b"


# ---------------------------------------------------------------------------
# phrase_search
# ---------------------------------------------------------------------------

def test_phrase_search_brute(ray_session):
    import re

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from bqf_ray.pipelines.text_stats import phrase_search
    rng = np.random.default_rng(4)
    vocab = ["a", "b", "c", "dd"]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 30)))
             for _ in range(300)]
    texts += ["", "   ", "a  b\tc", "b c b c b c"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    phrase = ["b", "c"]
    exp = []
    for did, t in zip(df["doc_id"], df["text"]):
        toks = t.split()
        hits = [i + 1 for i in range(len(toks) - 1)
                if toks[i:i + 2] == phrase]
        if hits:
            exp.append((did, len(hits), hits[0]))
    exp = pd.DataFrame(exp, columns=["doc_id", "n_matches", "first_pos"])
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(7)
    got = (phrase_search(ds, phrase).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, exp.sort_values("doc_id").reset_index(drop=True),
        check_dtype=False)


def test_phrase_search_overlaps_and_single_token(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray

    from bqf_ray.pipelines.text_stats import phrase_search
    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["a a a a", "x a"]})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    got = phrase_search(ds, ["a", "a"]).to_pandas().set_index("doc_id")
    assert got.loc[1, "n_matches"] == 3 and got.loc[1, "first_pos"] == 1
    assert 2 not in got.index
    got1 = phrase_search(ds, ["a"]).to_pandas().set_index("doc_id")
    assert got1.loc[1, "n_matches"] == 4
    assert got1.loc[2, "first_pos"] == 2


def test_phrase_search_validation():
    import pytest

    from bqf_ray.pipelines.text_stats import phrase_search
    with pytest.raises(ValueError, match="phrase"):
        phrase_search(None, [])
    with pytest.raises(ValueError, match="phrase"):
        phrase_search(None, ["ok", "two words"])


def test_linear_text_scores(ray_session):
    """Hashed-BoW linear scorer: margins match a per-doc recomputation
    with the same md5 feature hashing; empty docs drop out."""
    import hashlib

    import ray

    from bqf_ray.pipelines.text_stats import linear_text_scores
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["the quick brown fox", "", "one token"])})
    out = (linear_text_scores(ray.data.from_arrow(docs), dim=512)
           .to_pandas().set_index("doc_id"))
    assert list(out.index) == [1, 3]          # empty doc dropped

    def ref(tokens):
        s = 0
        for t in tokens:
            f = int(hashlib.md5(t.encode()).hexdigest()[:16], 16) % 512
            s += (f * 2654435761) % 2001 - 1000
        return s

    assert out.loc[1, "w_sum"] == ref("the quick brown fox".split())
    assert out.loc[3, "n_tokens"] == 2
    assert out.loc[1, "margin"] == out.loc[1, "w_sum"] / (1000.0 * 4)
    assert bool(out.loc[1, "keep"]) == (out.loc[1, "w_sum"] > 0)
