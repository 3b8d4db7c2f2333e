"""Sequence packing: budget invariants, conservation, determinism."""

import numpy as np
import pyarrow as pa
import pytest

from bqf_ray.pipelines.pack import pack_sequences
from bqf_ray.sources.pages import generate_pages

BUDGET = 64


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray
    t = generate_pages(400, seed=11)
    t = t.append_column("doc_id", pa.array(np.arange(len(t), dtype=np.int64)))
    return t, ray.data.from_arrow(t).repartition(4)


def _tok(t):
    return {d: len(x.split()) for d, x in
            zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())}


def test_greedy_budget_and_conservation(corpus):
    t, ds = corpus
    ntok = _tok(t)
    out = pack_sequences(ds, budget=BUDGET, strategy="greedy").take_all()
    assert sum(r["n_docs"] for r in out) == len(t)
    assert sum(r["n_tokens"] for r in out) == sum(ntok.values())
    for r in out:
        assert r["n_tokens"] <= BUDGET or r["n_docs"] == 1, r


def test_greedy_is_actually_greedy_per_group(corpus):
    t, ds = corpus
    ntok = _tok(t)
    langs = dict(zip(t.column("doc_id").to_pylist(),
                     t.column("lang").to_pylist()))
    out = pack_sequences(ds, budget=BUDGET, strategy="greedy").take_all()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, packs in by_lang.items():
        docs = sorted(d for d, l in langs.items() if l == lang)
        packs.sort(key=lambda r: r["pack_seq"])
        # replay the greedy rule
        i, want = 0, []
        while i < len(docs):
            tok = ntok[docs[i]]
            j = i + 1
            while j < len(docs) and tok + ntok[docs[j]] <= BUDGET:
                tok += ntok[docs[j]]
                j += 1
            want.append((docs[i], j - i, tok))
            i = j
        got = [(r["first_doc"], r["n_docs"], r["n_tokens"]) for r in packs]
        assert got == want


def test_chunk_matches_window_rule(corpus):
    t, ds = corpus
    ntok = _tok(t)
    langs = dict(zip(t.column("doc_id").to_pylist(),
                     t.column("lang").to_pylist()))
    out = pack_sequences(ds, budget=BUDGET, strategy="chunk").take_all()
    assert sum(r["n_docs"] for r in out) == len(t)
    for lang in set(langs.values()):
        docs = sorted(d for d, l in langs.items() if l == lang)
        cum = 0
        want = {}
        for d in docs:
            want.setdefault(cum // BUDGET, []).append(d)
            cum += ntok[d]
        got = {r["pack_seq"]: r for r in out if r["lang"] == lang}
        assert set(got) == set(want)
        for p, dd in want.items():
            assert got[p]["n_docs"] == len(dd)
            assert got[p]["first_doc"] == dd[0]


def test_sharded_packs_never_span_shards(corpus):
    t, ds = corpus
    out = pack_sequences(ds, budget=BUDGET, strategy="greedy",
                         shard_size=100).take_all()
    assert sum(r["n_docs"] for r in out) == len(t)
    for r in out:
        assert r["first_doc"] // 100 == r["shard"]
        assert r["n_tokens"] <= BUDGET or r["n_docs"] == 1


def _ref_chunks(texts, chunk, overlap):
    stride = chunk - overlap
    out = []
    for i, t in enumerate(texts):
        toks = t.split()
        n = len(toks)
        if n == 0:
            continue
        k = 1 + int(np.ceil(max(n - chunk, 0) / stride))
        for j in range(k):
            ct = toks[j * stride: j * stride + chunk]
            out.append((i, j, " ".join(ct), len(ct)))
    return sorted(out)


@pytest.mark.parametrize("chunk,overlap", [(8, 0), (8, 3), (5, 4)])
def test_chunk_documents_matches_reference(ray_session, chunk, overlap):
    import ray

    from bqf_ray.pipelines.pack import chunk_documents
    rng = np.random.RandomState(7)
    texts = [" ".join(f"t{rng.randint(50)}" for _ in range(rng.randint(0, 30)))
             for _ in range(200)]
    texts += ["", "one", " ".join(["x"] * 8)]   # empty / tiny / exact-size
    ids = np.arange(len(texts), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids), "text": pa.array(texts)})).repartition(4)
    got = sorted(
        (int(r["doc_id"]), int(r["chunk_idx"]), r["text"], int(r["n_tokens"]))
        for _, r in chunk_documents(ds, chunk, overlap).to_pandas().iterrows())
    assert got == _ref_chunks(texts, chunk, overlap)


def test_chunk_documents_validates(ray_session):
    import ray

    from bqf_ray.pipelines.pack import chunk_documents
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array([0], pa.int64()),
                                       "text": pa.array(["a b"])}))
    with pytest.raises(ValueError):
        chunk_documents(ds, chunk=4, overlap=4)
