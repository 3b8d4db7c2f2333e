"""Bigram-LM quality scoring: exact backend vs a sequential reference,
cross-corpus OOV/min_count semantics, and the BQF-backed count store
matching the exact path on collision-free fixtures."""

import math

import numpy as np
import pyarrow as pa
import pytest

from bqf_ray.pipelines.lm import (ngram_lm_score, ngram_lm_score_bqf,
                                  score_with_model, train_bigram_counts)


def _docs_table(texts):
    return pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
    })


def _ref_scores(train_texts, score_texts, min_count=1):
    """Sequential reference: Laplace bigram LM with integer micro-nats."""
    big, ctx, uni = {}, {}, set()
    for t in train_texts:
        toks = t.split()
        uni.update(toks)
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    if min_count > 1:
        big = {k: v for k, v in big.items() if v >= min_count}
    V = len(uni)
    out = {}
    for i, t in enumerate(score_texts):
        toks = t.split()
        s = oov = 0
        nb = max(len(toks) - 1, 0)
        for a, b in zip(toks, toks[1:]):
            cb = big.get((a, b), 0)
            if cb == 0:
                oov += 1
            lp = math.log((cb + 1.0) / (ctx.get(a, 0) + V))
            s += math.floor(lp * 1e6 + 0.5)
        avg = (s / 1e6) / nb if nb else 0.0
        out[i] = (len(toks), nb, oov, s, avg)
    return out


def _collect(ds):
    df = ds.to_pandas().set_index("doc_id").sort_index()
    return {i: (r.n_tokens, r.n_bigrams, r.oov_bigrams, r.sum_lp_micro,
                r.avg_logprob) for i, r in df.iterrows()}


TEXTS = ["the cat sat on the mat", "the dog sat on the log",
         "a cat and a dog", "one", "", "the the the the",
         "cat dog cat dog cat"]


def test_self_score_matches_reference(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_docs_table(TEXTS))
    got = _collect(ngram_lm_score(ds))
    want = _ref_scores(TEXTS, TEXTS)
    assert set(got) == set(want)
    for i in got:
        assert got[i][:4] == want[i][:4], (i, got[i], want[i])
        assert got[i][4] == pytest.approx(want[i][4], abs=1e-12)
        assert got[i][2] == 0  # self-scoring, min_count=1 -> no OOV


def test_cross_corpus_oov_and_min_count(ray_session):
    import ray.data
    train = ["the cat sat", "the cat sat", "the dog ran"]
    score = ["the cat sat", "the bird flew", "zz yy"]
    model = train_bigram_counts(ray.data.from_arrow(_docs_table(train)),
                                min_count=2)
    got = _collect(score_with_model(
        ray.data.from_arrow(_docs_table(score)), model))
    want = _ref_scores(train, score, min_count=2)
    for i in got:
        assert got[i][:4] == want[i][:4], (i, got[i], want[i])
    # "the dog" was pruned by min_count=2 and "zz yy" never seen:
    assert got[1][2] > 0 and got[2][2] == 1


def test_bqf_backend_matches_exact(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_docs_table(TEXTS * 3))
    exact = _collect(ngram_lm_score(ds))
    approx = _collect(ngram_lm_score_bqf(ds, q=14, count_size=8,
                                         num_partitions=4))
    assert set(exact) == set(approx)
    for i in exact:
        assert exact[i] == approx[i], (i, exact[i], approx[i])
