"""BPE merge training vs a sequential reference implementation."""

import numpy as np
import pyarrow as pa
import pytest

from bqf_ray.pipelines.vocab import bpe_train, word_frequencies


def _ref_bpe(word_counts: dict[str, int], num_merges: int,
             min_pair_count: int = 2):
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + word_counts[w]
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, n in pairs.items() if n == top)
        if top < min_pair_count:
            break
        merges.append((best[0], best[1], top))
        l, r = best
        for w, syms in vocab.items():
            i, new = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    new.append(l + r)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            vocab[w] = new
    return merges


@pytest.mark.parametrize("seed,budget", [(0, 200_000), (1, 200_000),
                                         (0, 0)])  # budget=0 forces the
                                         # distributed merge-loop plan
def test_bpe_matches_reference(ray_session, seed, budget):
    import ray
    rng = np.random.RandomState(seed)
    words = ["low", "lower", "lowest", "new", "newer", "newest", "wide",
             "widely", "widest", "bin", "binary", "bind"]
    texts = [" ".join(rng.choice(words, size=rng.randint(3, 30)))
             for _ in range(200)]
    tbl = pa.table({"doc_id": pa.array(np.arange(200, dtype=np.int64)),
                    "text": pa.array(texts)})
    ds = ray.data.from_arrow(tbl).repartition(4)

    wc: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    want = _ref_bpe(wc, 15)
    got = bpe_train(ds, num_merges=15, driver_vocab_budget=budget)
    assert got == want
    assert len(got) >= 5          # the fixture genuinely produces merges


def test_word_frequencies_exact(ray_session):
    import ray
    tbl = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(["a b a", "b  c"])})
    out = {r["word"]: r["count"] for r in
           word_frequencies(ray.data.from_arrow(tbl)).take_all()}
    assert out == {"a": 2, "b": 2, "c": 1}


def test_bpe_oracle_sql_matches_adversarial_chains(ray_session):
    """The unrolled-CTE SQL oracle must reproduce bpe_train bit-for-bit
    on words with long same-char runs — the case where a naive
    space-separated replace diverges from the greedy skip-after-merge
    scan (match parity across back-to-back occurrences)."""
    import duckdb
    import pandas as pd
    import ray

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ray_entry", "/root/repo/__ray_entry__.py")
    em = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(em)

    from bqf_ray.pipelines.vocab import bpe_merges_table

    rng = np.random.RandomState(3)
    words = ["aaaaa", "aaaa", "aaaaaaa", "ababab", "aabb", "abab",
             "xxyyxxyy", "zzzzzz", "a", "ab", "ba", "abcabc"]
    texts = [" ".join(rng.choice(words, 30)) for _ in range(40)]
    tbl = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                    "text": pa.array(texts)})
    got = (bpe_merges_table(ray.data.from_arrow(tbl), num_merges=6)
           .to_pandas().sort_values("rank").reset_index(drop=True))

    con = duckdb.connect()
    con.register("documents", tbl)
    toks = ("SELECT doc_id, unnest(string_split_regex(text, '\\s+')) "
            "AS token FROM documents")
    want = (con.execute(em._bpe_oracle_sql(toks, rounds=6)).fetchdf()
            .sort_values("rank").reset_index(drop=True))
    assert len(got) == len(want)
    for c in ["rank", "left", "right", "pair_count"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
