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


# ---------------------------------------------------------------------------
# BPE ENCODE (apply a fixed merge table)

from bqf_ray.pipelines.vocab import (BpeEncoder, bpe_encode,
                                     bpe_encode_token_counts, encode_words)


def _ref_encode(word: str, merges) -> list[str]:
    """Rank-ordered reference: one greedy left-to-right pass per merge."""
    syms = list(word)
    for l, r in merges:
        i, new = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                new.append(l + r)
                i += 2
            else:
                new.append(syms[i])
                i += 1
        syms = new
    return syms


def _classic_encode(word: str, ranks: dict) -> list[str]:
    """Lowest-rank-first iterative encoder (the huggingface/GPT-2 shape):
    repeatedly merge the leftmost occurrence of the lowest-rank pair."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank, best_i = rk, i
        if best_i is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def _split_by_offsets(flat, offs):
    return [flat[offs[i]:offs[i + 1]].tolist() for i in range(len(offs) - 1)]


def test_encode_words_matches_rank_order_reference():
    merges = [("a", "a"), ("aa", "a"), ("a", "b"), ("ab", "ab"),
              ("b", "b"), ("aa", "aa"), ("c", "ab"), ("bb", "c")]
    words = ["aaaaa", "aaaa", "aaaaaaa", "ababab", "aabb", "abab",
             "abcabc", "bbbb", "cabab", "", "a", "zzz", "aabbaabb",
             "bbcab", "aaabab"]
    flat, offs = encode_words(words, merges)
    got = _split_by_offsets(flat, offs)
    want = [_ref_encode(w, merges) for w in words]
    assert got == want


def test_encode_words_matches_classic_on_well_ordered_tables():
    """On well-ordered tables (merge inputs produced by earlier merges,
    no token producible two ways) rank-order one-pass == classic
    lowest-rank-first."""
    rng = np.random.RandomState(7)
    for trial in range(20):
        alphabet = ["a", "b", "c", "d"]
        toks = list(alphabet)
        produced = set(alphabet)
        merges = []
        while len(merges) < 12:
            l = toks[rng.randint(len(toks))]
            r = toks[rng.randint(len(toks))]
            if l + r in produced:
                continue
            produced.add(l + r)
            toks.append(l + r)
            merges.append((l, r))
        ranks = {m: i for i, m in enumerate(merges)}
        words = ["".join(rng.choice(alphabet, rng.randint(1, 15)))
                 for _ in range(60)]
        flat, offs = encode_words(words, merges)
        got = _split_by_offsets(flat, offs)
        want = [_classic_encode(w, ranks) for w in words]
        assert got == want, (trial, words)


def test_encode_words_empty_and_unknown():
    flat, offs = encode_words([], [("a", "b")])
    assert len(flat) == 0 and offs.tolist() == [0]
    flat, offs = encode_words(["xyz"], [("q", "q")])
    assert _split_by_offsets(flat, offs) == [["x", "y", "z"]]


def test_bpe_encode_token_counts_exact(ray_session):
    import ray
    rng = np.random.RandomState(11)
    words = ["low", "lower", "lowest", "new", "newest", "aaaa", "abab"]
    texts = [" ".join(rng.choice(words, rng.randint(1, 20)))
             for _ in range(150)]
    tbl = pa.table({"doc_id": pa.array(range(150), pa.int64()),
                    "text": pa.array(texts)})
    ds = ray.data.from_arrow(tbl).repartition(4)
    merges = [(l, r) for l, r, _ in _ref_bpe(
        _word_counts(texts), num_merges=10)]

    want: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            for tok in _ref_encode(w, merges):
                want[tok] = want.get(tok, 0) + 1
    got = {r["token"]: r["n"]
           for r in bpe_encode_token_counts(ds, merges).take_all()}
    assert got == want


def _word_counts(texts):
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def test_bpe_encoder_per_document(ray_session):
    import ray
    rng = np.random.RandomState(13)
    words = ["aaa", "aaaa", "abab", "banana", "bandana", "low", "lowest"]
    texts = [" ".join(rng.choice(words, rng.randint(0, 12)))
             for _ in range(120)]
    texts[5] = ""                      # empty doc
    texts[6] = "   "                   # whitespace-only doc
    tbl = pa.table({"doc_id": pa.array(range(120), pa.int64()),
                    "text": pa.array(texts)})
    merges = [(l, r) for l, r, _ in _ref_bpe(_word_counts(texts), 8)]
    out = (bpe_encode(ray.data.from_arrow(tbl).repartition(3), merges,
                      batch_size=16)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i, t in enumerate(texts):
        want = [tok for w in t.split() for tok in _ref_encode(w, merges)]
        assert list(out["tokens"][i]) == want, i


def test_bpe_encoder_cache_reuse():
    merges = [("a", "a"), ("aa", "aa")]
    enc = BpeEncoder(merges)
    b1 = pa.table({"doc_id": pa.array([0], pa.int64()),
                   "text": pa.array(["aaaa aaaa"])})
    out1 = enc(b1)
    assert out1.column("tokens").to_pylist() == [["aaaa", "aaaa"]]
    assert "aaaa" in enc.cache
    # second batch hits the memo (mutate cache to prove it is read)
    enc.cache["aaaa"] = np.array(["HIT"], dtype=object)
    out2 = enc(b1)
    assert out2.column("tokens").to_pylist() == [["HIT", "HIT"]]


def test_bpe_encode_oracle_sql(ray_session):
    """The encode-counts oracle (training CTE + one more replace round +
    unnest) must match bpe_encode_token_counts bit-for-bit on the same
    adversarial same-char-run corpus as the training oracle test."""
    import duckdb
    import ray

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ray_entry", "/root/repo/__ray_entry__.py")
    em = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(em)

    from bqf_ray.pipelines.vocab import bpe_merges_table

    rng = np.random.RandomState(5)
    words = ["aaaaa", "aaaa", "ababab", "aabb", "xxyyxxyy", "zzzzzz",
             "a", "ab", "ba", "abcabc", "banana"]
    texts = [" ".join(rng.choice(words, 25)) for _ in range(40)]
    tbl = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                    "text": pa.array(texts)})
    ds = ray.data.from_arrow(tbl)
    mt = (bpe_merges_table(ds, num_merges=6).to_pandas()
          .sort_values("rank"))
    merges = list(zip(mt["left"], mt["right"]))
    got = (bpe_encode_token_counts(ds, merges).to_pandas()
           .sort_values("token").reset_index(drop=True))

    con = duckdb.connect()
    con.register("documents", tbl)
    toks = ("SELECT doc_id, unnest(string_split_regex(text, '\\s+')) "
            "AS token FROM documents")
    want = (con.execute(em._bpe_encode_oracle_sql(toks, rounds=6))
            .fetchdf().sort_values("token").reset_index(drop=True))
    assert len(got) == len(want)
    assert (got["token"].to_numpy() == want["token"].to_numpy()).all()
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()


def test_bpe_encoder_cache_eviction():
    """Eviction must re-encode the WHOLE batch (review finding: clearing
    the memo then gathering previously-cached words KeyErrored)."""
    merges = [("a", "a")]
    enc = BpeEncoder(merges, max_cache=3)
    b1 = pa.table({"doc_id": pa.array([0], pa.int64()),
                   "text": pa.array(["aa bb cc"])})
    b2 = pa.table({"doc_id": pa.array([1], pa.int64()),
                   "text": pa.array(["aa dd ee"])})
    assert enc(b1).column("tokens").to_pylist() == \
        [["aa", "b", "b", "c", "c"]]
    assert enc(b2).column("tokens").to_pylist() == \
        [["aa", "d", "d", "e", "e"]]
    assert len(enc.cache) <= 3
