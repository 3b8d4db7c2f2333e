import numpy as np
import pyarrow as pa

from bqf_ray.functions.hashing import xxhash64, xxhash64_array
from bqf_ray.functions.tokenize import (
    char_ngram_hashes,
    shingle_hashes,
    sliding_window_min,
    token_hashes,
    tokenize_column,
)
from bqf_ray.sources.pages import generate_pages
from bqf_ray.text.extract import extract_text


def test_extract_basic():
    html = (b"<html><head><title>Hi there</title><script>var x = '<p>';</script>"
            b"<style>p{}</style></head><body><!-- c --><p>a &amp; b &#65;"
            b" &#x42;</p>\n<div>two  words</div></body></html>")
    assert extract_text(html) == "Hi there a & b A B two words"


def test_extract_deterministic_and_idempotent_whitespace():
    html = "<p>one\t two\n\nthree</p>".encode()
    assert extract_text(html) == "one two three"
    assert extract_text(html) == extract_text(html)


def test_pages_invariant_and_determinism():
    t1 = generate_pages(200, seed=42)
    t2 = generate_pages(200, seed=42)
    assert t1.equals(t2)
    for html, text in zip(t1["html"].to_pylist(), t1["text"].to_pylist()):
        assert extract_text(html) == text  # byte-identical per url
    # skew engineered in
    langs = t1["lang"].to_pylist()
    assert langs.count("en") / len(langs) > 0.55
    hosts = [u.split("/")[2] for u in t1["url"].to_pylist()]
    assert hosts.count("hot.example.com") / len(hosts) > 0.15


def test_pages_golden_frozen():
    """Freeze the extractor+generator contract: any change to either breaks
    this hash (recompute deliberately if the contract changes)."""
    t = generate_pages(50, seed=7)
    joined = "\x00".join(t["text"].to_pylist()).encode()
    assert xxhash64(joined) == GOLDEN_PAGES_50_SEED7


# frozen value — see test_pages_golden_frozen (recompute deliberately on
# contract change: xxhash64 of '\x00'.join(texts) for generate_pages(50, seed=7))
GOLDEN_PAGES_50_SEED7 = 0xF0BE43359D10DAC3


def test_tokenize_matches_python_split():
    texts = [" a  b c ", "", "x", None, "  ", "one two\tthree\nfour"]
    toks, offs = tokenize_column(pa.array(texts, pa.string()))
    toks = toks.to_pylist()
    exp_docs = [(t or "").split() for t in texts]
    exp_flat = [w for d in exp_docs for w in d]
    assert toks == exp_flat
    lens = list(np.diff(offs))
    assert lens == [len(d) for d in exp_docs]


def test_token_hashes_match_scalar():
    texts = ["hello world", "hello"]
    h, offs = token_hashes(pa.array(texts))
    assert list(offs) == [0, 2, 3]
    assert h[0] == xxhash64(b"hello")
    assert h[1] == xxhash64(b"world")
    assert h[2] == xxhash64(b"hello")


def test_shingles_counts_and_order_sensitivity():
    texts = ["a b c d", "a b", "a"]
    h, offs = token_hashes(pa.array(texts))
    sh, soffs = shingle_hashes(h, offs, s=2)
    assert list(soffs) == [0, 3, 4, 4]
    # 'a b' shingle identical across docs; 'b a' would differ
    assert sh[0] == sh[3]
    h2, o2 = token_hashes(pa.array(["b a"]))
    sh2, _ = shingle_hashes(h2, o2, s=2)
    assert sh2[0] != sh[0]


def test_sliding_window_min():
    vals = np.array([5, 1, 3, 2, 9, 4], dtype=np.int64)
    offs = np.array([0, 4, 6])
    out, ooffs = sliding_window_min(vals, offs, 2)
    assert list(ooffs) == [0, 3, 4]
    assert list(out) == [1, 1, 2, 4]


def test_char_ngrams():
    h, offs = char_ngram_hashes(pa.array(["abcde", "ab", "abcdef"]), n=5)
    assert list(offs) == [0, 1, 1, 3]
    # shared prefix shingle 'abcde' equal across docs
    assert h[0] == h[1]
    assert h[1] != h[2]




def test_repetition_stats_ordering(ray_session):
    import ray
    import pyarrow as pa
    import numpy as np
    from bqf_ray.pipelines.text_stats import repetition_stats
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "spam spam spam spam spam spam",            # max repetition
            "a b a b a b a b",                          # bigram repetition
            "one two three four five six",              # no repetition
            "",                                          # dropped (no tokens)
        ])})
    out = {int(r["doc_id"]): r for r in
           repetition_stats(ray.data.from_arrow(docs)).take_all()}
    assert set(out) == {1, 2, 3}
    assert out[1]["dup_token_frac"] == 1 - 1 / 6
    assert out[1]["top_token_frac"] == 1.0
    assert out[1]["top_bigram_frac"] == 1.0
    assert out[2]["top_bigram_frac"] == 4 / 7           # 'a b' 4 of 7
    assert out[3]["dup_token_frac"] == 0.0
    assert out[3]["top_token_frac"] == 1 / 6


def test_scrub_pii_redaction(ray_session):
    import ray
    import pyarrow as pa
    from bqf_ray.pipelines.text_stats import scrub_pii
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "mail bob@example.com call +1 555-123-4567",
            "hosts 10.0.0.1 192.168.1.255",
            "clean document text",
        ])})
    out = {int(r["doc_id"]): r for r in
           scrub_pii(ray.data.from_arrow(docs)).take_all()}
    assert out[1]["clean_text"] == "mail <EMAIL> call <PHONE>"
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert out[2]["clean_text"] == "hosts <IP> <IP>"
    assert out[2]["n_ipv4"] == 2
    assert out[3]["clean_text"] == "clean document text"
    assert out[3]["n_email"] == out[3]["n_ipv4"] == out[3]["n_phone"] == 0
