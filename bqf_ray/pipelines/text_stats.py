"""Text-analysis operators: doc stats, language id, quality scoring,
content fingerprints.  All vectorized `map_batches` stages over Arrow.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from bqf_ray.functions.hashing import xxhash64_array
from bqf_ray.functions.tokenize import tokenize_column
from bqf_ray.sources.pages import LANG_CORE


def doc_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(id, n_chars, n_tokens, avg_token_len) — SQL-oracle-checkable."""

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        n_chars = pc.utf8_length(texts).cast(pa.int64())
        toks, offs = tokenize_column(texts)
        n_tokens = np.diff(offs).astype(np.int64)
        tok_lens = np.asarray(pc.utf8_length(toks), dtype=np.int64) \
            if len(toks) else np.empty(0, dtype=np.int64)
        sums = np.zeros(len(batch), dtype=np.int64)
        if len(tok_lens):
            did = np.repeat(np.arange(len(batch)), n_tokens)
            np.add.at(sums, did, tok_lens)
        avg = np.where(n_tokens > 0, sums / np.maximum(n_tokens, 1), 0.0)
        return pa.table({
            id_col: batch.column(id_col),
            "n_chars": n_chars,
            "n_tokens": pa.array(n_tokens),
            "avg_token_len": pa.array(avg, pa.float64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


class LangId:
    """Actor-pool language-id stage: per-language core-word hit ratio,
    argmax with deterministic tie-break (language list order, then 'und').

    State (per-language hashed lexicons) is built once per actor in
    __init__, per the actor-pool pattern."""

    LANGS = list(LANG_CORE)

    def __init__(self, text_col: str = "text", min_hits: float = 0.05):
        self.text_col = text_col
        self.min_hits = min_hits
        self.lex = {lang: np.sort(xxhash64_array(words))
                    for lang, words in LANG_CORE.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from bqf_ray.functions.tokenize import token_hashes
        th, offs = token_hashes(batch.column(self.text_col))
        n_docs = len(offs) - 1
        n_tok = np.diff(offs).astype(np.int64)
        did = np.repeat(np.arange(n_docs), n_tok)
        scores = np.zeros((n_docs, len(self.LANGS)), dtype=np.float64)
        for li, lang in enumerate(self.LANGS):
            lex = self.lex[lang]
            pos = np.searchsorted(lex, th)
            hit = (pos < len(lex))
            posc = np.minimum(pos, len(lex) - 1)
            hit &= lex[posc] == th
            hits = np.zeros(n_docs, dtype=np.int64)
            if hit.any():
                np.add.at(hits, did[hit], 1)
            scores[:, li] = hits / np.maximum(n_tok, 1)
        best = np.argmax(scores, axis=1)
        best_score = scores[np.arange(n_docs), best]
        langs = np.array(self.LANGS, dtype=object)[best]
        langs[best_score < self.min_hits] = "und"
        return batch.append_column("pred_lang", pa.array(langs.tolist(),
                                                         pa.string())) \
                    .append_column("lang_score", pa.array(best_score))


_STOPWORDS = LANG_CORE["en"]


class QualityScore:
    """Heuristic quality score in [0,1]: doc-length band, mean token
    length band, stopword presence, alpha ratio — the usual web-text
    quality signals, deterministic and vectorized."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.stop = np.sort(xxhash64_array(_STOPWORDS))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from bqf_ray.functions.tokenize import token_hashes
        texts = batch.column(self.text_col)
        n = len(batch)
        th, offs = token_hashes(texts)
        n_tok = np.diff(offs).astype(np.int64)
        did = np.repeat(np.arange(n), n_tok)
        toks, _ = tokenize_column(texts)
        tok_lens = np.asarray(pc.utf8_length(toks), dtype=np.int64) \
            if len(toks) else np.empty(0, dtype=np.int64)
        sums = np.zeros(n, dtype=np.int64)
        if len(tok_lens):
            np.add.at(sums, did, tok_lens)
        mean_len = np.where(n_tok > 0, sums / np.maximum(n_tok, 1), 0.0)
        pos = np.searchsorted(self.stop, th)
        hit = (pos < len(self.stop))
        posc = np.minimum(pos, len(self.stop) - 1)
        hit &= self.stop[posc] == th
        stop_hits = np.zeros(n, dtype=np.int64)
        if hit.any():
            np.add.at(stop_hits, did[hit], 1)
        stop_ratio = stop_hits / np.maximum(n_tok, 1)
        # length score: ramps 0→1 over [5, 50] tokens, flat to 2000, then decays
        ls = np.clip((n_tok - 5) / 45.0, 0, 1) * np.where(
            n_tok <= 2000, 1.0, np.maximum(0.2, 2000 / np.maximum(n_tok, 1)))
        # token-length score: ideal mean 3–9 chars
        tl = np.clip(1.0 - np.abs(mean_len - 6.0) / 6.0, 0, 1)
        # stopword score: saturates at 20% stopwords
        ss = np.clip(stop_ratio / 0.2, 0, 1)
        score = 0.4 * ls + 0.3 * tl + 0.3 * ss
        return (batch.append_column("quality", pa.array(score))
                     .append_column("n_tokens", pa.array(n_tok))
                     .append_column("stop_ratio", pa.array(stop_ratio)))


def content_fingerprints(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(id, content_hash, simhash) — exact + fuzzy fingerprints per doc."""
    from bqf_ray.pipelines.dedup import simhash64

    def fp(batch: pa.Table) -> pa.Table:
        ch = xxhash64_array(batch.column(text_col)).astype(np.int64)
        sh = simhash64(batch.column(text_col)).astype(np.int64)
        return pa.table({id_col: batch.column(id_col),
                         "content_hash": pa.array(ch),
                         "simhash": pa.array(sh)})

    return ds.map_batches(fp, batch_format="pyarrow")
