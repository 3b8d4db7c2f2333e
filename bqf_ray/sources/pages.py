"""Deterministic synthetic Common-Crawl-style ``pages`` table.

Schema per BASELINE.json ``input_hint`` / FIXTURES.md §1:
    url: string, warc_ts: timestamp[us], html: binary, text: string,
    lang: string

Properties engineered for the engine's tests and benches:
- fully deterministic for a given (seed, n_rows): same bytes every run;
- ``extract_text(html) == text`` byte-identically per url (the golden
  per-row invariant) — guaranteed by construction and frozen in tests;
- skew: one hot host (~25% of rows) and one hot lang (~70% "en") to
  exercise salting (SURVEY.md §4);
- a controllable fraction of near-duplicate documents (for MinHash/SimHash
  dedup tests) and exact duplicates (for exact dedup / first-repeat).
"""

from __future__ import annotations

import numpy as np

from bqf_ray.text.extract import extract_text

HOSTS = ["hot.example.com"] + [f"site{i:02d}.example.org" for i in range(15)]
HOST_P = np.array([0.25] + [0.05] * 15)
LANGS = ["en", "de", "fr", "es", "zh"]
LANG_P = np.array([0.70, 0.10, 0.08, 0.07, 0.05])

# per-language high-frequency words (drive the n-gram/stopword language id)
LANG_CORE = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans", "pour", "que"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con", "para", "las"],
    "zh": ["de5", "shi4", "zai4", "you3", "wo3", "le5", "bu4", "ren2", "zhe4", "ta1"],
}
VOCAB = [f"tok{i:04d}" for i in range(2000)]

_TEMPLATE = (
    "<html><head><title>{title}</title>"
    "<script type='text/javascript'>var t={{}};t.x=1&&2;</script>"
    "<style>.m{{color:red}}</style></head>"
    "<body><!-- crawler:{rid} --><nav>home about contact</nav>"
    "<h1>{title}</h1><p>{body}</p>"
    "<footer>&copy; example {year}</footer></body></html>"
)


def _doc_words(rng: np.random.RandomState, lang: str, n_words: int) -> list[str]:
    core = LANG_CORE[lang]
    # zipf-ish draw over shared vocab mixed with language-core words
    n_core = int(n_words * 0.4)
    core_ws = [core[i] for i in rng.randint(0, len(core), n_core)]
    zipf_idx = np.minimum(rng.zipf(1.3, n_words - n_core) - 1, len(VOCAB) - 1)
    body_ws = [VOCAB[i] for i in zipf_idx]
    words = core_ws + body_ws
    rng.shuffle(words)
    return words


def generate_pages(n_rows: int, seed: int = 42, dup_frac: float = 0.06,
                   near_dup_frac: float = 0.06):
    """Build the deterministic pages table → ``pyarrow.Table``."""
    import pyarrow as pa

    rng = np.random.RandomState(seed)
    host_idx = rng.choice(len(HOSTS), n_rows, p=HOST_P)
    lang_idx = rng.choice(len(LANGS), n_rows, p=LANG_P)
    ts_base = np.int64(1_700_000_000_000_000)  # 2023-11-14 UTC, microseconds
    warc_ts = ts_base + rng.randint(0, 90 * 86400, n_rows).astype(np.int64) * 1_000_000

    urls, htmls, texts, langs = [], [], [], []
    bodies: list[list[str]] = []
    for i in range(n_rows):
        lang = LANGS[lang_idx[i]]
        url = f"https://{HOSTS[host_idx[i]]}/p/{seed}/{i}"
        r = rng.random_sample()
        if i > 10 and r < dup_frac:
            words = list(bodies[int(rng.randint(0, i))])           # exact dup body
        elif i > 10 and r < dup_frac + near_dup_frac:
            words = list(bodies[int(rng.randint(0, i))])
            for _ in range(max(1, len(words) // 20)):               # ~5% edits
                words[int(rng.randint(0, len(words)))] = VOCAB[int(rng.randint(0, len(VOCAB)))]
        else:
            words = _doc_words(rng, lang, int(rng.randint(30, 120)))
        title = " ".join(words[:4]) if len(words) >= 4 else "untitled page"
        body = " ".join(words)
        # sprinkle entities so extraction is non-trivial
        if i % 7 == 0:
            body += " a &amp; b &lt;tag&gt; &#8212; end"
        html = _TEMPLATE.format(title=title, rid=i, body=body, year=2023 + i % 3)
        urls.append(url)
        htmls.append(html.encode("utf-8"))
        texts.append(extract_text(html))                            # invariant by construction
        langs.append(lang)
        bodies.append(words)

    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(warc_ts, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def pages_dataset(n_rows: int, seed: int = 42, parallelism: int = 8, **kw):
    """The pages table as a ``ray.data.Dataset`` split into blocks.

    Generation happens in parallel Ray tasks (one per shard, deterministic
    per-shard seed) so benches measure the pipeline, not a driver-side loop.
    """
    import ray

    shard = max(256, n_rows // max(parallelism, 1))
    specs = [(s0, min(shard, n_rows - s0), seed + 101 * (s0 // shard))
             for s0 in range(0, n_rows, shard)]

    def make(spec_batch):
        import pyarrow as pa
        out = [generate_pages(int(n), seed=int(sd), **kw)
               for (n, sd) in zip(spec_batch["n"].to_pylist(),
                                  spec_batch["seed"].to_pylist())]
        return pa.concat_tables(out)

    import pyarrow as pa
    spec_tbl = pa.table({
        "start": [s for s, _, _ in specs],
        "n": [n for _, n, _ in specs],
        "seed": [sd for _, _, sd in specs],
    })
    return (ray.data.from_arrow(spec_tbl)
            .repartition(len(specs))
            .map_batches(make, batch_format="pyarrow", batch_size=1))
