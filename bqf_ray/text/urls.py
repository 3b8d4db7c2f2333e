"""URL canonicalization and host/domain extraction — the web-corpus key
normalizers (crawl dedup by canonical URL, per-host capping, domain
mixing all key on these).

Every step is a vectorized Arrow kernel (RE2 regex / C++ sort), and each
is chosen to be REPLAYABLE IN ANSI-ish SQL (regexp_extract /
regexp_replace / lower / list_sort) so canonicalization is
oracle-checkable byte-for-byte — same philosophy as
:func:`bqf_ray.pipelines.text_stats.normalize_text`.

Canonical form (scheme://host[:port]/path?query):

1. fragment dropped (``#...``);
2. scheme+host+port lowercased (path/query case preserved);
3. default ports stripped (``http://…:80``, ``https://…:443``);
4. bare-host URLs get a ``/`` path (``http://a.com`` → ``http://a.com/``);
5. query parameters byte-sorted (duplicates kept), empty query ``?``
   dropped.

Registrable-domain extraction uses a deliberately small embedded
two-level-suffix list (co.uk-style) — a stand-in for the public-suffix
list, which is an external artifact this sandbox doesn't ship; the
mechanism (last 2 labels, 3 when the 2-label tail is a public suffix)
is the real one.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# minimal two-level public-suffix sample; swap in the full PSL in prod
TWO_LEVEL_SUFFIXES = ("co.uk", "ac.uk", "gov.uk", "com.au", "co.jp",
                      "com.br", "co.in")


def _sort_query_params(q: pa.Array) -> pa.Array:
    """Byte-sort '&'-separated params per row, vectorized: explode to a
    (row, param) table, ONE C++ sort, rebuild lists, rejoin."""
    lists = pc.split_pattern(q, "&")
    flat = lists.flatten()
    lens = np.asarray(lists.value_lengths().fill_null(0), dtype=np.int64)
    if len(flat) == 0:
        return q
    rows = np.repeat(np.arange(len(q), dtype=np.int64), lens)
    t = pa.table({"r": pa.array(rows), "p": flat})
    idx = pc.sort_indices(t, sort_keys=[("r", "ascending"),
                                        ("p", "ascending")])
    sorted_flat = t.column("p").take(idx)
    if isinstance(sorted_flat, pa.ChunkedArray):
        sorted_flat = sorted_flat.combine_chunks()
    offs = pa.array(np.concatenate([[0], np.cumsum(lens)]).astype(np.int32))
    return pc.binary_join(pa.ListArray.from_arrays(offs, sorted_flat), "&")


def canonicalize_urls(urls) -> pa.Array:
    """Vectorized canonical form of a string array of absolute
    http(s) URLs (see module docstring for the exact rules)."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    u = pc.replace_substring_regex(urls, r"#.*$", "")        # 1. fragment
    base = pc.extract_regex(u, r"^(?P<b>[^?]*)").field("b")
    has_q = pc.match_substring(u, "?")
    q = pc.extract_regex(
        pc.if_else(has_q, u, pc.binary_join_element_wise(u, "?", "")),
        r"^[^?]*\?(?P<q>.*)$").field("q")
    # 2. lowercase scheme://host[:port]
    prefix = pc.extract_regex(base, r"^(?P<p>[hH][tT][tT][pP][sS]?://[^/]*)"
                              ).field("p")
    rest = pc.replace_substring_regex(
        base, r"^[hH][tT][tT][pP][sS]?://[^/]*", "")
    lowered = pc.utf8_lower(prefix)
    # 3. default ports
    lowered = pc.replace_substring_regex(lowered,
                                         r"^(http://[^/:]+):80$", r"\1")
    lowered = pc.replace_substring_regex(lowered,
                                         r"^(https://[^/:]+):443$", r"\1")
    base2 = pc.binary_join_element_wise(lowered, rest, "")
    # 4. bare host -> trailing slash
    base2 = pc.replace_substring_regex(base2, r"^(https?://[^/]+)$", r"\1/")
    # 5. sorted query
    q_sorted = _sort_query_params(q)
    keep_q = pc.and_(has_q, pc.not_equal(q_sorted, ""))
    with_q = pc.binary_join_element_wise(base2, "?", q_sorted, "")
    return pc.if_else(keep_q, with_q, base2)


def host_of(urls) -> pa.Array:
    """Lowercased host (port stripped) of absolute http(s) URLs."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    h = pc.extract_regex(urls, r"^[hH][tT][tT][pP][sS]?://(?P<h>[^/:?#]*)"
                         ).field("h")
    return pc.utf8_lower(h)


def registrable_domain(hosts) -> pa.Array:
    """Registrable domain of a lowercased host: last two labels, or
    three when the two-label tail is in the embedded suffix sample."""
    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    two = pc.extract_regex(hosts, r"(?P<d>[^.]+\.[^.]+)$").field("d")
    three = pc.extract_regex(hosts, r"(?P<d>[^.]+\.[^.]+\.[^.]+)$"
                             ).field("d")
    is_psl = pc.is_in(two, value_set=pa.array(list(TWO_LEVEL_SUFFIXES)))
    use3 = pc.and_(is_psl, pc.is_valid(three))
    return pc.if_else(use3, three, two)


def url_table(ds, url_col: str = "url"):
    """Append ``url_canon`` / ``host`` / ``domain`` columns — the
    stateless normalizer stage ahead of URL-keyed dedup / per-host caps."""
    def fn(batch: pa.Table) -> pa.Table:
        u = batch.column(url_col)
        canon = canonicalize_urls(u)
        h = host_of(canon)
        return (batch.append_column("url_canon", canon)
                .append_column("host", h)
                .append_column("domain", registrable_domain(h)))

    return ds.map_batches(fn, batch_format="pyarrow")
