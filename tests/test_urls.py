"""URL canonicalization rules, host/domain extraction, and the Dataset
stage — rule-by-rule goldens plus idempotence."""

import pyarrow as pa
import pytest

from bqf_ray.text.urls import (canonicalize_urls, host_of,
                               registrable_domain, url_table)

GOLDEN = [
    # fragment drop + scheme/host lowering + default port + param sort
    ("HTTP://Example.COM:80/Path/To?b=2&a=1#frag",
     "http://example.com/Path/To?a=1&b=2"),
    # https default port + bare host slash
    ("https://Sub.Site.co.uk:443", "https://sub.site.co.uk/"),
    # empty query dropped
    ("http://a.com/x?", "http://a.com/x"),
    # duplicate params kept, byte-sorted
    ("http://a.com/x?z=1&y=2&y=1", "http://a.com/x?y=1&y=2&z=1"),
    # non-default port and path case preserved
    ("https://b.org:8443/KeepCase/Path", "https://b.org:8443/KeepCase/Path"),
    # :8080 is not :80
    ("http://h.net:8080/x", "http://h.net:8080/x"),
    ("http://plain.net", "http://plain.net/"),
]


def test_canonicalize_goldens():
    got = canonicalize_urls(pa.array([u for u, _ in GOLDEN])).to_pylist()
    assert got == [c for _, c in GOLDEN]


def test_canonicalize_idempotent():
    once = canonicalize_urls(pa.array([u for u, _ in GOLDEN]))
    twice = canonicalize_urls(once)
    assert once.to_pylist() == twice.to_pylist()


def test_host_and_domain():
    hosts = host_of(pa.array(["HTTP://A.B.Example.COM:80/x",
                              "https://www.shop.co.uk/y?q=1",
                              "http://single.io"]))
    assert hosts.to_pylist() == ["a.b.example.com", "www.shop.co.uk",
                                 "single.io"]
    doms = registrable_domain(hosts)
    assert doms.to_pylist() == ["example.com", "shop.co.uk", "single.io"]


def test_url_table_stage(ray_session):
    import ray
    t = pa.table({"url": pa.array([u for u, _ in GOLDEN])})
    out = (url_table(ray.data.from_arrow(t)).to_pandas())
    assert out["url_canon"].tolist() == [c for _, c in GOLDEN]
    assert out["host"].iloc[0] == "example.com"
    assert out["domain"].iloc[1] == "site.co.uk"
