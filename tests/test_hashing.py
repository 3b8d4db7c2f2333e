import numpy as np
import pyarrow as pa
import pytest

from bqf_ray.functions.hashing import (
    bfc_hash_64,
    bfc_hash_64_inv,
    fmix64,
    xxhash64,
    xxhash64_array,
)


def test_xxh64_empty_golden():
    # published XXH64 test vector: empty input, seed 0
    assert xxhash64(b"") == 0xEF46DB3751D8E999


def test_xxh64_scalar_vs_vector_random():
    rng = np.random.RandomState(7)
    rows = []
    for n in [0, 1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 31, 32, 33, 63, 64, 100, 1000]:
        rows.append(bytes(rng.randint(0, 256, n, dtype=np.uint8)))
    for _ in range(50):
        n = int(rng.randint(0, 200))
        rows.append(bytes(rng.randint(0, 256, n, dtype=np.uint8)))
    arr = pa.array(rows, type=pa.binary())
    got = xxhash64_array(arr)
    expect = np.array([xxhash64(b) for b in rows], dtype=np.uint64)
    np.testing.assert_array_equal(got, expect)


def test_xxh64_seeded_and_strings():
    rows = ["", "a", "hello world", "x" * 100, "αβγ δ"]
    arr = pa.array(rows, type=pa.string())
    for seed in [0, 1, 42, 2**63]:
        got = xxhash64_array(arr, seed=seed)
        expect = np.array([xxhash64(s.encode("utf-8"), seed) for s in rows],
                          dtype=np.uint64)
        np.testing.assert_array_equal(got, expect)


def test_xxh64_chunked_array_and_offsets():
    rows = [f"token{i}" for i in range(1000)]
    arr = pa.chunked_array([pa.array(rows[:300]), pa.array(rows[300:])])
    got = xxhash64_array(arr)
    expect = np.array([xxhash64(s.encode()) for s in rows], dtype=np.uint64)
    np.testing.assert_array_equal(got, expect)
    # sliced array (nonzero offset)
    sl = pa.array(rows).slice(100, 50)
    np.testing.assert_array_equal(
        xxhash64_array(sl),
        np.array([xxhash64(s.encode()) for s in rows[100:150]], dtype=np.uint64))


def test_xxh64_small_chunk_budget():
    rows = ["r" * (i % 97) for i in range(500)]
    got = xxhash64_array(pa.array(rows), chunk_bytes=1 << 10)
    expect = np.array([xxhash64(s.encode()) for s in rows], dtype=np.uint64)
    np.testing.assert_array_equal(got, expect)


def test_fmix64_scalar_matches_vector_and_bijective():
    rng = np.random.RandomState(3)
    xs = rng.randint(0, 2**63, 1000, dtype=np.int64).astype(np.uint64)
    v = fmix64(xs)
    s = np.array([fmix64(int(x)) for x in xs], dtype=np.uint64)
    np.testing.assert_array_equal(v, s)
    assert len(np.unique(v)) == len(np.unique(xs))


@pytest.mark.parametrize("bits", [64, 56, 40, 32])
def test_bfc_roundtrip(bits):
    rng = np.random.RandomState(11)
    xs = (rng.randint(0, 2**63, 2000, dtype=np.int64).astype(np.uint64)
          & np.uint64((1 << bits) - 1))
    h = bfc_hash_64(xs, bits)
    assert np.all(h <= np.uint64((1 << bits) - 1))
    back = bfc_hash_64_inv(h, bits)
    np.testing.assert_array_equal(back, xs)
    # scalar agrees with vector
    for x in xs[:20]:
        assert bfc_hash_64(int(x), bits) == int(bfc_hash_64(np.array([x]), bits)[0])
        assert bfc_hash_64_inv(int(bfc_hash_64(int(x), bits)), bits) == int(x)


def test_xxh64_distribution_sanity():
    keys = xxhash64_array(pa.array([f"w{i}" for i in range(20000)]))
    assert len(np.unique(keys)) == 20000
    # top-bit balance within 2%
    frac = np.mean((keys >> np.uint64(63)).astype(np.float64))
    assert 0.47 < frac < 0.53


def test_md5_hash64_matches_hashlib_and_sql():
    """md5_hash64_array must equal big-endian first-8-bytes-of-md5 per
    value AND DuckDB's ('0x' || substr(md5(v),1,16))::UBIGINT — the
    cross-engine contract the simhash oracle relies on."""
    import hashlib

    import duckdb

    from bqf_ray.functions.hashing import md5_hash64_array

    vals = ["hello", "", "héllo wörld", "a" * 300, "hello"]  # dup on purpose
    got = md5_hash64_array(pa.array(vals))
    want = np.array([int.from_bytes(hashlib.md5(v.encode()).digest()[:8],
                                    "big") for v in vals], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)
    con = duckdb.connect()
    for v, g in zip(vals, got):
        sql = con.execute(
            "SELECT ('0x' || substr(md5(?),1,16))::UBIGINT", [v]).fetchone()[0]
        assert int(sql) == int(g)


def test_simhash_chunked_bucket_pairs_complete():
    """Chunked pair emission inside a band bucket must equal the full
    triu enumeration (no pairs lost for buckets larger than one chunk)."""
    from bqf_ray.pipelines.dedup import simhash64

    rng = np.random.RandomState(7)
    base = "the quick brown fox jumps over the lazy dog " * 3
    texts = []
    for i in range(300):
        words = base.split()
        # mutate a couple of words so hamming distances spread 0..64
        for _ in range(rng.randint(0, 4)):
            words[rng.randint(len(words))] = f"w{rng.randint(30)}"
        texts.append(" ".join(words))
    hs = simhash64(pa.array(texts), algo="md5")
    # brute-force reference pairs at <=3
    i, j = np.triu_indices(len(hs), k=1)
    x = hs[i] ^ hs[j]
    ham = np.array([bin(int(v)).count("1") for v in x])
    want = {(a, b) for a, b, h in zip(i, j, ham) if h <= 3}

    import ray

    from bqf_ray.pipelines.dedup import simhash_dup_pairs
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts)}))
    got = simhash_dup_pairs(ds, max_hamming=3, algo="md5").to_pandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got["doc_a"], got["doc_b"])}
    assert got_pairs == want
