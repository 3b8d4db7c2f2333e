"""Reference-parity tests for the DNA codec layer + the golden first-repeat
check (E. coli KMC analog, cqf_test.cpp:519-541 shape, on synthetic reads)."""

import numpy as np
import pytest

from bqf_ray.functions.dna import (canonical, decode, encode, hash_to_kmer,
                                   kmer_to_hash, revcomp, sequence_kmers)
from bqf_ray.sketches.bqf import BqfCf


def test_encode_mapping_matches_reference():
    # (char >> 1) & 0b11: A=0, C=1, T=2, G=3
    assert encode("A") == 0 and encode("C") == 1
    assert encode("T") == 2 and encode("G") == 3
    assert encode("ACTG") == (0 << 6) | (1 << 4) | (2 << 2) | 3


@pytest.mark.parametrize("s", ["A", "ACGT", "GATTACA", "TTTTTTTT", "ACGTACGTACGTACGT"])
def test_encode_decode_roundtrip(s):
    assert decode(encode(s), len(s)) == s


def test_revcomp():
    # revcomp(ACGT) = ACGT (palindrome)
    assert revcomp(encode("ACGT"), 4) == encode("ACGT")
    assert revcomp(encode("AAAA"), 4) == encode("TTTT")
    assert revcomp(encode("GAT"), 3) == encode("ATC")
    assert canonical(encode("TTTT"), 4) == encode("AAAA")


@pytest.mark.parametrize("k", [5, 21, 31])
def test_hash_roundtrip(k):
    rng = np.random.RandomState(k)
    for _ in range(50):
        v = int(rng.randint(0, 1 << min(2 * k, 62)))
        v &= (1 << (2 * k)) - 1
        h = kmer_to_hash(v, k)
        assert h < (1 << (2 * k))
        assert encode(hash_to_kmer(h, k)) == v


def test_sequence_kmers_with_reset():
    # invalid char resets the window (bqf_cf.cpp:108-113)
    ks = sequence_kmers("ACGTNACG", 3, canonical_form=False)
    expect = [encode("ACG"), encode("CGT"), encode("ACG")]
    assert list(ks) == expect
    assert len(sequence_kmers("ACNGT", 3, canonical_form=False)) == 0
    assert len(sequence_kmers("", 3)) == 0


def test_first_repeat_golden_on_reads():
    """Golden E2E shape of the reference's filter tool: stream synthetic
    reads through BqfCf; output set == exact {kmer : count >= 2}."""
    rng = np.random.RandomState(99)
    genome = "".join("ACGT"[i] for i in rng.randint(0, 4, 3000))
    reads = [genome[i:i + 150] for i in range(0, 2850, 37)]  # overlapping
    k = 21
    f = BqfCf(q=10, hash_bits=2 * k)
    from bqf_ray.functions.dna import sequence_kmer_hashes
    all_hashes = []
    for r in reads:
        h = sequence_kmer_hashes(r, k)
        f.update_batch(h)
        all_hashes.append(h)
    allh = np.concatenate(all_hashes)
    uniq, cnt = np.unique(allh, return_counts=True)
    expected = set(uniq[cnt >= 2].tolist())
    got = set(f.second_occurrence_keys().tolist())
    assert got == expected
    assert len(expected) > 100  # overlapping reads ⇒ plenty of repeats


def test_encode_batch_matches_scalar():
    import pyarrow as pa
    import pytest
    from bqf_ray.functions.dna import encode, encode_batch
    rng = np.random.RandomState(7)
    smers = ["".join(rng.choice(list("ACGT"), 11)) for _ in range(500)]
    col = pa.chunked_array([pa.array(smers[:200]), pa.array(smers[200:])])
    got = encode_batch(col, 11)
    exp = np.array([encode(m) for m in smers], dtype=np.uint64)
    np.testing.assert_array_equal(got, exp)
    # sliced column (non-zero arrow offset)
    sl = pa.array(smers).slice(100, 50)
    np.testing.assert_array_equal(encode_batch(sl, 11), exp[100:150])
    with pytest.raises(ValueError):
        encode_batch(pa.array(["ACGTN" + "A" * 6]), 11)   # invalid char
    with pytest.raises(ValueError):
        encode_batch(pa.array(["ACG"]), 11)               # wrong length
