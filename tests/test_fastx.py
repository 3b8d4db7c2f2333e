"""FASTA/FASTQ record assembly (SURVEY §2 S3) + the filter tool's
stream output mode (S5) + CLI e2e over a real multi-line FASTA."""

import os

import numpy as np
import pytest

from bqf_ray.sources.fastx import parse_fasta_bytes, parse_fastq_bytes

FASTA = (b">read1 extra comment\n"
         b"ACGTAC\nGTACGT\nACG\n"
         b">read2\n"
         b"TTTTGGGGCCCC\n"
         b">empty\n"
         b">read3\nACACACACAC\n")

FASTQ = (b"@r1 desc\nACGTACGTACGT\n+\nIIIIIIIIIIII\n"
         b"@r2\nGGGGCCCCAAAA\n+r2\nJJJJJJJJJJJJ\n")


def test_parse_fasta_multiline():
    names, seqs = parse_fasta_bytes(FASTA)
    assert names == ["read1", "read2", "empty", "read3"]
    assert seqs == ["ACGTACGTACGTACG", "TTTTGGGGCCCC", "", "ACACACACAC"]
    # \r\n tolerated
    n2, s2 = parse_fasta_bytes(FASTA.replace(b"\n", b"\r\n"))
    assert s2 == seqs


def test_parse_fastq_records():
    names, seqs, quals = parse_fastq_bytes(FASTQ)
    assert names == ["r1", "r2"]
    assert seqs == ["ACGTACGTACGT", "GGGGCCCCAAAA"]
    assert quals == ["IIIIIIIIIIII", "JJJJJJJJJJJJ"]
    with pytest.raises(ValueError):
        parse_fastq_bytes(b"@r1\nACGT\n+\n")          # truncated
    with pytest.raises(ValueError):
        parse_fastq_bytes(b"@r1\nACGT\nX\nIIII\n")    # bad separator


def test_read_fastx_dataset(ray_session, tmp_path):
    from bqf_ray.sources.fastx import read_fastx
    fa = tmp_path / "a.fasta"
    fq = tmp_path / "b.fastq"
    fa.write_bytes(FASTA)
    fq.write_bytes(FASTQ)
    out = read_fastx([str(fa), str(fq)]).to_pandas()
    assert len(out) == 6
    assert set(out["name"]) == {"read1", "read2", "empty", "read3",
                                "r1", "r2"}
    withq = read_fastx([str(fq)], include_quality=True).to_pandas()
    assert list(withq["qual"]) == ["IIIIIIIIIIII", "JJJJJJJJJJJJ"]


def test_filter_stream_mode_matches_batch(ray_session):
    """stream mode must emit exactly the batch modes' k-mer SET."""
    import ray
    from bqf_ray.pipelines.genomic import filter_fastx
    import pyarrow as pa

    rng = np.random.RandomState(5)
    reads = ["".join(rng.choice(list("ACGT"), 40)) for _ in range(60)]
    reads += reads[:20]            # guarantee repeats
    ds = ray.data.from_arrow(pa.table({"seq": pa.array(reads)})) \
        .repartition(4)
    batch_out = set(filter_fastx(ds, k=11, mode="text", num_partitions=4)
                    .to_pandas()["kmer"])
    stream_out = filter_fastx(ds, k=11, mode="stream", num_partitions=4) \
        .to_pandas()["kmer"]
    assert len(stream_out) == len(set(stream_out))   # each emitted once
    assert set(stream_out) == batch_out


def test_cli_filter_fastx_e2e(ray_session, tmp_path):
    """CLI over a real multi-line FASTA: k-mers spanning line breaks
    within a record must be found (the line-oriented parse missed them)."""
    from bqf_ray.cli import main
    fa = tmp_path / "reads.fasta"
    # one 24-char sequence split over 3 lines, repeated in a second record
    seq = "ACGTACGTTTGGCCAAGGTTCCAA"
    fa.write_bytes((">a\n" + seq[:8] + "\n" + seq[8:16] + "\n" + seq[16:]
                    + "\n>b\n" + seq + "\n").encode())
    outdir = str(tmp_path / "out")
    main(["filter", "-i", str(fa), "-o", outdir, "-k", "21", "--fastx"])
    import pyarrow.parquet as pq
    import glob
    kmers = set()
    for f in glob.glob(os.path.join(outdir, "*.parquet")):
        kmers |= set(pq.read_table(f).column("kmer").to_pylist())
    from bqf_ray.functions.dna import sequence_kmers, decode
    expected = {decode(int(c), 21) for c in sequence_kmers(seq, 21)}
    assert kmers == expected and len(kmers) == 4


# --- intra-file byte-range splits ------------------------------------------

def _mk_fastq(path, n, seed=0, multi=False):
    rng = np.random.RandomState(seed)
    with open(path, "wb") as f:
        for i in range(n):
            L = int(rng.randint(20, 120))
            seq = bytes(rng.choice(list(b"ACGT"), L).astype(np.uint8))
            # qualities deliberately include '@' and '+' bytes — the
            # phase-lock must not misanchor on them
            qual = bytes(rng.randint(ord('@') - 2, ord('I'), L,
                                     dtype=np.int64).astype(np.uint8))
            f.write(b"@read" + str(i).encode() + b" extra meta\n"
                    + seq + b"\n+\n" + qual + b"\n")


def _mk_fasta(path, n, seed=1):
    rng = np.random.RandomState(seed)
    with open(path, "wb") as f:
        for i in range(n):
            f.write(b">ctg" + str(i).encode() + b" desc\n")
            for _ in range(int(rng.randint(1, 5))):   # multi-line seqs
                L = int(rng.randint(10, 80))
                f.write(bytes(rng.choice(list(b"ACGT"), L)
                              .astype(np.uint8)) + b"\n")


@pytest.mark.parametrize("split", [256, 1024, 7777])
def test_fastq_split_equals_whole(ray_session, tmp_path, split):
    import ray

    from bqf_ray.sources.fastx import read_fastx
    fq = tmp_path / "big.fastq"
    _mk_fastq(str(fq), 400, seed=3)
    whole = (read_fastx([str(fq)], include_quality=True, split_size=None)
             .to_pandas().sort_values("name").reset_index(drop=True))
    split_df = (read_fastx([str(fq)], include_quality=True,
                           split_size=split)
                .to_pandas().sort_values("name").reset_index(drop=True))
    assert len(whole) == 400
    assert whole.equals(split_df)


@pytest.mark.parametrize("split", [128, 999])
def test_fasta_split_equals_whole(ray_session, tmp_path, split):
    import ray

    from bqf_ray.sources.fastx import read_fastx
    fa = tmp_path / "big.fasta"
    _mk_fasta(str(fa), 300, seed=5)
    whole = (read_fastx([str(fa)], split_size=None)
             .to_pandas().sort_values("name").reset_index(drop=True))
    split_df = (read_fastx([str(fa)], split_size=split)
                .to_pandas().sort_values("name").reset_index(drop=True))
    assert len(whole) == 300
    assert whole.equals(split_df)


def test_parse_tables_match_lists():
    """Vectorized Arrow assembly ≡ the list API on tricky inputs."""
    from bqf_ray.sources.fastx import (parse_fasta_bytes,
                                       parse_fasta_table)
    data = (b">a desc\nACGT\nTTGG\n>b\nC\n>empty\n>c\tx\nGG\n")
    t = parse_fasta_table(data)
    n, s = parse_fasta_bytes(data)
    assert t.column("name").to_pylist() == n == ["a", "b", "empty", "c"]
    assert t.column("seq").to_pylist() == s == ["ACGTTTGG", "C", "", "GG"]


def test_fastq_split_boundary_in_last_record_with_at_quality(
        ray_session, tmp_path):
    """A split boundary inside the LAST record whose quality line
    begins '@' (Phred 31) must not misphase the EOF sync — the 4-line
    remainder-to-EOF test pins the phase (review finding r4)."""
    import ray

    from bqf_ray.sources.fastx import read_fastx
    data = (b"@r0\nACGT\n+\nIIII\n"
            b"@r1\nACGTACGT\n+\n@IIIIIII\n")
    fq = tmp_path / "t.fastq"
    fq.write_bytes(data)
    whole = (read_fastx([str(fq)], include_quality=True,
                        split_size=None).to_pandas()
             .sort_values("name").reset_index(drop=True))
    assert len(whole) == 2
    # every possible boundary position must reproduce the whole parse
    for split in range(4, len(data), 3):
        got = (read_fastx([str(fq)], include_quality=True,
                          split_size=split).to_pandas()
               .sort_values("name").reset_index(drop=True))
        assert whole.equals(got), f"split={split}"


def test_read_fastx_parallelism_param(ray_session, tmp_path):
    """parallelism>0 maps to a derived split size (the task-count
    meaning it had before the byte-range rewrite)."""
    import ray

    from bqf_ray.sources.fastx import read_fastx
    fq = tmp_path / "p.fastq"
    _mk_fastq(str(fq), 200, seed=8)
    whole = (read_fastx([str(fq)], include_quality=True,
                        split_size=None).to_pandas()
             .sort_values("name").reset_index(drop=True))
    par = (read_fastx([str(fq)], include_quality=True, parallelism=7)
           .to_pandas().sort_values("name").reset_index(drop=True))
    assert whole.equals(par)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(n=st.integers(1, 60), seed=st.integers(0, 2**31 - 1),
       split=st.integers(8, 4000))
def test_fastq_split_property(ray_session, n, seed, split):
    """Arbitrary record counts × arbitrary split sizes: the byte-range
    parse must always equal the whole-file parse (qualities include
    '@'/'+' bytes on purpose)."""
    import tempfile

    from bqf_ray.sources.fastx import read_fastx
    rng = np.random.RandomState(seed)
    with tempfile.NamedTemporaryFile(suffix=".fastq",
                                     delete=False) as f:
        for i in range(n):
            L = int(rng.randint(1, 90))
            seq = bytes(rng.choice(list(b"ACGT"), L).astype(np.uint8))
            qual = bytes(rng.randint(ord('!'), ord('J'), L,
                                     dtype=np.int64).astype(np.uint8))
            f.write(b"@q%d x\n" % i + seq + b"\n+\n" + qual + b"\n")
        path = f.name
    whole = (read_fastx([path], include_quality=True, split_size=None)
             .to_pandas().sort_values("name").reset_index(drop=True))
    got = (read_fastx([path], include_quality=True, split_size=split)
           .to_pandas().sort_values("name").reset_index(drop=True))
    assert len(whole) == n
    assert whole.equals(got)
