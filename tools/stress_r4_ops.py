"""Round-4 stress battery — reproduces the BASELINE.md round-4 rows.

Covers every scale-path added this round:
  - node-sharded pagerank vs broadcast (bit-identity + wall) at 2M edges,
    plus the 20M-edge / 5M-node sharded-only tier (auto dispatch,
    dataset output, exact mass conservation);
  - sharded kcore / LPA / HITS vs broadcast at 800k edges;
  - sharded random walks past the CSR broadcast budget (5M edges);
  - intra-file FASTX byte-range splits vs whole-file on a generated
    ~300 MB FASTQ;
  - quantized grouped Kendall on 10M rows with a 6M-row hot key.

Run:  RAY_GRAFT_CPUS=32 python tools/stress_r4_ops.py [section ...]
Sections: graph big walks fastx kendall   (default: all)
"""
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402

ray.init(address="local",
         num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
         include_dashboard=False)

SECTIONS = set(sys.argv[1:]) or {"graph", "big", "walks", "fastx",
                                 "kendall"}


def _edges(seed, E, N):
    rng = np.random.default_rng(seed)
    return pa.table({
        "a": pa.array(rng.integers(0, N, E).astype(np.int64)),
        "b": pa.array(rng.integers(0, N, E).astype(np.int64))})


if "graph" in SECTIONS:
    from bqf_ray.pipelines.graph import (hits, kcore, label_propagation,
                                         pagerank)
    tbl = _edges(42, 2_000_000, 300_000)
    t0 = time.time()
    a = pagerank(ray.data.from_arrow(tbl).repartition(32), "a", "b",
                 iters=5, mode="broadcast")
    tb = time.time() - t0
    t0 = time.time()
    b = pagerank(ray.data.from_arrow(tbl).repartition(32), "a", "b",
                 iters=5, mode="sharded", num_shards=16)
    ts = time.time() - t0
    eq = list(a[0]) == list(b[0]) and all(
        int(x) == int(y) for x, y in zip(a[1], b[1]))
    print(f"pagerank 2M edges: broadcast={tb:.1f}s sharded={ts:.1f}s "
          f"bit_identical={eq}")

    tbl = _edges(3, 800_000, 150_000)
    for name, fn in (
            ("kcore", lambda m: kcore(
                ray.data.from_arrow(tbl).repartition(16), 8, rounds=4,
                mode=m, num_shards=8)),
            ("lpa", lambda m: label_propagation(
                ray.data.from_arrow(tbl).repartition(16), rounds=2,
                mode=m, num_shards=8))):
        t0 = time.time()
        x = fn("broadcast").to_pandas().sort_values("node") \
            .reset_index(drop=True)
        tb = time.time() - t0
        t0 = time.time()
        y = fn("sharded").to_pandas().sort_values("node") \
            .reset_index(drop=True)
        ts = time.time() - t0
        print(f"{name} 800k edges: broadcast={tb:.1f}s sharded={ts:.1f}s "
              f"identical={x.equals(y)}")
    t0 = time.time()
    an, ah, aa = hits(ray.data.from_arrow(tbl).repartition(16),
                      "a", "b", rounds=2, mode="broadcast")
    tb = time.time() - t0
    t0 = time.time()
    bn, bh, ba = hits(ray.data.from_arrow(tbl).repartition(16),
                      "a", "b", rounds=2, mode="sharded", num_shards=8)
    ts = time.time() - t0
    print(f"hits 800k edges: broadcast={tb:.1f}s sharded={ts:.1f}s "
          f"identical={list(an) == list(bn) and (ah == bh).all() and (aa == ba).all()}")

if "big" in SECTIONS:
    from ray.data.aggregate import Sum

    from bqf_ray.pipelines.graph import pagerank
    E, N = 20_000_000, 5_000_000
    rng = np.random.default_rng(7)
    tbl = pa.table({
        "a": pa.array(rng.integers(0, N, E).astype(np.int64)),
        "b": pa.array(rng.integers(0, N, E).astype(np.int64))})
    t0 = time.time()
    out = pagerank(ray.data.from_arrow(tbl).repartition(64), "a", "b",
                   iters=5, mode="auto", node_budget=1_000_000,
                   num_shards=32, output="dataset")
    n = out.count()
    dt = time.time() - t0
    tot = out.aggregate(Sum("rank", alias_name="s"))["s"]
    unit = out.take(1)[0]["unit"]
    print(f"sharded pagerank {E} edges / {n} nodes: {dt:.1f}s "
          f"({E * 5 / dt / 1e6:.1f}M edge-visits/s) "
          f"mass_exact={tot == n * unit}")

if "walks" in SECTIONS:
    from bqf_ray.pipelines.graph import random_walks
    E, N = 5_000_000, 1_000_000
    rng = np.random.default_rng(11)
    tbl = pa.table({
        "a": pa.array(rng.integers(0, N, E).astype(np.int64)),
        "b": pa.array(rng.integers(0, N, E).astype(np.int64))})
    seeds = rng.choice(N, 20_000, replace=False).astype(np.int64)
    t0 = time.time()
    out = random_walks(ray.data.from_arrow(tbl).repartition(32), seeds,
                       walk_len=5, walks_per_seed=2, algo="xx64",
                       mode="auto", broadcast_budget_bytes=1,
                       num_shards=16)
    n = out.count()
    dt = time.time() - t0
    print(f"sharded walks {E} edges, 40k x 5 steps: rows={n} {dt:.1f}s")

if "fastx" in SECTIONS:
    from ray.data.aggregate import Sum

    from bqf_ray.sources.fastx import read_fastx
    path = "/tmp/stress_r4.fastq"
    if not os.path.exists(path):
        rng = np.random.RandomState(0)
        ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)
        with open(path, "wb") as f:
            i0 = 0
            total = 0
            while total < 300 * (1 << 20):
                seqs = ACGT[rng.randint(0, 4, (20000, 150))]
                quals = rng.randint(33, 74, (20000, 150)) \
                    .astype(np.uint8)
                buf = bytearray()
                for j in range(20000):
                    buf += b"@r%d meta\n" % (i0 + j)
                    buf += seqs[j].tobytes() + b"\n+\n"
                    buf += quals[j].tobytes() + b"\n"
                f.write(buf)
                total += len(buf)
                i0 += 20000

    def count(split):
        t0 = time.time()
        ds = read_fastx([path], include_quality=True, split_size=split)

        def ln(b: pa.Table) -> pa.Table:
            return pa.table({"n": pa.array([len(b)], pa.int64())})

        n = ds.map_batches(ln, batch_format="pyarrow") \
            .aggregate(Sum("n", alias_name="n"))["n"]
        return n, time.time() - t0

    n1, t1 = count(None)
    n2, t2 = count(64 << 20)
    print(f"fastx 300MB single file: whole={t1:.1f}s split={t2:.1f}s "
          f"speedup={t1 / t2:.1f}x records_equal={n1 == n2}")

if "kendall" in SECTIONS:
    from bqf_ray.pipelines.aggregates import grouped_kendall_binned
    rng = np.random.RandomState(0)
    n = 10_000_000
    k = np.where(rng.rand(n) < 0.6, 0,
                 rng.randint(1, 50, n)).astype(np.int64)
    x = rng.randn(n)
    y = x * 0.3 + rng.randn(n)
    t = pa.table({"k": pa.array(k), "x": pa.array(x), "y": pa.array(y)})
    t0 = time.time()
    out = grouped_kendall_binned(
        ray.data.from_arrow(t).repartition(64), "k", "x", "y",
        bins=64).to_pandas()
    dt = time.time() - t0
    hot = out.set_index("k").loc[0]
    print(f"kendall_binned 10M rows (hot key {int(hot['n'])}): {dt:.1f}s "
          f"tau={hot['tau']:.4f} bound={hot['tau_err_bound']:.4f}")

ray.shutdown()
