"""PageRank stress at 10^7 nodes / 10^8 edges (previous driver loop was
O(n) Python per iteration and could not reach this envelope; r3
vectorized it to int64 numpy).  Also checks exact mass conservation at
scale.  Run: python tools/stress_graph.py [n_nodes] [avg_deg]."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import ray  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
DEG = int(sys.argv[2]) if len(sys.argv) > 2 else 10
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
ray.init(address="local", num_cpus=CPUS, include_dashboard=False)

from tools.canary import print_canary  # noqa: E402
from bqf_ray.functions.hashing import fmix64  # noqa: E402
from bqf_ray.pipelines.graph import pagerank  # noqa: E402

SHARD = 2_000_000
E = N * DEG
spec = pa.table({"start": list(range(0, E, SHARD))})


def gen(batch: pa.Table) -> pa.Table:
    out = []
    for s0 in batch["start"].to_pylist():
        n = min(SHARD, E - s0)
        i = np.arange(s0, s0 + n, dtype=np.uint64)
        # deterministic pseudo-random graph with a hot head (zipf-ish):
        # src uniform, dst skewed toward low ids (square of uniform)
        src = (fmix64(i) % np.uint64(N)).astype(np.int64)
        u = (fmix64(i + np.uint64(E)) % np.uint64(1 << 32)).astype(np.float64)
        dst = ((u / (1 << 32)) ** 2 * N).astype(np.int64)
        out.append(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    return pa.concat_tables(out)


edges = (ray.data.from_arrow(spec).repartition(max(1, E // SHARD))
         .map_batches(gen, batch_format="pyarrow", batch_size=1)
         .materialize())
print(f"edges materialized: {E:,}")
print_canary()
t0 = time.time()
nodes, ranks, unit = pagerank(edges, "src", "dst", iters=5)
dt = time.time() - t0
n = len(nodes)
assert int(ranks.sum()) == n * unit, "mass not conserved"
print(f"pagerank nodes={n:,} edges={E:,} iters=5 sec={dt:.1f} "
      f"edges_per_iter_per_sec={E * 5 / dt:,.0f} unit={unit} "
      f"top_rank={int(ranks.max())}")
ray.shutdown()
