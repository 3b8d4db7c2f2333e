"""High-cardinality stress: partitioned BQF build over N distinct uint64
keys (the regime a real web vocab produces, which the tiny synthetic
corpus vocabulary cannot).  Run: python tools/stress_cardinality.py [n_keys]."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pyarrow as pa
import ray

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
ray.init(address="local", num_cpus=CPUS, include_dashboard=False)

from tools.canary import print_canary
from bqf_ray.functions.hashing import fmix64
from bqf_ray.sketches.bqf import BqfEc
from bqf_ray.stages.sketch_stage import PartitionedSketch, build_partitioned

SHARD = 1_000_000
spec = pa.table({"start": list(range(0, N, SHARD))})
ds = ray.data.from_arrow(spec).repartition(max(1, N // SHARD))

def gen(batch: pa.Table) -> pa.Table:
    out = []
    for s0 in batch["start"].to_pylist():
        n = min(SHARD, N - s0)
        keys = fmix64(np.arange(s0, s0 + n, dtype=np.uint64))  # distinct
        out.append(pa.table({"key": pa.array(keys.astype(np.int64))}))
    return pa.concat_tables(out)

keys_ds = ds.map_batches(gen, batch_format="pyarrow", batch_size=1).materialize()

def key_fn(batch: pa.Table):
    return np.asarray(batch.column("key"), dtype=np.int64).astype(np.uint64), None

print_canary()
t0 = time.time()
blob_ds = build_partitioned(keys_ds, key_fn,
                            lambda: BqfEc(q=16, count_size=4),
                            num_partitions=CPUS, batch_size=None)
ps = PartitionedSketch.from_dataset(blob_ds, CPUS)
dt = time.time() - t0
total_bytes = sum(len(s.to_bytes()) for s in ps.shards.values())
print(f"keys={N} build_sec={dt:.1f} keys_per_sec={N/dt:,.0f} "
      f"elements={ps.elements_inside} shards={len(ps.shards)} "
      f"bits_per_elem={total_bytes*8/ps.elements_inside:.1f}")
# spot-check correctness
probe = fmix64(np.arange(0, N, max(1, N // 100_000), dtype=np.uint64))
assert bool(np.all(ps.query_batch(probe) == 1))
absent = fmix64(np.arange(N, N + 100_000, dtype=np.uint64))
fp = int((ps.query_batch(absent) > 0).sum())
print(f"false_positives_on_100k_absent={fp}")
ray.shutdown()
