"""High-cardinality stress for the grouped-sketch surface (r2 verdict
#8): the sf fixtures have ≤200 groups; here the grouped HLL paths,
grouped_top_terms and the grouped t-digest UDAF face 1M–10M distinct
keys, where the unique-key-shuffle lesson from pivot/dedup_spans says
plans degrade.

Measures, with the cold-touch canary on every row:
- grouped_hll_sparse at KEYS distinct keys (the sparse-register plan);
- sketch_agg native grouped HLL at KEYS//32 keys (blob-per-group: one
  Python serde round trip per (block, group) — the moderate-cardinality
  surface, timed here to document WHERE the crossover sits);
- grouped_top_terms at KEYS keys;
- build_grouped t-digest at KEYS//8 keys.

Run: python tools/stress_grouped_sketch.py [n_rows] [n_keys]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import ray  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
KEYS = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
ray.init(address="local", num_cpus=CPUS, include_dashboard=False)

from tools.canary import cold_touch_mb_s  # noqa: E402
from bqf_ray.functions.hashing import fmix64  # noqa: E402


def run(name, fn, rows):
    c = cold_touch_mb_s()
    t0 = time.time()
    n = fn()
    dt = time.time() - t0
    print(f"{name:28s} {dt:8.1f}s  {rows/dt:12.0f} rows/s  ({n} out)  "
          f"[canary {c:.0f} MB/s]", flush=True)


SHARD = 2_000_000
spec = pa.table({"start": list(range(0, N, SHARD))})


def gen(n_keys):
    def fn(batch: pa.Table) -> pa.Table:
        out = []
        for s0 in batch["start"].to_pylist():
            n = min(SHARD, N - s0)
            i = np.arange(s0, s0 + n, dtype=np.uint64)
            key = (fmix64(i) % np.uint64(n_keys)).astype(np.int64)
            val = (fmix64(i + np.uint64(N)) % np.uint64(100_000)) \
                .astype(np.int64)
            out.append(pa.table({"k": pa.array(key), "v": pa.array(val)}))
        return pa.concat_tables(out)
    return fn


base = (ray.data.from_arrow(spec).repartition(max(1, N // SHARD))
        .map_batches(gen(KEYS), batch_format="pyarrow", batch_size=1)
        .materialize())
print(f"rows={N:,} keys={KEYS:,} cpus={CPUS}", flush=True)

# ---- 1. sparse-register grouped HLL at full cardinality ---------------
from bqf_ray.pipelines.aggregates import grouped_hll_sparse  # noqa: E402

run(f"grouped_hll_sparse {KEYS//1_000_000}M keys",
    lambda: grouped_hll_sparse(base, "k", "v", p=12).count(), N)

# ---- 2. native sketch_agg grouped HLL at reduced cardinality ----------
if os.environ.get("STRESS_SKIP_NATIVE") != "1":
    from bqf_ray.sketches.hll import HyperLogLog  # noqa: E402
    from bqf_ray.stages.udaf import sketch_agg  # noqa: E402

    NK = KEYS // 32
    nat = (ray.data.from_arrow(spec).repartition(max(1, N // SHARD))
           .map_batches(gen(NK), batch_format="pyarrow", batch_size=1)
           .materialize())
    run(f"sketch_agg hll {NK//1000}k keys",
        lambda: nat.groupby("k").aggregate(
            sketch_agg(lambda: HyperLogLog(p=12), on="v",
                       finalize="estimate", name="est")).count(), N)

# ---- 3. grouped_top_terms at full key cardinality ----------------------
from bqf_ray.pipelines.text_stats import grouped_top_terms  # noqa: E402

VOCAB = np.array([f"tok{i}" for i in range(4096)])


def to_docs(batch: pa.Table) -> pa.Table:
    k = np.asarray(batch.column("k"), dtype=np.int64)
    v = np.asarray(batch.column("v"), dtype=np.int64)
    words = VOCAB[v % 4096]
    text = np.char.add(np.char.add(words, " "), VOCAB[(v * 7 + 1) % 4096])
    return pa.table({"key": pa.array(np.char.add("s", k.astype("U"))),
                     "text": pa.array(text)})


docs = base.map_batches(to_docs, batch_format="pyarrow").materialize()
run(f"grouped_top_terms {KEYS//1_000_000}M keys",
    lambda: grouped_top_terms(docs, key_col="key", k=3,
                              text_col="text").count(), N)

# ---- 4. grouped quantiles: vectorized DDSketch at FULL cardinality ----
#      vs build_grouped t-digest (sketch-object-per-group) at KEYS//8
from bqf_ray.pipelines.aggregates import grouped_dd_quantiles  # noqa: E402

run(f"grouped_dd_quantiles {KEYS//1_000_000}M keys",
    lambda: grouped_dd_quantiles(base, "k", "v",
                                 qs=(0.25, 0.5, 0.75)).count(), N)

if os.environ.get("STRESS_SKIP_NATIVE") != "1":
    from bqf_ray.sketches.tdigest import TDigest  # noqa: E402
    from bqf_ray.stages.sketch_stage import build_grouped  # noqa: E402

    TK = KEYS // 8
    td = (ray.data.from_arrow(spec).repartition(max(1, N // SHARD))
          .map_batches(gen(TK), batch_format="pyarrow", batch_size=1)
          .materialize())

    def vals(batch: pa.Table) -> np.ndarray:
        return np.asarray(batch.column("v"), dtype=np.float64)

    run(f"build_grouped tdigest {TK//1000}k keys",
        lambda: build_grouped(td, "k", vals,
                              lambda: TDigest(delta=100)).count(), N)

ray.shutdown()
