"""Print Ray Data execution stats for a driver-contract query — the
per-stage feedback loop ("read ds.stats() and iterate") as a one-liner:

    python tools/query_stats.py <query_name> [sf_dir]

Runs ``__ray_entry__.queries()[name]`` and, when the result is a
``ray.data.Dataset``, prints the stage-by-stage wall/cpu/rows report the
streaming executor collected (pandas/arrow results print shape only —
their pipelines already materialized inside the wrapper)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402


def main():
    name = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    import logging
    logging.getLogger("bqf_ray.plans").setLevel(logging.INFO)
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
             include_dashboard=False)
    import __ray_entry__ as entry
    fn = entry.queries()[name]
    t0 = time.time()
    res = fn(sf)
    if isinstance(res, ray.data.Dataset):
        res = res.materialize()
        print(res.stats())
        print(f"rows={res.count()}")
    else:
        print(f"non-Dataset result: {type(res).__name__} "
              f"shape={getattr(res, 'shape', None)}")
    print(f"total_sec={time.time() - t0:.2f}")
    from bqf_ray.plans import recent_plans
    for p in recent_plans():
        detail = " ".join(f"{k}={v}" for k, v in p.items()
                          if k not in ("op", "plan"))
        print(f"plan: {p['op']} -> {p['plan']} ({detail})")
    ray.shutdown()


if __name__ == "__main__":
    main()
