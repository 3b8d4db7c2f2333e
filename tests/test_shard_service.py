"""Live sharded sketch service: interleaved insert/query with
read-your-writes, snapshot/checkpoint handoff to the batch world."""

import numpy as np
import pytest

from bqf_ray.sketches.bqf import BqfCf, BqfEc
from bqf_ray.state.shard_actors import ShardedSketchService


def _keys(n, seed):
    return np.random.RandomState(seed).randint(
        0, 2**62, n, dtype=np.int64).astype(np.uint64)


@pytest.fixture()
def service(ray_session):
    svc = ShardedSketchService(lambda: BqfEc(q=8, count_size=8), num_shards=4)
    yield svc
    svc.shutdown()


def test_interleaved_updates_and_queries(service):
    oracle: dict[int, int] = {}
    rng = np.random.RandomState(1)
    for step in range(6):
        keys = _keys(2000, seed=step)[rng.randint(0, 2000, 1500)]
        counts = rng.randint(1, 10, len(keys)).astype(np.uint64)
        service.update(keys, counts)
        for k, c in zip(keys.tolist(), counts.tolist()):
            oracle[k] = min(oracle.get(k, 0) + c, 255)
        # read-your-writes: immediately query a sample including fresh keys
        sample = np.array(list(oracle)[:: max(1, len(oracle) // 500)],
                          dtype=np.uint64)
        got = service.query(sample)
        exp = np.array([oracle[int(k)] for k in sample], dtype=np.uint64)
        np.testing.assert_array_equal(got, exp, err_msg=f"step {step}")
    assert service.n_elements() == len(oracle)


def test_snapshot_matches_live(service):
    keys = _keys(5000, seed=9)
    service.update(keys)
    ps = service.snapshot()
    np.testing.assert_array_equal(ps.query_batch(keys), service.query(keys))
    # snapshot is independent: further live updates don't affect it
    service.update(keys)
    assert np.all(ps.query_batch(keys[:100]) == 1)
    assert np.all(service.query(keys[:100]) == 2)


def test_checkpoint_roundtrip(service, tmp_path):
    from bqf_ray.stages.sketch_stage import PartitionedSketch
    from bqf_ray.state.checkpoint import SketchCheckpoint
    keys = _keys(3000, seed=4)
    service.update(keys, np.full(len(keys), 7, dtype=np.uint64))
    ckdir = str(tmp_path / "svc")
    service.checkpoint(ckdir, config={"kind": "live-bqf"})
    shards = SketchCheckpoint.load_all(ckdir)
    ps = PartitionedSketch(shards)
    np.testing.assert_array_equal(ps.query_batch(keys),
                                  np.full(len(keys), 7, dtype=np.uint64))


def test_first_repeat_live(ray_session):
    """Streaming first-repeat: the cf filter as a live service."""
    svc = ShardedSketchService(lambda: BqfCf(q=8), num_shards=2)
    try:
        a = _keys(1000, seed=2)
        svc.update(a)                 # first sighting
        assert np.all(svc.query(a) == 0)   # cf reports bit=0 for seen-once
        svc.update(a[:300])           # repeats
        assert np.all(svc.query(a[:300]) == 1)
        assert np.all(svc.query(a[300:]) == 0)
    finally:
        svc.shutdown()


def test_routed_probe_matches_broadcast(ray_session):
    """routed=True probes via one actor per shard (per-actor memory = one
    shard, not the whole index) and must agree exactly with the
    broadcast-sketch probe."""
    import ray
    from bqf_ray.pipelines.build_index import build_bqf_index
    from bqf_ray.sources.pages import generate_pages

    pages = generate_pages(600, seed=11)
    ds = ray.data.from_arrow(pages).repartition(4)
    idx = build_bqf_index(ds, num_partitions=4, q=10, batch_size=256)
    # the sharded path only matters when the index is genuinely split:
    # every actor holds strictly less than the whole index
    sizes = [s.elements_inside for s in idx.psketch.shards.values()]
    assert len(sizes) > 1
    assert max(sizes) < sum(sizes)

    docs = ray.data.from_arrow(pages).repartition(2)
    broad = (idx.probe_documents(docs, id_col="url", concurrency=1)
             .to_pandas().sort_values("url").reset_index(drop=True))
    routed = (idx.probe_documents(docs, id_col="url", routed=True)
              .to_pandas().sort_values("url").reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(broad, routed)
