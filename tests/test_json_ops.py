"""extract_json / json_rollup — semi-structured column extraction."""
import json

import numpy as np
import pyarrow as pa
import pytest

from bqf_ray.pipelines.json_ops import (_get_path, _parse_ndjson,
                                        extract_json, json_rollup)


def test_parse_ndjson_alignment_and_types():
    col = pa.array(['{"k": 87, "m": {"lang": "en"}}', None, '', '  ',
                    '{"x": 1.5}', '{"k": null}', '{"s": "a\\nb"}'])
    t = _parse_ndjson(col)
    assert t.num_rows == len(col)
    assert _get_path(t, "k").cast(pa.int64(), safe=False).to_pylist() == \
        [87, None, None, None, None, None, None]
    assert _get_path(t, "m.lang").to_pylist() == \
        ["en", None, None, None, None, None, None]
    assert _get_path(t, "m.nope").to_pylist() == [None] * 7
    assert _get_path(t, "absent.deep").to_pylist() == [None] * 7
    # escaped newline inside a JSON string must not break row alignment
    assert _get_path(t, "s").to_pylist()[-1] == "a\nb"


def test_parse_ndjson_rejects_multirow_json():
    with pytest.raises(ValueError):
        _parse_ndjson(pa.array(["1\n2"]))


def test_extract_json_dataset(ray_session):
    import ray
    rows = [{"id": i,
             "props": json.dumps({"k": i * 3, "m": {"tag": f"t{i % 2}"}})}
            for i in range(200)]
    rows[7]["props"] = None
    rows[11]["props"] = ""
    ds = ray.data.from_items(rows)
    out = extract_json(ds, col="props",
                       fields={"k": pa.int64(), "m.tag": pa.string()},
                       drop_source=True)
    tbl = pa.Table.from_pylist(out.take_all())
    assert set(tbl.schema.names) == {"id", "k", "m.tag"}
    got = {r["id"]: (r["k"], r["m.tag"]) for r in tbl.to_pylist()}
    for i in range(200):
        if i in (7, 11):
            assert got[i] == (None, None)
        else:
            assert got[i] == (i * 3, f"t{i % 2}")


def test_json_rollup_matches_python_oracle(ray_session):
    import ray
    rng = np.random.default_rng(5)
    rows, exp = [], {}
    for i in range(500):
        g = f"g{i % 4}"
        n, nv, tot = exp.get(g, (0, 0, 0))
        if i % 17 == 0:
            rows.append({"event_type": g, "props": '{"other": 1}'})
            exp[g] = (n + 1, nv, tot)
        else:
            v = int(rng.integers(0, 100))
            rows.append({"event_type": g, "props": json.dumps({"k": v})})
            exp[g] = (n + 1, nv + 1, tot + v)
    out = json_rollup(ray.data.from_items(rows)).take_all()
    assert len(out) == 4
    for r in out:
        n, nv, tot = exp[r["event_type"]]
        assert r["n_events"] == n
        assert r["n_null"] == n - nv
        assert r["total"] == tot
        assert r["avg_val"] == (tot / nv if nv else 0.0)
