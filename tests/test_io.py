"""Sources/sinks: schema assertion, atomic resumable writes, ORC/CSV/JSON
round trips, make_symmetric semantics."""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from lynxkite_ray.sources.io import (
    is_complete,
    read_orc,
    read_parquet_with_schema,
    read_table,
    write_parquet_atomic,
)


def test_schema_checked_read():
    schema = pa.schema([("l_orderkey", pa.int64()), ("l_quantity", pa.float64())])
    ds = read_parquet_with_schema("/root/testdata/sf0.001/lineitem.parquet", schema)
    assert ds.count() > 0
    bad = pa.schema([("l_orderkey", pa.string())])
    with pytest.raises(ValueError, match="schema mismatch"):
        read_parquet_with_schema("/root/testdata/sf0.001/lineitem.parquet", bad)
    missing = pa.schema([("no_such_col", pa.int64())])
    with pytest.raises(ValueError, match="missing"):
        read_parquet_with_schema("/root/testdata/sf0.001/lineitem.parquet", missing)


def test_atomic_write_and_resume_marker(tmp_path):
    ds = rd.from_arrow(pa.table({"a": np.arange(10)}))
    out = str(tmp_path / "out")
    n = write_parquet_atomic(ds, out)
    assert n == 10 and is_complete(out)
    back = rd.read_parquet(out)
    assert sorted(r["a"] for r in back.take_all()) == list(range(10))


def test_orc_roundtrip(tmp_path):
    from pyarrow import orc

    t = pa.table({"x": np.arange(50), "y": [f"v{i}" for i in range(50)]})
    p = str(tmp_path / "t.orc")
    orc.write_table(t, p)
    ds = read_orc(p)
    assert ds.count() == 50
    assert sorted(r["x"] for r in ds.take_all()) == list(range(50))


def test_csv_json_roundtrip(tmp_path):
    ds = rd.from_arrow(pa.table({"a": np.arange(20), "b": np.arange(20) * 1.5}))
    cdir = str(tmp_path / "c")
    jdir = str(tmp_path / "j")
    ds.write_csv(cdir)
    ds.write_json(jdir)
    assert read_table(cdir, "csv").count() == 20
    assert read_table(jdir, "json").count() == 20
    # unknown engine in a jdbc url fails loudly (JVM-only drivers need a
    # connection-factory callable)
    with pytest.raises(ValueError, match="unknown engine"):
        read_table("jdbc:oracle:thin@db", "jdbc", query="SELECT 1")


def test_read_database_partitioned_duckdb_and_sqlite(tmp_path):
    """read_database (ImportOperations.scala:133 partitioned-JDBC slot):
    range-partitioned parallel reads return the full result set from both
    available engines, with and without a partition column."""
    import sqlite3

    import duckdb

    from lynxkite_ray.sources.io import read_database

    n = 1_000
    ddb = str(tmp_path / "t.duckdb")
    con = duckdb.connect(ddb)
    con.execute(
        "CREATE TABLE t AS SELECT range AS k, range * 2 AS v, "
        "'s' || (range % 7) AS s FROM range(1000)"
    )
    con.close()

    got = (
        read_database(f"duckdb:{ddb}", "SELECT * FROM t", "k", num_partitions=4)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert len(got) == n
    assert got["k"].tolist() == list(range(n))
    assert got["v"].tolist() == [2 * i for i in range(n)]
    assert got["s"][8] == "s1"

    # jdbc-alias URL + single-task path (no partition column)
    one = read_database("jdbc:duckdb:" + ddb, "SELECT COUNT(*) AS c FROM t")
    assert one.take(1)[0]["c"] == n

    sq = str(tmp_path / "t.sqlite")
    sc = sqlite3.connect(sq)
    sc.execute("CREATE TABLE t (k INTEGER, v REAL)")
    sc.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, i * 0.5) for i in range(200)]
    )
    sc.commit()
    sc.close()
    got = (
        read_database(("sqlite", sq), "SELECT * FROM t", "k", num_partitions=3)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert len(got) == 200 and got["v"][9] == 4.5

    # connection-factory callable path
    got2 = read_database(
        lambda: sqlite3.connect(sq), "SELECT * FROM t WHERE k < 10"
    ).to_pandas()
    assert len(got2) == 10

    # empty result with a partition column: no range split, zero rows
    empty = read_database(f"duckdb:{ddb}", "SELECT * FROM t WHERE k < 0", "k")
    assert empty.count() == 0


def test_make_symmetric_min_matched_pairs():
    from lynxkite_ray.stages.edges import make_symmetric

    # 2×(0→1), 1×(1→0) → min = 1 pair kept each way; (2→3) unmatched → dropped
    edges = [(0, 1), (0, 1), (1, 0), (2, 3)]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": np.array([e[0] for e in edges], np.int64),
                "dst": np.array([e[1] for e in edges], np.int64),
            }
        )
    )
    out = sorted((r["src"], r["dst"]) for r in make_symmetric(ds).take_all())
    assert out == [(0, 1), (1, 0)]


def test_snapshot_store_skip_if_exists(tmp_path):
    import time

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lynxkite_ray.state.checkpoint import SnapshotStore, lineage_key

    store = SnapshotStore(str(tmp_path / "snap"))
    t = pa.table({"a": np.arange(100, dtype=np.int64)})
    lin = lineage_key("test-table", 100)
    calls = []

    def compute():
        calls.append(1)
        return rd.from_arrow(t)

    out1 = store.save_or_load("mytab", lin, compute)
    assert sorted(r["a"] for r in out1.take_all()) == list(range(100))
    assert store.exists("mytab", lin)
    d = store._dir("mytab", lin)
    mtime = max(
        __import__("os").path.getmtime(__import__("os").path.join(d, f))
        for f in __import__("os").listdir(d)
    )
    time.sleep(0.05)
    out2 = store.save_or_load("mytab", lin, compute)
    assert len(calls) == 1  # second call reused the snapshot
    mtime2 = max(
        __import__("os").path.getmtime(__import__("os").path.join(d, f))
        for f in __import__("os").listdir(d)
    )
    assert mtime2 == mtime  # untouched on disk
    assert sorted(r["a"] for r in out2.take_all()) == list(range(100))
    # different lineage → recompute
    store.save_or_load("mytab", lineage_key("test-table", 101), compute)
    assert len(calls) == 2


def test_csv_json_export_roundtrip(tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lynxkite_ray.sources.io import read_table, write_csv, write_json

    t = pa.table(
        {
            "k": np.arange(50, dtype=np.int64),
            "v": (np.arange(50) * 0.5).astype(np.float64),
            "s": [f"row{i}" for i in range(50)],
        }
    )
    ds = rd.from_arrow(t)
    cdir = str(tmp_path / "csv_out")
    jdir = str(tmp_path / "json_out")
    write_csv(ds, cdir)
    write_json(ds, jdir)

    back_csv = read_table(cdir, "csv").to_pandas().sort_values("k").reset_index(drop=True)
    back_json = read_table(jdir, "json").to_pandas().sort_values("k").reset_index(drop=True)
    ref = t.to_pandas().sort_values("k").reset_index(drop=True)
    assert back_csv["k"].tolist() == ref["k"].tolist()
    assert back_csv["s"].tolist() == ref["s"].tolist()
    assert np.allclose(back_csv["v"], ref["v"])
    assert back_json["k"].tolist() == ref["k"].tolist()
    assert np.allclose(back_json["v"], ref["v"])


def test_sql_roundtrip(tmp_path):
    """write_sql → read_sql round trip through the DuckDB-backed adapter."""
    import ray.data as rd

    from lynxkite_ray.sources.io import read_sql, write_sql

    db = str(tmp_path / "x.duckdb")
    ds = rd.from_arrow(
        pa.table({"k": [3, 1, 2], "s": ["c", "a", "b"], "v": [0.5, 1.5, 2.5]})
    )
    n = write_sql(ds, db, "t")
    assert n == 3
    # append mode
    n2 = write_sql(
        rd.from_arrow(pa.table({"k": [9], "s": ["z"], "v": [9.0]})),
        db,
        "t",
        mode="append",
    )
    assert n2 == 1
    back = read_sql(db, "SELECT k, s, v FROM t ORDER BY k")
    rows = back.take_all()
    assert [r["k"] for r in rows] == [1, 2, 3, 9]
    assert rows[0]["s"] == "a" and rows[3]["v"] == 9.0


def test_write_parquet_partitioned_resume(tmp_path):
    """Crash-resume contract: completed partitions are skipped (and not
    rewritten), missing ones are filled in; total content is exact."""
    import os
    import shutil

    import pyarrow.dataset as pads

    from lynxkite_ray.sources.io import write_parquet_partitioned

    t = pa.table(
        {
            "doc_id": np.arange(100, dtype=np.int64),
            "lang": np.array(["en", "de", "fr", "hu"])[np.arange(100) % 4],
            "val": np.arange(100, dtype=np.float64),
        }
    )
    root = str(tmp_path / "out")
    n = write_parquet_partitioned(rd.from_arrow(t), root, "lang")
    assert n == 100
    parts = sorted(p for p in os.listdir(root) if "=" in p)
    assert parts == ["lang=de", "lang=en", "lang=fr", "lang=hu"]
    assert all(os.path.exists(os.path.join(root, p, "_SUCCESS")) for p in parts)

    # simulate a crash that lost one partition
    shutil.rmtree(os.path.join(root, "lang=fr"))
    marker = os.path.join(root, "lang=en", "_SUCCESS")
    mtime_before = os.path.getmtime(os.path.join(root, "lang=en"))
    n2 = write_parquet_partitioned(rd.from_arrow(t), root, "lang")
    assert n2 == 25  # only the lost partition was rewritten
    assert os.path.exists(marker)
    assert os.path.getmtime(os.path.join(root, "lang=en")) == mtime_before

    back = pads.dataset(
        root, format="parquet", partitioning="hive",
        ignore_prefixes=["_", "."],
    ).to_table()
    assert back.num_rows == 100
    assert sorted(back.column("doc_id").to_pylist()) == list(range(100))

    # fully-resumed rerun is a no-op
    assert write_parquet_partitioned(rd.from_arrow(t), root, "lang") == 0


def test_write_parquet_partitioned_encoded_and_null_keys(tmp_path):
    """Resume detection must survive Hive/URL-encoded key values (space,
    slash, '=') and null keys (__HIVE_DEFAULT_PARTITION__) — a rerun of a
    finished run is a no-op for those partitions too (ADVICE r3)."""
    import os

    from lynxkite_ray.sources.io import write_parquet_partitioned

    t = pa.table(
        {
            "doc_id": np.arange(8, dtype=np.int64),
            "k": pa.array(
                ["a b", "a b", "x/y", "x/y", "p=q", "p=q", None, None]
            ),
            "val": np.arange(8, dtype=np.float64),
        }
    )
    root = str(tmp_path / "enc")
    n = write_parquet_partitioned(rd.from_arrow(t), root, "k")
    assert n == 8
    dirs = sorted(p for p in os.listdir(root) if "=" in p)
    assert len(dirs) == 4  # three encoded values + the null partition
    assert any("__HIVE_DEFAULT_PARTITION__" in d for d in dirs)

    # fully-resumed rerun is a no-op for EVERY partition
    assert write_parquet_partitioned(rd.from_arrow(t), root, "k") == 0


def test_execute_sql_roundtrip_and_row_guard():
    """execute_sql works for small intermediates and REFUSES to collect a
    Dataset past max_rows (VERDICT r3 'What's wrong' #5)."""
    import pytest

    from lynxkite_ray.functions.sql import execute_sql

    ds = rd.from_arrow(pa.table({"a": np.arange(1000, dtype=np.int64)}))
    out = execute_sql("SELECT COUNT(*) AS n, SUM(a) AS s FROM t", t=ds)
    row = out.take_all()[0]
    assert row["n"] == 1000 and row["s"] == 999 * 500

    with pytest.raises(ValueError, match="exceeds"):
        execute_sql("SELECT COUNT(*) AS n FROM t", max_rows=100, t=ds)


def test_avro_roundtrip(tmp_path):
    """AVRO write → read round-trip (polars codec, one Ray task/file)."""
    from lynxkite_ray.sources.io import read_avro, read_table, write_avro

    t = pa.table(
        {
            "a": np.arange(100, dtype=np.int64),
            "s": pa.array([f"v{i}" for i in range(100)]),
            "f": np.arange(100, dtype=np.float64) * 0.5,
        }
    )
    path = str(tmp_path / "av")
    assert write_avro(rd.from_arrow(t).repartition(3), path) == 100
    back = read_avro(path).to_pandas().sort_values("a").reset_index(drop=True)
    assert back["a"].tolist() == list(range(100))
    assert back["s"][3] == "v3" and back["f"][4] == 2.0
    # column pruning + read_table dispatch
    only_a = read_table(path, fmt="avro", columns=["a"]).take(1)[0]
    assert set(only_a) == {"a"}


def test_delta_log_replay_and_time_travel(tmp_path):
    """Minimal static Delta table: JSON commit replay honors add/remove
    and version= time travel (ImportOperations.scala:360-414 slot)."""
    import json

    import pyarrow.parquet as pq

    from lynxkite_ray.sources.io import read_delta

    root = tmp_path / "dt"
    (root / "_delta_log").mkdir(parents=True)
    pq.write_table(pa.table({"x": [1, 2, 3]}), root / "f0.parquet")
    pq.write_table(pa.table({"x": [4, 5]}), root / "f1.parquet")
    pq.write_table(pa.table({"x": [6]}), root / "f2.parquet")

    def commit(v, actions):
        with open(root / "_delta_log" / f"{v:020d}.json", "w") as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")

    commit(0, [{"add": {"path": "f0.parquet"}}, {"add": {"path": "f1.parquet"}}])
    commit(1, [{"remove": {"path": "f1.parquet"}}, {"add": {"path": "f2.parquet"}}])

    latest = sorted(read_delta(str(root)).to_pandas()["x"].tolist())
    assert latest == [1, 2, 3, 6]
    v0 = sorted(read_delta(str(root), version=0).to_pandas()["x"].tolist())
    assert v0 == [1, 2, 3, 4, 5]
    pruned = read_delta(str(root), columns=["x"]).take(1)[0]
    assert set(pruned) == {"x"}


def test_delta_multipart_checkpoint_and_vacuumed_log(tmp_path):
    """Multi-part checkpoints (n.checkpoint.i.m.parquet) load as the base
    state; a vacuumed log with no base checkpoint raises instead of
    silently replaying a partial commit set (ADVICE r4)."""
    import json

    import pytest

    import pyarrow.parquet as pq

    from lynxkite_ray.sources.io import read_delta

    root = tmp_path / "dt"
    log = root / "_delta_log"
    log.mkdir(parents=True)
    for i in range(4):
        pq.write_table(pa.table({"x": [i]}), root / f"f{i}.parquet")

    # commits 0-1 were vacuumed; version-1 state lives in a 2-part checkpoint
    ck_schema = pa.schema(
        [("add", pa.struct([("path", pa.string())])),
         ("remove", pa.struct([("path", pa.string())]))]
    )
    pq.write_table(
        pa.table(
            {"add": [{"path": "f0.parquet"}], "remove": [None]}, schema=ck_schema
        ),
        log / f"{1:020d}.checkpoint.{0:010d}.{2:010d}.parquet",
    )
    pq.write_table(
        pa.table(
            {"add": [{"path": "f1.parquet"}], "remove": [None]}, schema=ck_schema
        ),
        log / f"{1:020d}.checkpoint.{1:010d}.{2:010d}.parquet",
    )
    with open(log / f"{2:020d}.json", "w") as f:
        f.write(json.dumps({"remove": {"path": "f0.parquet"}}) + "\n")
        f.write(json.dumps({"add": {"path": "f2.parquet"}}) + "\n")

    got = sorted(read_delta(str(root)).to_pandas()["x"].tolist())
    assert got == [1, 2]
    v1 = sorted(read_delta(str(root), version=1).to_pandas()["x"].tolist())
    assert v1 == [0, 1]

    # same log without the checkpoint parts: replay would start at commit 2
    for p in log.glob("*.checkpoint.*"):
        p.unlink()
    with pytest.raises(ValueError, match="vacuumed"):
        read_delta(str(root))


def test_read_hive_table_pruning_and_partition_column(tmp_path):
    from lynxkite_ray.sources.io import read_hive_table, write_parquet_partitioned

    root = str(tmp_path / "hive")
    t = pa.table(
        {
            "k": pa.array(["a", "b", None, "x y"], pa.string()),
            "v": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    write_parquet_partitioned(rd.from_arrow(t), root, "k")

    # full read attaches the partition column
    full = read_hive_table(root).to_pandas()
    assert sorted(full["v"]) == [1, 2, 3, 4]
    assert set(full.columns) == {"k", "v"}

    # partition-level pruning: only k=a read
    got = read_hive_table(root, where=lambda d: d.get("k") == "a").to_pandas()
    assert list(got["v"]) == [1]

    # decoded values: the space-containing key round-trips
    got = read_hive_table(root, where=lambda d: d.get("k") == "x y").to_pandas()
    assert list(got["v"]) == [4]

    # null partition decoded to None
    got = read_hive_table(root, where=lambda d: d.get("k") is None).to_pandas()
    assert list(got["v"]) == [3]

    # read_table dispatch
    assert read_table(root, "hive").count() == 4


def test_derive_sql_distributed_row_local():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lynxkite_ray.functions.sql import derive_sql

    n = 10_000
    ds = rd.from_arrow(
        pa.table({"a": np.arange(n, dtype=np.int64), "b": np.arange(n) * 0.5})
    ).repartition(8)
    out = derive_sql(
        ds, "SELECT a, a * 2 + CAST(FLOOR(b) AS BIGINT) AS c FROM batch", concurrency=2
    ).to_pandas().sort_values("a").reset_index(drop=True)
    assert len(out) == n
    import numpy as np
    assert (out["c"] == out["a"] * 2 + np.floor(out["a"] * 0.5).astype("int64")).all()
    assert list(out.columns) == ["a", "c"]


def test_explode_list_column():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lynxkite_ray.stages.transform import explode

    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "v": pa.array(
                [[10, 20, 30], [], None, [40]], pa.list_(pa.int64())
            ),
        }
    )
    out = (
        explode(rd.from_arrow(t), "v")
        .to_pandas()
        .sort_values(["id", "pos"])
        .reset_index(drop=True)
    )
    assert out["id"].tolist() == [1, 1, 1, 4]
    assert out["pos"].tolist() == [0, 1, 2, 0]
    assert out["value"].tolist() == [10, 20, 30, 40]
    assert list(out.columns) == ["id", "pos", "value"]


def test_unpivot_wide_to_long():
    import pyarrow as pa
    import ray.data as rd

    from lynxkite_ray.stages.transform import unpivot

    t = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "a": pa.array([10.0, 20.0], pa.float64()),
            "b": pa.array([0.5, 0.25], pa.float64()),
        }
    )
    out = (
        unpivot(rd.from_arrow(t), ["id"], ["a", "b"])
        .to_pandas()
        .sort_values(["id", "metric"])
        .reset_index(drop=True)
    )
    assert len(out) == 4
    assert out["metric"].tolist() == ["a", "b", "a", "b"]
    assert out["val"].tolist() == [10.0, 0.5, 20.0, 0.25]


def test_approx_quantiles_error_bound():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lynxkite_ray.functions.aggregates import approx_quantiles

    rng = np.random.default_rng(3)
    v = np.concatenate([rng.normal(100, 15, 20_000), rng.exponential(50, 5_000)])
    ds = rd.from_arrow(pa.table({"x": v})).repartition(16)
    bins = 4096
    got = approx_quantiles(ds, "x", [0.1, 0.5, 0.9, 0.99], bins=bins)
    bound = (v.max() - v.min()) / bins + 1e-9
    for q, est in got.items():
        exact = np.quantile(v, q)
        assert abs(est - exact) <= 2 * bound, (q, est, exact, bound)

    # constant column degenerates cleanly
    c = rd.from_arrow(pa.table({"x": np.full(100, 7.0)}))
    assert approx_quantiles(c, "x", [0.5]) == {0.5: 7.0}


def test_grouped_approx_quantiles_error_bound():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lynxkite_ray.functions.aggregates import grouped_approx_quantiles

    rng = np.random.default_rng(11)
    ks, vs = [], []
    dists = {
        0: rng.normal(50, 5, 30_000),
        1: rng.exponential(20, 10_000),
        2: rng.uniform(-10, 10, 5_000),
    }
    for k, v in dists.items():
        ks.append(np.full(len(v), k))
        vs.append(v)
    t = pa.table(
        {
            "k": np.concatenate(ks).astype(np.int64),
            "x": np.concatenate(vs),
        }
    )
    bins = 2048
    out = grouped_approx_quantiles(
        rd.from_arrow(t).repartition(16), "k", "x", [0.1, 0.5, 0.9], bins=bins
    ).to_pandas()
    assert len(out) == 9
    for k, v in dists.items():
        bound = (v.max() - v.min()) / bins + 1e-9
        for q in (0.1, 0.5, 0.9):
            est = out[(out["k"] == k) & (out["q"] == q)]["value"].iloc[0]
            exact = np.quantile(v, q)
            assert abs(est - exact) <= 2 * bound, (k, q, est, exact)


def test_grouped_approx_quantiles_ignores_nan():
    """NaN rows are masked before binning (ADVICE r4): a key whose column
    carries NaNs gets the same quantiles as the NaN-free key."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lynxkite_ray.functions.aggregates import grouped_approx_quantiles

    vals = np.linspace(0.0, 100.0, 5_000)
    with_nan = np.concatenate([vals, np.full(500, np.nan)])
    t = pa.table(
        {
            "k": np.concatenate(
                [np.zeros(len(vals)), np.ones(len(with_nan))]
            ).astype(np.int64),
            "x": np.concatenate([vals, with_nan]),
        }
    )
    out = grouped_approx_quantiles(
        rd.from_arrow(t).repartition(8), "k", "x", [0.5], bins=512
    ).to_pandas()
    v0 = out[out["k"] == 0]["value"].iloc[0]
    v1 = out[out["k"] == 1]["value"].iloc[0]
    assert abs(v0 - v1) <= 100.0 / 512 + 1e-9
    assert abs(v0 - 50.0) <= 2 * 100.0 / 512


def test_write_delta_round_trip_and_time_travel(tmp_path):
    """write_delta (ExportOperations.scala:132 analog) → read_delta:
    append creates version 0 with protocol/metaData, a second append
    version 1, an overwrite version 2 with remove actions — and time
    travel to every version still reconstructs the right row set."""
    import pyarrow as pa
    import ray.data as rd

    from lynxkite_ray.sources.io import read_delta, write_delta

    root = str(tmp_path / "dl")
    v0 = write_delta(rd.from_arrow(pa.table({"x": [1, 2, 3]})), root)
    assert v0 == 0
    v1 = write_delta(rd.from_arrow(pa.table({"x": [4, 5]})), root, mode="append")
    assert v1 == 1
    assert sorted(read_delta(root).to_pandas()["x"]) == [1, 2, 3, 4, 5]
    assert sorted(read_delta(root, version=0).to_pandas()["x"]) == [1, 2, 3]
    v2 = write_delta(rd.from_arrow(pa.table({"x": [9]})), root, mode="overwrite")
    assert v2 == 2
    assert sorted(read_delta(root).to_pandas()["x"]) == [9]
    assert sorted(read_delta(root, version=1).to_pandas()["x"]) == [1, 2, 3, 4, 5]
    # version 0 carries protocol + metaData with a schemaString
    import json

    with open(tmp_path / "dl" / "_delta_log" / f"{0:020d}.json") as f:
        actions = [json.loads(line) for line in f if line.strip()]
    assert "protocol" in actions[0] and "metaData" in actions[1]
    assert '"type": "struct"' in actions[1]["metaData"]["schemaString"].replace('","', '", "') or "struct" in actions[1]["metaData"]["schemaString"]


def test_write_database_round_trip_sqlite_and_duckdb(tmp_path):
    """write_database (ExportOperations.scala:69-96 'Export to JDBC'
    analog) → read_database round trip on both DB-API engines, create +
    append modes."""
    import pyarrow as pa
    import ray.data as rd

    from lynxkite_ray.sources.io import read_database, write_database

    ds = rd.from_arrow(
        pa.table({"k": [1, 2, 3], "name": ["a", "b", "c"], "x": [1.5, 2.5, 3.5]})
    )
    for spec in (f"sqlite:{tmp_path}/t.db", f"duckdb:{tmp_path}/t.duckdb"):
        n = write_database(ds, spec, "items")
        assert n == 3
        n2 = write_database(
            rd.from_arrow(pa.table({"k": [4], "name": ["d"], "x": [4.5]})),
            spec,
            "items",
            mode="append",
        )
        assert n2 == 1
        back = read_database(spec, "SELECT * FROM items", partition_col="k").to_pandas()
        assert sorted(back["k"].tolist()) == [1, 2, 3, 4]
        assert sorted(back["name"].tolist()) == ["a", "b", "c", "d"]


def test_snapshot_load_union(tmp_path):
    """'Import union of table snapshots' (ImportOperations.scala:439)."""
    import pyarrow as pa
    import ray.data as rd

    from lynxkite_ray.state.checkpoint import SnapshotStore

    store = SnapshotStore(str(tmp_path / "snaps"))
    store.save(rd.from_arrow(pa.table({"x": [1, 2]})), "a", "lin1")
    store.save(rd.from_arrow(pa.table({"x": [3]})), "b", "lin1")
    u = store.load_union(["a", "b"], "lin1")
    assert sorted(r["x"] for r in u.take_all()) == [1, 2, 3]
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        store.load_union(["a", "missing"], "lin1")


def test_well_known_graph_karate_club():
    """'Import well-known graph dataset' (ImportOperations.scala:455):
    Karate Club is embedded — 34 vertices, 78 edges, the classic degree
    profile (deg(0)=16, deg(33)=17), two factions."""
    import numpy as np

    from lynxkite_ray.sources.generators import well_known_graph

    vs, es = well_known_graph("Karate Club")
    v = vs.to_pandas()
    e = es.to_pandas()
    assert len(v) == 34 and len(e) == 78
    deg = np.zeros(34, int)
    for s, d in zip(e["src"], e["dst"]):
        assert s < d  # canonical orientation
        deg[s] += 1
        deg[d] += 1
    assert deg[0] == 16 and deg[33] == 17 and deg.sum() == 156
    assert set(v["y"]) == {0, 1} and v["y"].sum() == 17
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        well_known_graph("Cora")
