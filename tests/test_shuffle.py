"""grouped_aggregate: map-side pre-combine (HybridRDD.scala:56-58 analog),
hot-key salting, and type/empty-block discipline."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

import lynxkite_ray.stages.shuffle as sh


def _skewed_table(n=1_000_000, hot_frac=0.9, n_cold=1000, seed=7):
    rng = np.random.default_rng(seed)
    k = np.where(
        rng.random(n) < hot_frac, 0, rng.integers(1, n_cold + 1, n)
    ).astype(np.int64)
    v = rng.integers(0, 1000, n).astype(np.int64)
    f = rng.random(n)
    return pa.table({"k": k, "v": v, "f": f})


def _expected(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas()
    return (
        df.groupby("k")
        .agg(
            s=("v", "sum"),
            c=("v", "count"),
            lo=("v", "min"),
            hi=("v", "max"),
            m=("f", "mean"),
        )
        .reset_index()
    )


def _got(ds):
    return (
        ds.to_pandas().sort_values("k").reset_index(drop=True)
    )


def test_precombine_shrinks_shuffle_and_is_exact(monkeypatch):
    t = _skewed_table()
    ds = rd.from_arrow(t).repartition(32).materialize()

    shuffled_rows = []
    real = sh.hash_partition

    def spy(d, keys, num_partitions=None):
        shuffled_rows.append(d.materialize().count())
        return real(d, keys, num_partitions)

    monkeypatch.setattr(sh, "hash_partition", spy)
    out = sh.grouped_aggregate(
        ds,
        ["k"],
        [
            ("v", "sum", "s"),
            ("v", "count", "c"),
            ("v", "min", "lo"),
            ("v", "max", "hi"),
            ("f", "mean", "m"),
        ],
        num_partitions=8,
    )
    got = _got(out)
    want = _expected(t)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the hot key (900k rows) must ship as per-block partials, not raw rows:
    # ≤ 32 blocks × 1001 keys through the exchange instead of 1,000,000
    assert len(shuffled_rows) == 1
    assert shuffled_rows[0] <= 32 * 1001
    assert shuffled_rows[0] < t.num_rows / 25


def test_salted_matches_unsalted():
    t = _skewed_table(n=200_000, seed=11)
    ds = rd.from_arrow(t).repartition(16).materialize()
    aggs = [
        ("v", "sum", "s"),
        ("v", "count", "c"),
        ("v", "min", "lo"),
        ("v", "max", "hi"),
        ("f", "mean", "m"),
    ]
    plain = _got(sh.grouped_aggregate(ds, ["k"], aggs, num_partitions=8))
    salted = _got(
        sh.grouped_aggregate(ds, ["k"], aggs, num_partitions=8, salt=8)
    )
    pd.testing.assert_frame_equal(plain, salted, check_dtype=False)
    pd.testing.assert_frame_equal(salted, _expected(t), check_dtype=False)


def test_precombine_type_promotion_matches_direct_path():
    # float32 sums → float64, int32 → int64, uint8 → uint64 (pyarrow's
    # hash_sum promotions), identical whether or not pre-combine runs
    t = pa.table(
        {
            "k": pa.array([1, 1, 2, 2, 2], pa.int64()),
            "f32": pa.array([1.5, 2.5, 3.0, None, 1.0], pa.float32()),
            "i32": pa.array([1, 2, 3, 4, 5], pa.int32()),
            "u8": pa.array([1, 2, 3, 4, 5], pa.uint8()),
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    out = sh.grouped_aggregate(
        ds,
        ["k"],
        [
            ("f32", "sum", "fs"),
            ("f32", "count", "fc"),
            ("f32", "mean", "fm"),
            ("i32", "sum", "is_"),
            ("u8", "sum", "us"),
            ("u8", "max", "um"),
        ],
        num_partitions=2,
    )
    tbl = pa.concat_tables(
        out.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    schema = {f.name: f.type for f in tbl.schema}
    assert schema["fs"] == pa.float64()
    assert schema["fc"] == pa.int64()
    assert schema["fm"] == pa.float64()
    assert schema["is_"] == pa.int64()
    assert schema["us"] == pa.uint64()
    assert schema["um"] == pa.uint8()
    df = tbl.to_pandas().sort_values("k").reset_index(drop=True)
    assert df.loc[0, "fs"] == 4.0 and df.loc[1, "fs"] == 4.0
    assert df.loc[0, "fc"] == 2 and df.loc[1, "fc"] == 2  # null not counted
    assert df.loc[1, "fm"] == 2.0
    assert list(df["is_"]) == [3, 12]
    assert list(df["um"]) == [2, 5]


def test_count_distinct_still_direct_path():
    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "v": pa.array([10, 10, 20, 30, 30], pa.int64()),
        }
    )
    ds = rd.from_arrow(t).repartition(2)
    out = sh.grouped_aggregate(
        ds, ["k"], [("v", "count_distinct", "nd")], num_partitions=2
    )
    got = {r["k"]: r["nd"] for r in out.take_all()}
    assert got == {1: 2, 2: 1}
