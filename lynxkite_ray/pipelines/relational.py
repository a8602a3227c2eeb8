"""Relational operator battery over the driver's TPC-H-ish tables — each
function is a ``queries()`` entry with an exact DuckDB oracle in
__ray_entry__.oracle_sql().

Exactness discipline: money columns are integerized (cents / 1e-4 units)
BEFORE summing, so Ray and DuckDB sums are exact integers regardless of
summation order — no float-rounding coin flips in the value-hash gate.
Doubles that must stay double (mean/std) are rounded on both sides with an
error budget ≫ float noise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Std, Sum

from ..functions.aggregates import (
    CountDistinct,
    CountMostCommon,
    max_by,
    MostCommon,
    as_vector,
    min_max_min_positive,
    top_values,
    weighted_average,
)
from ..stages.join import anti_join, broadcast_join, semi_join
from ..stages.transform import bucket_double, filter_batches, hash_column, ranking


def _read(sf_dir: str, table: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(arr, scale: int = 100) -> pa.Array:
    """Exact integerization of a 2-decimal money double."""
    return pc.cast(pc.round(pc.multiply(arr, float(scale))), pa.int64())


# ---------------------------------------------------------------- lineitem


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: filter on ship date, groupby flag/status, exact-int
    money sums (ExecuteSQL / Aggregate analog)."""
    from datetime import datetime

    li = _read(
        sf_dir,
        "lineitem",
        [
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )
    li = filter_batches(
        li, lambda t: pc.less_equal(t["l_shipdate"], pa.scalar(datetime(1998, 9, 2)))
    )

    def prep(t: pa.Table) -> pa.Table:
        base_c = _cents(t["l_extendedprice"])
        disc_c = _cents(t["l_discount"])  # 0.00-0.10 → 0-10 (scale 100)
        disc_e4 = pc.multiply(base_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": pc.cast(t["l_quantity"], pa.int64()),
                "base_cents": base_c,
                "disc_e4": disc_e4,
            }
        )

    g = li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    out = g.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty", alias_name="sum_qty"),
        Sum("base_cents", alias_name="sum_base_cents"),
        Sum("disc_e4", alias_name="sum_disc_e4"),
        Count(alias_name="n_rows"),
    )
    return out.map_batches(
        lambda t: t.append_column(
            "avg_qty", pc.divide(pc.cast(t["sum_qty"], pa.float64()), pc.cast(t["n_rows"], pa.float64()))
        ),
        batch_format="pyarrow",
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_e4,
       COUNT(*) AS n_rows,
       SUM(CAST(l_quantity AS BIGINT))::DOUBLE / COUNT(*)::DOUBLE AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def filter_project_revenue(sf_dir: str):
    """Vectorized filter + computed projection (AttributeFilters + Derive)."""
    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"],
    )
    li = filter_batches(
        li,
        lambda t: pc.and_(
            pc.greater(t["l_quantity"], 45.0), pc.less(t["l_discount"], 0.05)
        ),
    )

    def proj(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            _cents(t["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(t["l_discount"])),
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "revenue_e4": rev,
            }
        )

    return li.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)


FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(l_extendedprice * 100) AS BIGINT)
       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS revenue_e4
FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05
"""


def count_distinct_parts_per_supplier(sf_dir: str):
    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])
    return li.groupby("l_suppkey").aggregate(CountDistinct("l_partkey", "n_parts"))


COUNT_DISTINCT_SQL = (
    "SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts "
    "FROM lineitem GROUP BY l_suppkey"
)


# ------------------------------------------------------------ joins


def join_orders_customers(sf_dir: str):
    """Broadcast join (customer is the small side) + grouped exact sums."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    j = broadcast_join(
        orders, cust, on="o_custkey", right_on="c_custkey", how="inner"
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "total_cents": _cents(t["o_totalprice"]),
            }
        )

    g = j.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return g.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"), Sum("total_cents", alias_name="sum_total_cents")
    )


JOIN_ORDERS_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def hash_join_supplier_nation(sf_dir: str):
    """Supplier ⋈ nation.  The 25-row nation side is broadcast (ray.put
    once, merged inside every supplier block) — a hash shuffle for a
    dimension table this small moves every supplier row for nothing
    (VERDICT r2 'What's wrong' #7); the shuffle-join code path keeps its
    coverage from the larger joins (degree/pagerank/semi fallbacks)."""
    from ..stages.join import broadcast_join

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    j = broadcast_join(sup, nat, on=["s_nationkey"], right_on=["n_nationkey"])
    return j.map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": t["s_suppkey"],
                "n_name": t["n_name"],
                "acctbal_cents": _cents(t["s_acctbal"]),
            }
        ),
        batch_format="pyarrow",
    )


HASH_JOIN_SQL = """
SELECT s_suppkey, n_name, CAST(ROUND(s_acctbal * 100) AS BIGINT) AS acctbal_cents
FROM supplier JOIN nation ON s_nationkey = n_nationkey
"""


def semi_join_building_orders(sf_dir: str):
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    keys = filter_batches(
        cust, lambda t: pc.equal(t["c_mktsegment"], "BUILDING")
    ).select_columns(["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    out = semi_join(orders, keys, on="o_custkey", key_col="c_custkey")
    return out.map_batches(
        lambda t: pa.table(
            {"o_orderkey": t["o_orderkey"], "total_cents": _cents(t["o_totalprice"])}
        ),
        batch_format="pyarrow",
    )


SEMI_JOIN_SQL = """
SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
FROM orders WHERE o_custkey IN
  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


def anti_join_customers_without_orders(sf_dir: str):
    """Customers with no big-ticket order (threshold keeps the result
    non-empty on the dense synthetic data)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    big = filter_batches(
        orders, lambda t: pc.greater(t["o_totalprice"], 300000.0)
    ).select_columns(["o_custkey"])
    return anti_join(cust, big, on="c_custkey", key_col="o_custkey")


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
"""


# ------------------------------------------------- aggregation / stats


def top_brands(sf_dir: str):
    return top_values(_read(sf_dir, "part", ["p_brand"]), "p_brand", 5)


TOP_BRANDS_SQL = """
SELECT p_brand, COUNT(*) AS cnt FROM part GROUP BY p_brand
ORDER BY cnt DESC, p_brand ASC LIMIT 5
"""


def histogram_acctbal(sf_dir: str):
    cust = _read(sf_dir, "customer", ["c_acctbal"])
    b = bucket_double(cust, "c_acctbal", -1000.0, 10000.0, 11, out="bucket")
    return b.groupby("bucket").aggregate(Count(alias_name="n"))


HISTOGRAM_SQL = """
SELECT LEAST(GREATEST(CAST(FLOOR((c_acctbal - (-1000.0)) / 1000.0) AS BIGINT), 0), 10)
         AS bucket,
       COUNT(*) AS n
FROM customer GROUP BY 1
"""


def ranking_customers(sf_dir: str):
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    r = ranking(cust, ["c_acctbal", "c_custkey"], out="rank", descending=[True, False])
    return r.map_batches(
        lambda t: t.append_column("rank64", pc.cast(t["rank"], pa.int64())).drop_columns(
            ["rank", "c_acctbal"]
        ),
        batch_format="pyarrow",
    )


RANKING_SQL = """
SELECT c_custkey,
       ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS rank64
FROM customer
"""


def sort_limit_orders(sf_dir: str):
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    top = orders.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)
    return top.map_batches(
        lambda t: pa.table(
            {"o_orderkey": t["o_orderkey"], "total_cents": _cents(t["o_totalprice"])}
        ),
        batch_format="pyarrow",
    )


SORT_LIMIT_SQL = """
SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def distinct_segments(sf_dir: str):
    cust = _read(sf_dir, "customer", ["c_mktsegment"])
    return cust.groupby("c_mktsegment").aggregate(Count(alias_name="_n")).select_columns(
        ["c_mktsegment"]
    )


DISTINCT_SQL = "SELECT DISTINCT c_mktsegment FROM customer"


def union_entity_keys(sf_dir: str):
    """VertexSetUnion analog: customer ∪ supplier key spaces (distinct)."""
    c = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda t: t.rename_columns(["id"]), batch_format="pyarrow"
    )
    s = _read(sf_dir, "supplier", ["s_suppkey"]).map_batches(
        lambda t: t.rename_columns(["id"]), batch_format="pyarrow"
    )
    return c.union(s).groupby("id").aggregate(Count(alias_name="_n")).select_columns(["id"])


UNION_SQL = (
    "SELECT c_custkey AS id FROM customer UNION SELECT s_suppkey AS id FROM supplier"
)


def merge_by_segment(sf_dir: str):
    """MergeVertices.scala:36-75 analog with the pinned deterministic
    representative = min id."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    return cust.groupby("c_mktsegment").aggregate(
        Min("c_custkey", alias_name="representative"),
        Count(alias_name="size"),
    )


MERGE_SQL = """
SELECT c_mktsegment, MIN(c_custkey) AS representative, COUNT(*) AS size
FROM customer GROUP BY c_mktsegment
"""


def global_stats_acctbal(sf_dir: str):
    cust = _read(sf_dir, "customer", ["c_acctbal"])
    row = cust.aggregate(
        Count(on="c_acctbal", alias_name="n"),
        Min("c_acctbal", alias_name="min_bal"),
        Max("c_acctbal", alias_name="max_bal"),
        Mean("c_acctbal", alias_name="mean_bal"),
        Std("c_acctbal", alias_name="std_bal"),
    )
    return pa.table(
        {
            "n": pa.array([row["n"]], pa.int64()),
            "min_bal": pa.array([row["min_bal"]], pa.float64()),
            "max_bal": pa.array([row["max_bal"]], pa.float64()),
            "mean_bal": pa.array([round(row["mean_bal"], 4)], pa.float64()),
            "std_bal": pa.array([round(row["std_bal"], 4)], pa.float64()),
        }
    )


GLOBAL_STATS_SQL = """
SELECT COUNT(c_acctbal) AS n, MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
       ROUND(AVG(c_acctbal), 4) AS mean_bal, ROUND(STDDEV_SAMP(c_acctbal), 4) AS std_bal
FROM customer
"""


def weighted_avg_price(sf_dir: str):
    part = _read(sf_dir, "part", ["p_brand", "p_retailprice", "p_size"])
    part = part.map_batches(
        lambda t: t.append_column("w", pc.cast(t["p_size"], pa.float64())),
        batch_format="pyarrow",
    )
    out = weighted_average(part, "p_brand", "p_retailprice", "w", out="wavg")
    return out.map_batches(
        lambda t: pa.table(
            {"p_brand": t["p_brand"], "wavg": pc.round(t["wavg"], ndigits=4)}
        ),
        batch_format="pyarrow",
    )


WEIGHTED_AVG_SQL = """
SELECT p_brand,
       ROUND(SUM(p_retailprice * p_size::DOUBLE) / SUM(p_size::DOUBLE), 4) AS wavg
FROM part GROUP BY p_brand
"""


def weighted_sum_price(sf_dir: str):
    """WeightedSum (Aggregate.scala:316-560): per brand Σ(price·size),
    integerized to cents so both sides sum exact int64."""
    from ..functions.aggregates import weighted_sum

    part = _read(sf_dir, "part", ["p_brand", "p_retailprice", "p_size"])
    part = part.map_batches(
        lambda t: pa.table(
            {"p_brand": t["p_brand"], "cents": _cents(t["p_retailprice"]),
             "w": pc.cast(t["p_size"], pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return weighted_sum(part, "p_brand", "cents", "w", out="wsum_cents")


WEIGHTED_SUM_SQL = """
SELECT p_brand,
       CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)
                * CAST(p_size AS BIGINT)) AS BIGINT) AS wsum_cents
FROM part GROUP BY p_brand
"""


def most_common_priority(sf_dir: str):
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    j = broadcast_join(orders, cust, on="o_custkey", right_on="c_custkey")
    return j.groupby("c_mktsegment").aggregate(
        MostCommon("o_orderpriority", "top_priority")
    )


MOST_COMMON_SQL = """
SELECT c_mktsegment, top_priority FROM (
  SELECT c_mktsegment, o_orderpriority AS top_priority,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY COUNT(*) DESC, o_orderpriority ASC) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, o_orderpriority
) WHERE rn = 1
"""


def max_by_priority(sf_dir: str):
    """MaxBy(Double) (Aggregate.scala:316-560): per customer, the priority
    of their highest-total order (pinned tie-break: equal total → smallest
    priority string)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority", "o_totalprice"])
    return max_by(
        orders, "o_custkey", "o_orderpriority", "o_totalprice", out="best_priority"
    )


MAX_BY_SQL = """
SELECT o_custkey, best_priority FROM (
  SELECT o_custkey, o_orderpriority AS best_priority,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderpriority ASC) AS rn
  FROM orders
) WHERE rn = 1
"""


def count_most_common_priority(sf_dir: str):
    """CountMostCommon (Aggregate.scala:316-560): the modal priority's
    multiplicity per market segment."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    j = broadcast_join(orders, cust, on="o_custkey", right_on="c_custkey")
    return j.groupby("c_mktsegment").aggregate(
        CountMostCommon("o_orderpriority", alias_name="mode_count")
    )


COUNT_MOST_COMMON_SQL = """
SELECT c_mktsegment, MAX(cnt) AS mode_count FROM (
  SELECT c_mktsegment, COUNT(*) AS cnt
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, o_orderpriority
) GROUP BY c_mktsegment
"""


def quantity_vector(sf_dir: str):
    """AsVector (Aggregate.scala:316-560): per order, the integer
    quantities of its lineitems in linenumber order (duplicates kept —
    the ordered sibling of order_part_sets' AsSet)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity", "l_linenumber"])
    ints = li.map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "q": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
                "l_linenumber": t["l_linenumber"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return as_vector(ints, "l_orderkey", "q", "l_linenumber", out="quantities")


# l_linenumber is non-unique in the synthetic data, so the order-by needs
# the same pinned tie-break as as_vector: value-as-string ASC.
QUANTITY_VECTOR_SQL = """
SELECT l_orderkey,
       string_agg(q, ',' ORDER BY l_linenumber, q) AS quantities
FROM (SELECT l_orderkey, l_linenumber,
             CAST(CAST(ROUND(l_quantity) AS BIGINT) AS VARCHAR) AS q
      FROM lineitem)
GROUP BY l_orderkey
"""


def min_positive_acctbal(sf_dir: str):
    """ComputeMinMaxMinPositive (BasicStats.scala:29-282): per segment min /
    max / smallest-positive account balance in one pass (the reference uses
    it to plan log-scale histogram axes)."""
    cust = _read(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])
    return min_max_min_positive(cust, "c_mktsegment", "c_acctbal")


MIN_POSITIVE_SQL = """
SELECT c_mktsegment,
       MIN(c_acctbal) AS min_val,
       MAX(c_acctbal) AS max_val,
       MIN(CASE WHEN c_acctbal > 0 THEN c_acctbal END) AS min_positive
FROM customer GROUP BY c_mktsegment
"""


def hash_supplier_names(sf_dir: str):
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    return hash_column(sup, "s_name", salt="s1", out="name_hash").select_columns(
        ["s_suppkey", "name_hash"]
    )


HASH_SQL = "SELECT s_suppkey, sha256('s1' || s_name) AS name_hash FROM supplier"


def convert_floor_total(sf_dir: str):
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return orders.map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "total_floor": pc.cast(pc.floor(t["o_totalprice"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


CONVERT_SQL = (
    "SELECT o_orderkey, CAST(FLOOR(o_totalprice) AS BIGINT) AS total_floor FROM orders"
)


# ------------------------------------------------------------- events


def events_tumbling_hour(sf_dir: str):
    """Tumbling 1-hour window per user (streaming-shaped workload on the
    ordered log — SURVEY §2.10: batch semantics, window = truncated ts)."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def win(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "window_start": pc.cast(
                    pc.floor_temporal(t["ts"], unit="hour"), pa.timestamp("us")
                ),
                "value_cents": _cents(t["value"]),
            }
        )

    g = ev.map_batches(win, batch_format="pyarrow", zero_copy_batch=True)
    agg = g.groupby(["user_id", "window_start"]).aggregate(
        Count(alias_name="n_events"), Sum("value_cents", alias_name="sum_value_cents")
    )
    # Ray's shuffle may narrow the timestamp unit; pin [us] to match DuckDB.
    return agg.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("window_start"),
            "window_start",
            pc.cast(t["window_start"], pa.timestamp("us")),
        ),
        batch_format="pyarrow",
    )


EVENTS_TUMBLING_SQL = """
SELECT user_id, date_trunc('hour', ts) AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1, 2
"""


def event_type_stats(sf_dir: str):
    ev = _read(sf_dir, "events", ["event_type", "value"])
    ev = ev.map_batches(
        lambda t: pa.table(
            {"event_type": t["event_type"], "value_cents": _cents(t["value"])}
        ),
        batch_format="pyarrow",
    )
    return ev.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Sum("value_cents", alias_name="sum_cents"),
        Max("value_cents", alias_name="max_cents"),
    )


def median_quantity(sf_dir: str):
    """Median (Quantile aggregator, linear interpolation — parity with
    DuckDB quantile_cont verified)."""
    from ray.data.aggregate import Quantile

    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    return li.groupby("l_returnflag").aggregate(
        Quantile("l_quantity", q=0.5, alias_name="median_qty")
    )


MEDIAN_SQL = """
SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty
FROM lineitem GROUP BY l_returnflag
"""


def events_sessionize(sf_dir: str, gap_minutes: int = 30):
    """Session windows over the event log: a session breaks when the gap to
    the previous event of the same user exceeds ``gap_minutes``.  Key
    shuffle by user (sessions are user-local), then a vectorized per-block
    lag/cumsum — no per-row or per-group Python (SURVEY §2.10 pattern:
    ordered log + partition-local windowing)."""
    from ..stages.shuffle import hash_partition

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    part = hash_partition(ev, ["user_id"])
    gap_us = gap_minutes * 60 * 1_000_000

    def sessions(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "sum_value_cents": pa.array([], pa.int64()),
                    "session_start": pa.array([], pa.timestamp("us")),
                }
            )
        u = t.column("user_id").to_numpy()
        ts = t.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = (
            pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((ts, u))
        u, ts, cents = u[order], ts[order], cents[order]
        new_user = np.empty(len(u), dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        gap_break = np.empty(len(u), dtype=bool)
        gap_break[0] = True
        gap_break[1:] = (ts[1:] - ts[:-1]) > gap_us
        brk = new_user | gap_break
        # session_id = per-user 0-based running session counter
        sess_global = np.cumsum(brk) - 1
        starts = np.flatnonzero(brk)
        counts = np.diff(np.append(starts, len(u)))
        user_first = u[starts]
        # per-user renumbering of global session indices
        first_of_user = np.empty(len(starts), dtype=bool)
        first_of_user[0] = True
        first_of_user[1:] = user_first[1:] != user_first[:-1]
        user_sess_base = np.maximum.accumulate(
            np.where(first_of_user, np.arange(len(starts)), 0)
        )
        session_id = np.arange(len(starts)) - user_sess_base
        n_events = counts
        sum_cents = np.add.reduceat(cents, starts)
        return pa.table(
            {
                "user_id": user_first,
                "session_id": session_id.astype(np.int64),
                "n_events": n_events.astype(np.int64),
                "sum_value_cents": sum_cents.astype(np.int64),
                "session_start": ts[starts].astype("datetime64[us]"),
            }
        )

    return part.map_batches(sessions, batch_format="pyarrow", zero_copy_batch=True)


SESSIONIZE_SQL = """
WITH ordered AS (
  SELECT user_id, ts, CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM events
),
tagged AS (
  SELECT user_id, ts, cents,
         CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
  FROM ordered
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_value_cents,
       MIN(ts) AS session_start
FROM tagged GROUP BY user_id, session_id
"""


EVENT_TYPE_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       MAX(CAST(ROUND(value * 100) AS BIGINT)) AS max_cents
FROM events GROUP BY event_type
"""


def events_asof_click(sf_dir: str):
    """Backward as-of join over the event log: for each purchase, the
    user's most recent click at-or-before it (ties: larger click id)."""
    from ..stages.join import asof_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    purchases = filter_batches(
        ev, lambda t: pc.equal(t["event_type"], "purchase")
    ).select_columns(["event_id", "user_id", "ts"])
    clicks = filter_batches(
        ev, lambda t: pc.equal(t["event_type"], "click")
    ).select_columns(["event_id", "user_id", "ts"])
    j = asof_join(
        purchases, clicks, by="user_id", on="ts",
        right_cols=["event_id"], right_tie="event_id", prefix="click_",
    )
    return j.map_batches(
        lambda t: pa.table(
            {"event_id": t["event_id"], "click_id": t["click_event_id"]}
        ),
        batch_format="pyarrow",
    )


ASOF_CLICK_SQL = """
SELECT event_id, click_id FROM (
  SELECT p.event_id, c.event_id AS click_id,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id AND c.ts <= p.ts
) WHERE rn = 1
"""


# ------------------------------------------------ time-banded windows / joins
# Shared kernel for the sliding-window aggregate and the banded range
# self-join: after a key shuffle by user, each block holds complete users;
# lexsort by (user, ts) and fold the pair into ONE monotone int64 axis
# (rel_ts + segment * span with span > rel_range + band) so a single
# np.searchsorted resolves every row's window bounds without crossing user
# boundaries — no per-user Python loop, no window ever reaching a
# neighboring segment (the +band headroom in `span` guarantees it).


def _user_time_axis(u: np.ndarray, ts_us: np.ndarray, band_us: int):
    """Returns (order, comp) — the lexsort permutation by (u, ts) and the
    folded monotone composite axis.  Falls back to per-segment offsets only
    if the fold would overflow int64 (≈ never: span·users < 2^62)."""
    order = np.lexsort((ts_us, u))
    us, tss = u[order], ts_us[order]
    seg = np.zeros(len(us), dtype=np.int64)
    if len(us) > 1:
        seg[1:] = np.cumsum(us[1:] != us[:-1])
    rel = tss - tss.min()
    span = int(rel.max()) + band_us + 1
    if span * (int(seg[-1]) + 1) >= (1 << 62):  # pragma: no cover
        raise OverflowError("time axis fold overflows int64; rebase timestamps")
    return order, rel + seg * span


def events_sliding_window(sf_dir: str, window_minutes: int = 60):
    """Per event: count and value-sum of the same user's events in the
    trailing window [ts − window, ts] — the RANGE-window rolling aggregate
    (peers at the same ts included, matching SQL RANGE ... CURRENT ROW).
    One key shuffle by user, then per-block vectorized searchsorted over
    the folded (user, ts) axis + prefix sums; no per-row or per-user
    Python.  At cluster scale each block is one user hash range — the same
    partitioning contract as sessionize/asof."""
    from ..stages.shuffle import hash_partition

    band = window_minutes * 60 * 1_000_000
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    part = hash_partition(ev, ["user_id"])

    def win(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "n_window": pa.array([], pa.int64()),
                    "sum_window_cents": pa.array([], pa.int64()),
                }
            )
        u = t.column("user_id").to_numpy()
        ts = t.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = _cents(t["value"]).to_numpy(zero_copy_only=False)
        ids = t.column("event_id").to_numpy()
        order, comp = _user_time_axis(u, ts, band)
        cents = cents[order]
        lo = np.searchsorted(comp, comp - band, side="left")
        hi = np.searchsorted(comp, comp, side="right")
        prefix = np.concatenate(([0], np.cumsum(cents)))
        return pa.table(
            {
                "event_id": ids[order],
                "n_window": (hi - lo).astype(np.int64),
                "sum_window_cents": prefix[hi] - prefix[lo],
            }
        )

    return part.map_batches(win, batch_format="pyarrow", zero_copy_batch=True)


SLIDING_WINDOW_SQL = """
SELECT event_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)
           AS sum_window_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def events_followup_count(sf_dir: str, band_minutes: int = 5):
    """Banded range self-join: for every click, how many same-user events
    (any type) land strictly after it within `band_minutes` — the bounded
    non-equi join (LEFT semantics: clicks with no follow-up count 0).
    Same folded-axis kernel as the sliding window; the band bound is what
    keeps the join linear instead of quadratic."""
    from ..stages.shuffle import hash_partition

    band = band_minutes * 60 * 1_000_000
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    part = hash_partition(ev, ["user_id"])

    def followups(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "n_followups": pa.array([], pa.int64()),
                }
            )
        u = t.column("user_id").to_numpy()
        ts = t.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        ids = t.column("event_id").to_numpy()
        is_click = pc.equal(t["event_type"], "click").to_numpy(zero_copy_only=False)
        order, comp = _user_time_axis(u, ts, band)
        click_pos = np.flatnonzero(is_click[order])
        lo = np.searchsorted(comp, comp[click_pos], side="right")
        hi = np.searchsorted(comp, comp[click_pos] + band, side="right")
        return pa.table(
            {
                "event_id": ids[order][click_pos],
                "n_followups": (hi - lo).astype(np.int64),
            }
        )

    return part.map_batches(followups, batch_format="pyarrow", zero_copy_batch=True)


FOLLOWUP_SQL = """
SELECT p.event_id, CAST(COUNT(e2.event_id) AS BIGINT) AS n_followups
FROM events p
LEFT JOIN events e2
  ON e2.user_id = p.user_id
 AND e2.ts > p.ts AND e2.ts <= p.ts + INTERVAL 5 MINUTE
WHERE p.event_type = 'click'
GROUP BY p.event_id
"""


def corr_qty_price(sf_dir: str):
    """Sample correlation of quantity vs extended price per return flag —
    the Corr/Covar aggregate family via the five per-block moment partials
    (n, Σx, Σy, Σxy, Σx², Σy²); Ray's hash aggregate combines partials
    map-side, the finalize runs over the tiny grouped table."""
    from ..util import round_away

    li = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        x = pc.cast(t["l_quantity"], pa.float64())
        y = pc.cast(t["l_extendedprice"], pa.float64())
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "x": x,
                "y": y,
                "xy": pc.multiply(x, y),
                "xx": pc.multiply(x, x),
                "yy": pc.multiply(y, y),
            }
        )

    g = li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    agg = g.groupby("l_returnflag").aggregate(
        Count(alias_name="n"),
        Sum("x", alias_name="sx"),
        Sum("y", alias_name="sy"),
        Sum("xy", alias_name="sxy"),
        Sum("xx", alias_name="sxx"),
        Sum("yy", alias_name="syy"),
    )

    def fin(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy().astype(np.float64)
        sx = t.column("sx").to_numpy()
        sy = t.column("sy").to_numpy()
        sxy = t.column("sxy").to_numpy()
        sxx = t.column("sxx").to_numpy()
        syy = t.column("syy").to_numpy()
        r = (n * sxy - sx * sy) / np.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "corr_qty_price": round_away(r, 6),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


CORR_SQL = """
SELECT l_returnflag,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
FROM lineitem GROUP BY l_returnflag
"""

def event_lag(sf_dir: str):
    """Per event: microseconds since the same user's previous event (the
    LAG window function; first event of a user → -1 sentinel so the column
    stays non-null int64 for the hash gate).  One key shuffle by user, then
    a per-block lexsort + vectorized diff — the partition-local window
    pattern shared with sessionize (reference SQL surface: LAG OVER
    PARTITION BY, ExecuteSQL analog)."""
    from ..stages.shuffle import hash_partition

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    part = hash_partition(ev, ["user_id"])

    def lag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "gap_us": pa.array([], pa.int64()),
                }
            )
        u = t.column("user_id").to_numpy()
        ts = t.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        ids = t.column("event_id").to_numpy()
        order = np.lexsort((ids, ts, u))
        u, ts, ids = u[order], ts[order], ids[order]
        gap = np.empty(len(u), dtype=np.int64)
        gap[0] = -1
        gap[1:] = np.where(u[1:] == u[:-1], ts[1:] - ts[:-1], -1)
        return pa.table({"event_id": ids, "gap_us": gap})

    return part.map_batches(lag, batch_format="pyarrow", zero_copy_batch=True)


EVENT_LAG_SQL = """
SELECT event_id,
       CAST(COALESCE(date_diff('microsecond',
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts),
           -1) AS BIGINT) AS gap_us
FROM events
"""


def cumulative_revenue(sf_dir: str):
    """Per order: running total-price sum (exact cents) of the same
    customer's orders up to and including this one, ordered by
    (o_orderdate, o_orderkey) — the cumulative / prefix-sum window
    aggregate (SUM OVER ROWS UNBOUNDED PRECEDING).  Key shuffle by
    customer, then per-block lexsort + one segmented cumsum."""
    from ..stages.shuffle import hash_partition

    o = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    part = hash_partition(o, ["o_custkey"])

    def cum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "cum_revenue_cents": pa.array([], pa.int64()),
                }
            )
        c = t.column("o_custkey").to_numpy()
        d = t.column("o_orderdate").to_numpy().astype("datetime64[us]").astype(np.int64)
        k = t.column("o_orderkey").to_numpy()
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        order = np.lexsort((k, d, c))
        c, k, cents = c[order], k[order], cents[order]
        cs = np.cumsum(cents)
        brk = np.empty(len(c), dtype=bool)
        brk[0] = True
        brk[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(brk)
        counts = np.diff(np.append(starts, len(c)))
        base = np.repeat(cs[starts] - cents[starts], counts)
        return pa.table(
            {
                "o_orderkey": k,
                "cum_revenue_cents": (cs - base).astype(np.int64),
            }
        )

    return part.map_batches(cum, batch_format="pyarrow", zero_copy_batch=True)


CUMULATIVE_REVENUE_SQL = """
SELECT o_orderkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_revenue_cents
FROM orders
"""


def pivot_order_counts(sf_dir: str):
    """Pivot / crosstab: order counts per priority, spread over status
    columns (n_open / n_fulfilled / n_partial) — the indicator-column
    pattern: per-batch 0/1 casts, then ONE hash aggregate of sums, no
    per-status passes."""
    o = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])

    def prep(t: pa.Table) -> pa.Table:
        s = t["o_orderstatus"]
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "o": pc.cast(pc.equal(s, "O"), pa.int64()),
                "f": pc.cast(pc.equal(s, "F"), pa.int64()),
                "p": pc.cast(pc.equal(s, "P"), pa.int64()),
            }
        )

    g = o.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    agg = g.groupby("o_orderpriority").aggregate(
        Sum("o", alias_name="n_open"),
        Sum("f", alias_name="n_fulfilled"),
        Sum("p", alias_name="n_partial"),
        Count(alias_name="n_total"),
    )
    return agg


PIVOT_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_fulfilled,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial,
       CAST(COUNT(*) AS BIGINT) AS n_total
FROM orders GROUP BY o_orderpriority
"""


def grouped_quantile(sf_dir: str):
    """Exact per-group quantiles (p50 / p90 of event value per event type,
    linear interpolation — quantile_cont semantics).  Key shuffle by type
    makes each group block-complete, then one in-block sort serves every
    quantile; groups are few, values are many (the regime where exact
    beats a sketch — see sampled_histogram for the opposite regime)."""
    from ..stages.shuffle import hash_partition
    from ..util import round_away

    ev = _read(sf_dir, "events", ["event_type", "value"])
    part = hash_partition(ev, ["event_type"])

    def quant(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "p50_value": pa.array([], pa.float64()),
                    "p90_value": pa.array([], pa.float64()),
                }
            )
        types = t.column("event_type").to_numpy(zero_copy_only=False)
        vals = t.column("value").to_numpy()
        order = np.argsort(types, kind="stable")
        types, vals = types[order], vals[order]
        brk = np.empty(len(types), dtype=bool)
        brk[0] = True
        brk[1:] = types[1:] != types[:-1]
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(types))
        out_t, p50, p90 = [], [], []
        for s, e in zip(starts, ends):  # loop over groups, not rows
            g = np.sort(vals[s:e])
            out_t.append(types[s])
            p50.append(_quantile_cont(g, 0.5))
            p90.append(_quantile_cont(g, 0.9))
        return pa.table(
            {
                "event_type": pa.array(out_t, type=pa.string()),
                "p50_value": round_away(np.asarray(p50), 6),
                "p90_value": round_away(np.asarray(p90), 6),
            }
        )

    return part.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True)


def _quantile_cont(sorted_vals: np.ndarray, q: float) -> float:
    """quantile_cont / np.quantile 'linear': h = (n-1)q, interpolate
    between floor(h) and ceil(h).  Spelled out so the oracle contract is
    explicit rather than delegated to np.quantile version behavior."""
    n = len(sorted_vals)
    h = (n - 1) * q
    lo = int(np.floor(h))
    hi = int(np.ceil(h))
    frac = h - lo
    return float(sorted_vals[lo] * (1.0 - frac) + sorted_vals[hi] * frac)


GROUPED_QUANTILE_SQL = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50_value,
       ROUND(quantile_cont(value, 0.9), 6) AS p90_value
FROM events GROUP BY event_type
"""


# Per-stratum keep-thresholds on the 32-bit Knuth-hash ring: AUTOMOBILE 20%,
# BUILDING 10%, everything else 5% (floor(frac * 2^32), pinned integers so
# the SQL oracle and the numpy filter compare the exact same values).
_STRATA_THRESHOLDS = {"AUTOMOBILE": 858993459, "BUILDING": 429496729}
_STRATA_DEFAULT = 214748364


def stratified_sample_customers(sf_dir: str):
    """Deterministic stratified sampling: keep a per-segment fraction of
    customers chosen by a Knuth multiplicative hash of the key — the
    SQL-expressible cousin of AddRandomAttribute + VertexAttributeFilter
    (same rule on both sides, so the sample is oracle-checkable and stable
    across runs/partitionings, unlike rand()).  Pure per-batch filter: no
    shuffle, no state."""
    c = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def samp(t: pa.Table) -> pa.Table:
        k = t.column("c_custkey").to_numpy().astype(np.uint64)
        h = (k * np.uint64(2654435761)) % np.uint64(4294967296)
        seg = t.column("c_mktsegment").to_numpy(zero_copy_only=False)
        thr = np.full(len(k), _STRATA_DEFAULT, dtype=np.uint64)
        for name, v in _STRATA_THRESHOLDS.items():
            thr[seg == name] = v
        return t.filter(pa.array(h < thr))

    return c.map_batches(samp, batch_format="pyarrow", zero_copy_batch=True)


STRATIFIED_SAMPLE_SQL = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE (c_custkey * 2654435761) % 4294967296 <
      CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 858993459
                        WHEN 'BUILDING'   THEN 429496729
                        ELSE 214748364 END
"""


def events_top3_per_user(sf_dir: str):
    """Grouped top-k: each user's 3 highest-value events (ties pinned by
    event_id).  ONE key shuffle by user, then a per-block lexsort +
    vectorized within-group ranking — the per-group ComputeTopValues
    (global top-k is `top_values`; this is its PARTITION BY cousin)."""
    from ..stages.shuffle import hash_partition

    ev = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    part = hash_partition(ev, ["user_id"])

    def topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "value": pa.array([], pa.float64()),
                }
            )
        u = t.column("user_id").to_numpy()
        v = t.column("value").to_numpy()
        ids = t.column("event_id").to_numpy()
        order = np.lexsort((ids, -v, u))
        u, v, ids = u[order], v[order], ids[order]
        brk = np.empty(len(u), dtype=bool)
        brk[0] = True
        brk[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(brk)
        counts = np.diff(np.append(starts, len(u)))
        rank = np.arange(len(u)) - np.repeat(starts, counts)
        keep = rank < 3
        return pa.table({"user_id": u[keep], "event_id": ids[keep], "value": v[keep]})

    return part.map_batches(topk, batch_format="pyarrow", zero_copy_batch=True)


TOP3_PER_USER_SQL = """
SELECT user_id, event_id, value FROM (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rk
  FROM events
) WHERE rk <= 3
"""


def activity_vs_orders(sf_dir: str):
    """FULL OUTER join of two aggregates over DIFFERENT tables on a shared
    key domain (event user ids vs order customer keys): per key, event
    count and order count, zero-filled on the unmatched sides — the
    outer-join surface (hash_join how='outer') exercised end-to-end."""
    from ..stages.join import hash_join

    ev = (
        _read(sf_dir, "events", ["user_id"])
        .groupby("user_id")
        .aggregate(Count(alias_name="n_events"))
        .map_batches(
            lambda t: t.rename_columns(["k", "n_events"]), batch_format="pyarrow"
        )
    )
    orders = (
        _read(sf_dir, "orders", ["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_orders"))
        .map_batches(
            lambda t: t.rename_columns(["k", "n_orders"]), batch_format="pyarrow"
        )
    )
    j = hash_join(ev, orders, on="k", how="outer")

    def fill(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": t["k"],
                "n_events": pc.fill_null(t["n_events"], 0),
                "n_orders": pc.fill_null(t["n_orders"], 0),
            }
        )

    return j.map_batches(fill, batch_format="pyarrow")


ACTIVITY_VS_ORDERS_SQL = """
WITH e AS (SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n_events
           FROM events GROUP BY 1),
o AS (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1)
SELECT k, COALESCE(n_events, 0) AS n_events, COALESCE(n_orders, 0) AS n_orders
FROM e FULL OUTER JOIN o USING (k)
"""


def events_funnel(sf_dir: str):
    """Greedy per-user funnel view → click → purchase: depth 1 if the user
    ever viewed, 2 if a click follows the FIRST view, 3 if a purchase
    follows that first qualifying click (the standard event-analytics
    funnel semantics — each stage anchors at the earliest qualifying
    event).  One key shuffle by user; per block the three stages are
    grouped mins via lexsort + minimum.reduceat with masked candidates —
    no per-user Python."""
    from ..stages.shuffle import hash_partition

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    part = hash_partition(ev, ["user_id"])
    INF = np.iinfo(np.int64).max

    def stage_min(u_all, users, ts, mask):
        """min ts per user in `users` (sorted unique) over rows where mask
        holds; INF where no qualifying row."""
        vals = np.where(mask, ts, INF)
        order = np.argsort(u_all, kind="stable")
        us, vs = u_all[order], vals[order]
        brk = np.empty(len(us), dtype=bool)
        if len(us):
            brk[0] = True
            brk[1:] = us[1:] != us[:-1]
        starts = np.flatnonzero(brk)
        mins = np.minimum.reduceat(vs, starts) if len(starts) else np.empty(0, np.int64)
        out = np.full(len(users), INF, dtype=np.int64)
        pos = np.searchsorted(users, us[starts])
        out[pos] = mins
        return out

    def funnel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "funnel_depth": pa.array([], pa.int64()),
                }
            )
        u = t.column("user_id").to_numpy()
        ts = t.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        users = np.unique(u)
        t1 = stage_min(u, users, ts, et == "view")
        t1_of_row = t1[np.searchsorted(users, u)]
        t2 = stage_min(u, users, ts, (et == "click") & (ts > t1_of_row))
        t2_of_row = t2[np.searchsorted(users, u)]
        t3 = stage_min(u, users, ts, (et == "purchase") & (ts > t2_of_row))
        depth = (t1 < INF).astype(np.int64)
        depth += ((t2 < INF) & (t1 < INF)).astype(np.int64)
        depth += ((t3 < INF) & (t2 < INF)).astype(np.int64)
        keep = t1 < INF
        return pa.table(
            {"user_id": users[keep], "funnel_depth": depth[keep]}
        )

    return part.map_batches(funnel, batch_format="pyarrow", zero_copy_batch=True)


FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view'
  GROUP BY 1
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t1
  WHERE e.event_type = 'click' GROUP BY 1
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t2
  WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT s1.user_id,
       CAST(1 + CASE WHEN s2.user_id IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN s3.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS funnel_depth
FROM s1
LEFT JOIN s2 ON s2.user_id = s1.user_id
LEFT JOIN s3 ON s3.user_id = s1.user_id
"""


def cohort_retention(sf_dir: str):
    """Weekly cohort retention: cohort = Monday-truncated week of each
    user's first event; one row per (cohort, week_offset) with the count
    of distinct users from that cohort active in that week — the standard
    retention triangle.  One key shuffle by user (first-event and offsets
    are user-local), vectorized week math per block, then one tiny global
    count aggregate."""
    from ..stages.shuffle import grouped_aggregate, hash_partition

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    part = hash_partition(ev, ["user_id"])
    DAY_US = 86_400_000_000

    def weeks(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "cohort": pa.array([], pa.timestamp("us")),
                    "week_offset": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                }
            )
        u = t.column("user_id").to_numpy()
        ts = t.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        days = ts // DAY_US
        # 1970-01-01 was a Thursday (weekday 3 with Monday = 0)
        monday = days - (days + 3) % 7
        order = np.lexsort((monday, u))
        us, wk = u[order], monday[order]
        brk = np.empty(len(us), dtype=bool)
        brk[0] = True
        brk[1:] = us[1:] != us[:-1]
        starts = np.flatnonzero(brk)
        first_wk = np.repeat(wk[starts], np.diff(np.append(starts, len(us))))
        offset = (wk - first_wk) // 7
        # distinct (user, offset) within the block (users are block-local)
        key_brk = brk | np.concatenate(([True], offset[1:] != offset[:-1]))
        keep = key_brk
        cohort_us = (first_wk[keep] * DAY_US).astype("datetime64[us]")
        return pa.table(
            {
                "cohort": pa.array(cohort_us),
                "week_offset": offset[keep].astype(np.int64),
                "user_id": us[keep],
            }
        )

    rows = part.map_batches(weeks, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_aggregate(
        rows, ["cohort", "week_offset"], [("user_id", "count", "n_active")]
    )


COHORT_RETENTION_SQL = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort
  FROM events GROUP BY 1
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort,
         CAST(date_diff('day', CAST(f.cohort AS DATE),
                        date_trunc('week', e.ts)) / 7 AS BIGINT) AS week_offset
  FROM events e JOIN first f USING (user_id)
)
SELECT cohort, week_offset, CAST(COUNT(*) AS BIGINT) AS n_active
FROM activity GROUP BY 1, 2
"""


def q_json_props(sf_dir: str):
    """JSON metadata-blob extraction (stages/transform.json_fields) over
    the event log's props column — (event_id, event_type, k)."""
    from ..stages.transform import json_fields

    ev = _read(sf_dir, "events", ["event_id", "event_type", "props"])
    return json_fields(
        ev, "props", {"k": pa.int64()}, keep=["event_id", "event_type"]
    )


JSON_PROPS_SQL = """
SELECT event_id, event_type,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events
"""


def q_derive_sql(sf_dir: str):
    """Distributed per-batch SQL derivation (functions/sql.derive_sql) —
    row-local net-price expression over lineitem, evaluated by DuckDB
    inside the actor pool, never on the driver."""
    from ..functions.sql import derive_sql

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
    )
    return derive_sql(
        li,
        "SELECT l_orderkey, l_linenumber, "
        "ROUND(l_extendedprice * (1 - l_discount), 2) AS net FROM batch",
    )


DERIVE_SQL_SQL = """
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice * (1 - l_discount), 2) AS net
FROM lineitem
"""


def q_explode_embedding(sf_dir: str):
    """UNNEST/explode analog (stages/transform.explode) over the real
    list<float> embedding column — (vec_id, pos, value)."""
    from ..stages.transform import explode

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return explode(emb, "embedding", value_out="value", pos_col="pos")


EXPLODE_EMBEDDING_SQL = """
SELECT vec_id, unnest(range(len(embedding))) AS pos,
       unnest(embedding) AS value
FROM embeddings
"""


def q_unpivot_lineitem(sf_dir: str):
    """UNPIVOT/melt (stages/transform.unpivot): lineitem wide metrics →
    long (l_orderkey, l_linenumber, metric, val)."""
    from ..stages.transform import unpivot

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"],
    )
    return unpivot(li, ["l_orderkey", "l_linenumber"], ["l_quantity", "l_discount", "l_tax"])


UNPIVOT_SQL = """
UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
         FROM lineitem)
ON l_quantity, l_discount, l_tax INTO NAME metric VALUE val
"""


def q_approx_quantiles(sf_dir: str):
    """Histogram-sketch quantiles of l_extendedprice.  SQL-oracled since
    r5: the two-pass sketch is deterministic (min/max + fixed-width
    binning + linear interpolation), so the oracle replays the identical
    float64 arithmetic; pytest additionally pins the one-bin-width error
    bound against the exact sort-based quantile."""
    from ..functions.aggregates import approx_quantiles
    from ..util import round_away

    li = _read(sf_dir, "lineitem", ["l_extendedprice"])
    got = approx_quantiles(li, "l_extendedprice", [0.25, 0.5, 0.75, 0.95])
    qs = sorted(got)
    return pa.table(
        {
            "q": pa.array(qs, pa.float64()),
            "value": pa.array(
                round_away(np.array([got[q] for q in qs]), 6), pa.float64()
            ),
        }
    )


def _approx_quantiles_sql(
    table: str, col: str, qs: list[float], bins: int = 8192
) -> str:
    """Literal SQL replay of aggregates.approx_quantiles: same width
    ((hi-lo)/bins), same truncating bin cast, same searchsorted-left bin
    pick over the cumulative histogram (empty bins are never picked for
    q > 0 — cum doesn't increase there), same clipped interpolation."""
    q_values = ", ".join(f"({q}::DOUBLE)" for q in qs)
    return f"""
WITH st AS MATERIALIZED (
  SELECT MIN({col})::DOUBLE AS lo, MAX({col})::DOUBLE AS hi,
         COUNT({col})::DOUBLE AS total,
         (MAX({col})::DOUBLE - MIN({col})::DOUBLE) / {bins}.0 AS w
  FROM {table}
),
hist AS MATERIALIZED (
  SELECT b, cnt, SUM(cnt) OVER (ORDER BY b) AS cum FROM (
    SELECT LEAST(GREATEST(CAST(FLOOR(({col}::DOUBLE - st.lo) / st.w) AS BIGINT), 0),
                 {bins - 1}) AS b,
           COUNT(*)::DOUBLE AS cnt
    FROM {table}, st GROUP BY 1
  )
),
qs(q) AS (VALUES {q_values}),
pick AS MATERIALIZED (
  SELECT q, b, cnt, cum - cnt AS prev FROM (
    SELECT qs.q, h.b, h.cnt, h.cum,
           ROW_NUMBER() OVER (PARTITION BY qs.q ORDER BY h.b) AS rn
    FROM qs JOIN hist h ON h.cum >= qs.q * (SELECT total FROM st)
  ) WHERE rn = 1
)
SELECT q,
       ROUND(st.lo + (p.b + LEAST(GREATEST((p.q * st.total - p.prev) / p.cnt, 0.0),
                                  1.0)) * st.w, 6) AS value
FROM pick p, st ORDER BY q
"""


APPROX_QUANTILES_SQL = _approx_quantiles_sql(
    "lineitem", "l_extendedprice", [0.25, 0.5, 0.75, 0.95]
)


def q_grouped_approx_quantiles(sf_dir: str):
    """Per-priority order-value quantile sketch.  SQL-oracled since r5
    (deterministic per-key histogram replayed literally, see
    q_approx_quantiles); pytest additionally pins the per-key error
    bound."""
    from ..functions.aggregates import grouped_approx_quantiles
    from ..util import round_away

    o = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def keyed(t: pa.Table) -> pa.Table:
        # integer key for the sketch (priority '1-URGENT' → 1, ...)
        p = pc.utf8_slice_codeunits(t["o_orderpriority"], 0, 1)
        return pa.table(
            {
                "prio": pc.cast(p, pa.int64()),
                "o_totalprice": t["o_totalprice"],
            }
        )

    kd = o.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_approx_quantiles(kd, "prio", "o_totalprice", [0.5, 0.9])

    def rounded(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "prio": t["prio"],
                "q": t["q"],
                "value": pa.array(
                    round_away(
                        t.column("value").to_numpy(zero_copy_only=False), 6
                    ),
                    pa.float64(),
                ),
            }
        )

    return out.map_batches(rounded, batch_format="pyarrow", zero_copy_batch=True)


GROUPED_APPROX_QUANTILES_SQL = """
WITH kd AS MATERIALIZED (
  SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) AS prio,
         o_totalprice::DOUBLE AS v
  FROM orders
),
st AS MATERIALIZED (
  SELECT prio, MIN(v) AS lo,
         CASE WHEN MAX(v) > MIN(v) THEN (MAX(v) - MIN(v)) / 2048.0 ELSE 1.0 END AS w
  FROM kd GROUP BY prio
),
hist AS MATERIALIZED (
  SELECT prio, b, cnt, SUM(cnt) OVER (PARTITION BY prio ORDER BY b) AS cum FROM (
    SELECT kd.prio,
           LEAST(GREATEST(CAST(FLOOR((kd.v - st.lo) / st.w) AS BIGINT), 0), 2047) AS b,
           COUNT(*)::DOUBLE AS cnt
    FROM kd JOIN st USING (prio) GROUP BY 1, 2
  )
),
tot AS MATERIALIZED (SELECT prio, SUM(cnt) AS total FROM hist GROUP BY prio),
qs(q) AS (VALUES (0.5::DOUBLE), (0.9::DOUBLE)),
pick AS MATERIALIZED (
  SELECT prio, q, b, cnt, cum - cnt AS prev, target FROM (
    SELECT h.prio, qs.q, h.b, h.cnt, h.cum, t.total * qs.q AS target,
           ROW_NUMBER() OVER (PARTITION BY h.prio, qs.q ORDER BY h.b) AS rn
    FROM hist h JOIN tot t USING (prio) CROSS JOIN qs
    WHERE h.cum >= t.total * qs.q
  ) WHERE rn = 1
)
SELECT p.prio, p.q,
       ROUND(st.lo + (p.b + LEAST(GREATEST((p.target - p.prev) / p.cnt, 0.0),
                                  1.0)) * st.w, 6) AS value
FROM pick p JOIN st USING (prio) ORDER BY p.prio, p.q
"""


def event_lead(sf_dir: str):
    """LEAD — microseconds until the same user's NEXT event (the forward
    sibling of event_lag; last event of a user → -1 sentinel).  Same
    partition-local window pattern: one key shuffle, per-block lexsort +
    shifted diff."""
    from ..stages.shuffle import hash_partition

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    part = hash_partition(ev, ["user_id"])

    def lead(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "next_gap_us": pa.array([], pa.int64()),
                }
            )
        u = t.column("user_id").to_numpy()
        ts = t.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        ids = t.column("event_id").to_numpy()
        order = np.lexsort((ids, ts, u))
        u, ts, ids = u[order], ts[order], ids[order]
        gap = np.empty(len(u), dtype=np.int64)
        gap[-1] = -1
        gap[:-1] = np.where(u[1:] == u[:-1], ts[1:] - ts[:-1], -1)
        return pa.table({"event_id": ids, "next_gap_us": gap})

    return part.map_batches(lead, batch_format="pyarrow", zero_copy_batch=True)


EVENT_LEAD_SQL = """
SELECT event_id,
       CAST(COALESCE(date_diff('microsecond', ts,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)),
           -1) AS BIGINT) AS next_gap_us
FROM events
"""
