"""Ad-hoc SQL over Datasets — the ExecuteSQL analog (ExecuteSQL.scala:
19-146 runs Spark SQL over column-pruned ProtoTable views; here DuckDB runs
over zero-copy Arrow views of Ray Datasets).

Column pruning: referenced-column detection is DuckDB's own (its optimizer
projects the Arrow scan), so only touched columns are pulled from the
object store blocks.  The result comes back as a Ray Dataset so SQL steps
compose with the rest of a pipeline.

This is the escape hatch for ad-hoc analytics on *small-to-medium*
intermediates — the driver-side DuckDB instance is single-node (exactly
like the reference's Spark-driver SQL planning, with the cluster-side
execution replaced by DuckDB's vectorized engine).  For the distributed
path, express the query with the engine's native operators instead.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa

from ray.data import Dataset


def _collect_arrow(ds: Dataset) -> pa.Table:
    batches = list(ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches)


def execute_sql(query: str, **tables: Dataset | pa.Table):
    """Run ``query`` with each kwarg registered as a view. Returns a Ray
    Dataset.

        out = execute_sql("SELECT src, COUNT(*) n FROM e GROUP BY src",
                          e=edges_ds)
    """
    import ray.data as rd

    con = duckdb.connect()
    for name, t in tables.items():
        if isinstance(t, Dataset):
            t = _collect_arrow(t)
        con.register(name, t)
    result = con.execute(query).fetch_arrow_table()
    return rd.from_arrow(result)


class SqlStage:
    """Per-batch SQL transform: run a DuckDB query against each Arrow batch
    (view name ``batch``) inside map_batches — the distributed from of a
    row-local SQL expression (projection/filter/case logic).

        ds.map_batches(SqlStage("SELECT a, b*2 AS b2 FROM batch WHERE a>0"),
                       batch_format="pyarrow")
    """

    def __init__(self, query: str):
        self.query = query
        self._con = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._con is None:
            self._con = duckdb.connect()  # one connection per actor
        self._con.register("batch", t)
        out = self._con.execute(self.query).fetch_arrow_table()
        self._con.unregister("batch")
        return out
