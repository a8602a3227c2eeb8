"""lynxkite_ray — a Ray-Data-native link-graph / data-processing engine.

A from-scratch rebuild of the query + data-processing capabilities of
lynxkite/lynxkite (the reference at /root/reference, studied for semantics
only) expressed idiomatically on Ray Data:

- tables and graphs are ``ray.data.Dataset`` pipelines over Arrow blocks
- per-record transforms are vectorized ``map_batches`` stages
- stateful stages (HTML parsing, models, CSR shards) are actor pools
- wide steps are ``groupby``/``aggregate``/``sort``/hash-``join``
- iterative graph algorithms (PageRank, connected components, label
  propagation) run gather-scatter over hash-partitioned CSR shards with
  per-iteration checkpointing (see ``lynxkite_ray.state.checkpoint``)

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the caller (bench.py, tests/conftest.py, or the graft driver).
"""

__version__ = "0.1.0"
