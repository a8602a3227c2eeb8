"""Execution-context policy: block sizing, shuffle hygiene, quiet logs.

Mirrors the reference's partition policy (KITE_VERTICES_PER_PARTITION =
200k rows/partition with 2x tolerance; /root/reference/app/com/lynxanalytics/
biggraph/graph_api/io/EntityIO.scala:82-96) as an explicit rows/block and
bytes/block target on Ray Data's DataContext.
"""

from __future__ import annotations

import math
import os

# Reference parity knobs (EntityIO.scala:82-85, HybridRDD.scala:78-80,
# ConnectedComponents.scala:19) re-expressed for Ray Data.
ROWS_PER_BLOCK = int(os.environ.get("LKR_ROWS_PER_BLOCK", 200_000))
PARTITION_TOLERANCE = 2.0
HUB_DEGREE_THRESHOLD = int(os.environ.get("LKR_HUB_THRESHOLD", ROWS_PER_BLOCK // 5))
LOCAL_EDGE_THRESHOLD = int(os.environ.get("LKR_LOCAL_EDGES", 20_000_000))
# Dense-vector fallback for iterative algorithms: if the vertex count fits a
# per-worker numpy array comfortably, broadcast the rank/label vector instead
# of shuffling it (the small-graph analog of ConnectedComponents.scala:63-78's
# single-task fallback).  800 MiB of float64 at the default.
DENSE_VERTEX_THRESHOLD = int(os.environ.get("LKR_DENSE_VERTICES", 100_000_000))


def configure(quiet: bool = True) -> None:
    """Apply engine-wide DataContext policy. Safe to call repeatedly."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.target_max_block_size = 128 * 1024 * 1024
    ctx.execution_options.preserve_order = False
    if quiet:
        ctx.enable_progress_bars = False
    return ctx


def num_blocks_for(rows: int) -> int:
    """desiredNumPartitions analog (EntityIO.scala:92-96): ceil(rows / 200k)."""
    return max(1, math.ceil(rows / ROWS_PER_BLOCK))
