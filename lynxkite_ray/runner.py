"""Job entrypoint — the ``ray job submit`` surface of the engine.

    python -m lynxkite_ray.runner flagship \
        --pages 100000 --iterations 5 --out /tmp/lkr_out \
        --checkpoint-root /tmp/lkr_ckpt [--resume]

Runs pages → extraction → edge table → PageRank (+ components), writing
**resumable partitioned parquet** outputs:

    <out>/edges/          part-*.parquet   (the deduplicated edge table)
    <out>/scores/         part-*.parquet   (id, rank[, component])
    <out>/manifest.json   row counts, params, lineage, metrics
    <out>/_SUCCESS

Output directories are written to a tmp dir and atomically renamed
(EntityIO.scala:100-109 protocol), and per-iteration algorithm state goes
through state.checkpoint, so a killed job restarted with the same
--checkpoint-root continues from the last complete iteration.

On a real cluster this module is the entrypoint given to ``ray job
submit --working-dir .`` — it initializes Ray only when no session exists
(never inside library code).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time


def _atomic_write_parquet(ds, path: str) -> int:
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp)
    # count from footers, not ds.count() (which re-runs a lazy plan)
    import pyarrow.dataset as pads

    n = pads.dataset(tmp, format="parquet").count_rows()
    shutil.rmtree(path, ignore_errors=True)
    os.replace(tmp, path)
    return n


def run_flagship(args) -> dict:
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from .pipelines.flagship import flagship
    from .sources.pages import pages_parquet

    pages_path = args.pages_path or pages_parquet(args.pages, args.seed)
    t0 = time.time()
    res = flagship(
        pages_path=pages_path,
        iterations=args.iterations,
        damping=args.damping,
        checkpoint_root=args.checkpoint_root,
        with_components=not args.no_components,
    )
    out = args.out
    os.makedirs(out, exist_ok=True)
    n_edges = _atomic_write_parquet(res["edges"], os.path.join(out, "edges"))
    cols = {"id": res["graph"].vids, "rank": res["ranks"]}
    if "components" in res:
        cols["component"] = res["components"]
    scores = rd.from_arrow(pa.table(cols))
    n_scores = _atomic_write_parquet(scores, os.path.join(out, "scores"))
    manifest = {
        "pipeline": "flagship",
        "pages_path": pages_path,
        "params": {
            "iterations": args.iterations,
            "damping": args.damping,
            "seed": args.seed,
        },
        "lineage": res["graph"].lineage,
        "rows": {"edges": n_edges, "scores": n_scores},
        "metrics": {
            "num_vertices": res["num_vertices"],
            "num_edges": res["num_edges"],
            "rank_sum": res["rank_sum"],
            "num_components": res.get("num_components"),
            "wall_sec": round(time.time() - t0, 3),
        },
    }
    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    with open(os.path.join(out, "_SUCCESS"), "w") as f:
        f.write("")
    return manifest


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="lynxkite_ray.runner")
    sub = p.add_subparsers(dest="cmd", required=True)
    f = sub.add_parser("flagship", help="pages → links → edges → PageRank/CC")
    f.add_argument("--pages", type=int, default=10_000)
    f.add_argument("--pages-path", default=None, help="existing pages parquet dir")
    f.add_argument("--seed", type=int, default=42)
    f.add_argument("--iterations", type=int, default=5)
    f.add_argument("--damping", type=float, default=0.85)
    f.add_argument("--out", required=True)
    f.add_argument("--checkpoint-root", default=None)
    f.add_argument("--no-components", action="store_true")
    f.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from .context import configure

    configure(quiet=True)
    manifest = run_flagship(args)
    print(json.dumps(manifest))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
