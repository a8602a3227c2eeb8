"""Per-iteration checkpointing with lineage manifests + resume.

The reference resumes per-*entity* (GUID-keyed dirs with _SUCCESS + metadata,
EntityIO.scala:99-110; SparkDomain.scala:75-80 skips compute when outputs
exist) but cannot resume mid-operation.  The north rule asks for finer grain:
every iteration of PageRank / connected components / label propagation
persists the vertex-state table plus a manifest
(iteration, lineage = content key of the input graph, per-part row counts +
value digests, convergence metrics), so a killed job continues from the last
complete iteration.

Layout (atomic: written to ``<dir>.tmp`` then renamed, like the reference's
EntityIO write protocol EntityIO.scala:100-109):

    <root>/<job>/<stage>/iter_00004/
        part-00000.parquet ...
        manifest.json      # {iteration, lineage, parts: [{rows, digest}], metrics}
        _SUCCESS
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_ITER_RE = re.compile(r"^iter_(\d+)$")


def _digest(table: pa.Table) -> str:
    h = hashlib.blake2b(digest_size=16)
    for col in table.itercolumns():
        for chunk in col.chunks:
            arr = chunk.to_numpy(zero_copy_only=False)
            h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()


class CheckpointManager:
    """Checkpoint store for one (job, stage, lineage) iteration sequence.

    ``lineage`` is a content key of the input (e.g. the graph's edge-count +
    vertex-count + params hash) — a checkpoint only resumes against the same
    lineage, mirroring the reference's GUID addressing (MetaGraph.scala:39-57).
    """

    def __init__(self, root: str, job: str, stage: str, lineage: str):
        self.dir = os.path.join(root, job, stage)
        self.lineage = lineage
        os.makedirs(self.dir, exist_ok=True)

    def _iter_dir(self, k: int) -> str:
        return os.path.join(self.dir, f"iter_{k:05d}")

    def complete_iterations(self) -> list[int]:
        out = []
        for name in os.listdir(self.dir):
            m = _ITER_RE.match(name)
            if m and os.path.exists(os.path.join(self.dir, name, "_SUCCESS")):
                k = int(m.group(1))
                manifest = self.manifest(k)
                if manifest and manifest.get("lineage") == self.lineage:
                    out.append(k)
        return sorted(out)

    def manifest(self, k: int) -> dict | None:
        p = os.path.join(self._iter_dir(k), "manifest.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def latest(self) -> int | None:
        done = self.complete_iterations()
        return done[-1] if done else None

    def save(self, k: int, table: pa.Table, metrics: dict, rows_per_part: int = 1_000_000) -> None:
        final = self._iter_dir(k)
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        parts = []
        n = table.num_rows
        nparts = max(1, -(-n // rows_per_part))
        for p in range(nparts):
            sl = table.slice(p * rows_per_part, rows_per_part)
            pq.write_table(sl, os.path.join(tmp, f"part-{p:05d}.parquet"))
            parts.append({"rows": sl.num_rows, "digest": _digest(sl)})
        manifest = {
            "iteration": k,
            "lineage": self.lineage,
            "parts": parts,
            "metrics": metrics,
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("")
        shutil.rmtree(final, ignore_errors=True)
        os.replace(tmp, final)

    def load(self, k: int) -> pa.Table:
        d = self._iter_dir(k)
        files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
        return pa.concat_tables([pq.read_table(os.path.join(d, f)) for f in files])

    def save_dataset(self, k: int, ds, metrics: dict) -> None:
        """Distributed save for the Dataset-plane algorithms (V beyond the
        dense threshold): blocks write straight to the iteration dir via
        ``ds.write_parquet`` — nothing is collected to the driver.  The
        manifest records per-file rows + byte sizes from the footers (a
        content digest would force a full second read of state that never
        touched the driver)."""
        final = self._iter_dir(k)
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        ds.write_parquet(tmp)
        parts = []
        for f in sorted(os.listdir(tmp)):
            if not f.endswith(".parquet"):
                continue
            p = os.path.join(tmp, f)
            parts.append(
                {
                    "file": f,
                    "rows": pq.read_metadata(p).num_rows,
                    "bytes": os.path.getsize(p),
                }
            )
        manifest = {
            "iteration": k,
            "lineage": self.lineage,
            "parts": parts,
            "metrics": metrics,
            "distributed": True,
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("")
        shutil.rmtree(final, ignore_errors=True)
        os.replace(tmp, final)

    def load_dataset(self, k: int):
        """Resume state as a Ray Dataset (only the parquet parts named by
        the manifest — never the manifest/_SUCCESS files)."""
        import ray.data as rd

        d = self._iter_dir(k)
        m = self.manifest(k)
        files = [os.path.join(d, p["file"]) for p in m["parts"]]
        return rd.read_parquet(files)


def lineage_key(*parts) -> str:
    h = hashlib.blake2b(digest_size=12)
    for p in parts:
        h.update(repr(p).encode())
        h.update(b"\x00")
    return h.hexdigest()


class SnapshotStore:
    """SaveTable / GUID-store analog (SaveTable.scala:24; EntityIO.scala:
    99-110 skip-if-exists semantics): tables are persisted under a
    content key — (name, lineage) — and a second save with the same key is
    a no-op, so re-running a pipeline reuses every already-computed
    snapshot exactly like the reference's GUID-addressed entity store.

    Layout:  <root>/<name>/<lineage>/part-*.parquet + _SUCCESS
    Writes are atomic (tmp dir + os.replace)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str, lineage: str) -> str:
        return os.path.join(self.root, name, lineage)

    def exists(self, name: str, lineage: str) -> bool:
        return os.path.exists(os.path.join(self._dir(name, lineage), "_SUCCESS"))

    def save(self, ds, name: str, lineage: str) -> str:
        """Persist a Dataset (or Arrow table). Skips when the snapshot
        already exists; returns the snapshot directory."""
        final = self._dir(name, lineage)
        if self.exists(name, lineage):
            return final
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        if isinstance(ds, pa.Table):
            pq.write_table(ds, os.path.join(tmp, "part-00000.parquet"))
        else:
            ds.write_parquet(tmp)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("")
        shutil.rmtree(final, ignore_errors=True)
        os.replace(tmp, final)
        return final

    def load(self, name: str, lineage: str):
        """Returns the snapshot as a Ray Dataset, or None when absent."""
        if not self.exists(name, lineage):
            return None
        import ray.data as rd

        d = self._dir(name, lineage)
        files = [
            os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
        ]
        return rd.read_parquet(files)

    def save_or_load(self, name: str, lineage: str, compute):
        """GUID-store idiom: return the cached snapshot if present, else
        run ``compute()`` (→ Dataset), persist, and return the reloaded
        snapshot."""
        cached = self.load(name, lineage)
        if cached is not None:
            return cached
        self.save(compute(), name, lineage)
        return self.load(name, lineage)

    def load_union(self, names: list[str], lineage: str):
        """'Import union of table snapshots' (ImportOperations.scala:
        439-453): the row-union of several same-schema snapshots as ONE
        Dataset — each snapshot stays its own lazily-read parquet
        directory (Dataset.union concatenates block lists, no data
        movement)."""
        parts = []
        for n in names:
            ds = self.load(n, lineage)
            if ds is None:
                raise FileNotFoundError(f"snapshot {n!r} (lineage {lineage!r}) missing")
            parts.append(ds)
        if not parts:
            raise ValueError("load_union needs at least one snapshot name")
        out = parts[0]
        for ds in parts[1:]:
            out = out.union(ds)
        return out
