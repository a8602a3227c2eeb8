"""Ray-free hardware-scaling control (BASELINE.md §3): the exact
extract_page loop under bare multiprocessing on in-memory pages — zero
engine, zero IO — to separate the VM's per-core throughput curve from the
engine's partitioning when reading `bench.py --scaling` numbers.

    python tools/hw_control.py [n_pages] [procs ...]

Prints one JSON line: aggregate and per-core pages/s at each process
count, plus the pairwise efficiencies.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _work(args):
    """Generate the worker's page range UNTIMED, then time extraction
    only (the r4 control's 'in-memory pages, zero engine, zero IO')."""
    lo, hi, n, seed = args
    from lynxkite_ray.sources.pages import synth_page
    from lynxkite_ray.stages.extract import extract_page

    pages = [synth_page(i, n, seed, heavy=True) for i in range(lo, hi)]
    t0 = time.time()
    for url, _, html, _, _ in pages:
        extract_page(url, html)
    return hi - lo, time.time() - t0


def measure(n_pages: int, procs: int) -> float:
    ranges = []
    step = (n_pages + procs - 1) // procs
    for p in range(procs):
        lo, hi = p * step, min((p + 1) * step, n_pages)
        if lo < hi:
            ranges.append((lo, hi, n_pages, 42))
    with mp.Pool(procs) as pool:
        parts = pool.map(_work, ranges)
    # workers start extraction near-simultaneously (generation cost is
    # uniform), so aggregate throughput = total pages / slowest extractor
    done = sum(p[0] for p in parts)
    return done / max(p[1] for p in parts)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    procs = [int(x) for x in sys.argv[2:]] or [2, 8]
    rates = {p: round(measure(n, p), 1) for p in procs}
    out = {
        "metric": "hw_control_pages_per_sec",
        "n_pages": n,
        "rates": rates,
        "per_core": {p: round(r / p, 1) for p, r in rates.items()},
        "efficiency": {
            f"{a}->{b}": round((rates[b] / rates[a]) / (b / a), 3)
            for a, b in zip(procs, procs[1:])
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
