"""Deterministic synthetic Common-Crawl-shaped pages table.

Schema per BASELINE.json input_hint / FIXTURES.md §1:
  (url: string, warc_ts: timestamp[ms, UTC], html: binary, text: string,
   lang: string)

Every page is a pure function of ``(index, n_pages, seed)`` via
``numpy.random.Generator(Philox(SeedSequence((seed, index))))`` — stable
across processes, partitionings and parallelism levels (FIXTURES.md demands
seed-stability; reference analog: seeded per-partition Randoms,
RDDUtils.scala:345-357).  The ``text`` column is filled by running the
pinned oracle extractor on the generated html, so the byte-identity
invariant is checkable end-to-end.

Link structure: out-degree ~ 1 + Zipf(a=2.2) capped at 60 (a few designated
hub pages get out-degree ~200); targets are drawn Zipf-biased toward low
page indices so the first few pages become high in-degree hubs (exercises
the hub-split path, SURVEY §4.2); ~3% of targets are external dangling
urls; link markup mixes absolute, relative, fragment, duplicate, self and
malformed forms; ~10% of pages are latin-1 encoded with a meta charset.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..stages.extract import extract_page

LANGS = ["en", "de", "hu", "fr", "es"]
_WORDS = (
    "alpha beta gamma delta graph vertex edge rank crawl web page link node "
    "stream batch arrow shuffle partition actor block data lynx kite ray "
    "kávé über naïve őrült szép análisis forêt straße".split()
)

N_SITES = 97  # pages are spread over this many hosts


def page_url(i: int) -> str:
    return f"http://site{i % N_SITES}.example/p/{i}"


def _rng(seed: int, i: int) -> np.random.Generator:
    return np.random.Generator(np.random.Philox(np.random.SeedSequence((seed, i))))


def page_out_links(i: int, n: int, seed: int) -> list[str]:
    """The ground-truth out-link targets of page i (normalized urls).
    Used by the pure-python oracle graph builder in tests."""
    rng = _rng(seed, i)
    if rng.random() < 0.05:
        return []  # dangling page, no out-links
    deg = int(min(rng.zipf(2.2), 60))
    if i % 211 == 7:
        deg = 200  # designated out-hub
    targets = []
    for _ in range(deg):
        if rng.random() < 0.03:
            targets.append(f"http://external{rng.integers(0, 50)}.example/x/{rng.integers(0, 1000)}")
        else:
            # Zipf-biased toward low indices → in-degree hubs at i ∈ [0, ~10)
            t = int(min(rng.zipf(1.7) - 1, n - 1))
            targets.append(page_url(t))
    return targets


def synth_page(
    i: int, n: int, seed: int, heavy: bool = False
) -> tuple[str, int, bytes, str, str]:
    """Returns (url, warc_ts_ms, html, text, lang) for page index i.

    ``heavy`` pages carry ~15-40KB of body markup (real Common-Crawl pages
    average 50-100KB; the default tiny profile under-weights per-page parse
    work so badly that framework fixed costs dominate any throughput
    measurement — the scaling bench uses the heavy profile)."""
    rng = _rng(seed, i)
    url = page_url(i)
    lang = LANGS[i % len(LANGS)]
    ts_ms = 1_700_000_000_000 + (i * 73_057) % 31_536_000_000

    lo, hi = (900, 2400) if heavy else (20, 120)
    words = rng.choice(_WORDS, size=int(rng.integers(lo, hi)))
    paras = []
    row = []
    for w in words:
        row.append(str(w))
        if len(row) >= 12:
            paras.append(" ".join(row))
            row = []
    if row:
        paras.append(" ".join(row))

    body = [f"<h1>Page {i} &amp; friends</h1>"]
    body.append("<script>var x = 'not text &lt;';</script>")
    body.append("<style>.a { color: red }</style>")
    links = page_out_links(i, n, seed)
    for j, target in enumerate(links):
        if target.startswith("http://external"):
            href = target
        elif j % 4 == 0:
            # relative form of an on-site target (same host only)
            tid = int(target.rsplit("/", 1)[1])
            href = f"/p/{tid}" if tid % N_SITES == i % N_SITES else target
            if href.startswith("/"):
                target_abs = f"http://site{i % N_SITES}.example{href}"
                if target_abs != target:  # cross-host: keep absolute
                    href = target
        elif j % 7 == 3:
            href = target + "#frag"  # fragment must be stripped by extractor
        else:
            href = target
        body.append(f'<a href="{href}">link {j}</a>')
    body.append('<a href="#top">to top</a>')  # fragment-only: no edge
    body.append('<a href="mailto:x@example.com">mail</a>')  # non-http: no edge
    if i % 13 == 0:
        body.append("<p>broken <b>markup")  # unclosed tags
    for p in paras:
        body.append(f"<p>{p}</p>")

    latin = i % 10 == 3
    charset = "iso-8859-1" if latin else "utf-8"
    html_str = (
        f'<html><head><meta charset="{charset}"><title>t{i}</title></head>'
        f"<body>{''.join(body)}</body></html>"
    )
    html = html_str.encode("latin-1", "replace") if latin else html_str.encode("utf-8")
    text, _ = extract_page(url, html)
    return url, ts_ms, html, text, lang


def pages_table(n: int, seed: int = 42, start: int = 0, stop: int | None = None) -> pa.Table:
    """Arrow table of pages [start, stop) out of a universe of n pages."""
    stop = n if stop is None else stop
    rows = [synth_page(i, n, seed) for i in range(start, stop)]
    urls, tss, htmls, texts, langs = zip(*rows) if rows else ((), (), (), (), ())
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(list(tss), type=pa.timestamp("ms", tz="UTC")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


class _PageBatchGen:
    """Distributed generator stage: batch of indices → batch of pages."""

    def __init__(self, n: int, seed: int, heavy: bool = False):
        self.n, self.seed, self.heavy = n, seed, heavy

    def __call__(self, batch) -> pa.Table:
        ids = batch["id"].to_pylist() if isinstance(batch, pa.Table) else list(batch["id"])
        rows = [synth_page(int(i), self.n, self.seed, self.heavy) for i in ids]
        urls, tss, htmls, texts, langs = zip(*rows)
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array(list(tss), type=pa.timestamp("ms", tz="UTC")),
                "html": pa.array(htmls, type=pa.binary()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(langs, type=pa.string()),
            }
        )


def pages_dataset(n: int, seed: int = 42, *, batch_size: int = 1000, heavy: bool = False):
    """Distributed pages Dataset: ray.data.range(n) → map_batches(generator).
    Generation is embarrassingly parallel; no driver-side materialization."""
    import ray.data as rd

    gen = _PageBatchGen(n, seed, heavy)
    return rd.range(n).map_batches(gen, batch_format="pyarrow", batch_size=batch_size)


def pages_parquet(
    n: int, seed: int = 42, root: str = "/tmp/lkr_pages", heavy: bool = False
) -> str:
    """Generate-once parquet cache for benches/queries: one directory per
    (n, seed[, heavy]), written atomically (tmp dir + rename) so
    concurrent/killed runs can't observe partial data."""
    path = os.path.join(root, f"n{n}_s{seed}" + ("_heavy" if heavy else ""))
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    tmp = path + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ds = pages_dataset(n, seed, heavy=heavy)
    ds.write_parquet(tmp)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("")
    shutil.rmtree(path, ignore_errors=True)
    os.replace(tmp, path)
    return path
