"""HTML → (text, out-links) extraction.

The reference imports edge tables and has no HTML parser of its own
(DeriveHTMLPython.scala renders HTML *output*), so the north rule's
"byte-identical extracted text per url" binds against the pinned single-node
extractor defined HERE.  One implementation — ``extract_page`` — is used
both as the in-process oracle (tests) and inside the distributed actor-pool
stage (``LinkExtractor``), which is what makes byte-identity structural
rather than aspirational.

Distributed shape: a stateful callable class passed to
``ds.map_batches(LinkExtractor, batch_format="pyarrow", concurrency=N)`` —
parser tables and the URL normalizer are built once per actor
(reference analog: per-partition loaded state, LookupRegion.scala:33).
Heavy ``html`` bytes are dropped from the output batch immediately so
downstream blocks stay small (SURVEY §7.5.6).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from urllib.parse import urljoin, urlsplit

import numpy as np
import pyarrow as pa

from ..ids import hash64_array, normalize_url

_SKIP_CONTENT = {"script", "style", "noscript", "template", "head"}
_WS = re.compile(r"\s+")
_CHARSET = re.compile(rb"charset=[\"']?([A-Za-z0-9_\-]+)", re.I)
_SKIP_SCHEMES = {"javascript", "mailto", "data", "tel", "ftp"}


class _Parser(HTMLParser):
    """Collects visible text and <a href> values. Deterministic: stdlib
    HTMLParser with convert_charrefs=True (entities decoded), no locale or
    version-dependent behavior.  Kept as the REFERENCE tokenizer the fast
    scanner below is differentially tested against (tests/test_extract.py);
    the hot path uses ``_fast_parse``."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.hrefs: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_CONTENT:
            self._skip_depth += 1
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)
                    break

    def handle_endtag(self, tag):
        if tag in _SKIP_CONTENT and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._skip_depth == 0 and data:
            self.chunks.append(data)


# --- fast scanner -----------------------------------------------------------
# The stdlib HTMLParser spends ~85% of extract time in goahead/parse_starttag
# generality this consumer never observes: the only events that matter are
# <a href> start tags, skip-tag depth (script/style/noscript/template/head),
# script/style CDATA skipping, and the concatenated inter-tag text (chunk
# boundaries are erased by the whitespace collapse).  _fast_parse produces
# the same (text, hrefs) ~4x faster by skipping every other tag wholesale.

_TAG_NAME = re.compile(r"[a-zA-Z][^\t\n\r\f />\x00]*")  # tagfind_tolerant shape
_RAW_END = {
    "script": re.compile(r"</\s*script", re.I),
    "style": re.compile(r"</\s*style", re.I),
}
# attribute-name-anchored href (won't match data-href); value forms mirror
# HTMLParser's attrfind_tolerant: double/single-quoted or unquoted
_HREF = re.compile(
    r"""(?i)(?<![\w\-.:])href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]*))"""
)


def _find_tag_end(doc: str, pos: int) -> tuple[int, bool]:
    """Index of the start tag's closing '>' (quote-aware) and whether the
    tag is self-closing.  (-1, False) when the tag never closes."""
    n = len(doc)
    i = pos
    while i < n:
        ch = doc[i]
        if ch == '"' or ch == "'":
            q = doc.find(ch, i + 1)
            if q < 0:
                return -1, False
            i = q + 1
        elif ch == ">":
            return i, doc[i - 1] == "/"
        else:
            i += 1
    return -1, False


def _fast_parse(doc: str, chunks: list[str], hrefs: list[str]) -> None:
    """Single pass over ``doc`` appending visible-text chunks and raw href
    values — the event stream _Parser would deliver, minus the per-tag
    attribute parsing for tags the consumer ignores."""
    from html import unescape

    skip = 0
    i, n = 0, len(doc)
    find = doc.find

    def trunc(lt: int) -> int:
        """HTMLParser's EOF fallback for an unterminated construct
        (parser.py goahead k<0 branch): emit from '<' to the next '>'
        (inclusive) / next '<' / one char, as RAW data."""
        k = find(">", lt + 1)
        if k < 0:
            k = find("<", lt + 1)
            k = lt + 1 if k < 0 else k
        else:
            k += 1
        if skip == 0:
            chunks.append(doc[lt:k])
        return k

    while i < n:
        lt = find("<", i)
        if lt < 0:
            if skip == 0:
                seg = doc[i:]
                chunks.append(unescape(seg) if "&" in seg else seg)
            break
        if lt > i and skip == 0:
            seg = doc[i:lt]
            chunks.append(unescape(seg) if "&" in seg else seg)
        j = lt + 1
        if j >= n:
            if skip == 0:
                chunks.append("<")
            break
        c = doc[j]
        if c == "!":
            if doc.startswith("<!--", lt):
                end = find("-->", lt + 4)
                i = trunc(lt) if end < 0 else end + 3
            else:
                end = find(">", j)
                i = trunc(lt) if end < 0 else end + 1
        elif c == "?":
            end = find(">", j)
            i = trunc(lt) if end < 0 else end + 1
        elif c == "/":
            end = find(">", j)
            if end < 0:
                i = trunc(lt)
                continue
            m = _TAG_NAME.match(doc, j + 1)
            if m:
                name = m.group().lower()
                if name in _SKIP_CONTENT and skip > 0:
                    skip -= 1
            i = end + 1
        elif c.isascii() and c.isalpha():
            m = _TAG_NAME.match(doc, j)
            name = m.group().lower()
            gt, selfclose = _find_tag_end(doc, m.end())
            if gt < 0:
                i = trunc(lt)  # truncated start tag at EOF
                continue
            if name == "a":
                for hm in _HREF.finditer(doc, m.end(), gt):
                    v = hm.group(2) or hm.group(3) or hm.group(4)
                    if v:
                        hrefs.append(unescape(v) if "&" in v else v)
                        break
            elif name in _SKIP_CONTENT:
                if not selfclose:
                    skip += 1
                    raw = _RAW_END.get(name)
                    if raw is not None:
                        # CDATA content: no tags parsed until the real
                        # close tag (so hrefs in script strings are ignored)
                        rm = raw.search(doc, gt + 1)
                        if rm is None:
                            break  # unclosed script/style swallows the rest
                        end = find(">", rm.end())
                        skip -= 1
                        i = n if end < 0 else end + 1
                        continue
            i = gt + 1
        else:
            # literal '<' in text (HTMLParser treats it as data)
            if skip == 0:
                chunks.append("<")
            i = j
    return


def decode_html(raw: bytes) -> str:
    """Pinned decoding: declared charset if recognizable, else utf-8,
    falling back to latin-1 (which never fails)."""
    m = _CHARSET.search(raw[:2048])
    if m:
        enc = m.group(1).decode("ascii", "ignore").lower()
        if enc in ("utf-8", "utf8", "latin-1", "latin1", "iso-8859-1", "ascii"):
            try:
                return raw.decode("latin-1" if enc.startswith(("latin", "iso")) else "utf-8")
            except UnicodeDecodeError:
                pass
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def extract_page(url: str, raw_html: bytes) -> tuple[str, list[str]]:
    """THE pinned extractor. Returns (text, normalized absolute out-links).

    text = visible character data outside script/style/noscript/template/head,
    whitespace runs collapsed to single spaces, stripped. Links are resolved
    against ``url``, fragment-stripped, normalized; javascript:/mailto:/data:
    etc. dropped; order preserved, duplicates kept (edge dedup is a separate
    graph op — StripDuplicateEdgesFromBundle semantics, see stages/edges.py).
    """
    chunks: list[str] = []
    hrefs: list[str] = []
    try:
        _fast_parse(decode_html(raw_html), chunks, hrefs)
    except Exception:
        pass  # malformed HTML: keep whatever was parsed before the error
    text = _WS.sub(" ", "".join(chunks)).strip()
    links = []
    for href in hrefs:
        href = href.strip()
        if not href or href.startswith("#"):
            continue
        try:
            absu = urljoin(url, href)
            scheme = urlsplit(absu).scheme
        except ValueError:
            continue
        if scheme not in ("http", "https"):
            continue
        links.append(normalize_url(absu))
    return text, links


class LinkExtractor:
    """Actor-pool stage: pages batch → links batch.

    In:  (url: string, html: binary[, ...]) Arrow batch
    Out: (src_url, src, dst_url, dst, text_len) — one row per extracted link,
         plus one sentinel row with dst_url="" for link-less pages so every
         crawled page still yields a vertex.

    Use ``extract_text_stage`` for the (url, text) projection instead when
    only text is needed.
    """

    def __init__(self) -> None:
        # Parser class + regexes are module-level compiled once per process;
        # the instance exists so map_batches runs this as an actor pool.
        self._extract = extract_page

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        page_urls: list[str] = []
        counts: list[int] = []
        dst_urls: list[str] = []
        page_lens: list[int] = []
        for url, raw in zip(urls, htmls):
            nurl = normalize_url(url)
            text, links = self._extract(nurl, raw)
            if not links:
                links = [""]  # sentinel: page with no out-links (dangling)
            page_urls.append(nurl)
            counts.append(len(links))
            dst_urls.extend(links)
            page_lens.append(len(text))
        # per-PAGE values computed once, repeated per link (hashing a url
        # once per page instead of once per out-link)
        cnt = np.asarray(counts, dtype=np.int64)
        idx = pa.array(np.repeat(np.arange(len(page_urls), dtype=np.int64), cnt))
        src = np.repeat(hash64_array(page_urls), cnt)
        dst = np.where(
            np.asarray([d == "" for d in dst_urls], dtype=bool),
            np.int64(-1),
            hash64_array(dst_urls),
        )
        return pa.table(
            {
                "src_url": pc.take(pa.array(page_urls, type=pa.string()), idx),
                "src": pa.array(src),
                "dst_url": pa.array(dst_urls, type=pa.string()),
                "dst": pa.array(dst),
                "text_len": pc.take(
                    pa.array(np.asarray(page_lens, dtype=np.int64)), idx
                ),
            }
        )


class TextExtractor:
    """Actor-pool stage: pages batch → (url, text) batch (byte-identity
    surface vs the oracle; html column dropped on output)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        texts = [extract_page(normalize_url(u), h)[0] for u, h in zip(urls, htmls)]
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "text": pa.array(texts, type=pa.string()),
            }
        )


def extract_links(pages_ds, *, concurrency=None, batch_size: int = 512):
    """pages Dataset → links Dataset.

    batch_size is modest because each row carries a full html payload
    (wide-row hazard, SURVEY §7.5.6); 512 × ~3-100KB html keeps batches in
    the low-MB..50MB range while cutting per-task overhead 4x vs 128
    (measured: the extract stage scales 3.5x from 8→32 CPUs at 512 vs
    2.75x at 128).

    Runs as STATELESS tasks by default: the extractor's per-process state
    (compiled regexes, parser tables) is module-level, so Ray's reused
    worker processes amortize it exactly like an actor pool would — without
    paying pool startup (~0.1s/actor, 3s+ for a 32-wide pool) on every
    pipeline.  Pass ``concurrency`` to pin an actor pool instead (the shape
    a real model-loading parser would use — e.g. LinkExtractor with a
    per-actor ML boilerplate model; see functions/multimodal.py for that
    pattern in earnest).
    """
    if concurrency is not None:
        return pages_ds.map_batches(
            LinkExtractor,
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
            concurrency=concurrency,
        )
    fn = LinkExtractor()
    return pages_ds.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )


def extract_texts(pages_ds, *, concurrency=None, batch_size: int = 512):
    if concurrency is not None:
        return pages_ds.map_batches(
            TextExtractor,
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
            concurrency=concurrency,
        )
    fn = TextExtractor()
    return pages_ds.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
