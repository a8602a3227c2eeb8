"""Extraction: byte-identity of distributed text vs the pinned oracle, and
link semantics (fragments, schemes, relative resolution)."""

import pyarrow as pa

from lynxkite_ray.ids import hash64, normalize_url
from lynxkite_ray.sources.pages import page_out_links, pages_table
from lynxkite_ray.stages.extract import LinkExtractor, extract_page, extract_texts


def test_extract_basic_text_and_links():
    html = (
        b"<html><head><title>T</title><style>.x{}</style></head><body>"
        b"<h1>Hello &amp; bye</h1><script>var a=1;</script>"
        b'<a href="/b#frag">rel</a> <a href="http://other.example/c">abs</a>'
        b'<a href="#top">frag only</a><a href="mailto:a@b">mail</a>'
        b"<p>tail  text</p></body></html>"
    )
    text, links = extract_page("http://site.example/a", html)
    assert text == "Hello & byerel absfrag onlymailtail text"
    assert links == ["http://site.example/b", "http://other.example/c"]


def test_extract_latin1_fallback():
    raw = "<p>caf\xe9</p>".encode("latin-1")
    text, _ = extract_page("http://x.example/", raw)
    assert text == "café"


def test_normalize_url():
    assert normalize_url("HTTP://Site.Example:80/p/1?q=2#f") == "http://site.example/p/1?q=2"
    assert normalize_url("https://a.example:443/") == "https://a.example/"
    assert normalize_url("http://a.example") == "http://a.example/"


def test_distributed_text_matches_oracle_bytes():
    import ray.data as rd

    t = pages_table(120, 42)
    ds = rd.from_arrow(t.select(["url", "html"]))
    got = {r["url"]: r["text"] for r in extract_texts(ds, concurrency=2).take_all()}
    for url, text in zip(t.column("url").to_pylist(), t.column("text").to_pylist()):
        assert got[normalize_url(url)].encode() == text.encode()  # byte identity


def test_link_extractor_matches_generator_ground_truth():
    t = pages_table(60, 42)
    out = LinkExtractor()(t.select(["url", "html"]))
    by_src: dict[str, list[str]] = {}
    for s, d in zip(out["src_url"].to_pylist(), out["dst_url"].to_pylist()):
        by_src.setdefault(s, []).append(d)
    for i in range(60):
        url = f"http://site{i % 97}.example/p/{i}"
        want = [normalize_url(u) for u in page_out_links(i, 60, 42)]
        got = [d for d in by_src[url] if d != ""]
        assert got == want


def test_sentinel_rows_for_linkless_pages():
    html = b"<html><body>no links here</body></html>"
    batch = pa.table({"url": ["http://a.example/x"], "html": [html]})
    out = LinkExtractor()(batch)
    assert out.num_rows == 1
    assert out["dst"].to_pylist() == [-1]
    assert out["src"].to_pylist() == [hash64("http://a.example/x")]


def _reference_extract(url: str, raw_html: bytes):
    """The pre-round-4 stdlib-HTMLParser extractor, kept verbatim as the
    differential reference for the fast scanner."""
    import re as _re

    from lynxkite_ray.stages.extract import _WS, _Parser, decode_html
    from urllib.parse import urljoin, urlsplit

    from lynxkite_ray.ids import normalize_url as _norm

    p = _Parser()
    try:
        p.feed(decode_html(raw_html))
        p.close()
    except Exception:
        pass
    text = _WS.sub(" ", "".join(p.chunks)).strip()
    links = []
    for href in p.hrefs:
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
        links.append(_norm(absu))
    return text, links


NASTY = [
    b"<p>a &amp; b &lt;c&gt; &#65;&#x42; &unknown; &ampx</p>",
    b"<script>var s = '</div><a href=\"http://evil.example/x\">';</script>ok",
    b"<style>p:after { content: '<a href=http://no.example>' }</style>t",
    b"<SCRIPT TYPE='x'>raw</SCRIPT>after",
    b"<a href='http://q.example/a?x=1&amp;y=2'>q</a>",
    b"<a title='>' href=\"http://gt.example/\">gt-in-attr</a>",
    b"<a href=http://unquoted.example/p>u</a>",
    b"<a data-href='http://not.example'>no real href</a>",
    b"<a href=''>empty</a><a href='http://second.example/'>2nd</a>",
    b"<A HREF='HTTP://UPPER.EXAMPLE/P'>case</A>",
    b"<noscript><a href='http://ns.example/'>x</a>hidden</noscript>vis",
    b"<head><title>t</title><a href='http://inhead.example/'>h</a></head>body",
    b"<template><p>tpl</p></template>out",
    b"<!-- <a href='http://comment.example/'>c</a> -->text",
    b"<!DOCTYPE html><?php echo '<a href=x>'; ?>tail",
    b"1 < 2 but <b>bold</b> & 3 > 2",
    b"<p>truncated <a href='http://t.example/",
    b"<script>never closed...",
    b"<br/><template/>selfclose</p>",
    b"<div><p>nested <span>deep</span> text</p></div>",
    b"<a\nhref='http://nl.example/'>newline attrs</a>",
    b"<a alt='x' href='http://later.example/'>attr order</a>",
    "<p>utf8 café →</p>".encode("utf-8"),
    b"<p>latin \xe9</p>",
    b"",
    b"plain text only",
]


def test_fast_scanner_matches_stdlib_reference():
    """Differential: the fast scanner's extract_page output equals the
    stdlib-HTMLParser reference on the synthetic corpus + nasty cases."""
    t = pages_table(300, 42)
    for url, html in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
        nurl = normalize_url(url)
        assert extract_page(nurl, html) == _reference_extract(nurl, html), url
    for html in NASTY:
        got = extract_page("http://base.example/d/p", html)
        want = _reference_extract("http://base.example/d/p", html)
        assert got == want, html


def test_fast_scanner_fuzz_differential():
    """Mutation fuzz: structural damage (truncation, stray '<', unclosed
    script) still matches the stdlib reference exactly.  (Pathological
    attribute-quote splices are excluded: stdlib's tolerant attr regex has
    bug-for-bug behavior there that the fast scanner doesn't chase — both
    stay deterministic, which is what the byte-identity contract needs.)"""
    import numpy as np

    t = pages_table(40, 7)
    htmls = t.column("html").to_pylist()
    rng = np.random.default_rng(13)
    cases = []
    for h in htmls[:20]:
        cases.append(h[: int(rng.integers(1, len(h)))])          # truncate
        cut = int(rng.integers(0, len(h) - 10))
        cases.append(h[:cut] + b"<" + h[cut:])                   # stray <
        cases.append(h.replace(b"</script>", b"", 1))            # unclosed
    for html in cases:
        got = extract_page("http://f.example/x", html)
        want = _reference_extract("http://f.example/x", html)
        assert got == want, html[:80]
