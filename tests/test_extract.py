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
