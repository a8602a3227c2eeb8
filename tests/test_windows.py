"""Time-banded window kernels (sliding-window aggregate, banded range
self-join, PII scrub, vocab top-k, corr) against brute-force oracles on
crafted + random inputs.  The sf0.001 DuckDB gate in test_queries_oracle
covers the same queries end-to-end; these pin the kernel edge cases
(equal-ts peers, window boundaries, user isolation, regex nesting)."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _events(rows):
    # rows: (event_id, user_id, ts_us, value, event_type)
    eid, uid, ts, val, typ = zip(*rows)
    return pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(np.array(ts, np.int64), pa.timestamp("us")),
            "value": pa.array(val, pa.float64()),
            "event_type": pa.array(typ, pa.string()),
        }
    )


def _write_events(tmp_path, rows):
    import pyarrow.parquet as pq

    pq.write_table(_events(rows), str(tmp_path / "events.parquet"))
    return str(tmp_path)


MIN = 60 * 1_000_000


def test_sliding_window_vs_bruteforce(tmp_path):
    from lynxkite_ray.pipelines.relational import events_sliding_window

    rng = np.random.default_rng(7)
    rows = [
        (i, int(rng.integers(0, 6)), int(rng.integers(0, 300)) * MIN,
         float(rng.integers(0, 100)), "x")
        for i in range(400)
    ]
    # equal-ts peers within one user: RANGE window must include BOTH
    rows += [(1000, 99, 50 * MIN, 1.0, "x"), (1001, 99, 50 * MIN, 2.0, "x")]
    sf = _write_events(tmp_path, rows)
    got = {
        r["event_id"]: (r["n_window"], r["sum_window_cents"])
        for r in events_sliding_window(sf, window_minutes=60).take_all()
    }
    assert len(got) == len(rows)
    for eid, uid, ts, val, _ in rows:
        in_win = [
            (v2, t2) for (_, u2, t2, v2, _) in rows
            if u2 == uid and ts - 60 * MIN <= t2 <= ts
        ]
        assert got[eid] == (
            len(in_win),
            int(sum(round(v * 100) for v, _ in in_win)),
        ), (eid, uid, ts)
    # both equal-ts peers see each other (RANGE ... CURRENT ROW includes peers)
    assert got[1000] == (2, 300) and got[1001] == (2, 300)


def test_followup_count_vs_bruteforce(tmp_path):
    from lynxkite_ray.pipelines.relational import events_followup_count

    rng = np.random.default_rng(3)
    types = ["click", "view", "purchase"]
    rows = [
        (i, int(rng.integers(0, 5)), int(rng.integers(0, 60)) * MIN,
         1.0, types[int(rng.integers(0, 3))])
        for i in range(300)
    ]
    sf = _write_events(tmp_path, rows)
    got = {
        r["event_id"]: r["n_followups"]
        for r in events_followup_count(sf, band_minutes=5).take_all()
    }
    clicks = [r for r in rows if r[4] == "click"]
    assert len(got) == len(clicks)  # LEFT semantics: every click has a row
    for eid, uid, ts, _, _ in clicks:
        want = sum(
            1 for (_, u2, t2, _, _) in rows
            if u2 == uid and ts < t2 <= ts + 5 * MIN
        )
        assert got[eid] == want, (eid, uid, ts)


def test_pii_scrub_crafted():
    from lynxkite_ray.functions.text import pii_scrub

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [
                        "mail a.b+c@ex-1.example.org or d@e.io now",
                        "server at 10.0.0.1 and 192.168.300.7 up",
                        "plain text, no pii at all",
                        "x@y.z 1.2.3.4",  # 1-letter TLD must NOT match
                    ],
                    pa.string(),
                ),
            }
        )
    )
    out = {r["doc_id"]: r for r in pii_scrub(docs).take_all()}
    assert out[1]["clean_text"] == "mail <EMAIL> or <EMAIL> now"
    assert (out[1]["n_emails"], out[1]["n_ips"]) == (2, 0)
    assert out[2]["clean_text"] == "server at <IP> and <IP> up"
    assert (out[2]["n_emails"], out[2]["n_ips"]) == (0, 2)
    assert out[3]["clean_text"] == "plain text, no pii at all"
    assert out[4]["clean_text"] == "x@y.z <IP>"


def test_vocab_topk_ties_and_counts():
    from lynxkite_ray.functions.text import vocab_topk

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["b a b c", "a b  a", "   "],  # 'a'x3 'b'x3 'c'x1; blank doc
                    pa.string(),
                ),
            }
        )
    )
    rows = vocab_topk(docs, k=2).take_all()
    assert [(r["token"], r["cnt"]) for r in rows] == [("a", 3), ("b", 3)]


def test_corr_matches_numpy(tmp_path):
    import pyarrow.parquet as pq
    from lynxkite_ray.pipelines.relational import corr_qty_price

    rng = np.random.default_rng(5)
    q = rng.integers(1, 50, size=500).astype(np.float64)
    p = q * 10 + rng.normal(0, 5, size=500)
    flag = np.where(np.arange(500) % 2 == 0, "A", "R")
    pq.write_table(
        pa.table(
            {
                "l_returnflag": pa.array(flag.tolist(), pa.string()),
                "l_quantity": pa.array(q, pa.float64()),
                "l_extendedprice": pa.array(p, pa.float64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    got = {
        r["l_returnflag"]: r["corr_qty_price"]
        for r in corr_qty_price(str(tmp_path)).take_all()
    }
    for f in ("A", "R"):
        m = flag == f
        want = np.corrcoef(q[m], p[m])[0, 1]
        assert abs(got[f] - want) < 1e-6, f
