"""queries() wrappers for the text / dedup / similarity operator suite over
the driver's documents + embeddings tables, with DuckDB oracles where the
semantics are SQL-expressible (the MinHash/SimHash/LSH family is
deterministic but not SQL-expressible → rows-only + pytest differential)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions import dedup as D
from ..functions import similarity as S
from ..functions import text as T
from ..functions.multimodal import documents_as_media, extract_media_features


def _docs(sf_dir: str):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _emb(sf_dir: str):
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


# ------------------------------------------------------------ oracle-checked


def q_text_stats(sf_dir: str):
    return T.text_stats(_docs(sf_dir))


def q_token_count(sf_dir: str):
    return T.token_count(_docs(sf_dir))


def q_repetition_signals(sf_dir: str):
    return T.repetition_signals(_docs(sf_dir))


def q_winnowing_fingerprints(sf_dir: str):
    """SQL-oracled since r5: the k-gram polynomial rolling hash runs over
    unicode codepoints in uint64 wraparound arithmetic, which the oracle
    mirrors with HUGEINT mod-2^64 terms (the two wide power constants are
    the engine's uint64-wrapped 1000003^4 / 1000003^3); window minima and
    the <=window global-min fallback are list ops."""
    return T.winnowing_fingerprints(_docs(sf_dir))


# Exact SQL replica of winnowing_fingerprints(k=5, window=4): codepoint
# lists → k-gram hashes h_j = sum(cp[j+t] * 1000003^(4-t)) with per-term
# and per-sum wrap mod 2^64, masked to 61 bits → minima of each 4-window
# (global min when fewer than 5 k-grams) → distinct per document.
WINNOWING_SQL = """
WITH cps AS MATERIALIZED (
  SELECT doc_id,
         list_transform(regexp_split_to_array(text, ''),
                        c -> CAST(unicode(c) AS HUGEINT)) AS cp
  FROM documents
  WHERE length(text) >= 5
),
kh AS MATERIALIZED (
  SELECT doc_id,
         list_transform(range(1, len(cp) - 3), j ->
           ((cp[j]   * 14003818205314896721 % 18446744073709551616)
          + (cp[j+1] * 1000009000027000027 % 18446744073709551616)
          +  cp[j+2] * 1000006000009
          +  cp[j+3] * 1000003
          +  cp[j+4]) % 18446744073709551616 % 2305843009213693952) AS h
  FROM cps
),
sel AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN len(h) <= 4 THEN [list_min(h)]
              ELSE list_transform(range(1, len(h) - 2), j ->
                     LEAST(h[j], h[j+1], h[j+2], h[j+3]))
         END AS w
  FROM kh
)
SELECT DISTINCT doc_id, fingerprint FROM (
  SELECT doc_id, CAST(unnest(w) AS BIGINT) AS fingerprint FROM sel
)
"""


REPETITION_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
  FROM documents WHERE trim(text) != ''
),
wc AS (
  SELECT doc_id, word, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(w) AS word FROM toks) GROUP BY doc_id, word
),
dup AS (
  SELECT doc_id,
         ROUND(SUM(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE / SUM(c), 6)
           AS dup_word_frac
  FROM wc GROUP BY doc_id
),
bgc AS (
  SELECT doc_id, bg, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS bg
        FROM toks WHERE len(w) >= 2)
  GROUP BY doc_id, bg
),
top AS (
  SELECT doc_id, ROUND(MAX(c)::DOUBLE / SUM(c), 6) AS top_bigram_frac
  FROM bgc GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(dup.dup_word_frac, 0.0) AS dup_word_frac,
       COALESCE(top.top_bigram_frac, 0.0) AS top_bigram_frac
FROM documents d
LEFT JOIN dup ON d.doc_id = dup.doc_id
LEFT JOIN top ON d.doc_id = top.doc_id
"""


# Same RE2/`re`-portable pattern on both sides (text.BPE_TOKEN_PATTERN);
# single quotes doubled for the SQL literal.
TOKEN_COUNT_SQL = (
    "SELECT doc_id, len(regexp_extract_all(text, '"
    + T.BPE_TOKEN_PATTERN.replace("'", "''")
    + "')) AS n_bpe_tokens FROM documents"
)


# CASE guards: tokenize('') = [] in the engine, but DuckDB's
# regexp_split_to_array(trim(''), ...) yields [''] (1 token) — blank docs
# would diverge without them.
TEXT_STATS_SQL = r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) END AS n_distinct,
       length(regexp_replace(text, '\s', '', 'g')) AS n_token_chars
FROM documents
"""


def q_quality(sf_dir: str):
    out = T.quality_scores(_docs(sf_dir))
    return out.select_columns(["doc_id", "ttr", "stop_ratio", "mean_token_len"])


_STOPLIST_SQL = ", ".join(f"'{w}'" for w in sorted(T._STOPWORDS_ALL))

QUALITY_SQL = rf"""
WITH tk AS (
  SELECT doc_id,
         regexp_split_to_array(trim(text), '\s+') AS toks,
         regexp_split_to_array(trim(lower(text)), '\s+') AS ltoks,
         length(regexp_replace(text, '\s', '', 'g')) AS nchars,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS ntoks
  FROM documents
)
SELECT doc_id,
       CASE WHEN ntoks = 0 THEN 0.0 ELSE
         ROUND(len(list_distinct(toks))::DOUBLE / ntoks::DOUBLE, 6) END AS ttr,
       CASE WHEN ntoks = 0 THEN 0.0 ELSE
         ROUND(len(list_filter(ltoks, w -> w IN ({_STOPLIST_SQL})))::DOUBLE
               / ntoks::DOUBLE, 6) END AS stop_ratio,
       CASE WHEN ntoks = 0 THEN 0.0 ELSE
         ROUND(nchars::DOUBLE / ntoks::DOUBLE, 6) END AS mean_token_len
FROM tk
"""


def q_exact_dedup(sf_dir: str):
    return D.exact_dedup(_docs(sf_dir))


EXACT_DEDUP_SQL = """
SELECT MIN(doc_id) AS doc_id, md5(text) AS text_md5
FROM documents GROUP BY md5(text)
"""


def q_jaccard_pairs(sf_dir: str):
    return D.jaccard_pairs(_docs(sf_dir), threshold=0.9)


JACCARD_SQL = r"""
WITH w AS (
  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS word
  FROM documents
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM w GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS src, b.doc_id AS dst, COUNT(*) AS c
  FROM w a JOIN w b ON a.word = b.word AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT src, dst,
       ROUND(c::DOUBLE / (x.n + y.n - c)::DOUBLE, 6) AS jaccard
FROM common JOIN cnt x ON x.doc_id = src JOIN cnt y ON y.doc_id = dst
WHERE c::DOUBLE / (x.n + y.n - c)::DOUBLE >= 0.9
"""


def q_embedding_neardup(sf_dir: str):
    return D.embedding_neardup_pairs(_emb(sf_dir), threshold=0.35)


EMB_NEARDUP_SQL = """
SELECT a.vec_id AS src, b.vec_id AS dst,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.35
"""


def q_ann_topk(sf_dir: str):
    return S.ann_bruteforce(_emb(sf_dir), query_ids=list(range(10)), k=5)


# Tie-break matches ann_bruteforce exactly: cos DESC, neighbor_id ASC.
# Row risk: two candidates within one float64 ulp at rank k could order
# differently between numpy and DuckDB — never observed on the synthetic
# embeddings (pairwise cosines are well separated).
ANN_TOPK_SQL = """
SELECT query_id, neighbor_id, ROUND(cos, 6) AS cos, rank FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS cos,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])) DESC,
                    b.vec_id ASC) AS rank
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
  WHERE a.vec_id < 10
) WHERE rank <= 5
"""


def q_ann_threshold(sf_dir: str):
    return S.ann_threshold(_emb(sf_dir), query_ids=list(range(10)), threshold=0.3)


ANN_THRESHOLD_SQL = """
SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
WHERE a.vec_id < 10
  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.3
"""


def _lsh_plane_values() -> str:
    """q_ann_lsh's exact hyperplane matrix (dim=64, n_planes=8, seed=5) as
    SQL VALUES rows — repr() round-trips float64, so the embedded literals
    parse back to the identical doubles the engine multiplies with."""
    from ..functions.similarity import _HyperplaneSigner

    s = _HyperplaneSigner(dim=64, n_planes=8, seed=5, vec_col="", id_col="")
    return ",".join(
        f"({p}, [{','.join(repr(float(v)) for v in s.H[:, p])}])"
        for p in range(s.H.shape[1])
    )


# Exact SQL replica of ann_lsh(query_ids=range(5), k=5): hyperplane-sign
# buckets from the embedded seed-5 plane matrix (dot products in float64 on
# both sides — embedding widened FLOAT[]→DOUBLE[]), probe = every vector
# sharing a query's bucket, exact cosine top-5 re-rank inside the probed
# set with the ANN_TOPK_SQL tie-break (cos DESC, neighbor_id ASC).
ANN_LSH_SQL = f"""
WITH h(p, hv) AS (VALUES {_lsh_plane_values()}),
sig AS MATERIALIZED (
  SELECT vec_id,
         SUM(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]), h.hv) > 0
                  THEN (1::BIGINT << p) ELSE 0 END) AS bucket
  FROM embeddings e CROSS JOIN h GROUP BY vec_id
),
probed AS MATERIALIZED (
  SELECT vec_id FROM sig
  WHERE bucket IN (SELECT DISTINCT bucket FROM sig WHERE vec_id < 5)
)
SELECT query_id, neighbor_id, ROUND(cos, 6) AS cos, rank FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS cos,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])) DESC,
                    b.vec_id ASC) AS rank
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
  WHERE a.vec_id < 5
    AND b.vec_id IN (SELECT vec_id FROM probed)
) WHERE rank <= 5
"""


# ----------------------------------------------------------------- rows-only


def q_language_id(sf_dir: str):
    return T.language_id(_docs(sf_dir))


def q_fingerprints(sf_dir: str):
    """SQL-oracled since r5: fingerprint64 is md5-lower-64 of the
    whitespace-normalized text, recomputed verbatim by the oracle."""
    return T.fingerprints(_docs(sf_dir))


FINGERPRINTS_SQL = r"""
SELECT doc_id,
       CAST(md5_number_lower(array_to_string(
            CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                 ELSE regexp_split_to_array(trim(text), '\s+') END, ' '))
            & 9223372036854775807 AS BIGINT) AS fingerprint
FROM documents
ORDER BY doc_id
"""


def q_simhash(sf_dir: str):
    return D.simhash(_docs(sf_dir))


def q_minhash_dedup(sf_dir: str):
    """SQL-oracled since r5: MinHasher hashes shingles with md5-lower-64
    (the simhash engine/oracle hash contract), so the oracle below
    recomputes the ENTIRE pipeline — signatures, band buckets, candidate
    pairs, exact-Jaccard verify, connected components — in DuckDB."""
    return D.minhash_dedup(_docs(sf_dir), threshold=0.9)


def _minhash_perm_values() -> str:
    """The 128 (a, b) universal-hash constants of q_minhash_dedup's exact
    MinHasher config (num_perm=128, seed=7), embedded into the oracle SQL
    the same way PII_SCRUB_SQL embeds the shared regex patterns."""
    mh = D.MinHasher()
    return ",".join(
        f"({i},{int(a)},{int(b)})" for i, (a, b) in enumerate(zip(mh.a, mh.b))
    )


# Exact SQL replica of minhash_dedup(threshold=0.9): word trigram shingles →
# md5_number_lower shingle hashes → 128-perm signatures ((a*x+b) wraps mod
# 2^64 before mod (2^61-1), mirrored with HUGEINT arithmetic) → 32 bands of
# 4 rows folded with the engine's FNV-style fold mod 2^64 → bucket self-join
# candidates → exact word-set Jaccard ≥ 0.9 → min-label components via
# transitive closure over the (tiny) dup graph.
MINHASH_DEDUP_SQL = rf"""
WITH RECURSIVE tok_list AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\s+') END AS ts
  FROM documents
),
shingles AS MATERIALIZED (
  SELECT doc_id, unnest(
    CASE WHEN len(ts) = 0 THEN ['']
         WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
         ELSE list_transform(range(1, len(ts) - 1),
                             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
    END) AS sh
  FROM tok_list
),
shash AS MATERIALIZED (
  SELECT DISTINCT doc_id, CAST(md5_number_lower(sh) AS HUGEINT) AS x
  FROM shingles
),
perms(i, a, b) AS (VALUES {_minhash_perm_values()}),
sig AS MATERIALIZED (
  SELECT doc_id, p.i AS pi,
         MIN(((CAST(p.a AS HUGEINT) * x + p.b) % 18446744073709551616)
             % 2305843009213693951) AS sv
  FROM shash CROSS JOIN perms p
  GROUP BY doc_id, p.i
),
bsig AS MATERIALIZED (
  SELECT doc_id, pi // 4 AS band,
         MAX(CASE WHEN pi % 4 = 0 THEN sv END) AS s0,
         MAX(CASE WHEN pi % 4 = 1 THEN sv END) AS s1,
         MAX(CASE WHEN pi % 4 = 2 THEN sv END) AS s2,
         MAX(CASE WHEN pi % 4 = 3 THEN sv END) AS s3
  FROM sig GROUP BY doc_id, pi // 4
),
buckets AS MATERIALIZED (
  SELECT doc_id, band,
         (((((s0 * 1099511628211 + s1) % 18446744073709551616)
             * 1099511628211 + s2) % 18446744073709551616)
             * 1099511628211 + s3) % 18446744073709551616 AS bh
  FROM bsig
),
cand AS MATERIALIZED (
  SELECT DISTINCT l.doc_id AS src, r.doc_id AS dst
  FROM buckets l JOIN buckets r
    ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
),
words AS MATERIALIZED (
  SELECT DISTINCT doc_id, unnest(ts) AS w FROM tok_list
),
wc AS MATERIALIZED (
  SELECT doc_id, COUNT(*)::BIGINT AS n FROM words GROUP BY doc_id
),
common AS MATERIALIZED (
  SELECT c.src, c.dst, COUNT(*)::BIGINT AS cnt
  FROM cand c
  JOIN words ws ON ws.doc_id = c.src
  JOIN words wd ON wd.doc_id = c.dst AND wd.w = ws.w
  GROUP BY c.src, c.dst
),
dup_edges AS MATERIALIZED (
  SELECT cm.src, cm.dst
  FROM common cm
  JOIN wc s ON s.doc_id = cm.src
  JOIN wc d ON d.doc_id = cm.dst
  WHERE CAST(cm.cnt AS DOUBLE) / (s.n + d.n - cm.cnt) >= 0.9
),
sym AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM dup_edges
  UNION SELECT dst, src FROM dup_edges
),
reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
rep AS (SELECT a AS doc_id, MIN(b) AS mn FROM reach GROUP BY a)
SELECT d.doc_id,
       CAST(COALESCE(LEAST(r.mn, d.doc_id), d.doc_id) AS BIGINT) AS rep
FROM documents d LEFT JOIN rep r ON r.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def q_ann_lsh(sf_dir: str):
    return S.ann_lsh(_emb(sf_dir), query_ids=list(range(5)), k=5)


def q_ann_ivf(sf_dir: str):
    return S.ann_ivf(_emb(sf_dir), query_ids=list(range(5)), k=5, n_lists=8, nprobe=3)


def q_fingerprint_matching(sf_dir: str):
    """Fingerprinting.scala analog — match documents from sources src0-9
    against src10-19 by token similarity, deterministic greedy 1:1
    (rows-only: the greedy stabilization is not SQL-expressible)."""
    import pyarrow.compute as pc

    from ..functions.matching import fingerprint_match

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    left = docs.map_batches(
        lambda t: t.filter(
            pc.is_in(t["source"], value_set=pa.array([f"src{i}" for i in range(10)]))
        ).select(["doc_id", "text"]),
        batch_format="pyarrow",
    )
    right = docs.map_batches(
        lambda t: t.filter(
            pc.is_in(t["source"], value_set=pa.array([f"src{i}" for i in range(10, 20)]))
        ).select(["doc_id", "text"]),
        batch_format="pyarrow",
    )
    return fingerprint_match(left, right, threshold=0.8)


def q_media_features(sf_dir: str):
    """SQL-oracled since r5: the fixture payloads are real minimal
    containers (WAV/PNG/GIF/BMP/MP4) whose metadata is an arithmetic
    function of doc_id (multimodal.synth_media_payload), so the oracle
    recomputes every decoded value from the formula while the engine must
    genuinely parse the binary headers."""
    return extract_media_features(documents_as_media(sf_dir))


MEDIA_FEATURES_SQL = """
SELECT doc_id AS media_id,
       CASE doc_id % 5 WHEN 0 THEN 'audio' WHEN 4 THEN 'video'
            ELSE 'image' END AS kind,
       CAST(CASE doc_id % 5
            WHEN 0 THEN 44 + 500 + doc_id % 9000
            WHEN 1 THEN 45
            WHEN 2 THEN 14
            WHEN 3 THEN 54
            ELSE 232 END AS BIGINT) AS n_bytes,
       CAST(CASE WHEN doc_id % 5 = 0 THEN 0
            ELSE 16 + doc_id % 613 END AS BIGINT) AS width,
       CAST(CASE WHEN doc_id % 5 = 0 THEN 0
            ELSE 9 + doc_id % 427 END AS BIGINT) AS height,
       CAST(CASE WHEN doc_id % 5 IN (0, 4) THEN 500 + doc_id % 9000
            ELSE 0 END AS BIGINT) AS duration_ms
FROM documents
"""


def q_text_embeddings(sf_dir: str):
    """TextEmbeddingPython.scala:21 analog — deterministic hashed-n-gram
    embeddings over the documents table.  SQL-oracled since r5: grams hash
    with md5-lower-64, bucket sums are exact ±1 integers and the L2
    normalization is one sqrt + one divide per value, so the oracle's
    doubles are bit-identical — the vector is serialized to a %.9f CSV
    string for the driver's value hash (list columns are not hashable;
    same contract as quantity_vector's string_agg)."""
    from ..functions.embedding import embed_text

    emb = embed_text(_docs(sf_dir), dim=32)

    def serialize(t: pa.Table) -> pa.Table:
        col = t.column("embedding").combine_chunks()
        width = col.type.list_size
        M = col.flatten().to_numpy(zero_copy_only=False).reshape(-1, width)
        s = [",".join(f"{x:.9f}" for x in row) for row in M]
        return pa.table({"doc_id": t["doc_id"], "embedding": pa.array(s, pa.string())})

    return emb.map_batches(serialize, batch_format="pyarrow", zero_copy_batch=True)


# Exact SQL replica of embed_text(dim=32): unigrams + space-joined bigrams
# → md5_number_lower bucket (h % 32) and sign (top bit) → per-bucket signed
# counts on a dense doc × 32 grid → L2 normalize → ordered DOUBLE[32] list.
_TEXT_EMB_CTE = r"""
WITH toks AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\s+') END AS ts
  FROM documents
),
grams AS MATERIALIZED (
  SELECT doc_id, unnest(
    ts || list_transform(range(1, len(ts)), j -> ts[j] || ' ' || ts[j+1])
  ) AS g
  FROM toks
),
bs AS MATERIALIZED (
  SELECT doc_id, CAST(md5_number_lower(g) % 32 AS BIGINT) AS b,
         SUM(CASE WHEN (md5_number_lower(g) >> 63) & 1 = 1
                  THEN -1.0 ELSE 1.0 END) AS v
  FROM grams GROUP BY doc_id, b
),
norm AS MATERIALIZED (
  SELECT doc_id, sqrt(SUM(v * v)) AS n FROM bs GROUP BY doc_id
),
grid AS MATERIALIZED (
  SELECT d.doc_id, i.b
  FROM (SELECT DISTINCT doc_id FROM documents) d
  CROSS JOIN (SELECT unnest(range(0, 32)) AS b) i
),
emb AS MATERIALIZED (
  SELECT g.doc_id,
         list(COALESCE(bs.v / NULLIF(norm.n, 0), 0.0) ORDER BY g.b) AS embedding
  FROM grid g
  LEFT JOIN bs ON bs.doc_id = g.doc_id AND bs.b = g.b
  LEFT JOIN norm ON norm.doc_id = g.doc_id
  GROUP BY g.doc_id
)
"""

TEXT_EMBEDDINGS_SQL = _TEXT_EMB_CTE + """
SELECT g.doc_id,
       string_agg(printf('%.9f', COALESCE(bs.v / NULLIF(norm.n, 0), 0.0)),
                  ',' ORDER BY g.b) AS embedding
FROM grid g
LEFT JOIN bs ON bs.doc_id = g.doc_id AND bs.b = g.b
LEFT JOIN norm ON norm.doc_id = g.doc_id
GROUP BY g.doc_id
ORDER BY g.doc_id
"""

# Top-3 cosine re-rank over the bit-exact recomputed embeddings, with the
# ANN_TOPK_SQL tie-break (cos DESC, neighbor_id ASC).
TEXT_EMB_ANN_SQL = _TEXT_EMB_CTE + """
SELECT query_id, neighbor_id, ROUND(cos, 6) AS cos, rank FROM (
  SELECT a.doc_id AS query_id, b.doc_id AS neighbor_id,
         list_cosine_similarity(a.embedding, b.embedding) AS cos,
         ROW_NUMBER() OVER (
           PARTITION BY a.doc_id
           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                    b.doc_id ASC) AS rank
  FROM emb a JOIN emb b ON a.doc_id != b.doc_id
  WHERE a.doc_id < 5
) WHERE rank <= 3
"""


def q_text_embedding_ann(sf_dir: str):
    """Generated text embeddings feeding the existing ANN suite: top-3
    cosine neighbors for the first 5 documents.  SQL-oracled since r5: the
    oracle recomputes the embeddings (bit-exact, see TEXT_EMBEDDINGS_SQL)
    and re-ranks with list_cosine_similarity + the ANN_TOPK tie-break."""
    from ..functions.embedding import embed_text

    emb = embed_text(_docs(sf_dir), dim=32).materialize()
    return S.ann_bruteforce(
        emb, query_ids=list(range(5)), k=3, vec_col="embedding", id_col="doc_id"
    )


# ------------------------------------------------------------ PII / vocab


def q_pii_scrub(sf_dir: str):
    return T.pii_scrub(_docs(sf_dir))


# The oracle nests regexp_replace the same way the engine does (emails
# first, then IPs on the already-scrubbed text); both sides are RE2.
PII_SCRUB_SQL = rf"""
SELECT doc_id,
       regexp_replace(no_email, '{T.PII_IPV4_PATTERN}', '<IP>', 'g')
           AS clean_text,
       n_emails,
       CAST(len(regexp_extract_all(no_email, '{T.PII_IPV4_PATTERN}'))
            AS BIGINT) AS n_ips
FROM (
  SELECT doc_id,
         regexp_replace(text, '{T.PII_EMAIL_PATTERN}', '<EMAIL>', 'g')
             AS no_email,
         CAST(len(regexp_extract_all(text, '{T.PII_EMAIL_PATTERN}'))
              AS BIGINT) AS n_emails
  FROM documents
)
"""


def q_vocab_topk(sf_dir: str):
    return T.vocab_topk(_docs(sf_dir), k=50)


VOCAB_TOPK_SQL = r"""
SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents WHERE trim(text) != ''
)
GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 50
"""


def q_ngram_contamination(sf_dir: str):
    """Benchmark decontamination: docs with doc_id % 97 == 0 play the
    benchmark set; every other doc reports its 8-gram overlap."""
    import numpy as np
    import pyarrow as pa

    docs = _docs(sf_dir)

    def _mod_filter(keep_zero: bool):
        def body(t: pa.Table) -> pa.Table:
            m = t.column("doc_id").to_numpy() % 97 == 0
            return t.filter(pa.array(m if keep_zero else ~m))

        return body

    bench = docs.map_batches(_mod_filter(True), batch_format="pyarrow")
    corpus = docs.map_batches(_mod_filter(False), batch_format="pyarrow")
    return T.ngram_contamination(corpus, bench, n=8)


NGRAM_CONTAMINATION_SQL = r"""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
  FROM documents WHERE trim(text) != ''
),
grams AS (
  SELECT doc_id, unnest(list_transform(range(1, len(w) - 8 + 2),
                        i -> array_to_string(w[i:i+7], ' '))) AS g
  FROM words WHERE len(w) >= 8
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
corpus AS (SELECT doc_id, g FROM grams WHERE doc_id % 97 <> 0)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated,
       ROUND(CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS contaminated_frac
FROM corpus LEFT JOIN bench b USING (g)
GROUP BY doc_id
"""


def q_tfidf_top_terms(sf_dir: str):
    return T.tfidf_top_terms(_docs(sf_dir), k=3)


TFIDF_SQL = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents WHERE trim(text) != ''
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
       FROM tok GROUP BY 1),
n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM tok),
scored AS (
  SELECT tf.doc_id, tf.token,
         ROUND(tf.tf * ln(n.n / df.df), 6) AS tfidf
  FROM tf JOIN df USING (token) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, token, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, token ASC) AS rk
  FROM scored
)
SELECT doc_id, token, tfidf FROM ranked WHERE rk <= 3
"""


def q_c4_filter(sf_dir: str):
    return T.c4_filter(_docs(sf_dir))


C4_FILTER_SQL = rf"""
WITH tk AS (
  SELECT doc_id,
         regexp_split_to_array(trim(text), '\s+') AS toks,
         regexp_split_to_array(trim(lower(text)), '\s+') AS ltoks,
         length(regexp_replace(text, '\s', '', 'g')) AS nchars
  FROM documents WHERE trim(text) != ''
),
wc AS (
  SELECT doc_id, word, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(toks) AS word FROM tk) GROUP BY doc_id, word
),
dup AS (
  SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_mass
  FROM wc GROUP BY doc_id
)
SELECT tk.doc_id FROM tk JOIN dup ON dup.doc_id = tk.doc_id
WHERE len(toks) >= 10
  AND nchars::DOUBLE / len(toks) BETWEEN 3.0 AND 10.0
  AND dup.dup_mass::DOUBLE / len(toks) < 0.3
  AND len(list_filter(ltoks, w -> w IN ({_STOPLIST_SQL})))::DOUBLE
      / len(toks) > 0.01
"""


def q_chunk_tokens(sf_dir: str):
    """Token-window chunking (size=64, overlap=16) over documents —
    (doc_id, chunk_idx, n_tokens, chunk_text), hash-checked against the
    list-slicing SQL oracle."""
    return T.chunk_tokens(_docs(sf_dir), size=64, overlap=16)


CHUNK_TOKENS_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) = ''
              THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(
                     trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
                     '\s+') END AS w
  FROM documents
), stats AS (
  SELECT doc_id, w, len(w) AS n,
         1 + CAST(CEIL(GREATEST(len(w) - 64, 0) / 48.0) AS BIGINT) AS nchunks
  FROM toks
), expanded AS (
  SELECT doc_id, w, n, unnest(range(0, nchunks)) AS chunk_idx
  FROM stats
)
SELECT doc_id, chunk_idx,
       LEAST(64, n - chunk_idx * 48) AS n_tokens,
       array_to_string(w[chunk_idx * 48 + 1 : chunk_idx * 48 + 64], ' ') AS chunk_text
FROM expanded
"""


def q_training_shards(sf_dir: str):
    """End-to-end training-data packing: chunk → deterministic shard
    assignment → per-shard size accounting (pre-combined grouped
    aggregate, stages/shuffle.py).  (shard, n_chunks, sum_tokens)."""
    from ..stages.shuffle import grouped_aggregate

    chunks = T.chunk_tokens(_docs(sf_dir), size=64, overlap=16)
    sharded = T.shard_assign(chunks, n_shards=16)
    return grouped_aggregate(
        sharded,
        keys=["shard"],
        aggs=[("chunk_idx", "count", "n_chunks"), ("n_tokens", "sum", "sum_tokens")],
    )


TRAINING_SHARDS_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) = ''
              THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(
                     trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
                     '\s+') END AS w
  FROM documents
), stats AS (
  SELECT doc_id, len(w) AS n,
         1 + CAST(CEIL(GREATEST(len(w) - 64, 0) / 48.0) AS BIGINT) AS nchunks
  FROM toks
), chunks AS (
  SELECT doc_id, unnest(range(0, nchunks)) AS chunk_idx, n FROM stats
), sharded AS (
  SELECT ((doc_id * 2654435761 + chunk_idx * 40503 + 7) % 2147483647) % 16 AS shard,
         LEAST(64, n - chunk_idx * 48) AS n_tokens
  FROM chunks
)
SELECT shard, COUNT(*) AS n_chunks, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM sharded GROUP BY shard
"""


def _language_id_sql() -> str:
    """Literal SQL replay of functions.text.language_id: whitespace
    tokens, per-language stopword-occurrence counts, best = (count,
    lang) max with lexicographically-largest tie-break, 'und' when the
    best count is 0 or tied with the runner-up."""
    from ..functions.text import _LANG_STOPWORDS

    rows = ", ".join(
        f"('{lang}', '{w}')"
        for lang in sorted(_LANG_STOPWORDS)
        for w in sorted(_LANG_STOPWORDS[lang])
    )
    return rf"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, lower(unnest(regexp_split_to_array(trim(text), '\s+'))) AS w
  FROM documents WHERE trim(text) <> ''
),
nt AS MATERIALIZED (SELECT doc_id, COUNT(*)::DOUBLE AS n FROM toks GROUP BY doc_id),
stop(lang, w) AS (VALUES {rows}),
hits AS MATERIALIZED (
  SELECT t.doc_id, s.lang, COUNT(*)::BIGINT AS c
  FROM toks t JOIN stop s ON s.w = t.w GROUP BY 1, 2
),
ranked AS MATERIALIZED (
  SELECT doc_id, lang, c,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, lang DESC) AS rn
  FROM hits
),
b1 AS MATERIALIZED (SELECT doc_id, lang, c FROM ranked WHERE rn = 1),
b2 AS MATERIALIZED (SELECT doc_id, MAX(c) AS c2 FROM ranked WHERE rn > 1 GROUP BY doc_id)
SELECT d.doc_id,
       CASE WHEN b1.c IS NULL OR b1.c = 0 OR b1.c = COALESCE(b2.c2, 0)
            THEN 'und' ELSE b1.lang END AS lang_pred,
       CASE WHEN b1.c IS NULL OR b1.c = 0 OR b1.c = COALESCE(b2.c2, 0)
            THEN 0.0 ELSE ROUND(b1.c / nt.n, 6) END AS lang_conf
FROM documents d
LEFT JOIN b1 ON b1.doc_id = d.doc_id
LEFT JOIN b2 ON b2.doc_id = d.doc_id
LEFT JOIN nt ON nt.doc_id = d.doc_id
ORDER BY d.doc_id
"""


LANGUAGE_ID_SQL = _language_id_sql()


SIMHASH_SQL = r"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
  FROM documents WHERE trim(text) <> ''
),
tc AS MATERIALIZED (
  SELECT doc_id, md5_number_lower(w) AS h, COUNT(*)::BIGINT AS cnt
  FROM toks GROUP BY doc_id, w
),
bits AS MATERIALIZED (SELECT unnest(range(64)) AS b),
votes AS MATERIALIZED (
  SELECT doc_id, b,
         SUM(cnt * (CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) AS v
  FROM tc CROSS JOIN bits GROUP BY doc_id, b
),
sh AS MATERIALIZED (
  SELECT doc_id,
         SUM(CASE WHEN v > 0 THEN
             CASE WHEN b = 63 THEN -9223372036854775808
                  ELSE (1::BIGINT << CAST(b AS INTEGER)) END
             ELSE 0 END) AS simhash
  FROM votes GROUP BY doc_id
)
SELECT d.doc_id, CAST(COALESCE(sh.simhash, 0) AS BIGINT) AS simhash
FROM documents d LEFT JOIN sh ON sh.doc_id = d.doc_id
ORDER BY d.doc_id
"""
