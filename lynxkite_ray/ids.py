"""URL normalization + content-hash vertex ids.

The reference assigns vertex ids with ``randomNumbered`` (RDDUtils.scala:
338-359) — ids minted so they hash into the partition that created them,
avoiding a shuffle.  We get the same join-free property more simply with
**content hashes**: ``url64(url)`` is a pure function, so src and dst ids can
be computed independently inside any ``map_batches`` stage with no distinct +
id-assignment join at all (contrast VerticesToEdges.scala:30-64, which needs
distinct → randomNumbered → two skew-aware lookups).

blake2b(digest_size=8) is standardized and stable across Python versions and
processes, which makes ids safe to persist in checkpoints.
"""

from __future__ import annotations

from hashlib import blake2b
from urllib.parse import urlsplit, urlunsplit

import numpy as np

_MASK63 = (1 << 63) - 1


def hash64(value: str | bytes) -> int:
    """Deterministic non-negative int64 content hash."""
    if isinstance(value, str):
        value = value.encode("utf-8", "surrogatepass")
    return int.from_bytes(blake2b(value, digest_size=8).digest(), "big") & _MASK63


def hash64_array(values) -> np.ndarray:
    """Vectorized-at-the-batch-level hash of an iterable of strings → int64.

    The per-element blake2b call is C-level; the Python loop here is the
    per-batch cost (~1µs/row) amortized across the actor pool. Hot callers
    hash once per distinct url per batch.
    """
    frm = int.from_bytes
    return np.fromiter(
        (
            frm(blake2b(v.encode("utf-8", "surrogatepass"), digest_size=8).digest(), "big")
            & _MASK63
            for v in values
        ),
        dtype=np.int64,
        count=len(values),
    )


def hash_sample_mask(values, fraction: float, seed: int) -> np.ndarray:
    """Deterministic Bernoulli sample membership: keep a row iff
    md5-lower-64("seed:value") < fraction·2^64.  Content-hashed sampling is
    partition-stable (the same rows are kept under ANY repartitioning —
    ray.data.random_sample is plan-dependent) and SQL-mirrorable: DuckDB's
    md5_number_lower reproduces the mask exactly.  ``values`` are the str()
    forms of the rows' sample keys; str(float) and DuckDB's CAST(DOUBLE AS
    VARCHAR) agree (both emit the unique shortest round-trip decimal) for
    non-exponent-range values."""
    from .functions.dedup import _md5_lower64

    thr = np.uint64(int(fraction * 2.0**64))
    return _md5_lower64([f"{seed}:{v}" for v in values]) < thr


_DEFAULT_PORTS = {"http": "80", "https": "443"}


def normalize_url(url: str) -> str:
    """Pinned, deterministic URL normalization (the oracle and the
    distributed pipeline share this exact function — byte-identity depends
    on it):

    - lowercase scheme and host
    - strip fragment
    - drop default ports (http:80, https:443)
    - empty path → "/"
    """
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    host, sep, port = netloc.rpartition(":")
    if sep and port == _DEFAULT_PORTS.get(scheme):
        netloc = host
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))
