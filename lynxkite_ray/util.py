"""Small shared numeric helpers."""

from __future__ import annotations

import numpy as np


def round_away(x, ndigits: int = 6):
    """Round half away from zero — bit-compatible with DuckDB's ROUND()
    (numpy's np.round is half-to-even, which diverges on exact midpoints
    like 1/128 at 6 digits; every oracle-checked float column must use
    THIS so engine and SQL agree)."""
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** ndigits
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale
