"""The ONE half-away-from-zero rounding replica.

Every oracle-mirroring round in the engine must use this function:
DuckDB's ROUND rounds half away from zero, while Python ``round`` and
``np.round`` are half-to-even — a p/q ratio with a power-of-two
denominator (1/512 = 0.001953125) lands exactly on an 8th-decimal half
and the two conventions diverge. Keeping a single definition is what
lets tests/test_properties.py pin the DuckDB-equality domain
(|x·10^nd| < 1e10 — beyond it DuckDB computes the scaled product
through a different path and boundary values round apart) for ALL
call sites at once.
"""

from __future__ import annotations

import numpy as np


def round_half_away(x: np.ndarray, nd: int) -> np.ndarray:
    p = 10.0 ** nd
    return np.copysign(np.trunc(np.abs(np.asarray(x, dtype=np.float64)) * p + 0.5), x) / p
