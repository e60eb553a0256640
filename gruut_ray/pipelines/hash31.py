"""The repo's 31-bit affine id-hash, shared between the numpy kernels
and their DuckDB oracle SQL.

Several operators (mixture sampling, bottom-k quantile sampling) rely on
a deterministic per-row hash that is (a) uniform enough for sampling,
(b) overflow-safe in int64 for any id magnitude, and (c) expressible
VERBATIM in SQL so the driver oracle can replay the exact same sample.
Both the kernel and the SQL fragment live here so they can never drift
apart (review r03: two hand-maintained copies must stay bit-identical
or the oracle silently breaks).
"""

from __future__ import annotations

import numpy as np

M31 = 2_147_483_648   # 2**31
A31 = 2_654_435_761   # Knuth multiplicative constant (odd)
B31 = 12_345


def affine31(ids: np.ndarray) -> np.ndarray:
    """31-bit affine hash in [0, 2**31).  ``id % 2**31`` first keeps the
    int64 product below 2**63 at any id magnitude."""
    return ((ids.astype(np.int64) % M31) * A31 + B31) % M31


def affine31_sql(col: str) -> str:
    """The identical expression for a DuckDB oracle."""
    return f"(({col} % {M31}) * {A31} + {B31}) % {M31}"
