"""Numpy oracle for gap-fill over a dense offset spine.

Semantics (documented contract, tested at the F2 boundary docs):

LOCF (zero-order-hold; caits/core/_core_resample.py:45-54):
  - offsets before the first observation -> null (no anchor to carry)
  - otherwise carry the last observed value forward (incl. trailing gap)

LINEAR (np.interp semantics; caits/preprocessing.py:55):
  - between two anchors: v = prev + slope * (off - prev_off) with
    slope = (next - prev) / (next_off - prev_off), all float64.
    The expression ORDER matches the Spark SQL expression exactly so
    results are bitwise-identical.
  - before the first anchor: backfill first value (np.interp left=fp[0])
  - after the last anchor: carry last value (np.interp right=fp[-1])
"""

from __future__ import annotations

import numpy as np


def gapfill_locf(
    offsets: np.ndarray, values: np.ndarray, n: int
) -> np.ndarray:
    """Dense array of length n (float64; np.nan where null)."""
    offsets = np.asarray(offsets, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)
    out = np.full(n, np.nan, dtype=np.float64)
    if offsets.size == 0:
        return out
    order = np.argsort(offsets, kind="stable")
    offsets, values = offsets[order], values[order]
    spine = np.arange(n, dtype=np.int64)
    # index of last observation <= each spine offset
    idx = np.searchsorted(offsets, spine, side="right") - 1
    mask = idx >= 0
    out[mask] = values[idx[mask]]
    return out


def gapfill_linear(
    offsets: np.ndarray, values: np.ndarray, n: int
) -> np.ndarray:
    """Dense array of length n; linear interpolation with the exact
    expression order ``prev + (next-prev)/(next_off-prev_off)*(off-prev_off)``."""
    offsets = np.asarray(offsets, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)
    out = np.full(n, np.nan, dtype=np.float64)
    if offsets.size == 0:
        return out
    order = np.argsort(offsets, kind="stable")
    offsets, values = offsets[order], values[order]
    spine = np.arange(n, dtype=np.int64)

    hi = np.searchsorted(offsets, spine, side="left")  # first obs >= off
    lo = np.searchsorted(offsets, spine, side="right") - 1  # last obs <= off

    exact = (hi < offsets.size) & (offsets[np.minimum(hi, offsets.size - 1)] == spine)
    before = lo < 0
    after = hi >= offsets.size

    out[exact] = values[np.minimum(hi, offsets.size - 1)][exact]
    out[before] = values[0]
    out[after] = values[-1]

    mid = ~(exact | before | after)
    if mid.any():
        p_off = offsets[lo[mid]].astype(np.float64)
        n_off = offsets[hi[mid]].astype(np.float64)
        p_val = values[lo[mid]]
        n_val = values[hi[mid]]
        x = spine[mid].astype(np.float64)
        slope = (n_val - p_val) / (n_off - p_off)
        out[mid] = p_val + slope * (x - p_off)
    return out
