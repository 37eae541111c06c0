"""Driver-style result comparison: row-count + schema + order-insensitive
value equality with columns sorted by name — used by tests to pre-verify the
CORRECTNESS gate locally.

The driver hashes EXACT values (a Decimal('0.5') differs from the double
0.5), so this comparison is deliberately strict: exact equality for every
value (no isclose tolerance) AND canonical dtype agreement per column.
Round-1 lesson: a tolerant float compare passed 70/70 local tests while 5
gate queries hash-failed on DECIMAL-vs-DOUBLE drift.
"""

from __future__ import annotations

import decimal
import math

import pandas as pd


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        # normalize arrays/lists to tuples so they sort/compare
        if out[c].map(lambda v: isinstance(v, (list, tuple))).any():
            out[c] = out[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def _value_kind(v) -> str:
    """Canonical type kind of a scalar — Decimal is NOT a float, bool is not
    an int; numpy scalars map to their Python kind."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "null"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, str):
        return "str"
    if isinstance(v, (tuple, list)):
        return "array"
    if hasattr(v, "dtype"):  # numpy scalar
        k = v.dtype.kind
        return {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "ts"}.get(k, k)
    return type(v).__name__


def _column_kind(s: pd.Series) -> str:
    k = s.dtype.kind
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "ts"
    # object column: kind of the first non-null value
    for v in s:
        vk = _value_kind(v)
        if vk != "null":
            return vk
    return "null"


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = "") -> None:
    a, b = canonicalize(spark_pdf), canonicalize(duck_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    for c in a.columns:
        ka, kb = _column_kind(a[c]), _column_kind(b[c])
        assert ka == kb, f"{name}: col {c} dtype kind {ka} (spark) != {kb} (oracle)"
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            xn = x is None or (isinstance(x, float) and math.isnan(x))
            yn = y is None or (isinstance(y, float) and math.isnan(y))
            if xn or yn:
                if xn and yn:
                    continue
                raise AssertionError(f"{name}: col {c} row {i}: {x!r} != {y!r}")
            if x != y:  # exact — the driver hashes exact values
                raise AssertionError(f"{name}: col {c} row {i}: {x!r} != {y!r}")
