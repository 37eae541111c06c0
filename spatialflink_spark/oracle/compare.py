"""Driver-style result comparison: row-count + schema + order-insensitive
value equality with columns sorted by name — used by tests to pre-verify the
CORRECTNESS gate locally."""

from __future__ import annotations

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


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = "") -> None:
    a, b = canonicalize(spark_pdf), canonicalize(duck_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) or isinstance(y, float):
                if x is None and y is None:
                    continue
                if not math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-9):
                    raise AssertionError(f"{name}: col {c} row {i}: {x} != {y}")
            else:
                if x != y:
                    raise AssertionError(f"{name}: col {c} row {i}: {x!r} != {y!r}")
