"""Oracle-comparison helpers mirroring the driver's correctness gate:
row-count + schema (column names) + order-insensitive value hash, with
floats rounded to 4 dp and timestamps truncated to seconds.
"""

from __future__ import annotations

import datetime as dt
import math
from typing import Any

import pandas as pd


def _norm_value(v: Any) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        return f"{round(v, 4):.4f}"
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "<null>"
        return v.floor("s").isoformat()
    if isinstance(v, dt.datetime):
        return v.replace(microsecond=0).isoformat()
    if isinstance(v, (bool,)):
        return str(bool(v)).lower()
    try:
        if pd.isna(v):  # catches pd.NaT / pd.NA on scalars
            return "<null>"
    except (TypeError, ValueError):
        pass
    return str(v)


def normalize_frame(df: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_value(v) for v in row) for row in df[cols].itertuples(index=False)]
    rows.sort()
    return cols, rows


def frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    s_cols, s_rows = normalize_frame(spark_pdf)
    o_cols, o_rows = normalize_frame(oracle_pdf)
    if s_cols != o_cols:
        return False, f"column mismatch: spark={s_cols} oracle={o_cols}"
    if len(s_rows) != len(o_rows):
        return False, f"row-count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    if s_rows != o_rows:
        diff = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
        return False, f"value mismatch, first diffs: {diff}"
    return True, "ok"
