"""Shared correctness-comparison helpers (used by tests and
tools/compare_oracle.py): order-insensitive DataFrame comparison against
a DuckDB oracle, mirroring the driver's row-count + columns + value
check."""

from __future__ import annotations

import math
import os

import pandas as pd


def duck_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf or math.isclose(af, bf, rel_tol=1e-12, abs_tol=1e-12)
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)


def compare_frames(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    """Returns a list of mismatch descriptions (empty = equal)."""
    issues: list[str] = []
    s, d = normalize(spark_df), normalize(duck_df)
    if list(s.columns) != list(d.columns):
        issues.append(
            f"columns differ: spark={list(s.columns)} duck={list(d.columns)}"
        )
        return issues
    if len(s) != len(d):
        issues.append(f"row count differs: spark={len(s)} duck={len(d)}")
        return issues
    for col in s.columns:
        for i, (x, y) in enumerate(zip(s[col].tolist(), d[col].tolist())):
            if not values_equal(x, y):
                issues.append(
                    f"value mismatch col={col} row={i}: spark={x!r} duck={y!r}"
                )
                if len(issues) > 3:
                    return issues
    return issues
