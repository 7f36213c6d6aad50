"""Local mimic of the driver's correctness gate.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, sorts columns by name, sorts rows, and compares values
EXACTLY (floats included — the driver hashes values, so any drift
fails there too; passing here implies hash-matching there).
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb

from flink_etl_spark.sources.tables import CANONICAL_TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in CANONICAL_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, datetime):
        # compare at microsecond precision, tz-naive
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _sorted_table(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def compare_query(spark, name: str, fn, sql: str, sf_dir: str):
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    ocols, orows = run_oracle(sql, sf_dir)

    assert sorted(scols) == sorted(ocols), (
        f"{name}: column mismatch spark={sorted(scols)} oracle={sorted(ocols)}"
    )
    assert len(srows) == len(orows), (
        f"{name}: row count spark={len(srows)} oracle={len(orows)}"
    )
    _, s_sorted = _sorted_table(scols, srows)
    _, o_sorted = _sorted_table(ocols, orows)
    # exact compare, floats included: close-but-not-equal floats would
    # still break the driver's value hash, so no tolerance is allowed
    mismatches = []
    for i, (sr, orow) in enumerate(zip(s_sorted, o_sorted)):
        if sr != orow:
            mismatches.append((i, sr, orow))
        if len(mismatches) >= 5:
            break
    assert not mismatches, f"{name}: value mismatches (first 5): {mismatches}"
    return len(srows)
