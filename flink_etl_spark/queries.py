"""Public query catalog surface (back-compat shim over
`flink_etl_spark.catalog`)."""

from __future__ import annotations

from flink_etl_spark.catalog import CATALOG, load_all, oracle_sql, queries  # noqa: F401
from flink_etl_spark.catalog.cdc import cdc_merge_day  # noqa: F401

load_all()
