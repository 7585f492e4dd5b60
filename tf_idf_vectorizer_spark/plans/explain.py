"""Physical-plan inspection helpers.

The engine's scale guarantees are plan properties: filters reach the
parquet scan (PushedFilters / PartitionFilters), dictionary joins
broadcast, aggregations are partial+final, top-k is
TakeOrderedAndProject.  These helpers let tests assert those properties
instead of trusting that Catalyst "probably" did the right thing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans (greedy
    to end of line — In(...) lists contain brackets)."""
    text = explain_str(df)
    return re.findall(r"PushedFilters: \[(.*)\]", text)


def partition_filters(df: DataFrame) -> list[str]:
    text = explain_str(df)
    return re.findall(r"PartitionFilters: \[(.*)\]", text)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in explain_str(df)


def codegen_stage_count(df: DataFrame) -> int:
    return explain_str(df).count("WholeStageCodegen")
