"""Metadata-scale local DataFrames as JVM ``LocalTableScan`` plans.

``spark.createDataFrame(list_of_rows)`` builds a *Python-RDD-backed*
plan (``Scan ExistingRDD``): every downstream action schedules Python
workers whose creation is serialized under the ``PythonWorkerFactory``
monitor — jstack-profiled at 37-45 s for an 80-row frame inside a
heap-loaded 64M-row session (all 32 task threads queued behind one
``createThroughDaemon`` socket read). Arrow conversion of a pandas
frame instead produces a ``LocalTableScan``: rows are serialized once
driver-side and the scan is pure JVM — no Python workers, no
per-worker fork, nothing to schedule but the stage itself.

Every metadata-scale frame this engine emits (verdicts grids, PSI/KS
tables, drift scores, lineage rows, sketch state) goes through
:func:`local_df` so that *no per-pass plan in the validation pipeline
is Python-backed* — the only Python that executes at data scale is
Arrow-batched pandas UDFs the user explicitly opts into.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd

from pyspark.sql import DataFrame, SparkSession


def local_df(
    spark: SparkSession,
    rows: Iterable[Sequence],
    schema,
) -> DataFrame:
    """A local DataFrame whose scan is a JVM ``LocalTableScan``.

    ``schema`` is a DDL string or StructType; rows are positional
    tuples (``None`` for SQL NULL). Falls back to the classic
    parallelize path only for empty input (zero partitions — no
    Python workers are ever launched for an empty scan).
    """
    from pyspark.sql.types import StructType

    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    # resolve a DDL string to a StructType without private parsers;
    # skip the resolver round trip when the caller already passed one
    if isinstance(schema, StructType):
        struct = schema
    else:
        struct = spark.createDataFrame([], schema).schema
    pdf = pd.DataFrame(rows, columns=struct.names, dtype=object)
    # object dtype end-to-end: preserves None (NULL) in int/bool
    # columns where pandas would otherwise coerce to NaN/float
    arrow_key = "spark.sql.execution.arrow.pyspark.enabled"
    prior = spark.conf.get(arrow_key, "false")
    if prior.lower() == "true":
        return spark.createDataFrame(pdf, schema=struct)
    # without Arrow, the pandas path degrades back to a parallelized
    # Python RDD — force Arrow for this one driver-side conversion
    # (metadata-scale rows; driver is single-threaded here)
    spark.conf.set(arrow_key, "true")
    try:
        return spark.createDataFrame(pdf, schema=struct)
    finally:
        spark.conf.set(arrow_key, prior)
