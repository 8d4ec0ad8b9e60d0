"""Warehouse sink interface — the reference's load stage (L1-L4) behind a
pluggable boundary.

The reference loads its pandas frame into BigQuery with: idempotent
dataset/table DDL (L1, dump_bigq.py:34-67), an explicit schema enforced at
load (L2, dump_bigq.py:47-56,135-138), WRITE_TRUNCATE overwrite semantics
(L3, dump_bigq.py:135-145) and a post-load row-count verification (L4,
dump_bigq.py:147-149). The engine keeps those four obligations as the sink
contract and ships two implementations: the Spark-catalog parquet warehouse
(the native path) and a BigQuery stub that documents the exact connector
call without requiring the connector in this environment.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the reference warehouse schema, dump_bigq.py:47-56 (FLOAT → DoubleType:
#: BigQuery FLOAT is 64-bit).
REFERENCE_STOCK_SCHEMA = T.StructType(
    [
        T.StructField("stock_name", T.StringType()),
        T.StructField("Date", T.DateType()),
        T.StructField("Price", T.DoubleType()),
        T.StructField("Open", T.DoubleType()),
        T.StructField("High", T.DoubleType()),
        T.StructField("Low", T.DoubleType()),
        T.StructField("Vol", T.DoubleType()),
        T.StructField("Change", T.DoubleType()),
    ]
)


def enforce_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """L2: project+cast to the declared schema; extra columns dropped,
    missing columns become typed NULLs (the reference's load would reject
    them — we follow BigQuery's permissive load_table_from_dataframe)."""
    cols = []
    for field in schema.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


class SparkWarehouseSink:
    """Native warehouse: external parquet tables in the session catalog.

    ``dataset.table`` naming mirrors the reference's
    ``StockMktData.StockData``; data lands under ``root_dir`` so nothing
    persists outside the scratch/warehouse location.
    """

    def __init__(self, root_dir: str = "/root/repo/.scratch/warehouse") -> None:
        self.root_dir = root_dir

    def load(self, df: DataFrame, dataset: str, table: str, schema: T.StructType) -> int:
        spark = df.sparkSession
        # L1: idempotent namespace + table (in-memory catalog: CREATE
        # DATABASE IF NOT EXISTS; table created by the writer below)
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {dataset}")
        name = f"{dataset}.{table}"
        # L2 + L3: schema-enforced truncate load
        (
            enforce_schema(df, schema)
            .write.mode("overwrite")
            .option("path", os.path.join(self.root_dir, dataset, table))
            .format("parquet")
            .saveAsTable(name)
        )
        # L4: post-load verification read-back
        return spark.table(name).count()


class BigQuerySink:
    """The reference's actual sink, stubbed: this environment has neither
    the BigQuery connector jar nor credentials, so ``load`` raises unless
    the connector import succeeds. The write it would issue is the
    spark-bigquery-connector equivalent of dump_bigq.py:135-145."""

    def __init__(self, project: str, dataset: str) -> None:
        self.project = project
        self.dataset = dataset

    def load(self, df: DataFrame, dataset: str, table: str, schema: T.StructType) -> int:
        try:
            import google.cloud.bigquery  # noqa: F401
        except ImportError as exc:  # pragma: no cover - stub path
            raise NotImplementedError(
                "BigQuery connector not available in this environment; "
                "on a cluster: enforce_schema(df, schema).write"
                '.format("bigquery").option("table", '
                f'"{self.project}.{dataset}.{table}")'
                '.option("writeDisposition", "WRITE_TRUNCATE").save()'
            ) from exc
        raise NotImplementedError("connector write intentionally not wired here")
