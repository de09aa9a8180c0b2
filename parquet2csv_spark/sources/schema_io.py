"""Schema import/export + schema-file sinks — parity with the reference's
four utility entry points (SURVEY.md §3.2-3.4):

  K4  schema → JSON export   (`prq2csv --to-json`,  DataLoad.java:316-331)
  K5  JSON → schema import   (`prq2csv --from-json`, DataLoad.java:333-352)
  K3  footer-only parquet    (ParquetMetadataToBinarySerialize.java:24-63)
      → Spark analog: a zero-row parquet file carrying the full schema
  K2  one-row schema file    (OneRowParquetSchema.java:45-158) — a 1-row
      parquet with per-field default values
  V1  schema validation      (ValidateAvroSchema.java:28-36)

``$``-suffixed column names (the reference bytecode-patches Avro to accept
them, ValidateAvroSchema.java:38-60) need no patching here: Spark permits
them natively (backtick-quoted in SQL).
"""

from __future__ import annotations

import datetime
import decimal
import json

from pyspark.sql import DataFrame, SparkSession, types as T


def schema_to_json(df_or_schema) -> str:
    """K4: pretty JSON of the schema (Spark StructType JSON format plays
    the role of the reference's Avro-schema JSON)."""
    schema = df_or_schema.schema if isinstance(df_or_schema, DataFrame) else df_or_schema
    return json.dumps(schema.jsonValue(), indent=2, sort_keys=True)


def export_schema_json(spark: SparkSession, parquet_path: str, out_file: str) -> str:
    """K4 end-to-end: parquet footer → schema JSON file (footer-only read —
    no row data is scanned, like ParquetFileReader.open().getFooter())."""
    schema = spark.read.parquet(parquet_path).schema
    text = schema_to_json(schema)
    with open(out_file, "w") as f:
        f.write(text)
    return text


def schema_from_json(text: str) -> T.StructType:
    """K5: parse the JSON back to a schema; raises on invalid input
    (the V1 validation role)."""
    return T.StructType.fromJson(json.loads(text))


def write_schema_only_parquet(spark: SparkSession, schema: T.StructType, out_dir: str) -> None:
    """K3 analog: a data-less parquet that carries the full schema in its
    footer (the reference writes MAGIC+footer+MAGIC by hand; Spark's
    zero-row write produces the standards-compliant equivalent)."""
    spark.createDataFrame([], schema).coalesce(1).write.mode("overwrite").parquet(out_dir)


_DEFAULTS = {
    "long": 0,
    "integer": 0,
    "short": 0,
    "byte": 0,
    "double": 0.0,
    "float": 0.0,
    "boolean": False,
    "string": None,
}


def default_row(schema: T.StructType, overrides: dict | None = None) -> tuple:
    """K2's per-field default synthesis (OneRowParquetSchema.java:115-158):
    0 for numerics, epoch for timestamps, zero-uuid-style defaults come in
    via ``overrides`` (the reference special-cases columns by name)."""
    row = []
    for f in schema.fields:
        if overrides and f.name in overrides:
            row.append(overrides[f.name])
            continue
        t = f.dataType.typeName()
        if t in _DEFAULTS:
            row.append(_DEFAULTS[t])
        elif t.startswith("decimal"):
            row.append(decimal.Decimal(0))
        elif t == "timestamp":
            row.append(datetime.datetime(1970, 1, 1))
        elif t == "date":
            row.append(datetime.date(1970, 1, 1))
        else:
            row.append(None)
    return tuple(row)


def write_one_row_schema_file(
    spark: SparkSession,
    schema: T.StructType,
    out_dir: str,
    overrides: dict | None = None,
) -> None:
    """K2: 1-row parquet with default values, GZIP-compressed with
    dictionary encoding disabled — the reference writer's exact storage
    configuration (OneRowParquetSchema.java:104-110)."""
    df = spark.createDataFrame([default_row(schema, overrides)], schema)
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("compression", "gzip")
        .option("parquet.enable.dictionary", "false")
        .parquet(out_dir)
    )
