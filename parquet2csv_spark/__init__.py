"""parquet2csv_spark — a PySpark-native per-column lightweight-compression engine.

A from-scratch re-expression of the capabilities of tideworks/parquet2csv
(reference at /root/reference, studied for WHAT it computes — see SURVEY.md)
as an idiomatic Spark engine:

- ``codecs``     : from-scratch lightweight codecs — bit-packing,
                   frame-of-reference, run-length, dictionary, FSST-style
                   static symbol tables — plus a sampling-based auto-selector.
- ``operators``  : distributed encode/decode of DataFrames into size-capped,
                   skew-salted column chunks (binary frames), with bit-identity
                   verification (replaces the reference's row-at-a-time decode
                   loop, ParquetToCsv.java:93-109).
- ``sources``    : snapshot-pinned parquet-dir catalog (Iceberg drop-in hook),
                   deterministic source-code corpus generator, CSV sink and
                   schema import/export parity (DataLoad.java entry points).
- ``functions``  : reference formatting parity (quote/null/timestamp/uuid/
                   exact-float — ParquetToCsv.formatFieldValue), plus
                   training-data ops: dedup, similarity search, text analysis.
- ``plans``      : lineage/checkpoint table + exact resume via anti-join.
- ``streaming``  : incremental encode of newly arriving files (foreachBatch).
"""

__version__ = "0.1.0"
