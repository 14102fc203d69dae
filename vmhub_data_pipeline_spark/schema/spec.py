"""BigQuery-style schema spec -> Spark StructType compiler + conformance.

The reference declares warehouse schemas as JSON files of
``{name, type, mode}`` fields with recursive RECORD nesting, loaded by
``_create_schema_field`` (reference src/utils/bigquery_helper.py:98-107;
spec file shape from src/config/settings.py:47-53: ``{"schema": [...]}``) and
applies them at load with ``ignore_unknown_values=True``
(src/utils/bigquery_helper.py:115-122): undeclared input fields are dropped,
declared-but-missing nullable fields become NULL.

``conform`` reproduces exactly that contract on a DataFrame.
"""

from __future__ import annotations

from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# BigQuery type name -> Spark type (SURVEY §1.2 table).
_TYPE_MAP: dict[str, T.DataType] = {
    "STRING": T.StringType(),
    "INTEGER": T.LongType(),
    "INT64": T.LongType(),
    "FLOAT": T.DoubleType(),
    "FLOAT64": T.DoubleType(),
    "BOOLEAN": T.BooleanType(),
    "BOOL": T.BooleanType(),
    "TIMESTAMP": T.TimestampType(),
    "DATE": T.DateType(),
    "BYTES": T.BinaryType(),
    # Spark has no native JSON column type: store as string, query with
    # from_json/get_json_object (SURVEY §7 decision 2; reference JSON column
    # at src/utils/bigquery_helper.py:76).
    "JSON": T.StringType(),
    "NUMERIC": T.DecimalType(38, 9),
}


def compile_field(spec: dict[str, Any]) -> T.StructField:
    """One ``{name, type, mode?, fields?}`` spec entry -> StructField.

    Mirrors the reference loader: default mode NULLABLE
    (bigquery_helper.py:101), RECORD recursion (:103-105), REPEATED ->
    ArrayType (mode passthrough :101,107).
    """
    name = spec["name"]
    type_name = spec["type"].upper()
    mode = spec.get("mode", "NULLABLE").upper()

    if type_name == "RECORD":
        dt: T.DataType = T.StructType([compile_field(f) for f in spec.get("fields", [])])
    elif type_name in _TYPE_MAP:
        dt = _TYPE_MAP[type_name]
    else:
        raise ValueError(f"unsupported type {type_name!r} in field {name!r}")

    if mode == "REPEATED":
        # BigQuery REPEATED elements are themselves non-null
        return T.StructField(name, T.ArrayType(dt, containsNull=False), nullable=True)
    return T.StructField(name, dt, nullable=(mode != "REQUIRED"))


def compile_schema(spec: dict[str, Any] | list[dict[str, Any]]) -> T.StructType:
    """Full spec -> StructType. Accepts the file shape ``{"schema": [...]}``
    (reference src/config/settings.py:51-53) or a bare field list."""
    fields = spec["schema"] if isinstance(spec, dict) else spec
    return T.StructType([compile_field(f) for f in fields])


def conform(df: DataFrame, schema: T.StructType, strict_required: bool = True) -> DataFrame:
    """Project ``df`` onto ``schema`` with the reference's load semantics:

    * input columns not in the schema are DROPPED (ignore_unknown_values,
      reference src/utils/bigquery_helper.py:121);
    * declared nullable columns missing from input become NULL;
    * declared REQUIRED columns missing from input raise (BigQuery would
      fail the load job — reference asserts load_job.errors :133-139);
    * present columns are cast to the declared type.
    """
    have = {f.name for f in df.schema.fields}
    cols = []
    for field in schema.fields:
        if field.name in have:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        elif field.nullable or not strict_required:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        else:
            raise ValueError(f"required column {field.name!r} missing from input")
    return df.select(*cols)
