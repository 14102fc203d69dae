"""Schema-spec compiler + conformance (SURVEY §2 Milestone 1; reference
parity: src/utils/bigquery_helper.py:98-107, :115-122)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from vmhub_data_pipeline_spark.schema import compile_schema, conform

SPEC = {
    "schema": [
        {"name": "message_id", "type": "STRING", "mode": "REQUIRED"},
        {"name": "retry_count", "type": "INTEGER", "mode": "REQUIRED"},
        {"name": "sent_at", "type": "TIMESTAMP"},
        {"name": "template_variables", "type": "JSON", "mode": "NULLABLE"},
        {"name": "tags", "type": "STRING", "mode": "REPEATED"},
        {
            "name": "meta",
            "type": "RECORD",
            "fields": [
                {"name": "source", "type": "STRING"},
                {"name": "attempt", "type": "INTEGER", "mode": "REQUIRED"},
            ],
        },
    ]
}


def test_compile_types_and_modes():
    s = compile_schema(SPEC)
    by_name = {f.name: f for f in s.fields}
    assert by_name["message_id"].dataType == T.StringType()
    assert not by_name["message_id"].nullable
    assert by_name["retry_count"].dataType == T.LongType()
    assert by_name["sent_at"].dataType == T.TimestampType()
    assert by_name["sent_at"].nullable  # default NULLABLE
    assert by_name["template_variables"].dataType == T.StringType()  # JSON -> string
    assert isinstance(by_name["tags"].dataType, T.ArrayType)
    meta = by_name["meta"].dataType
    assert isinstance(meta, T.StructType)
    assert not meta["attempt"].nullable


def test_unknown_type_raises():
    with pytest.raises(ValueError, match="unsupported type"):
        compile_schema([{"name": "x", "type": "GEOGRAPHY"}])


def test_conform_drops_unknown_and_fills_missing(spark):
    schema = compile_schema(
        [
            {"name": "a", "type": "STRING", "mode": "REQUIRED"},
            {"name": "b", "type": "INTEGER"},
        ]
    )
    df = spark.createDataFrame(
        [("x", "99", "dropme")], "a string, b string, unknown_col string"
    )
    out = conform(df, schema)
    assert out.columns == ["a", "b"]
    row = out.first()
    assert row["a"] == "x" and row["b"] == 99  # cast string->long

    df2 = spark.createDataFrame([("y",)], "a string")
    out2 = conform(df2, schema)
    assert out2.first()["b"] is None  # missing nullable -> NULL


def test_conform_missing_required_raises(spark):
    schema = compile_schema([{"name": "a", "type": "STRING", "mode": "REQUIRED"}])
    df = spark.createDataFrame([(1,)], "other long")
    with pytest.raises(ValueError, match="required column 'a' missing"):
        conform(df, schema)
