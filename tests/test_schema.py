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


def test_url_path_quote_matches_urllib_quote(spark):
    """P8: url_path_quote is exact urllib.parse.quote (safe='/') parity —
    the reference quotes a CNPJ path segment with quote() before building
    the request URL (reference: src/api/vmhub_client.py:120)."""
    from urllib.parse import quote

    from vmhub_data_pipeline_spark.functions import url_path_quote
    import pyspark.sql.functions as F

    samples = [
        "12.345.678/0001-90",        # CNPJ: all chars safe under quote()
        "Customer#000000042",        # '#' -> %23
        "a b+c",                     # space -> %20 (NOT '+'), '+' -> %2B
        "path/with/slashes",         # '/' stays literal (safe='/')
        "star*tilde~",               # '*' -> %2A, '~' stays
        "percent%20already",         # '%' -> %25
        "naïve café ☕",             # non-ASCII -> UTF-8 percent triples
        "-._~ okay",
        "",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string").select(
        "s", url_path_quote("s").alias("q")
    )
    got = {r["s"]: r["q"] for r in df.collect()}
    assert got == {s: quote(s) for s in samples}
