"""Unit tests for the flatten family (SURVEY.md §2.7) on tiny literal
frames, covering the reference's null / empty / malformed edge cases
(/root/reference/transformation.py:151,224,260,311)."""

from __future__ import annotations

from pyspark.sql import types as T

from build_datawarehouse_demo_spark.operators.flatten import (
    explode_delimited,
    explode_json_array,
    explode_map,
    parse_hour_ranges,
)

HL_SCHEMA = T.StructType(
    [
        T.StructField("identifier", T.StringType()),
        T.StructField("params", T.StringType()),
        T.StructField("type", T.StringType()),
    ]
)


def test_explode_delimited_trims_and_drops_empties(spark):
    df = spark.createDataFrame(
        [("b1", "Pizza, Bars,  Cafés"), ("b2", ""), ("b3", None), ("b4", "Solo")],
        "id string, categories string",
    )
    out = explode_delimited(df, "categories", "cat", keep_cols=("id",))
    rows = {(r.id, r.cat) for r in out.collect()}
    assert rows == {("b1", "Pizza"), ("b1", "Bars"), ("b1", "Cafés"), ("b4", "Solo")}


def test_explode_map_skips_null_maps(spark):
    df = spark.createDataFrame(
        [("b1", {"WiFi": "free", "HasTV": "True"}), ("b2", None)],
        "id string, attributes map<string,string>",
    )
    out = explode_map(df, "attributes", keep_cols=("id",), key_alias="k", value_alias="v")
    rows = {(r.id, r.k, r.v) for r in out.collect()}
    assert rows == {("b1", "WiFi", "free"), ("b1", "HasTV", "True")}


def test_explode_json_array_malformed_yields_null_element(spark):
    df = spark.createDataFrame(
        [
            ("b1", '[{"identifier":"i1","params":"p","type":"t"}]'),
            ("b2", "not json at all"),
            ("b3", None),
        ],
        "id string, hl string",
    )
    out = explode_json_array(df, "hl", HL_SCHEMA, keep_cols=("id",), element_alias="h")
    rows = [(r.id, r.h.identifier if r.h else None) for r in out.collect()]
    # outer explode keeps the malformed/null rows with null elements,
    # matching the reference's except -> empty-list handling
    assert ("b1", "i1") in rows
    assert ("b2", None) in rows and ("b3", None) in rows


def test_parse_hour_ranges_wraps_and_drops_unparseable(spark):
    df = spark.createDataFrame(
        [
            ("b1", {"Monday": "9:0-22:0", "Tuesday": "20:0-26:0"}),
            ("b2", {"Friday": "garbage"}),
        ],
        "id string, hours map<string,string>",
    )
    out = parse_hour_ranges(df, "hours", keep_cols=("id",))
    rows = {
        (r.id, r.day_of_week, r.open_time, r.close_time, r.open_hour_id, r.close_hour_id)
        for r in out.collect()
    }
    # close 26 wraps to 2 (pmod, /root/reference/transformation.py:210);
    # the garbage row is dropped like the reference's warn-and-skip;
    # raw open_time/close_time strings kept per the reference schema.
    assert rows == {
        ("b1", "Monday", "9:0", "22:0", 9, 22),
        ("b1", "Tuesday", "20:0", "26:0", 20, 2),
    }
