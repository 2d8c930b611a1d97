"""Star-schema edge parity: empty inputs keep stable schemas (the
reference's early-return guards, /root/reference/transformation.py:
242,284,328,368,418,448,485) and NOAA 'T' trace values null out."""

from __future__ import annotations

from build_datawarehouse_demo_spark.plans.star_schema import build_warehouse


def test_empty_inputs_give_empty_tables_with_schemas(spark):
    raw = {
        "business": spark.createDataFrame(
            [],
            "business_id string, name string, address string, city string, state string, "
            "postal_code string, latitude double, longitude double, stars double, "
            "review_count int, is_open int, categories string, "
            "attributes map<string,string>, hours map<string,string>",
        ),
        "checkin": spark.createDataFrame([], "business_id string, date string"),
    }
    wh = build_warehouse(spark, raw)
    # generated dims exist regardless of inputs
    assert wh["dim_hour"].count() == 24
    # business-derived tables are empty but schema-stable
    assert wh["dim_business"].count() == 0
    assert wh["fact_business_categories"].columns == ["business_id", "category_id"]
    assert wh["fact_checkins"].count() == 0
    # datasets not provided -> tables not built (the reference's
    # dataset router simply skips them)
    assert "fact_reviews" not in wh


def test_weather_trace_values_null_out(spark):
    precip = spark.createDataFrame(
        [("20160426", "0.12", "0.2"), ("20160427", "T", "0.3")],
        "date string, precipitation string, precipitation_normal string",
    )
    wh = build_warehouse(spark, {"precipitation": precip})
    rows = {r.datetime_id is not None: r for r in wh["dim_precipitation"].collect()}
    got = {(round(r.precipitation, 2) if r.precipitation is not None else None)
           for r in wh["dim_precipitation"].collect()}
    assert got == {0.12, None}
