"""Flagship query (SURVEY.md §7 minimum slice).

The reference's signature shape in one plan: build a deduplicated
dimension with surrogate keys out of a fact column, broadcast-join the
facts back to it, aggregate (the category-dim pattern,
/root/reference/transformation.py:149-168, applied to the driver's
orders/lineitem tables).

Exercises: parquet scan (pushdown), projection, distinct, global
row_number surrogate key on the dim (small by construction), broadcast
hash join, hash aggregate with partial/final split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from build_datawarehouse_demo_spark.operators.joins import broadcast_dim_join
from build_datawarehouse_demo_spark.operators.keys import surrogate_key_rownum
from build_datawarehouse_demo_spark.sources.readers import read_parquet


def flagship_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue and volume per order priority through a built dimension.

    dim_priority = distinct o_orderpriority + row_number id;
    fact = lineitem ⋈ orders (key join) ⋈ broadcast(dim_priority);
    aggregate revenue/qty/count per (priority_id, priority).
    """
    orders = read_parquet(spark, f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    lineitem = read_parquet(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
    )

    dim_priority = surrogate_key_rownum(
        orders.select(F.col("o_orderpriority").alias("priority_name")).dropDuplicates(),
        order_by=("priority_name",),
        key_col="priority_id",
    )

    fact = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "inner")
    fact = broadcast_dim_join(
        fact.withColumnRenamed("o_orderpriority", "priority_name"),
        dim_priority,
        on="priority_name",
    )

    # money math in DECIMAL(18,2): exact, associative, bit-identical to
    # any other engine (oracle parity); final cast back to double.
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        fact.groupBy("priority_id", "priority_name")
        .agg(
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
