"""PySpark-native analytics engine with the capabilities of
MaVietHa-datascience/build_datawarehouse_demo (reference read-only at
/root/reference/), re-expressed Spark-first.

The reference is a medallion-style batch ETL: raw-zone JSON/CSV ->
pandas transforms -> DuckDB star schema -> SQL queries
(/root/reference/README.md:2-4). Here the same capabilities are a DAG
of lazy DataFrame definitions optimized by Catalyst, plus the
large-scale training-data-pipeline operators (dedup, similarity,
text analysis, multimodal plumbing) the reference never had.

Layout
------
- ``session``    SparkSession builder (AQE, Arrow, UTC, sized shuffles)
- ``sources``    typed readers, table sinks, catalog helpers, generators
- ``operators``  flatten / keys / joins / dedup / similarity / text / multimodal
- ``functions``  scalar expression kits (dates, strings)
- ``plans``      composed pipelines (the star-schema warehouse build)
- ``streaming``  Structured Streaming operators (watermark + windows)
"""

__version__ = "0.1.0"
