"""nextgenetl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of isb-cgc/NextGenETL.

The reference delegates all query execution to BigQuery Standard SQL
(reference: common_etl/support.py:775-821); this package re-expresses that
capability surface as idiomatic PySpark DataFrame/SQL plans so Catalyst and
Tungsten pick the physical strategy. Layers:

- ``session``    SparkSession factory (AQE, Arrow, sane shuffle defaults)
- ``functions``  scalar/array expression helpers (string_agg, delim_count, ...)
- ``operators``  relational operator compositions (set ops, joins, aggs,
                 dedup, similarity, text-analysis)
- ``sources``    file-format readers (TSV/JSONL/MAF/GTF/VCF) + normalization
- ``inference``  value normalization + type inference + schema generation
- ``flatten``    recursive nested-record flattening engine
- ``plans``      YAML-configured step pipeline harness + publish/compare
- ``streaming``  Structured Streaming extensions (watermarks, windows)
- ``workloads``  oracle-paired query registry used by the driver contract
"""

__version__ = "0.1.0"
