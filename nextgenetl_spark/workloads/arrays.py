"""Array / struct / JSON workloads (SURVEY.md §2.8) on documents + part.

These reproduce the reference's UNNEST / SPLIT / WITH OFFSET / zip idioms
as explode / posexplode / arrays_zip plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nextgenetl_spark.catalog import load
from nextgenetl_spark.functions import leaf_name, split_offset
from nextgenetl_spark.workloads import workload


@workload(
    "explode_tokens",
    oracle="""
    SELECT token, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 20
    """,
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST lateral flatten + top-k (N1/N3/O2, reference:
    PDC/build_pdc_case_metadata.py:176-229 CROSS JOIN UNNEST). The explode
    happens before the aggregate, but partial aggregation means only
    (token, partial-count) pairs shuffle — not the exploded rows."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(20)
    )


@workload(
    "posexplode_offset",
    oracle="""
    SELECT s.doc_id, CAST(t.i - 1 AS INT) AS pos, s.arr[t.i] AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS arr
          FROM documents WHERE doc_id < 5) s,
         LATERAL unnest(range(1, len(s.arr) + 1)) AS t(i)
    """,
)
def posexplode_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``UNNEST ... WITH OFFSET`` → posexplode (N2, reference:
    compare_clinical_gdc_api_releases.py:105-107,156-157)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)
    return d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
    )


@workload(
    "zip_arrays",
    oracle="""
    SELECT doc_id, u.tok, u.rtok
    FROM (SELECT doc_id,
                 unnest(list_zip(arr, list_reverse(arr))::STRUCT(tok VARCHAR, rtok VARCHAR)[]) AS u
          FROM (SELECT doc_id, string_split(text, ' ') AS arr
                FROM documents WHERE doc_id < 5) s) t
    """,
)
def zip_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional zip of two parallel arrays — the ``UNNEST(a) WITH OFFSET
    JOIN UNNEST(b) WITH OFFSET USING(OFFSET)`` idiom (N5/J11, reference:
    build_regulome_explorer_sql_import_v2.py:498-533)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)
    toks = d.withColumn("a", F.split(F.col("text"), " ")).withColumn("b", F.reverse(F.col("a")))
    return (
        toks.select("doc_id", F.explode(F.arrays_zip("a", "b")).alias("z"))
        .select("doc_id", F.col("z.a").alias("tok"), F.col("z.b").alias("rtok"))
    )


@workload(
    "leaf_extract",
    oracle="""
    SELECT p_partkey,
           (string_split(p_name, ' '))[-1] AS leaf,
           (string_split(p_name, ' '))[1]  AS head
    FROM part WHERE p_partkey < 100
    """,
)
def leaf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array indexing from both ends: ``SPLIT(x,d)[OFFSET(0)]`` and
    ``ARRAY_REVERSE(SPLIT(path,'.'))[OFFSET(0)]`` (N4/N7, reference:
    create_tables_quant_data_matrix_pdc.py:652-653;
    compare_clinical_gdc_api_releases.py:124)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return p.select(
        "p_partkey",
        leaf_name("p_name", " ").alias("leaf"),
        split_offset("p_name", " ", 0).alias("head"),
    )


@workload(
    "json_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
           COUNT(json_extract_string(props, '$.k')) AS k_present
    FROM events
    GROUP BY event_type
    """,
)
def json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON string column → typed extraction + aggregate (N8-adjacent; the
    reference serializes/introspects rows as JSON,
    build_gdc_file_clinical_tables_TCGA.py:276-280)."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("k_total"),
        F.count(k).alias("k_present"),
    )


@workload(
    "variant_props",
    oracle="""
    WITH x AS (
        SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    )
    SELECT user_id,
           COUNT(k) AS n_with_k,
           CAST(MIN(k) AS BIGINT) AS k_min,
           CAST(MAX(k) AS BIGINT) AS k_max
    FROM x WHERE k >= 50
    GROUP BY user_id
    """,
)
def variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via Spark 4 VARIANT: ``parse_json`` once into
    a binary variant value, then typed ``variant_get`` extractions — the
    shredded-JSON path that replaces per-access string re-parsing
    (get_json_object re-parses the JSON text on EVERY extraction; a
    variant parses once and fields are O(1) binary lookups — the
    difference compounds at 100 TB with many extractions per row). Filter
    and aggregate run on the extracted typed column, so the scan stage
    sees an ordinary long."""
    e = load(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "long")
    x = e.select("user_id", k.alias("k")).filter(F.col("k") >= 50)
    return x.groupBy("user_id").agg(
        F.count("k").alias("n_with_k"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
    )
