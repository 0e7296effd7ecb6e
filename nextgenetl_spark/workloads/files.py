"""File-format reader workloads (S4/S5): deterministic GTF and MAF fixture
files are rendered from the `part` table into /tmp (atomic, idempotent),
read back through the real readers, and oracle-checked against the same
derivation computed directly in SQL — so the parsers themselves sit inside
the driver's correctness gate, not just pytest."""

from __future__ import annotations

import hashlib
import os
import tempfile

import duckdb
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nextgenetl_spark.sources.gtf import read_gtf
from nextgenetl_spark.sources.maf import read_maf_concat
from nextgenetl_spark.workloads import workload

CALLER_SETS = ["muse", "muse;mutect2", "mutect2;varscan2*", "muse;mutect2;pindel;varscan2"]


def _fixture_dir(sf_dir: str) -> str:
    d = f"/tmp/nextgenetl_fixtures/{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}"
    os.makedirs(d, exist_ok=True)
    return d


def _atomic_write(path: str, content: str) -> None:
    if os.path.exists(path):
        return
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
    with os.fdopen(fd, "w") as fh:
        fh.write(content)
    os.replace(tmp, path)


def _parts(sf_dir: str):
    con = duckdb.connect()
    return con.sql(
        f"SELECT p_partkey, p_name FROM '{sf_dir}/part.parquet' ORDER BY p_partkey"
    ).fetchall()


def _gtf_path(sf_dir: str) -> str:
    path = os.path.join(_fixture_dir(sf_dir), "synth.gtf")
    lines = ["#!genome-build synth"]
    for key, name in _parts(sf_dir):
        lines.append(
            f"chr{key % 5 + 1}\tsynth\tgene\t{key * 100 + 1}\t{key * 100 + 50}\t.\t"
            f"{'+' if key % 2 == 0 else '-'}\t.\t"
            f'gene_id "G{key}"; gene_name "{name}";'
        )
    _atomic_write(path, "\n".join(lines) + "\n")
    return path


def _maf_paths(sf_dir: str) -> list[str]:
    d = _fixture_dir(sf_dir)
    paths = []
    for shard in (0, 1):
        path = os.path.join(d, f"sample_{shard}.maf")
        lines = ["#version synth-1.0", "hugo_symbol\tstart_position\tcallers"]
        for key, name in _parts(sf_dir):
            if key % 2 == shard:
                lines.append(f"{name}\t{key * 10}\t{CALLER_SETS[key % 4]}")
        _atomic_write(path, "\n".join(lines) + "\n")
        paths.append(path)
    return paths


@workload(
    "gtf_parse",
    oracle="""
    SELECT 'chr' || CAST(p_partkey % 5 + 1 AS VARCHAR) AS seqname,
           'gene' AS feature,
           CAST(p_partkey * 100 + 1 AS BIGINT)  AS start,
           CAST(p_partkey * 100 + 50 AS BIGINT) AS "end",
           CASE WHEN p_partkey % 2 = 0 THEN '+' ELSE '-' END AS strand,
           'G' || CAST(p_partkey AS VARCHAR) AS gene_id,
           p_name AS gene_name
    FROM part
    """,
)
def gtf_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 GTF parser through the driver gate: 9-column split + `;`-packed
    attribute extraction as one scan-stage projection (reference:
    BQ_Table_Building/build_gtf_bq_table.py:131-215)."""
    df = read_gtf(spark, _gtf_path(sf_dir), attributes=("gene_id", "gene_name"))
    return df.select("seqname", "feature", "start", "end", "strand", "gene_id", "gene_name")


@workload(
    "maf_concat",
    oracle="""
    SELECT p_name AS hugo_symbol,
           CAST(p_partkey * 10 AS VARCHAR) AS start_position,
           'sample_' || CAST(p_partkey % 2 AS VARCHAR) AS file_gdc_id,
           CASE WHEN p_partkey % 4 IN (0, 1, 3) THEN 'Yes' ELSE 'No' END AS muse,
           CASE WHEN p_partkey % 4 IN (1, 2, 3) THEN 'Yes' ELSE 'No' END AS mutect2,
           CASE WHEN p_partkey % 4 = 3 THEN 'Yes' ELSE 'No' END AS pindel,
           CASE p_partkey % 4 WHEN 2 THEN 'Yes*' WHEN 3 THEN 'Yes' ELSE 'No' END AS varscan2
    FROM part
    """,
)
def maf_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/Y6 MAF multi-file concat through the driver gate: globbed scan
    (no driver-side append), file-name provenance via input_file_name(),
    caller-flag expansion incl. the `*` suffix (reference:
    build_open_somatic_mut_bq_table.py:213-304)."""
    df = read_maf_concat(spark, _maf_paths(sf_dir))
    return df.select(
        "hugo_symbol", "start_position", "file_gdc_id", "muse", "mutect2", "pindel", "varscan2"
    )
