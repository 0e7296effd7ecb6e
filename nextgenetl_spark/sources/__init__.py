"""File-format readers (SURVEY.md §2.1): TSV/JSONL with the reference's
normalize-then-infer ingest discipline, plus the genomic raw-file parsers
(MAF concat, GTF attribute expansion, VCF FORMAT split) re-expressed as
DataFrame pipelines over ``spark.read`` primitives."""

from nextgenetl_spark.sources.tsv import read_tsv
from nextgenetl_spark.sources.jsonl import read_jsonl
from nextgenetl_spark.sources.maf import read_maf_concat
from nextgenetl_spark.sources.gtf import read_gtf
from nextgenetl_spark.sources.vcf import read_vcf

__all__ = ["read_tsv", "read_jsonl", "read_maf_concat", "read_gtf", "read_vcf"]
