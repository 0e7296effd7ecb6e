"""Pipeline harness: YAML-configured step chains (SURVEY.md §3.1) with the
publish/compare/version tail (§3.4)."""

from nextgenetl_spark.plans.pipeline import Pipeline, load_config
from nextgenetl_spark.plans.publish import publish_table

__all__ = ["Pipeline", "load_config", "publish_table"]
