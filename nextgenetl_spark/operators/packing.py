"""Sequence packing for training-data assembly.

Two tiers, matching how LLM pipelines actually pack documents into
fixed-size context windows:

- ``context_window_chunks`` — GPT-style concat-then-chunk: documents are
  laid out as one continuous token stream per part and each document is
  assigned the window its first token lands in. A pure window-function
  cumulative sum: JVM-side, one shuffle on the part key, SQL-oracle-able.
- ``greedy_bin_pack`` — next-fit bin packing (close the bin when the next
  document would overflow). A sequential recurrence, NOT expressible as a
  window function, so it runs one Arrow batch per part via
  ``applyInPandas``; parts are independent, parallelism = #parts. At
  100 TB the part key must be a bounded shard (source × day), exactly the
  contract the dedup blockers already use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nextgenetl_spark.operators.textstats import tokens


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach ``n_tokens`` (whitespace tokens — the engine's standard
    tokenizer from operators/textstats.py)."""
    return df.withColumn("n_tokens", F.size(tokens(text_col)).cast("long"))


def context_window_chunks(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    part_col: str = "source",
) -> DataFrame:
    """Concat-then-chunk window assignment: within each part, documents are
    concatenated in ``order_col`` order and ``window_id`` is the
    fixed-size context window the document's FIRST token lands in
    (documents may straddle windows, as in real GPT-style packing).

    One running-sum window over (part, order) — a single hash-partition
    shuffle on the part key; everything else is codegen."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn("window_id", F.floor(start / F.lit(budget)))


def window_stats(packed: DataFrame, part_col: str = "source") -> DataFrame:
    """Per (part, window) packing profile: document count + token mass."""
    return packed.groupBy(part_col, "window_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("window_tokens"),
    )


def greedy_bin_pack(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    part_col: str = "source",
) -> DataFrame:
    """Next-fit packing: walk documents in ``order_col`` order per part;
    when adding a document would push the open bin past ``budget``, close
    it and start a new one. Oversized documents (> budget) occupy a bin
    alone. Emits (part, order, n_tokens, bin_id).

    Per-part sequential loop in numpy via applyInPandas (Arrow-batched);
    the recurrence prevents a window-function form. State per task is one
    running counter."""
    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        bins = []
        bin_id, fill = 0, 0
        for t in pdf[token_col]:
            t = int(t)
            if fill > 0 and fill + t > budget:
                bin_id += 1
                fill = 0
            bins.append(bin_id)
            fill += t
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf[[part_col, order_col, token_col, "bin_id"]]

    out_schema = f"{part_col} string, {order_col} long, {token_col} long, bin_id long"
    return df.select(part_col, order_col, token_col).groupBy(part_col).applyInPandas(pack, out_schema)
