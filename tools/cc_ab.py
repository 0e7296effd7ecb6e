"""Interleaved A/B of connected-components round structures on the real
sf0.1 near-dup pair graph (r12 verdict ask #3: cut near_dup_groups'
per-round shuffle/fixed cost). Pairs are discovered once and localCheckpointed
eagerly so every variant times ONLY its CC rounds; variant outputs are
asserted identical to the current implementation before any timing is
trusted. Usage: python tools/cc_ab.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from nextgenetl_spark.session import get_spark
from nextgenetl_spark.catalog import load
from nextgenetl_spark.operators import dedup as D


def cc_current(edges):
    return D.connected_components(edges)


def cc_prepart(edges, a_col="a_id", b_col="b_id", max_iters=30):
    """Variant B: sym pre-partitioned by src before the checkpoint, so each
    round's join reuses the edge table's partitioning instead of
    re-exchanging the edge-sized side (guide §2.4)."""
    sym = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .repartition(F.col("src"))
        .localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    )
    labels = sym.select(F.col("src").alias("node")).distinct().withColumn("label", F.col("node"))
    prev_sum = None
    for _ in range(max_iters):
        contrib = sym.join(labels, sym.src == labels.node).select("dst", "label")
        labels = (
            contrib.union(labels.select(F.col("node").alias("dst"), "label"))
            .groupBy("dst")
            .agg(F.min("label").alias("label"))
            .select(F.col("dst").alias("node"), "label")
        )
        l2 = labels.select(F.col("node").alias("n2"), F.col("label").alias("l2"))
        labels = (
            labels.join(l2, labels.label == l2.n2, "left")
            .select("node", F.coalesce("l2", "label").alias("label"))
            .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
        )
        cur_sum = labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def cc_twostep(edges, a_col="a_id", b_col="b_id", max_iters=30):
    """Variant C: two propagation steps per materialized round — halves the
    per-round actions/checkpoints/convergence checks; extra steps after the
    fixpoint are no-ops so results are identical."""
    sym = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    )
    labels = sym.select(F.col("src").alias("node")).distinct().withColumn("label", F.col("node"))
    prev_sum = None
    for _ in range(max_iters):
        for _step in range(2):
            contrib = sym.join(labels, sym.src == labels.node).select("dst", "label")
            labels = (
                contrib.union(labels.select(F.col("node").alias("dst"), "label"))
                .groupBy("dst")
                .agg(F.min("label").alias("label"))
                .select(F.col("dst").alias("node"), "label")
            )
            l2 = labels.select(F.col("node").alias("n2"), F.col("label").alias("l2"))
            labels = labels.join(l2, labels.label == l2.n2, "left").select(
                "node", F.coalesce("l2", "label").alias("label")
            )
        labels = labels.localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
        cur_sum = labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def cc_both(edges, a_col="a_id", b_col="b_id", max_iters=30):
    sym = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .repartition(F.col("src"))
        .localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    )
    labels = sym.select(F.col("src").alias("node")).distinct().withColumn("label", F.col("node"))
    prev_sum = None
    for _ in range(max_iters):
        for _step in range(2):
            contrib = sym.join(labels, sym.src == labels.node).select("dst", "label")
            labels = (
                contrib.union(labels.select(F.col("node").alias("dst"), "label"))
                .groupBy("dst")
                .agg(F.min("label").alias("label"))
                .select(F.col("dst").alias("node"), "label")
            )
            l2 = labels.select(F.col("node").alias("n2"), F.col("label").alias("l2"))
            labels = labels.join(l2, labels.label == l2.n2, "left").select(
                "node", F.coalesce("l2", "label").alias("label")
            )
        labels = labels.localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
        cur_sum = labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def cc_delta(edges, a_col="a_id", b_col="b_id", max_iters=30):
    """Variant E: delta label propagation with a fused first round.

    Round 1 is computed directly as label(dst) = min(dst, min neighbor) —
    one groupBy over the symmetric edge list, replacing the labels-init
    distinct (a full |E| exchange) AND round 1's identity join (labels_0 is
    the identity map, so joining it into the edge list was a no-op that
    still shuffled). Later rounds propagate contributions ONLY from nodes
    whose label changed last round: labels are monotone decreasing, so an
    unchanged src's contribution was already folded into dst's min in the
    round where src last changed (induction: label_k(dst) <= label_{k-1}(src)
    for every edge). Contributions with label >= dst are pruned before the
    shuffle (label(dst) <= dst always). Pointer doubling unchanged.
    Convergence = zero changed rows (same one action per round)."""
    sym = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    )
    # fused round 1: min over closed neighborhood, one |E| shuffle
    labels = (
        sym.groupBy("dst")
        .agg(F.least(F.min("src"), F.col("dst")).alias("label"))
        .select(F.col("dst").alias("node"), "label")
    )
    # pointer doubling on round 1's labels
    l2 = labels.select(F.col("node").alias("n2"), F.col("label").alias("l2"))
    labels = (
        labels.join(l2, labels.label == l2.n2, "left")
        .select("node", F.coalesce("l2", "label").alias("label"))
        .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    )
    changed = labels.where(F.col("label") != F.col("node"))
    if changed.count() == 0:
        return labels
    for _ in range(max_iters):
        contrib = (
            sym.join(changed.withColumnRenamed("node", "src"), "src")
            .where(F.col("label") < F.col("dst"))
            .select("dst", "label")
        )
        cand = contrib.groupBy("dst").agg(F.min("label").alias("cand"))
        merged = labels.join(cand, labels.node == cand.dst, "left").select(
            "node",
            F.col("label").alias("old"),
            F.least(F.col("label"), F.coalesce("cand", "label")).alias("label"),
        )
        l2 = merged.select(F.col("node").alias("n2"), F.col("label").alias("l2"))
        merged = (
            merged.join(l2, merged.label == l2.n2, "left")
            .select("node", "old", F.coalesce("l2", "label").alias("label"))
            .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
        )
        changed = merged.where(F.col("label") != F.col("old")).select("node", "label")
        n_changed = changed.count()
        labels = merged.select("node", "label")
        if n_changed == 0:
            break
    return labels


VARIANTS = {
    "A_current": cc_current,
    "B_prepart": cc_prepart,
    "C_twostep": cc_twostep,
    "D_both": cc_both,
    "E_delta": cc_delta,
}


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("cc_ab")
    spark.range(1000).selectExpr("sum(id)").collect()
    d = load(spark, sf_dir, "documents")
    pairs = (
        D.ngram_jaccard_pairs(d, "source", threshold=0.5)
        .select("a_id", "b_id")
        .localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    )
    print("pairs:", pairs.count())

    # result identity first
    ref = sorted(map(tuple, cc_current(pairs).collect()))
    for name, fn in VARIANTS.items():
        got = sorted(map(tuple, fn(pairs).collect()))
        assert got == ref, f"{name} diverges from current implementation!"
    print("all variants identical:", len(ref), "labels")

    walls = {k: [] for k in VARIANTS}
    for r in range(reps):
        for name, fn in VARIANTS.items():
            t0 = time.time()
            fn(pairs).agg(F.count(F.lit(1))).first()
            walls[name].append(round(time.time() - t0, 3))
    for name, ws in walls.items():
        print(f"{name:12s} min {min(ws):6.3f}  runs {ws}")


if __name__ == "__main__":
    main()
