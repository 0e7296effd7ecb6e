"""Independent pure-Python oracle generator for `ann_ivf_topk` — the last
closable ∅-oracle row (round-7 verdict ask #1). The blocker was Lloyd
refinement averaging doubles in partition order; round 8 made the
refinement order-deterministic (decimal(27,18)-exact component sums, one
double division — operators/similarity.py refine_centroids), so the whole
IVF walk is now reproducible from scratch:

- centroid seed pick: k smallest (xxhash64(CAST(id AS STRING)), id) —
  the pure-Python XXH64 from tools/gen_hashpath_oracle.py (public spec)
- cell assignment: argmax cosine, first-max tie-break (np.argmax order =
  ascending cell_id). assign_cells scores with a normalized float64 GEMM;
  this walk uses the left-fold cosine — mathematically identical, within
  ~1e-15 numerically — so every assignment and probe-ranking MARGIN is
  asserted > 1e-9 during generation: with that slack the two arithmetic
  paths provably produce the same argmax/rank, or generation fails loudly
- Lloyd mean: per (cell, pos), sum of Decimal(repr(v)) quantized to 18
  places HALF_UP (Spark's double→decimal(27,18) cast = BigDecimal.valueOf
  + setScale HALF_UP), then float(sum)/n (decimal→double cast is the
  correctly-rounded conversion both sides); empty cells keep the previous
  centroid (COALESCE)
- query probe: left-fold cosine vs each refined centroid, row_number over
  (csim DESC, cell_id ASC), keep nprobe
- scoring: left-fold cosine, ROUND HALF_UP 4dp on the shortest repr
  (= Spark Round for doubles), row_number over (sim DESC, neighbor_id ASC)

Expected rows over the fixed sf0.01 corpus are frozen as a VALUES table
for the driver's cross-engine hash compare — the gen_lsh_oracle.py
discipline. The live differential test
(tests/test_oracle_generators_fuzz.py) re-derives this walk against Spark
on random corpora.

    python tools/gen_ivf_oracle.py
"""

from __future__ import annotations

import hashlib
import os
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

try:  # package import (tests) or sibling import (script run)
    from tools.gen_hashpath_oracle import xxh_str
    from tools.gen_lsh_oracle import cosine, round_half_up
except ImportError:  # pragma: no cover
    from gen_hashpath_oracle import xxh_str
    from gen_lsh_oracle import cosine, round_half_up

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
OUT = os.path.join(
    os.path.dirname(__file__), "..", "nextgenetl_spark", "workloads", "_ivf_expected.py"
)
K_CENTROIDS, NPROBE, K, REFINE_ITERS = 16, 4, 5, 2

# Minimum admissible gap between competing cosines at any argmax / probe-
# rank decision: fold-vs-GEMM arithmetic differs by ~1e-15, so a 1e-9 gap
# guarantees both paths order identically.
MIN_MARGIN = 1e-9

_Q18 = Decimal(1).scaleb(-18)


def pick_centroids(vecs: dict, k: int) -> list[list[float]]:
    """Seed centroids: the k vectors with the smallest (xxhash64(str(id)),
    id) — list index IS cell_id (pick_centroids numbers by that order)."""
    order = sorted(vecs, key=lambda vid: (xxh_str(str(vid)), vid))
    return [[float(x) for x in vecs[vid]] for vid in order[:k]]


def nearest(v, cents) -> tuple[int, float]:
    """(argmax-cosine cell, margin to the runner-up). First max wins ties,
    matching np.argmax over cells sorted by cell_id."""
    best, best_cs, second_cs = -1, None, None
    for cid, c in enumerate(cents):
        cs = cosine(v, c)
        if best_cs is None or cs > best_cs:
            second_cs, best_cs, best = best_cs, cs, cid
        elif second_cs is None or cs > second_cs:
            second_cs = cs
    return best, (best_cs - second_cs) if second_cs is not None else float("inf")


def refine(vecs: dict, cents: list, iters: int) -> tuple[list, float]:
    """Deterministic Lloyd walk: decimal(.,18)-exact per-component sums,
    one double division; empty cells keep their previous centroid.
    Returns (refined centroids, min assignment margin seen)."""
    min_margin = float("inf")
    for _ in range(iters):
        members: dict[int, list] = {cid: [] for cid in range(len(cents))}
        for vid in vecs:
            cid, m = nearest(vecs[vid], cents)
            min_margin = min(min_margin, m)
            members[cid].append(vid)
        new = []
        for cid, c in enumerate(cents):
            ids = members[cid]
            if not ids:
                new.append(c)
                continue
            dim = len(c)
            vec = []
            for pos in range(dim):
                s = Decimal(0)
                for vid in ids:
                    s += Decimal(repr(float(vecs[vid][pos]))).quantize(_Q18, ROUND_HALF_UP)
                vec.append(float(s) / len(ids))
            new.append(vec)
        cents = new
    return cents, min_margin


def ivf_topk_expected(
    vecs: dict,
    query_ids,
    k_centroids: int = K_CENTROIDS,
    nprobe: int = NPROBE,
    k: int = K,
    refine_iters: int = REFINE_ITERS,
) -> tuple[list[tuple], float]:
    """Full ann_ivf_topk walk. Returns (rows, min decision margin) where
    rows = (query_id, neighbor_id, sim, rank) and the margin covers every
    cell assignment plus every probe-rank boundary (nprobe-th vs next)."""
    cents = pick_centroids(vecs, k_centroids)
    cents, min_margin = refine(vecs, cents, refine_iters)
    assign = {}
    for vid in vecs:
        cid, m = nearest(vecs[vid], cents)
        min_margin = min(min_margin, m)
        assign[vid] = cid
    rows: list[tuple] = []
    for qid in sorted(query_ids):
        qv = vecs[qid]
        ranked = sorted(
            ((cosine(qv, c), cid) for cid, c in enumerate(cents)),
            key=lambda t: (-t[0], t[1]),
        )
        if len(ranked) > nprobe:
            min_margin = min(min_margin, ranked[nprobe - 1][0] - ranked[nprobe][0])
        probed = {cid for _, cid in ranked[:nprobe]}
        cands = [
            (nid, round_half_up(cosine(qv, vecs[nid])))
            for nid in vecs
            if nid != qid and assign[nid] in probed
        ]
        for rank, (nid, sim) in enumerate(
            sorted(cands, key=lambda t: (-t[1], t[0]))[:k], start=1
        ):
            rows.append((qid, nid, sim, rank))
    return rows, min_margin


def main() -> None:
    t = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"), columns=["vec_id", "embedding"])
    vecs = dict(zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist()))
    queries = [vid for vid in vecs if vid < 10]

    rows, min_margin = ivf_topk_expected(vecs, queries)
    assert min_margin > MIN_MARGIN, (
        f"decision margin {min_margin:.3e} too small to certify fold-vs-GEMM "
        "order equivalence — do not freeze this oracle"
    )

    h = hashlib.md5()
    for vid in sorted(vecs):
        h.update(str(vid).encode() + b"\x00" + str(vecs[vid]).encode() + b"\x01")
    with open(os.path.abspath(OUT), "w", encoding="utf-8") as fh:
        fh.write(
            '"""GENERATED by tools/gen_ivf_oracle.py — do not edit.\n\n'
            "Expected ann_ivf_topk output (k_centroids=16, nprobe=4, k=5,\n"
            "refine_iters=2) over the fixed sf0.01 corpus, computed by an\n"
            'independent pure-Python Lloyd/IVF walk."""\n\n'
            f'CORPUS_MD5 = "{h.hexdigest()}"\n'
            f"MIN_DECISION_MARGIN = {min_margin!r}\n\n"
        )
        fh.write("IVF_TOPK = [\n")
        for r in rows:
            fh.write(f"    ({r[0]}, {r[1]}, {r[2]!r}, {r[3]}),\n")
        fh.write("]\n")
    print(
        f"wrote {len(rows)} rows (min margin {min_margin:.3e}) -> {os.path.abspath(OUT)}"
    )


if __name__ == "__main__":
    main()
