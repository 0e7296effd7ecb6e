"""Independent pure-Python oracle generator for `ann_ivfpq_topk` (round 8).

IVF-PQ composes the two already-certified walks, and so does this oracle:

- IVF half (tools/gen_ivf_oracle.py): XXH64 seed pick of cell centroids,
  optional deterministic-decimal Lloyd refinement, fold-cosine cell
  assignment, per-query probe ranking — every argmax / probe-boundary
  margin asserted
- PQ half (tools/gen_pq_oracle.py): fold normalization, XXH64 seed pick of
  per-subspace codebooks, deterministic-decimal Lloyd, L2-argmin encoding,
  per-query ADC lookup-table fold — every argmin / shortlist-boundary
  margin asserted (same-code boundary ties exempt: identical code tuples
  produce the same gathered sum on both engines and resolve by id)
- composition: a query's candidate set is the probed cells' encoded
  vectors; ADC shortlists them; the exact fold-cosine re-rank of the
  shortlist (HALF_UP 4dp, id tie-break) is the output

Expected rows over the fixed sf0.01 corpus are frozen as a VALUES table
for the driver's cross-engine hash compare. The live differential test
(tests/test_oracle_generators_fuzz.py) re-derives this walk against Spark
on random corpora.

    python tools/gen_ivfpq_oracle.py
"""

from __future__ import annotations

import hashlib
import os

import pyarrow.parquet as pq

try:  # package import (tests) or sibling import (script run)
    from tools.gen_ivf_oracle import nearest
    from tools.gen_ivf_oracle import pick_centroids as pick_cell_centroids
    from tools.gen_ivf_oracle import refine as refine_cells
    from tools.gen_lsh_oracle import cosine, fold_dot, round_half_up
    from tools.gen_pq_oracle import MIN_MARGIN, _argmin_sqdist, train_codebooks, unit
except ImportError:  # pragma: no cover
    from gen_ivf_oracle import nearest, refine as refine_cells
    from gen_ivf_oracle import pick_centroids as pick_cell_centroids
    from gen_lsh_oracle import cosine, fold_dot, round_half_up
    from gen_pq_oracle import MIN_MARGIN, _argmin_sqdist, train_codebooks, unit

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
OUT = os.path.join(
    os.path.dirname(__file__), "..", "nextgenetl_spark", "workloads", "_ivfpq_expected.py"
)
K_CENTROIDS, NPROBE, REFINE_ITERS = 16, 4, 1
M, KS, TRAIN_ITERS, SHORTLIST, K = 8, 16, 1, 32, 5


def ivfpq_topk_expected(
    vecs: dict,
    query_ids,
    k_centroids: int = K_CENTROIDS,
    nprobe: int = NPROBE,
    refine_iters: int = REFINE_ITERS,
    m: int = M,
    ks: int = KS,
    train_iters: int = TRAIN_ITERS,
    shortlist: int = SHORTLIST,
    k: int = K,
) -> tuple[list[tuple], float]:
    """Full ann_ivfpq_topk walk over raw vectors. Returns (rows, min
    decision margin): rows = (query_id, neighbor_id, sim, rank)."""
    # IVF half: cells over the RAW vectors (ivf_topk's contract)
    cents = pick_cell_centroids(vecs, k_centroids)
    min_margin = float("inf")
    if refine_iters > 0:
        cents, min_margin = refine_cells(vecs, cents, refine_iters)
    assign = {}
    for vid in vecs:
        cid, marg = nearest(vecs[vid], cents)
        min_margin = min(min_margin, marg)
        assign[vid] = cid

    # PQ half: codebooks + codes over the UNIT vectors (pq_topk's contract)
    nvecs = {}
    for vid in vecs:
        nv = unit(vecs[vid])
        if nv is not None:
            nvecs[vid] = nv
    dim = len(next(iter(nvecs.values())))
    dsub = dim // m
    CB, cb_margin = train_codebooks(nvecs, m, ks, train_iters)
    min_margin = min(min_margin, cb_margin)
    codes = {}
    for vid in nvecs:
        cs = []
        for j in range(m):
            t, marg = _argmin_sqdist(nvecs[vid][j * dsub : (j + 1) * dsub], CB[j])
            min_margin = min(min_margin, marg)
            cs.append(t)
        codes[vid] = cs

    rows: list[tuple] = []
    for qid in sorted(query_ids):
        q = [float(x) for x in vecs[qid]]
        ranked = sorted(
            ((cosine(q, c), cid) for cid, c in enumerate(cents)),
            key=lambda t: (-t[0], t[1]),
        )
        if len(ranked) > nprobe:
            min_margin = min(min_margin, ranked[nprobe - 1][0] - ranked[nprobe][0])
        probed = {cid for _, cid in ranked[:nprobe]}

        lut = [
            [fold_dot(q[j * dsub : (j + 1) * dsub], CB[j][t]) for t in range(ks)]
            for j in range(m)
        ]
        scored = []
        for nid in nvecs:
            if nid == qid or assign[nid] not in probed:
                continue
            acc = lut[0][codes[nid][0]]
            for j in range(1, m):
                acc = acc + lut[j][codes[nid][j]]
            scored.append((nid, acc))
        scored.sort(key=lambda t: (-t[1], t[0]))
        if len(scored) > shortlist:
            hi, lo = scored[shortlist - 1][1], scored[shortlist][1]
            if hi - lo <= MIN_MARGIN:
                near_codes = {
                    tuple(codes[nid])
                    for nid, s in scored
                    if lo - MIN_MARGIN <= s <= hi + MIN_MARGIN
                }
                if len(near_codes) > 1:
                    min_margin = min(min_margin, hi - lo)
        cands = [
            (nid, round_half_up(cosine(q, vecs[nid])))
            for nid, _ in scored[:shortlist]
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

    rows, min_margin = ivfpq_topk_expected(vecs, queries)
    assert min_margin > MIN_MARGIN, (
        f"decision margin {min_margin:.3e} too small to certify fold-vs-GEMM "
        "order equivalence — do not freeze this oracle"
    )

    h = hashlib.md5()
    for vid in sorted(vecs):
        h.update(str(vid).encode() + b"\x00" + str(vecs[vid]).encode() + b"\x01")
    with open(os.path.abspath(OUT), "w", encoding="utf-8") as fh:
        fh.write(
            '"""GENERATED by tools/gen_ivfpq_oracle.py — do not edit.\n\n'
            f"Expected ann_ivfpq_topk output (k_centroids={K_CENTROIDS}, "
            f"nprobe={NPROBE},\nrefine_iters={REFINE_ITERS}, m={M}, ks={KS}, "
            f"train_iters={TRAIN_ITERS}, shortlist={SHORTLIST}, k={K})\n"
            'over the fixed sf0.01 corpus, computed by an independent\n'
            'pure-Python IVF-PQ walk."""\n\n'
            f'CORPUS_MD5 = "{h.hexdigest()}"\n'
            f"MIN_DECISION_MARGIN = {min_margin!r}\n\n"
        )
        fh.write("IVFPQ_TOPK = [\n")
        for r in rows:
            fh.write(f"    ({r[0]}, {r[1]}, {r[2]!r}, {r[3]}),\n")
        fh.write("]\n")
    print(
        f"wrote {len(rows)} rows (min margin {min_margin:.3e}) -> {os.path.abspath(OUT)}"
    )


if __name__ == "__main__":
    main()
