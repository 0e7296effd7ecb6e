"""Independent pure-Python oracle generator for `ann_pq_topk` (round 8).

Product quantization is deterministic end-to-end in this engine — every
decision replays from scratch:

- unit normalization: LEFT-FOLD sum of squares (the Spark ``aggregate``
  expression's exact IEEE op sequence), sqrt, one divide per component —
  all exact or correctly rounded, so normalized components are
  bit-identical across engines
- codebook seeds: the ks vectors with the smallest
  (xxhash64(CAST(id AS STRING)), id) — pure-Python XXH64 from
  tools/gen_hashpath_oracle.py (public spec), subvector slices per subspace
- Lloyd refinement per subspace: argmin L2 (first minimum wins, matching
  np.argmin), decimal(27,18)-exact per-component sums, one double division
  (operators/similarity.py train_pq_codebooks — the refine_centroids
  order-determinism discipline); empty codes keep the previous codeword
- encoding: same argmin walk
- ADC scoring: per-query lookup tables of fold-dot(query subvector,
  codeword); a corpus vector's approximate score is the LEFT-TO-RIGHT fold
  over subspaces of its m table lookups (the implementation adds the m
  gathered arrays in the same j order); shortlist = top rows by
  (approx DESC, id)
- re-rank: exact fold-cosine on RAW vectors, ROUND HALF_UP 4dp,
  row_number over (sim DESC, neighbor_id ASC), keep k

The implementation scores with numpy GEMMs (~1e-15 from the fold), so every
argmin, every shortlist boundary, and every assignment is MARGIN-ASSERTED
> 1e-9 during generation: with that slack the two arithmetic paths provably
produce the same selections, or generation fails loudly.

Expected rows over the fixed sf0.01 corpus are frozen as a VALUES table for
the driver's cross-engine hash compare — the gen_ivf_oracle.py discipline.
The live differential test (tests/test_oracle_generators_fuzz.py)
re-derives this walk against Spark on random corpora.

    python tools/gen_pq_oracle.py
"""

from __future__ import annotations

import hashlib
import math
import os
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

try:  # package import (tests) or sibling import (script run)
    from tools.gen_hashpath_oracle import xxh_str
    from tools.gen_lsh_oracle import cosine, fold_dot, round_half_up
except ImportError:  # pragma: no cover
    from gen_hashpath_oracle import xxh_str
    from gen_lsh_oracle import cosine, fold_dot, round_half_up

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
OUT = os.path.join(
    os.path.dirname(__file__), "..", "nextgenetl_spark", "workloads", "_pq_expected.py"
)
M, KS, K, SHORTLIST, TRAIN_ITERS = 8, 16, 5, 32, 2

# Minimum admissible gap at any argmin / shortlist decision: GEMM-vs-fold
# arithmetic differs by ~1e-15, so a 1e-9 gap guarantees identical ordering.
MIN_MARGIN = 1e-9

_Q18 = Decimal(1).scaleb(-18)


def unit(vec) -> list[float] | None:
    """Left-fold L2 normalization — the exact op sequence of the Spark
    ``aggregate``/``transform`` expression in _unit_vectors. None for a
    zero-norm vector (dropped by contract)."""
    acc = 0.0
    for x in vec:
        fx = float(x)
        acc = acc + fx * fx
    n = math.sqrt(acc)
    if n == 0.0:
        return None
    return [float(x) / n for x in vec]


def _argmin_sqdist(sub, book) -> tuple[int, float]:
    """(first-minimum code, margin to the runner-up) by fold L2 distance.
    The implementation's argmin runs over -2 v.c + |c|^2 — the same ordering
    up to the constant |v|^2, within GEMM-vs-fold noise covered by the
    margin assertion."""
    best, best_d, second_d = -1, None, None
    for t, c in enumerate(book):
        acc = 0.0
        for x, y in zip(sub, c):
            d = x - y
            acc = acc + d * d
        if best_d is None or acc < best_d:
            second_d, best_d, best = best_d, acc, t
        elif second_d is None or acc < second_d:
            second_d = acc
    return best, (second_d - best_d) if second_d is not None else float("inf")


def train_codebooks(
    nvecs: dict, m: int = M, ks: int = KS, iters: int = TRAIN_ITERS
) -> tuple[list, float]:
    """Seed pick + Lloyd walk. nvecs: id -> unit vector. Returns
    (CB[j][t] = codeword list, min decision margin seen)."""
    dim = len(next(iter(nvecs.values())))
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    dsub = dim // m
    order = sorted(nvecs, key=lambda vid: (xxh_str(str(vid)), vid))[:ks]
    CB = [
        [list(nvecs[vid][j * dsub : (j + 1) * dsub]) for vid in order]
        for j in range(m)
    ]
    min_margin = float("inf")
    for _ in range(iters):
        members: dict[tuple[int, int], list] = {}
        for vid in nvecs:
            nv = nvecs[vid]
            for j in range(m):
                t, marg = _argmin_sqdist(nv[j * dsub : (j + 1) * dsub], CB[j])
                min_margin = min(min_margin, marg)
                members.setdefault((j, t), []).append(vid)
        for j in range(m):
            for t in range(ks):
                ids = members.get((j, t), [])
                if not ids:
                    continue  # empty code keeps its previous codeword
                new = []
                for spos in range(dsub):
                    s = Decimal(0)
                    for vid in ids:
                        v = nvecs[vid][j * dsub + spos]
                        s += Decimal(repr(v)).quantize(_Q18, ROUND_HALF_UP)
                    new.append(float(s) / len(ids))
                CB[j][t] = new
    return CB, min_margin


def pq_topk_expected(
    vecs: dict,
    query_ids,
    m: int = M,
    ks: int = KS,
    k: int = K,
    shortlist: int = SHORTLIST,
    train_iters: int = TRAIN_ITERS,
) -> tuple[list[tuple], float]:
    """Full ann_pq_topk walk over raw vectors. Returns (rows, min margin):
    rows = (query_id, neighbor_id, sim, rank); the margin covers every
    Lloyd/encode argmin plus every shortlist boundary."""
    nvecs = {}
    for vid in vecs:
        nv = unit(vecs[vid])
        if nv is not None:
            nvecs[vid] = nv
    dim = len(next(iter(nvecs.values())))
    dsub = dim // m
    CB, min_margin = train_codebooks(nvecs, m, ks, train_iters)
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
        lut = [
            [fold_dot(q[j * dsub : (j + 1) * dsub], CB[j][t]) for t in range(ks)]
            for j in range(m)
        ]
        scored = []
        for nid in nvecs:
            if nid == qid:
                continue
            acc = lut[0][codes[nid][0]]
            for j in range(1, m):
                acc = acc + lut[j][codes[nid][j]]
            scored.append((nid, acc))
        scored.sort(key=lambda t: (-t[1], t[0]))
        if len(scored) > shortlist:
            # Boundary admissibility: candidates with IDENTICAL code tuples
            # have the same ADC score by construction on BOTH engines (one
            # gather-sum value), so an exact tie among them resolves by the
            # shared (score DESC, id ASC) order — safe. Only a near-boundary
            # pair with DIFFERENT codes needs a real margin: their scores
            # are computed from different table cells and GEMM-vs-fold noise
            # could reorder them.
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

    rows, min_margin = pq_topk_expected(vecs, queries)
    assert min_margin > MIN_MARGIN, (
        f"decision margin {min_margin:.3e} too small to certify fold-vs-GEMM "
        "order equivalence — do not freeze this oracle"
    )

    h = hashlib.md5()
    for vid in sorted(vecs):
        h.update(str(vid).encode() + b"\x00" + str(vecs[vid]).encode() + b"\x01")
    with open(os.path.abspath(OUT), "w", encoding="utf-8") as fh:
        fh.write(
            '"""GENERATED by tools/gen_pq_oracle.py — do not edit.\n\n'
            f"Expected ann_pq_topk output (m={M}, ks={KS}, k={K}, "
            f"shortlist={SHORTLIST},\ntrain_iters={TRAIN_ITERS}) over the fixed "
            'sf0.01 corpus, computed by an\nindependent pure-Python PQ/ADC walk."""\n\n'
            f'CORPUS_MD5 = "{h.hexdigest()}"\n'
            f"MIN_DECISION_MARGIN = {min_margin!r}\n\n"
        )
        fh.write("PQ_TOPK = [\n")
        for r in rows:
            fh.write(f"    ({r[0]}, {r[1]}, {r[2]!r}, {r[3]}),\n")
        fh.write("]\n")
    print(
        f"wrote {len(rows)} rows (min margin {min_margin:.3e}) -> {os.path.abspath(OUT)}"
    )


if __name__ == "__main__":
    main()
