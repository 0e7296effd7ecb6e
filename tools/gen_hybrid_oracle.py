"""Independent pure-Python oracle generator for the DENSE leg of
`hybrid_rrf_production` (round 10): ivfpq_topk with ALL-AUTO knobs
(nprobe=None, shortlist=None) for the 5 query vectors, k=10.

The walk composes the already-certified halves exactly as
tools/gen_ivfpq_oracle.py does, plus an independent replication of the two
auto-knob rules the implementation applies when the knobs are None:

- nprobe = ceil(k_centroids / 4)        (_auto_nprobe; IVF_DEFAULT_CONFIRM)
- shortlist = 3 * max(k, adc_crowd)     (_auto_shortlist; PQ_AUTO_SHORTLIST)

where adc_crowd is `measured_adc_crowd` replayed here in pure
Python+numpy: sample the 256 unit vectors with the smallest
(md5(str(id)), id); measure the ADC quantization-noise band delta =
95th-pct |ADC(v,u) - cos(v,u)| over the sample pair grid; count per
sampled vector the corpus unit vectors with cosine >= 1 - 2*delta; crowd =
ceil(mean count). Every numpy op replays the implementation's driver-side
numpy (same lib, same shapes for the grid; the corpus count GEMM row
results are batch-independent), and the freeze-time pytest
(tests/test_dedup_similarity.py::test_hybrid_oracle_corpus_fingerprint)
asserts the implementation's measured_adc_crowd over the fixed corpus
equals the frozen ADC_CROWD, certifying the one cross-derivation seam.

Expected dense rows over the fixed sf0.01 corpus are frozen as a VALUES
table; the lexical BM25 leg and the RRF fusion are SQL-expressible and
stay live in the oracle query.

    python tools/gen_hybrid_oracle.py
"""

from __future__ import annotations

import hashlib
import math
import os

import numpy as np
import pyarrow.parquet as pq

try:  # package import (tests) or sibling import (script run)
    from tools.gen_ivfpq_oracle import ivfpq_topk_expected
    from tools.gen_pq_oracle import MIN_MARGIN, _argmin_sqdist, train_codebooks, unit
except ImportError:  # pragma: no cover
    from gen_ivfpq_oracle import ivfpq_topk_expected
    from gen_pq_oracle import MIN_MARGIN, _argmin_sqdist, train_codebooks, unit

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
OUT = os.path.join(
    os.path.dirname(__file__), "..", "nextgenetl_spark", "workloads", "_hybrid_expected.py"
)
K_CENTROIDS, REFINE_ITERS = 16, 1
M, KS, TRAIN_ITERS = 8, 16, 1
K_DENSE = 10  # fusion depth of the dense leg
N_SAMPLE = 256


def auto_nprobe(k_centroids: int) -> int:
    """_auto_nprobe replicated: the measured quarter-fraction probe rule."""
    return max(1, math.ceil(k_centroids / 4))


def adc_crowd_expected(
    vecs: dict,
    m: int = M,
    ks: int = KS,
    train_iters: int = TRAIN_ITERS,
    n_sample: int = N_SAMPLE,
) -> tuple[int, float]:
    """measured_adc_crowd (operators/similarity.py) replayed independently.
    Returns (crowd, delta)."""
    nvecs = {}
    for vid in sorted(vecs):
        nv = unit(vecs[vid])
        if nv is not None:
            nvecs[vid] = nv
    dim = len(next(iter(nvecs.values())))
    dsub = dim // m
    CB, _ = train_codebooks(nvecs, m, ks, train_iters)
    CBnp = np.asarray(CB, dtype="float64")  # (m, ks, dsub)

    samp_ids = sorted(
        nvecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[:n_sample]
    V = np.stack([np.asarray(nvecs[i], dtype="float64") for i in samp_ids])
    Cd = np.asarray(
        [
            [_argmin_sqdist(nvecs[i][j * dsub : (j + 1) * dsub], CB[j])[0] for j in range(m)]
            for i in samp_ids
        ],
        dtype="int64",
    )
    lut = np.stack([V[:, j * dsub : (j + 1) * dsub] @ CBnp[j].T for j in range(m)], axis=1)
    adc = np.zeros((len(V), len(V)))
    for j in range(m):
        adc += lut[:, j, :][:, Cd[:, j]]
    exact = V @ V.T
    off = ~np.eye(len(V), dtype=bool)
    delta = float(np.quantile(np.abs(adc - exact)[off], 0.95)) if len(V) > 1 else 0.0
    thresh = 1.0 - 2.0 * delta

    U = np.stack([np.asarray(nvecs[i], dtype="float64") for i in sorted(nvecs)])
    total = int((U @ V.T >= thresh).sum())
    return max(1, int(math.ceil(total / len(V)))), delta


def main() -> None:
    t = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"), columns=["vec_id", "embedding"])
    vecs = dict(zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist()))
    queries = [vid for vid in vecs if vid < 5]

    nprobe = auto_nprobe(K_CENTROIDS)
    crowd, delta = adc_crowd_expected(vecs)
    shortlist = 3 * max(K_DENSE, crowd)  # _auto_shortlist replicated

    rows, min_margin = ivfpq_topk_expected(
        vecs,
        queries,
        k_centroids=K_CENTROIDS,
        nprobe=nprobe,
        refine_iters=REFINE_ITERS,
        m=M,
        ks=KS,
        train_iters=TRAIN_ITERS,
        shortlist=shortlist,
        k=K_DENSE,
    )
    assert min_margin > MIN_MARGIN, (
        f"decision margin {min_margin:.3e} too small to certify fold-vs-GEMM "
        "order equivalence — do not freeze this oracle"
    )

    h = hashlib.md5()
    for vid in sorted(vecs):
        h.update(str(vid).encode() + b"\x00" + str(vecs[vid]).encode() + b"\x01")
    with open(os.path.abspath(OUT), "w", encoding="utf-8") as fh:
        fh.write(
            '"""GENERATED by tools/gen_hybrid_oracle.py — do not edit.\n\n'
            "Expected ivfpq_topk dense-leg rows for hybrid_rrf_production\n"
            f"(k_centroids={K_CENTROIDS}, refine_iters={REFINE_ITERS}, m={M}, "
            f"ks={KS}, train_iters={TRAIN_ITERS}, k={K_DENSE},\n"
            "nprobe/shortlist AUTO — replicated rules below) over the fixed\n"
            'sf0.01 corpus, computed by an independent pure-Python walk."""\n\n'
            f'CORPUS_MD5 = "{h.hexdigest()}"\n'
            f"MIN_DECISION_MARGIN = {min_margin!r}\n"
            f"NPROBE = {nprobe}          # auto: ceil(k_centroids/4)\n"
            f"ADC_CROWD = {crowd}        # replicated measured_adc_crowd\n"
            f"ADC_DELTA = {delta!r}\n"
            f"SHORTLIST = {shortlist}      # auto: 3*max(k, crowd)\n\n"
        )
        fh.write("DENSE_TOPK = [\n")
        for r in rows:
            fh.write(f"    ({r[0]}, {r[1]}, {r[2]!r}, {r[3]}),\n")
        fh.write("]\n")
    print(
        f"wrote {len(rows)} rows (crowd {crowd}, delta {delta:.3e}, shortlist "
        f"{shortlist}, min margin {min_margin:.3e}) -> {os.path.abspath(OUT)}"
    )


if __name__ == "__main__":
    main()
