"""Independent pure-Python oracle generator for the three xxhash64-path
workloads (`doc_fingerprint`, `simhash_dedup`, `minhash_near_dup`,
`stream_near_dup_ingest` — the streaming probe is stateless, so its
output is the same integer walk: new docs ≥ 250 vs history < 250,
pair emitted iff any band hash matches, Jaccard-verified ≥ 0.5) —
closing the last ∅-oracle rows that CAN be closed: xxHash64 is a publicly
specified algorithm (Cyan4973/xxHash spec; Spark's XxHash64Function uses
the same primitives with fixed seed 42 and per-type byte layouts), so a
from-scratch Python implementation reproduces every hash, and the rest of
each operator is integer/set arithmetic in a fixed order. The expected
rows over the fixed sf0.01 corpus are frozen as VALUES tables for the
driver's cross-engine hash compare — exactly the compression_ratio /
ann_lsh discipline. (ann_ivf_topk joined this family in round 8 via
tools/gen_ivf_oracle.py once its Lloyd refinement became
order-deterministic; the remaining ∅ entries — approx_distinct_profile /
hll_user_rollup — estimate via Spark-internal HLL++ / DataSketches state
with no independent path.)

Replicated contracts:
- tokens: split(trim(text), \\s+) with Java ASCII \\s = [ \\t\\n\\x0B\\f\\r]
- doc_fingerprint: xxh64_string(" ".join(tokens)) as signed long
- simhash: per-distinct-token xxh64_string, strict bit majority
  (2*set_b > n), bit 63 = the long sign bit
- minhash: 3-token shingles (distinct, tail-trimmed, short docs one
  partial shingle), h0 = xxh64_string(shingle), permutation p =
  min over shingles of xxh64(h0 as long, seed p) [long+int chain],
  band hash = xxh64(sig-slice as array<long>, band) [array+int chain],
  candidates = same (band, hash) with a_id < b_id, verified Jaccard on
  the h0 sets, ROUND HALF_UP 4dp, keep >= 0.5

    python tools/gen_hashpath_oracle.py
"""

from __future__ import annotations

import hashlib
import os
import re
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
OUT = os.path.join(
    os.path.dirname(__file__), "..", "nextgenetl_spark", "workloads", "_hashpath_expected.py"
)

M = (1 << 64) - 1
P1, P2, P3, P4, P5 = (11400714785074694791, 14029467366897019727,
                      1609587929392839161, 9650029242287828579,
                      2870177450012600261)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def _round64(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * P2) & M, 31) * P1) & M


def xxh64_bytes(data: bytes, seed: int = 42) -> int:
    """Reference XXH64 over a byte string (Spark: StringType path)."""
    n, i = len(data), 0
    if n >= 32:
        v1, v2 = (seed + P1 + P2) & M, (seed + P2) & M
        v3, v4 = seed & M, (seed - P1) & M
        while i <= n - 32:
            v1 = _round64(v1, int.from_bytes(data[i:i + 8], "little")); i += 8
            v2 = _round64(v2, int.from_bytes(data[i:i + 8], "little")); i += 8
            v3 = _round64(v3, int.from_bytes(data[i:i + 8], "little")); i += 8
            v4 = _round64(v4, int.from_bytes(data[i:i + 8], "little")); i += 8
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round64(0, v)) * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i <= n - 8:
        h = (_rotl(h ^ _round64(0, int.from_bytes(data[i:i + 8], "little")), 27) * P1 + P4) & M
        i += 8
    if i <= n - 4:
        h = (_rotl(h ^ ((int.from_bytes(data[i:i + 4], "little") * P1) & M), 23) * P2 + P3) & M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * P5) & M), 11) * P1) & M
        i += 1
    return _fmix(h)


def hash_long(l: int, seed: int) -> int:
    """Spark XxHash64Function.hashLong (8-byte primitive path)."""
    l &= M
    h = (seed + P5 + 8) & M
    h ^= (_rotl((l * P2) & M, 31) * P1) & M
    h = (_rotl(h, 27) * P1 + P4) & M
    return _fmix(h)


def hash_int(i: int, seed: int) -> int:
    """Spark XxHash64Function.hashInt (4-byte primitive path)."""
    h = (seed + P5 + 4) & M
    h ^= ((i & 0xFFFFFFFF) * P1) & M
    h = (_rotl(h, 23) * P2 + P3) & M
    return _fmix(h)


def signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh_str(s: str) -> int:
    return signed(xxh64_bytes(s.encode("utf-8")))


def xxh_long_int(l: int, i: int) -> int:
    """F.xxhash64(longCol, intLit): chain 42 -> long -> int."""
    return signed(hash_int(i, hash_long(l, 42)))


def xxh_longarray_int(arr, i: int) -> int:
    """F.xxhash64(array<long>, intLit): elements fold, then the int."""
    h = 42
    for e in arr:
        h = hash_long(e, h)
    return signed(hash_int(i, h))


_WS = re.compile(r"[ \t\n\x0B\f\r]+")  # Java ASCII \s


def tokens(text: str) -> list[str]:
    # Spark's trim() strips ONLY the space character (0x20) — a leading
    # tab/newline survives and yields a leading "" token from the split,
    # exactly like F.split(F.trim(c), "\\s+"). (Found by the edge-doc
    # differential test; Python's bare .strip() removes all whitespace.)
    return _WS.split(text.strip(" "))


def shingles3(toks: list[str]) -> list[str]:
    if len(toks) >= 3:
        out = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
    else:
        out = [" ".join(toks)]  # concat_ws skips the null pads
    return list(dict.fromkeys(out))


def round_half_up(x: float, nd: int = 4) -> float:
    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-nd), ROUND_HALF_UP))


NUM_PERM, NUM_BANDS, ROWS_PER_BAND, THRESHOLD = 32, 8, 4, 0.5


def main() -> None:
    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"])
    docs = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))

    doc_fp = []            # (doc_id, fp)
    simhash_by_fp = {}     # fp -> [doc_ids]
    sh_sets = {}           # doc_id -> set of shingle h0 longs
    sigs = {}              # doc_id -> [32 minima]
    for did in sorted(docs):
        toks = tokens(docs[did])
        doc_fp.append((did, xxh_str(" ".join(toks))))

        thashes = [xxh_str(tok) for tok in dict.fromkeys(toks)]
        n = len(thashes)
        fp_u = 0
        for b in range(64):
            set_b = sum(1 for h in thashes if (h & M) >> b & 1)
            if 2 * set_b > n:
                fp_u |= 1 << b
        simhash_by_fp.setdefault(signed(fp_u), []).append(did)

        h0s = [xxh_str(s) for s in shingles3(toks)]
        sh_sets[did] = set(h0s)
        sigs[did] = [min(xxh_long_int(h, p) for h in h0s) for p in range(NUM_PERM)]

    band_hashes = {
        did: [
            xxh_longarray_int(sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND], b)
            for b in range(NUM_BANDS)
        ]
        for did, sig in sigs.items()
    }
    buckets = {}
    for did, bhs in band_hashes.items():
        for b, bh in enumerate(bhs):
            buckets.setdefault((b, bh), []).append(did)
    cands = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cands.add((ids[i], ids[j]))

    def _jac(a, b):
        return round_half_up(len(sh_sets[a] & sh_sets[b]) / len(sh_sets[a] | sh_sets[b]))

    pairs = []
    for a, b in sorted(cands):
        jac = _jac(a, b)
        if jac >= THRESHOLD:
            pairs.append((a, b, jac))

    # stream_near_dup_ingest: new docs (id >= SPLIT) probed against the
    # already-ingested history (id < SPLIT); a pair is emitted once iff ANY
    # band hash matches (the operator's first-matching-band filter is a
    # stateless dedup of exactly this), then Jaccard-verified.
    SPLIT = 250
    stream_pairs = []
    for new_id in sorted(d for d in docs if d >= SPLIT):
        for hist_id in sorted(d for d in docs if d < SPLIT):
            if any(
                band_hashes[new_id][b] == band_hashes[hist_id][b]
                for b in range(NUM_BANDS)
            ):
                jac = _jac(new_id, hist_id)
                if jac >= THRESHOLD:
                    stream_pairs.append((new_id, hist_id, jac))

    h = hashlib.md5()
    for did in sorted(docs):
        h.update(f"{did}\x00{docs[did]}\x01".encode())
    sim_rows = sorted(
        (fp, len(ids), min(ids)) for fp, ids in simhash_by_fp.items()
    )
    with open(os.path.abspath(OUT), "w", encoding="utf-8") as fh:
        fh.write(
            '"""GENERATED by tools/gen_hashpath_oracle.py — do not edit.\n\n'
            "Expected doc_fingerprint / simhash_dedup / minhash_near_dup output\n"
            "over the fixed sf0.01 corpus, computed by an independent pure-Python\n"
            'XXH64 implementation (public spec) + integer/set walks."""\n\n'
            f'CORPUS_MD5 = "{h.hexdigest()}"\n\n'
        )
        fh.write("DOC_FP = [\n")
        for did, fp in doc_fp:
            fh.write(f"    ({did}, {fp}),\n")
        fh.write("]\n\nSIMHASH = [\n")
        for fp, nd, cid in sim_rows:
            fh.write(f"    ({fp}, {nd}, {cid}),\n")
        fh.write("]\n\nMINHASH_PAIRS = [\n")
        for a, b, jac in pairs:
            fh.write(f"    ({a}, {b}, {jac!r}),\n")
        fh.write("]\n\nSTREAM_PAIRS = [\n")
        for n, hst, jac in stream_pairs:
            fh.write(f"    ({n}, {hst}, {jac!r}),\n")
        fh.write("]\n")
    print(
        f"wrote fp={len(doc_fp)} simhash={len(sim_rows)} pairs={len(pairs)} "
        f"stream={len(stream_pairs)} -> {os.path.abspath(OUT)}"
    )


if __name__ == "__main__":
    main()
