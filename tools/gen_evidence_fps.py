"""Regenerate nextgenetl_spark/workloads/_evidence_fps.json.

For every registry entry with hash-green driver evidence, snapshot the
implementation fingerprint (fingerprints.py symbol-closure walk) of the code
its NEWEST green row actually tested — the tree at that round's boundary
commit ("round N: verdict/advice/correctness/bench", which freezes
CORRECTNESS_r0N.json alongside the exact code the driver ran). load_all()
compares these against the working tree to rotate changed-implementation
entries to the front of the re-verification queue.

Run at ROUND START, right after a new CORRECTNESS_r0N.json + boundary commit
land (the freshness pytest in tests/test_evidence_fps.py fails if this is
forgotten). If an entry's newest green round has no boundary commit yet (the
current round's evidence landing before the round closes), the regeneration
CARRIES OVER the committed snapshot entry for that name verbatim instead of
re-snapshotting at an older boundary commit — re-snapshotting was observed to
reassign rounds for dozens of entries mid-round (r9 ADVICE), flipping --check
red between the artifact landing and the boundary commit. Carry-over keeps the
file byte-stable across that window; load_all() skips the comparison for such
entries anyway (snapshot round < evidence round = evidence is fresher than any
detectable change). Names with no committed entry are skipped until the
boundary commit exists.

Usage: python tools/gen_evidence_fps.py [--check]
  --check: exit 1 if the committed file differs from the regeneration
           (what the pytest does), without writing.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

OUT = os.path.join(ROOT, "nextgenetl_spark", "workloads", "_evidence_fps.json")


def round_commits() -> dict[int, str]:
    """round number -> boundary commit sha (newest commit per round wins,
    matching the artifact-freeze discipline)."""
    proc = subprocess.run(
        ["git", "-C", ROOT, "log", "--format=%H %s"], capture_output=True, text=True
    )
    if proc.returncode != 0:
        return {}
    out: dict[int, str] = {}
    for line in proc.stdout.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict/advice/correctness/bench", subject)
        if m:
            out.setdefault(int(m.group(1)), sha)
    return out


def generate() -> dict[str, dict]:
    from nextgenetl_spark.fingerprints import git_reader, workload_fingerprints
    from nextgenetl_spark.workloads import REGISTRY, _oracle_verified, load_all

    load_all()
    commits = round_commits()
    if not commits:
        raise SystemExit("no round-boundary commits found; refusing to snapshot")
    verified = {n: r for n, r in _oracle_verified().items() if r > 0 and n in REGISTRY}

    try:
        with open(OUT, encoding="utf-8") as fh:
            committed: dict[str, dict] = json.load(fh)
    except (OSError, ValueError):
        committed = {}

    by_round: dict[int, dict[str, tuple[str, str]]] = {}
    carried: dict[str, dict] = {}
    for name, newest in verified.items():
        if newest not in commits:
            # Evidence landed but its boundary commit hasn't yet (mid-round
            # window): carry over the committed entry verbatim so the file
            # stays byte-stable; load_all() skips these comparisons anyway.
            if name in committed:
                carried[name] = committed[name]
            continue
        wl = REGISTRY[name]
        by_round.setdefault(newest, {})[name] = (wl.fn.__module__, wl.fn.__name__)

    snap: dict[str, dict] = dict(carried)
    for r, targets in sorted(by_round.items()):
        fps = workload_fingerprints(git_reader(ROOT, commits[r]), targets)
        for name, fp in fps.items():
            snap[name] = {"round": r, "fp": fp}
    return dict(sorted(snap.items()))


def main() -> int:
    snap = generate()
    text = json.dumps(snap, indent=1, sort_keys=True) + "\n"
    if "--check" in sys.argv:
        try:
            with open(OUT, encoding="utf-8") as fh:
                current = fh.read()
        except OSError:
            current = ""
        if current != text:
            print("STALE: _evidence_fps.json does not match regeneration")
            return 1
        print(f"fresh: {len(snap)} entries")
        return 0
    with open(OUT, "w", encoding="utf-8") as fh:
        fh.write(text)
    rounds: dict[int, int] = {}
    for v in snap.values():
        rounds[v["round"]] = rounds.get(v["round"], 0) + 1
    print(f"wrote {len(snap)} entries: " + ", ".join(f"r{r}={c}" for r, c in sorted(rounds.items())))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
