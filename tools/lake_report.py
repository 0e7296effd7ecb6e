"""Lake-health report: per-table file-count and file-size profile under a
warehouse root, flagging small-file problems that plans/compaction.py
fixes. Pure filesystem walk — no Spark job — so it is safe to run against
a 100 TB lake's metadata from the driver.

    python tools/lake_report.py /path/to/warehouse [target_mb]
"""

from __future__ import annotations

import os
import sys


def table_file_profile(table_dir: str, suffix: str = ".parquet") -> dict:
    sizes = []
    for root, _dirs, files in os.walk(table_dir):
        sizes.extend(
            os.path.getsize(os.path.join(root, f)) for f in files if f.endswith(suffix)
        )
    if not sizes:
        return {"n_files": 0, "bytes": 0, "min": 0, "max": 0, "mean": 0}
    return {
        "n_files": len(sizes),
        "bytes": sum(sizes),
        "min": min(sizes),
        "max": max(sizes),
        "mean": sum(sizes) // len(sizes),
    }


def lake_report(root: str, target_file_bytes: int = 128 * 1024 * 1024) -> list[dict]:
    """One row per first-level table dir: file profile + whether compaction
    would reduce the file count ('compactable': mean file size below half
    the target AND more files than the post-compaction estimate)."""
    out = []
    for name in sorted(os.listdir(root)):
        tdir = os.path.join(root, name)
        if not os.path.isdir(tdir) or name.startswith("_"):
            continue
        prof = table_file_profile(tdir)
        ideal = max(1, -(-prof["bytes"] // target_file_bytes)) if prof["bytes"] else 0
        prof.update(
            table=name,
            ideal_files=ideal,
            compactable=bool(
                prof["n_files"] > ideal and prof["mean"] < target_file_bytes // 2
            ),
        )
        out.append(prof)
    return out


if __name__ == "__main__":
    root = sys.argv[1]
    target = int(float(sys.argv[2]) * 1024 * 1024) if len(sys.argv) > 2 else 128 * 1024 * 1024
    for row in lake_report(root, target):
        flag = "  <- compact" if row["compactable"] else ""
        print(
            f"{row['table']:32s} files={row['n_files']:6d} bytes={row['bytes']:>14,d} "
            f"mean={row['mean']:>12,d} ideal={row['ideal_files']:5d}{flag}"
        )
