"""Change-aware correctness rotation (round-8 verdict ask #1).

The driver re-greens a fixed budget of registry entries per round; entries
whose implementation changed since their newest green row must rotate first.
These tests pin the three layers: the symbol-closure fingerprint walker
(fingerprints.py), the committed evidence snapshot's freshness
(tools/gen_evidence_fps.py --check), and load_all()'s promotion ordering.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _dict_reader(files: dict[str, str]):
    return lambda rel: files.get(rel)


BASE_FILES = {
    "nextgenetl_spark/workloads/text.py": '''
from nextgenetl_spark.catalog import load
from nextgenetl_spark.workloads import workload

def _oracle():
    return "SELECT 1 AS x"

@workload("q1", oracle=_oracle())
def q1(spark, sf_dir):
    from nextgenetl_spark.operators.sampling import pick
    return pick(load(spark, sf_dir, "documents"))

@workload("q2", oracle="SELECT 2 AS y")
def q2(spark, sf_dir):
    return load(spark, sf_dir, "documents")
''',
    "nextgenetl_spark/catalog.py": '''
def _helper():
    return 1

def load(spark, sf_dir, table):
    return _helper()

def info_schema(spark):
    return 2
''',
    "nextgenetl_spark/operators/sampling.py": '''
def pick(df):
    return df

def other_op(df):
    return df.limit(1)
''',
}


def _fp(files, name="q1"):
    from nextgenetl_spark.fingerprints import workload_fingerprints

    return workload_fingerprints(
        _dict_reader(files), {name: ("nextgenetl_spark.workloads.text", name)}
    )[name]


def test_fingerprint_flips_on_fn_body_change():
    changed = dict(BASE_FILES)
    changed["nextgenetl_spark/workloads/text.py"] = BASE_FILES[
        "nextgenetl_spark/workloads/text.py"
    ].replace('"documents"', '"embeddings"')
    assert _fp(BASE_FILES) != _fp(changed)


def test_fingerprint_flips_on_imported_operator_change():
    changed = dict(BASE_FILES)
    changed["nextgenetl_spark/operators/sampling.py"] = BASE_FILES[
        "nextgenetl_spark/operators/sampling.py"
    ].replace("return df\n", "return df.cache()\n")
    assert _fp(BASE_FILES) != _fp(changed)


def test_fingerprint_flips_on_oracle_helper_change():
    # _oracle() is referenced only from the decorator text — the same-module
    # fixpoint must still pull its segment
    changed = dict(BASE_FILES)
    changed["nextgenetl_spark/workloads/text.py"] = BASE_FILES[
        "nextgenetl_spark/workloads/text.py"
    ].replace("SELECT 1 AS x", "SELECT 10 AS x")
    assert _fp(BASE_FILES) != _fp(changed)


def test_fingerprint_stable_under_unrelated_changes():
    """Edits to symbols OUTSIDE the closure — another operator in the same
    module, an unused catalog function, a sibling workload — must not flip
    the fingerprint (whole-file granularity would flood the rotation)."""
    changed = dict(BASE_FILES)
    changed["nextgenetl_spark/operators/sampling.py"] = BASE_FILES[
        "nextgenetl_spark/operators/sampling.py"
    ].replace("df.limit(1)", "df.limit(2)")
    changed["nextgenetl_spark/catalog.py"] = BASE_FILES[
        "nextgenetl_spark/catalog.py"
    ].replace("return 2", "return 3")
    changed["nextgenetl_spark/workloads/text.py"] = BASE_FILES[
        "nextgenetl_spark/workloads/text.py"
    ].replace("SELECT 2 AS y", "SELECT 20 AS y")
    assert _fp(BASE_FILES) == _fp(changed)


def test_fingerprint_follows_same_module_helpers():
    changed = dict(BASE_FILES)
    changed["nextgenetl_spark/catalog.py"] = BASE_FILES[
        "nextgenetl_spark/catalog.py"
    ].replace("return 1", "return 11")  # _helper, called by load
    assert _fp(BASE_FILES) != _fp(changed)


def test_missing_symbol_falls_back_to_whole_file():
    files = dict(BASE_FILES)
    files["nextgenetl_spark/operators/sampling.py"] = (
        "from nextgenetl_spark.operators._impl import pick\n"
    )
    files["nextgenetl_spark/operators/_impl.py"] = "def pick(df):\n    return df\n"
    fp1 = _fp(files)
    changed = dict(files)
    changed["nextgenetl_spark/operators/sampling.py"] += "# re-export shim\n"
    assert _fp(changed) != fp1  # whole-file stand-in for the re-export


def test_file_fallback_resolves_from_pkg_import_submodule():
    """The whole-file fallback must hash the implementation SUBMODULE when
    the unlocatable file binds it via `from pkg import submod` — not just
    the package __init__ (round-9 self-review)."""
    files = dict(BASE_FILES)
    files["nextgenetl_spark/operators/sampling.py"] = (
        "from nextgenetl_spark.operators import _impl as I\npick = I.pick\n"
    )
    files["nextgenetl_spark/operators/__init__.py"] = ""
    files["nextgenetl_spark/operators/_impl.py"] = "def pick(df):\n    return df\n"
    fp1 = _fp(files)
    changed = dict(files)
    changed["nextgenetl_spark/operators/_impl.py"] = "def pick(df):\n    return df.cache()\n"
    assert _fp(changed) != fp1


def test_alias_submodule_attribute_resolves_to_file():
    """`import pkg.sub as S` style usage through a module-bound alias whose
    attribute is itself a module: S.submod.fn must hash the submodule
    file."""
    files = dict(BASE_FILES)
    files["nextgenetl_spark/workloads/text.py"] = '''
from nextgenetl_spark import operators as O
from nextgenetl_spark.workloads import workload

@workload("q1", oracle="SELECT 1 AS x")
def q1(spark, sf_dir):
    return O.sampling.pick(None)
'''
    files["nextgenetl_spark/operators/__init__.py"] = ""
    fp1 = _fp(files)
    changed = dict(files)
    changed["nextgenetl_spark/operators/sampling.py"] = BASE_FILES[
        "nextgenetl_spark/operators/sampling.py"
    ].replace("return df\n", "return df.cache()\n")
    assert _fp(changed) != fp1


def test_changed_since_evidence_detects_mismatched_snapshot(tmp_path):
    """A snapshot entry at the entry's newest green round but with a stale
    fingerprint -> promoted; matching fingerprint or older snapshot round ->
    not promoted."""
    from nextgenetl_spark.fingerprints import tree_reader, workload_fingerprints
    from nextgenetl_spark.workloads import (
        REGISTRY,
        _changed_since_evidence,
        _oracle_verified,
        load_all,
    )

    load_all()
    pos = {n: r for n, r in _oracle_verified().items() if r > 0}
    names = sorted(pos)[:3]
    assert len(names) == 3
    targets = {n: (REGISTRY[n].fn.__module__, REGISTRY[n].fn.__name__) for n in names}
    cur = workload_fingerprints(tree_reader(ROOT), targets)
    snap = {
        names[0]: {"round": pos[names[0]], "fp": "0" * 64},  # stale fp -> changed
        names[1]: {"round": pos[names[1]], "fp": cur[names[1]]},  # match -> not
        names[2]: {"round": pos[names[2]] - 1, "fp": "0" * 64},  # older round -> skip
    }
    p = tmp_path / "snap.json"
    p.write_text(json.dumps(snap))
    got = _changed_since_evidence(pos, snap_path=str(p))
    assert names[0] in got and names[1] not in got and names[2] not in got


def test_rotation_puts_changed_entries_before_oldest_first():
    """The live registry order: every changed-flagged verified entry sorts
    before every unchanged verified entry, and within each class evidence
    rounds are non-decreasing (events-last scoping aside)."""
    from nextgenetl_spark.workloads import (
        _changed_since_evidence,
        _oracle_verified,
        load_all,
    )

    reg = load_all()
    pos = {n: r for n, r in _oracle_verified().items() if r > 0}
    changed = _changed_since_evidence(pos)
    verified_order = [n for n in reg if n in pos]
    if changed:
        last_changed = max(verified_order.index(n) for n in changed if n in verified_order)
        first_unchanged = min(
            (verified_order.index(n) for n in verified_order if n not in changed),
            default=len(verified_order),
        )
        assert last_changed < first_unchanged


def test_snapshot_stable_when_evidence_round_has_no_boundary_commit(monkeypatch):
    """Mid-round window (r9 ADVICE): once a new CORRECTNESS_r0N.json lands but
    before its 'round N: verdict/...' boundary commit exists, regeneration must
    carry over the committed snapshot entries verbatim — NOT re-snapshot at an
    older boundary commit (observed to reassign rounds for ~35 entries and flip
    --check red for the rest of the round)."""
    probe = subprocess.run(
        ["git", "-C", ROOT, "log", "--format=%s", "-1"], capture_output=True
    )
    if probe.returncode != 0:
        pytest.skip("git history unavailable")
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    try:
        import gen_evidence_fps
    finally:
        sys.path.pop(0)

    import nextgenetl_spark.workloads as wl_mod

    wl_mod.load_all()
    real = wl_mod._oracle_verified()
    assert real, "no verified entries — cannot exercise the carry-over path"
    future = max(r for r in real.values() if r > 0) + 1

    def fake_verified():
        # Pretend every entry just re-greened in a round whose boundary
        # commit does not exist yet.
        return {n: future for n, r in real.items() if r > 0}

    monkeypatch.setattr(wl_mod, "_oracle_verified", fake_verified)
    regenerated = gen_evidence_fps.generate()
    with open(
        os.path.join(ROOT, "nextgenetl_spark", "workloads", "_evidence_fps.json"),
        encoding="utf-8",
    ) as fh:
        committed = json.load(fh)
    assert regenerated == committed


def test_evidence_snapshot_is_fresh():
    """The committed _evidence_fps.json must match regeneration from the
    round-boundary commits — run tools/gen_evidence_fps.py after each new
    CORRECTNESS round lands. Skips where git history is unavailable."""
    probe = subprocess.run(
        ["git", "-C", ROOT, "log", "--format=%s", "-1"], capture_output=True
    )
    if probe.returncode != 0:
        pytest.skip("git history unavailable")
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "gen_evidence_fps.py"), "--check"],
        capture_output=True,
        text=True,
        cwd=ROOT,
    )
    assert proc.returncode == 0, f"stale snapshot:\n{proc.stdout}\n{proc.stderr}"


def test_fingerprint_stable_under_docstring_change():
    """Docstring edits are non-behavioral and must NOT flag an entry as
    changed (round 10: a COST-note docstring on two operators would have
    spent four budget slots re-greening fresh-r9 ANN entries). Body edits
    on the same function must still flip."""
    base = _fp(BASE_FILES)
    doc = dict(BASE_FILES)
    doc["nextgenetl_spark/operators/sampling.py"] = '''
def pick(df):
    """A very thorough new docstring.

    Multi-line, with detail.
    """
    return df

def other_op(df):
    return df.limit(1)
'''
    assert _fp(doc) == base
    body = dict(doc)
    body["nextgenetl_spark/operators/sampling.py"] = '''
def pick(df):
    """A very thorough new docstring.

    Multi-line, with detail.
    """
    return df.cache()

def other_op(df):
    return df.limit(1)
'''
    assert _fp(body) != base
    # same-line / shared-line docstrings are NOT stripped (guards): a
    # one-liner def keeps its full segment
    oneline = dict(BASE_FILES)
    oneline["nextgenetl_spark/operators/sampling.py"] = '''
def pick(df): "doc"; return df

def other_op(df):
    return df.limit(1)
'''
    oneline2 = dict(oneline)
    oneline2["nextgenetl_spark/operators/sampling.py"] = oneline[
        "nextgenetl_spark/operators/sampling.py"
    ].replace('"doc"', '"other doc"')
    assert _fp(oneline) != _fp(oneline2)


def test_fingerprint_flips_on_signature_line_shared_with_docstring():
    """A multi-line def signature closing on the docstring's FIRST line
    (`): "doc"`) must NOT be stripped: those characters are signature, and
    an edit confined to that line (e.g. a default-value change) would be
    invisible to change detection (round-10 ADVICE #3)."""
    sig = dict(BASE_FILES)
    sig["nextgenetl_spark/operators/sampling.py"] = '''
def pick(df,
         limit=10): "doc"

def other_op(df):
    return df.limit(1)
'''
    sig2 = dict(sig)
    sig2["nextgenetl_spark/operators/sampling.py"] = sig[
        "nextgenetl_spark/operators/sampling.py"
    ].replace("limit=10", "limit=99")
    assert _fp(sig) != _fp(sig2)
    # ...while a docstring on its own lines under the SAME multi-line
    # signature still strips (edits to it stay invisible, as designed)
    ml = dict(BASE_FILES)
    ml["nextgenetl_spark/operators/sampling.py"] = '''
def pick(df,
         limit=10):
    """doc"""
    return df

def other_op(df):
    return df.limit(1)
'''
    ml2 = dict(ml)
    ml2["nextgenetl_spark/operators/sampling.py"] = ml[
        "nextgenetl_spark/operators/sampling.py"
    ].replace('"""doc"""', '"""other doc"""')
    assert _fp(ml) == _fp(ml2)
