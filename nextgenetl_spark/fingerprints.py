"""Implementation fingerprints for change-aware correctness rotation.

The driver re-verifies a fixed budget of registry queries per round, so the
rotation in ``workloads.load_all`` must decide WHICH green rows are stalest.
Age alone is not enough (round-8 verdict ask #1): ``streaming/stateful.py``
changed in round 8 while ``stream_debounce`` sat on round-4 evidence, and
oldest-first rotation never reached it. This module computes, per workload, a
content fingerprint of the code that actually implements it, so entries whose
implementation changed since their newest green row rotate FIRST.

Granularity is the SYMBOL, not the module file: a workload's fingerprint
covers the source segment of its decorated function (decorators included —
inline DuckDB oracles live there), every same-module top-level def/constant
it references (fixpoint), and transitively every ``nextgenetl_spark`` symbol
imported by any collected segment — falling back to whole-file hashes only
when a symbol cannot be located. Whole-module hashing would flood: every
query calls ``catalog.load``, so ANY catalog.py edit would mark all ~200
entries changed and the budget would re-check nothing but false positives.
Symbol granularity keeps the changed set proportional to the edit; leading
docstrings are stripped from segments for the same reason (round 10) —
documentation edits are non-behavioral and must not consume the budget.

The same walk runs against two kinds of tree — the current working tree
(``load_all`` at driver time) and a past round-boundary git commit
(``tools/gen_evidence_fps.py`` snapshotting the code each green row actually
tested) — via an injected ``read(relpath) -> str | None``.  False negatives
are possible where code is reached dynamically (globals mutated elsewhere,
getattr dispatch); the repo's operators are plain top-level functions, and a
miss only delays re-verification to the ordinary oldest-first rotation.
"""

from __future__ import annotations

import ast
import hashlib
import json
import re
from collections.abc import Callable

PKG = "nextgenetl_spark"
_IDENT_RE = re.compile(r"[A-Za-z_]\w*")
# Registry infrastructure — every workload imports the decorator; excluding
# it keeps load_all() edits (rotation policy, not implementations) from
# flagging the whole registry as changed.
_SKIP_MODULES = {PKG + ".workloads"}

Reader = Callable[[str], "str | None"]


def _relpath_candidates(mod: str) -> list[str]:
    base = mod.replace(".", "/")
    return [base + ".py", base + "/__init__.py"]


class _ModuleView:
    """Parsed view of one module file under a given reader: top-level
    name->node map, module-level import bindings, raw lines."""

    def __init__(self, mod: str, text: str):
        self.mod = mod
        self.text = text
        self.lines = text.splitlines()
        self.tree = ast.parse(text)
        self.top: dict[str, ast.AST] = {}
        self.module_bindings: list[tuple[str, str, str | None]] = []
        for node in self.tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                self.top[node.name] = node
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        self.top[t.id] = node
            elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
                self.top[node.target.id] = node
            elif isinstance(node, (ast.Import, ast.ImportFrom)):
                self.module_bindings.extend(_bindings_of(node, self.mod))

    def segment(self, node: ast.AST) -> str:
        start = node.lineno
        for dec in getattr(node, "decorator_list", []) or []:
            start = min(start, dec.lineno)
        lines = self.lines[start - 1 : node.end_lineno]
        # Docstrings are non-behavioral: hashing them spends the driver's
        # fixed re-verification budget on documentation edits (round 10:
        # a COST-note docstring on pq_topk/ivfpq_topk would have flagged
        # four ANN entries carrying fresh r9 evidence). Strip the leading
        # docstring's lines from the segment — but only when those lines
        # hold nothing else (guards: strictly below the LAST line of the
        # def/class signature — a multi-line signature can close on the
        # docstring's first line (`): "doc"`), where stripping would hide
        # signature edits (round-10 ADVICE) — and the next statement
        # starts on a later line).
        body = getattr(node, "body", None)
        sig_end = node.lineno
        args = getattr(node, "args", None)
        if args is not None:
            for lst in (
                getattr(args, "posonlyargs", []),
                args.args,
                args.kwonlyargs,
                args.defaults,
                args.kw_defaults,
                [args.vararg, args.kwarg, getattr(node, "returns", None)],
            ):
                for x in lst or []:
                    end = getattr(x, "end_lineno", None)
                    if x is not None and end is not None:
                        sig_end = max(sig_end, end)
        for x in list(getattr(node, "bases", [])) + list(getattr(node, "keywords", [])):
            end = getattr(x, "end_lineno", None)
            if end is not None:
                sig_end = max(sig_end, end)
        if (
            body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
            and body[0].lineno > sig_end
            and (len(body) == 1 or body[1].lineno > body[0].end_lineno)
        ):
            ds0, ds1 = body[0].lineno, body[0].end_lineno
            lines = [
                ln for i, ln in enumerate(lines, start=start) if not (ds0 <= i <= ds1)
            ]
        return "\n".join(lines)


def _bindings_of(node: ast.AST, defining_mod: str) -> list[tuple[str, str, str | None]]:
    """(local_name, module, attr_or_None) bindings introduced by one import
    node, restricted to the package. attr=None means local is bound to the
    module object itself."""
    out: list[tuple[str, str, str | None]] = []
    if isinstance(node, ast.Import):
        for a in node.names:
            if a.name == PKG or a.name.startswith(PKG + "."):
                local = a.asname or a.name.split(".")[0]
                out.append((local, a.name, None))
    elif isinstance(node, ast.ImportFrom):
        if node.level:  # resolve relative import against the defining module
            parts = defining_mod.split(".")
            base = parts[: len(parts) - node.level]
            mod = ".".join(base + ([node.module] if node.module else []))
        else:
            mod = node.module or ""
        if mod == PKG or mod.startswith(PKG + "."):
            for a in node.names:
                out.append((a.asname or a.name, mod, a.name))
    return out


class _Walker:
    def __init__(self, read: Reader):
        self.read = read
        self._views: dict[str, "_ModuleView | None"] = {}
        self._is_module: dict[str, bool] = {}

    def view(self, mod: str) -> "_ModuleView | None":
        if mod not in self._views:
            v = None
            for rel in _relpath_candidates(mod):
                text = self.read(rel)
                if text is not None:
                    try:
                        v = _ModuleView(mod, text)
                    except SyntaxError:
                        v = None
                    break
            self._views[mod] = v
        return self._views[mod]

    def is_module(self, dotted: str) -> bool:
        if dotted not in self._is_module:
            self._is_module[dotted] = any(
                self.read(rel) is not None for rel in _relpath_candidates(dotted)
            )
        return self._is_module[dotted]

    def fingerprint(self, defining_module: str, fn_name: str) -> str:
        parts: set[tuple] = set()
        # worklist items: ("sym", module, name) | ("file", module)
        work: list[tuple] = [("sym", defining_module, fn_name)]
        seen: set[tuple] = set()
        # per-module set of names whose segments were collected, so the
        # same-module fixpoint and module-alias attribute scans converge
        collected: dict[str, dict[str, str]] = {}

        while work:
            item = work.pop()
            if item in seen:
                continue
            seen.add(item)
            if item[0] == "file":
                self._do_file(item[1], parts, work)
            else:
                self._do_symbol(item[1], item[2], parts, work, collected)
        return hashlib.sha256(
            json.dumps(sorted(parts), ensure_ascii=False).encode()
        ).hexdigest()

    def _do_file(self, mod: str, parts: set, work: list) -> None:
        if mod in _SKIP_MODULES:
            return
        v = self.view(mod)
        if v is None:
            parts.add(("missing-file", mod))
            return
        parts.add(("file", mod, hashlib.sha256(v.text.encode()).hexdigest()))
        # expand EVERY in-package import in the file, resolving
        # `from pkg import submodule` bindings to the submodule FILE —
        # the bare `from X import names` module name alone would hash only
        # X's (often 3-line) __init__ and miss the implementation file
        # (round-9 self-review)
        for node in ast.walk(v.tree):
            if isinstance(node, (ast.Import, ast.ImportFrom)):
                for _, bmod, attr in _bindings_of(node, mod):
                    if attr is not None and self.is_module(bmod + "." + attr):
                        work.append(("file", bmod + "." + attr))
                    else:
                        work.append(("file", bmod))

    def _do_symbol(
        self, mod: str, name: str, parts: set, work: list, collected: dict
    ) -> None:
        if mod in _SKIP_MODULES:
            return
        v = self.view(mod)
        if v is None:
            parts.add(("missing-file", mod))
            return
        node = v.top.get(name)
        if node is None:
            # symbol not locatable (re-export, __getattr__, rename): the
            # whole file stands in for it
            work.append(("file", mod))
            return
        seg = v.segment(node)
        parts.add(("seg", mod, name, seg))
        got = collected.setdefault(mod, {})
        got[name] = seg
        idents = set(_IDENT_RE.findall(seg))

        # same-module fixpoint: referenced top-level defs/constants
        for other in v.top:
            if other != name and other in idents:
                work.append(("sym", mod, other))

        # imports inside this segment (fn-body imports) — all names count
        bindings: list[tuple[str, str, str | None]] = []
        for sub in ast.walk(node):
            if isinstance(sub, (ast.Import, ast.ImportFrom)):
                bindings.extend(_bindings_of(sub, mod))
        # module-level imports — only names this segment references
        bindings.extend(
            (ln, m, a) for ln, m, a in v.module_bindings if ln in idents
        )

        for local, bmod, attr in bindings:
            if attr is not None and self.is_module(bmod + "." + attr):
                bmod, attr = bmod + "." + attr, None
            if attr is not None:
                work.append(("sym", bmod, attr))
                continue
            # module object bound to `local`: follow attribute uses —
            # an attribute that is ITSELF a submodule (alias.submod.fn)
            # hashes the submodule file rather than degrading to the
            # package __init__ (round-9 self-review)
            attrs = set(re.findall(rf"\b{re.escape(local)}\.(\w+)", seg))
            if attrs:
                for a in attrs:
                    if self.is_module(bmod + "." + a):
                        work.append(("file", bmod + "." + a))
                    else:
                        work.append(("sym", bmod, a))
            elif local in idents:
                work.append(("file", bmod))


def tree_reader(root: str) -> Reader:
    """Reader over the current working tree (driver-time path)."""
    import os

    cache: dict[str, str | None] = {}

    def read(rel: str) -> str | None:
        if rel not in cache:
            try:
                with open(os.path.join(root, rel), encoding="utf-8") as fh:
                    cache[rel] = fh.read()
            except OSError:
                cache[rel] = None
        return cache[rel]

    return read


def git_reader(root: str, commit: str) -> Reader:
    """Reader over a git commit tree (snapshot-generation path)."""
    import subprocess

    cache: dict[str, str | None] = {}

    def read(rel: str) -> str | None:
        if rel not in cache:
            proc = subprocess.run(
                ["git", "-C", root, "show", f"{commit}:{rel}"],
                capture_output=True,
            )
            cache[rel] = proc.stdout.decode("utf-8") if proc.returncode == 0 else None
        return cache[rel]

    return read


def workload_fingerprints(
    read: Reader, targets: dict[str, tuple[str, str]]
) -> dict[str, str]:
    """name -> fingerprint for targets {name: (defining_module, fn_name)}.
    One walker so module parses are shared across workloads."""
    w = _Walker(read)
    return {
        name: w.fingerprint(mod, fn) for name, (mod, fn) in sorted(targets.items())
    }
