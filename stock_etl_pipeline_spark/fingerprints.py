"""Per-query code fingerprints for round-over-round bench comparison.

Two complementary fingerprints (consumed by scripts/round_compare.py to
auto-derive the UNTOUCHED query set for the median ruler — BASELINE.md):

- ``plan_fingerprint(df)`` — md5 of the ANALYZED logical plan with
  session-varying tokens stripped (exprIds, plan ids, object addresses).
  Stable across sessions on identical code+data; moves when the PLAN
  changes. Blind spot: a Python-kernel BODY edit inside an identically
  shaped mapInPandas node does not move the plan (VERDICT r9 item 3).

  Analyzed, NOT optimized (fp_version 2, found in round 10): the
  optimizer embeds SESSION-HISTORY-dependent tokens token-stripping
  cannot fix — the common-subexpression-elimination counter is
  session-global (``_common_expr_N`` numbering depends on what planned
  earlier), and RewriteDistinctAggregates orders its Expand arms / gid
  assignment by exprId allocation history (measured: quality_suite
  hashed THREE ways across three session states on byte-identical
  code; the round-10 close-out snapshot disagreed with a fresh bench
  for 2 of 32 queries). The analyzed plan is pure query construction —
  verified byte-stable fresh-vs-post-sweep and across processes for
  all 32 bench queries. Optimizer-level changes arrive via Spark
  version (fixed) or session confs; conf coverage comes from the
  kernel hash folding session.py into every closure.

- ``kernel_fingerprint(fn)`` — md5 over the SOURCE BYTES of the module
  defining ``fn`` plus every in-package module reachable from it through
  module-level globals (functions/classes imported from siblings pull in
  their defining modules, transitively). Moves on ANY byte edit to any
  module the query's code can reach — deliberately over-approximate:
  marking extra queries "touched" only shrinks the untouched-median ruler
  basis (safe); missing a touch would silently bias it (unsafe).

Together: a query is UNTOUCHED for the ruler only when BOTH hashes are
stable, which closes the kernel-body blind spot without parsing Python.
"""

from __future__ import annotations

import ast
import hashlib
import importlib
import inspect
import re
import sys
from collections.abc import Callable

_PKG = __name__.rsplit(".", 1)[0]  # "stock_etl_pipeline_spark"

# Bump when the HASHING SCHEME changes (not when code changes): hashes from
# different versions are incomparable, and round_compare must not derive a
# touched set across a version boundary. 2 = analyzed-plan hashing +
# session.py in every kernel closure (round 10).
FP_VERSION = 2

# module source hashes memoized per process (files do not change mid-run)
_SRC_HASH: dict[str, str] = {}


def _module_src_hash(mod) -> str | None:
    name = mod.__name__
    if name not in _SRC_HASH:
        f = getattr(mod, "__file__", None)
        if not f or not f.endswith(".py"):
            return None
        with open(f, "rb") as fh:
            _SRC_HASH[name] = hashlib.md5(fh.read()).hexdigest()
    return _SRC_HASH[name]


def module_closure(mod, pkg_prefix: str = _PKG) -> dict[str, str]:
    """``{module_name: src_md5}`` for every in-package module reachable from
    ``mod`` via module-level globals (modules, functions, classes).

    A PACKAGE module's attributes include every submodule ever imported —
    the import machinery binds ``pkg.child`` onto ``pkg`` — which are
    import-order artifacts, not code references: following them makes
    every closure swallow the whole package (measured: all 32 bench
    kernel hashes collapsed to ONE value, so any edit anywhere would mark
    every query touched and empty the untouched-median ruler basis). So a
    module's OWN-subtree module attributes are skipped; genuine
    references survive because ``from .sibling import fn`` binds the
    function (whose ``getmodule`` IS the sibling) and cross-package
    ``from ..operators import dedup`` binds a module that is not in the
    referencing module's own subtree.
    """
    out: dict[str, str] = {}
    stack = [mod]
    while stack:
        m = stack.pop()
        name = getattr(m, "__name__", "")
        if name in out or not name.startswith(pkg_prefix):
            continue
        h = _module_src_hash(m)
        if h is None:
            continue
        out[name] = h
        for v in vars(m).values():
            mm = v if inspect.ismodule(v) else inspect.getmodule(v)
            mm_name = getattr(mm, "__name__", "")
            if (
                mm is not None
                and mm_name.startswith(pkg_prefix)
                and not mm_name.startswith(name + ".")
            ):
                stack.append(mm)
        stack.extend(_static_imports(m, pkg_prefix))
    return out


def _static_imports(mod, pkg_prefix: str):
    """In-package modules named by IMPORT STATEMENTS anywhere in ``mod``'s
    source — including function bodies, which the globals walk cannot see
    (e.g. a query fn's ``from ..quality import quality_metrics_agg``).
    Package ``__init__`` bodies are deliberately NOT scanned: their
    function-body imports are registration fan-outs (``load_all`` imports
    every workload module), and following those re-collapses every
    closure onto the whole package; their module-level imports are
    already covered by the globals walk."""
    if getattr(mod, "__path__", None) is not None:  # package __init__
        return []
    f = getattr(mod, "__file__", None)
    if not f or not f.endswith(".py"):
        return []
    try:
        with open(f) as fh:
            tree = ast.parse(fh.read())
    except (OSError, SyntaxError):
        return []
    names: set[str] = set()
    parts = mod.__name__.split(".")
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith(pkg_prefix):
                    names.add(a.name)
        elif isinstance(node, ast.ImportFrom):
            if node.level:
                anchor = ".".join(parts[: len(parts) - node.level])
                base = anchor + ("." + node.module if node.module else "")
            else:
                base = node.module or ""
            if base.startswith(pkg_prefix):
                names.add(base)
                # an imported NAME may itself be a module (from ..operators
                # import similarity); non-module names fail the import
                # below and drop out
                for a in node.names:
                    names.add(base + "." + a.name)
    mods = []
    for n in sorted(names):
        m = sys.modules.get(n)
        if m is None:
            try:
                m = importlib.import_module(n)
            except Exception:
                continue
        mods.append(m)
    return mods


def kernel_fingerprint(fn: Callable, pkg_prefix: str = _PKG) -> str | None:
    """md5 over the sorted (module, src_md5) closure of ``fn``'s module.

    For the real package, ``session.py`` is folded into EVERY closure:
    queries never import it (callers own the session), but its confs shape
    every query's runtime — and with analyzed-plan hashing (fp_version 2)
    the plan hash cannot see conf changes either. A session.py edit
    marking every query touched is the correct over-approximation."""
    mod = inspect.getmodule(fn)
    if mod is None:
        return None
    closure = module_closure(mod, pkg_prefix)
    if not closure:
        return None
    if pkg_prefix == _PKG:
        sess = sys.modules.get(f"{_PKG}.session") or importlib.import_module(
            f"{_PKG}.session"
        )
        h = _module_src_hash(sess)
        if h is not None:
            closure[sess.__name__] = h
    acc = hashlib.md5()
    for name in sorted(closure):
        acc.update(name.encode())
        acc.update(closure[name].encode())
    return acc.hexdigest()[:12]


def plan_fingerprint(df) -> str:
    """md5 of the analyzed logical plan, session-varying tokens stripped
    (see module docstring for why analyzed, not optimized)."""
    s = df._jdf.queryExecution().analyzed().toString()
    s = re.sub(r"#\d+L?", "#", s)
    s = re.sub(r"plan_id=\d+", "plan_id=", s)
    s = re.sub(r"0x[0-9a-f]+", "0x", s)
    s = re.sub(r"at [^>]*>", ">", s)
    return hashlib.md5(s.encode()).hexdigest()[:12]
