"""Query registry — the engine's pluggable-application surface.

The reference exposes applications by string name through ``functionMap``
(Worker/Worker.py:68-78): a dict from mapper/reducer names to Python
functions, dispatched by ``worker()``. This registry is the Spark-native
generalization: a named catalog of query builders, each a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB
oracle SQL string used by the correctness harness.

Operator modules self-register at import; ``all_queries()`` imports them
all so the catalog is complete after one call.
"""

from __future__ import annotations

import importlib
import json
import os
import re
from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that register queries (imported lazily by _load_all).
#
# Registration order here is only the TIE-BREAK: external consumers
# that iterate the catalog under a budget (the driver's correctness
# gate checks ~50 queries per round, in iteration order) see the
# catalog ROTATED by evidence age — queries with no CORRECTNESS_r*.json
# row yet iterate first, then least-recently-checked ones (see
# ``_evidence_rotation``). Each round's new driver artifact therefore
# automatically advances the window until the checked union closes
# over the whole catalog; no manual reordering per round.
_OPERATOR_MODULES = [
    "mapreducegcp_spark.operators.dedup",
    "mapreducegcp_spark.operators.similarity",
    "mapreducegcp_spark.operators.textstats",
    "mapreducegcp_spark.operators.multimodal",
    "mapreducegcp_spark.operators.pipeline",
    "mapreducegcp_spark.operators.training",
    "mapreducegcp_spark.operators.graph",
    "mapreducegcp_spark.operators.timeseries",
    "mapreducegcp_spark.operators.sampling",
    "mapreducegcp_spark.operators.sketches",
    "mapreducegcp_spark.operators.layout",
    "mapreducegcp_spark.sources.pysource",
    "mapreducegcp_spark.sources.formats",
    "mapreducegcp_spark.streaming.events",
    "mapreducegcp_spark.operators.windows",
    "mapreducegcp_spark.operators.scalars",
    "mapreducegcp_spark.operators.subqueries",
    "mapreducegcp_spark.operators.udtf_ops",
    "mapreducegcp_spark.operators.aggregates",
    "mapreducegcp_spark.operators.mapred_parity",
    "mapreducegcp_spark.operators.wordcount",
    "mapreducegcp_spark.operators.inverted_index",
    "mapreducegcp_spark.operators.relational",
    "mapreducegcp_spark.operators.tpch",
]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, RegisteredQuery] = {}
_LOADED = False


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a ``(spark, sf_dir) -> DataFrame`` builder to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


def _load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    _LOADED = True


_REPO_ROOT = Path(__file__).resolve().parent.parent
# (cache_key, mapping): cache_key captures the artifact dir and the
# (path, mtime_ns) of every artifact read, so the cache self-invalidates
# when a new CORRECTNESS file lands or an existing one changes — a
# long-lived session picks up fresh evidence without a restart.
_LAST_CHECKED: tuple[tuple, dict[str, int]] | None = None


def _artifact_dir() -> Path:
    """Directory holding CORRECTNESS_r*.json. Defaults to the source
    checkout root; ``SPARK_GRAFT_ARTIFACT_DIR`` overrides it (installed
    packages have no checkout root and fall back to registration order
    when the directory holds no artifacts)."""
    override = os.environ.get("SPARK_GRAFT_ARTIFACT_DIR")
    return Path(override) if override else _REPO_ROOT


def _last_checked_round() -> dict[str, int]:
    """Map query name -> latest driver round with a CORRECTNESS row.

    Reads the committed ``CORRECTNESS_r{N}.json`` artifacts (driver
    per-round oracle-check output) from ``_artifact_dir()``. Unreadable
    or malformed artifacts are skipped — absence of evidence just means
    round 0, i.e. highest rotation priority.
    """
    global _LAST_CHECKED
    root = _artifact_dir()
    def _mtime(p: Path) -> int:
        # an artifact deleted between glob and stat is just "absent" —
        # enumeration must not abort (contract: unreadable artifacts
        # are skipped); the read loop below tolerates the same race
        try:
            return p.stat().st_mtime_ns
        except OSError:
            return -1

    try:
        paths = sorted(root.glob("CORRECTNESS_r*.json"))
    except OSError:
        paths = []
    key = (str(root), tuple((str(p), _mtime(p)) for p in paths))
    if _LAST_CHECKED is None or _LAST_CHECKED[0] != key:
        last: dict[str, int] = {}
        for p in paths:
            m = re.search(r"r(\d+)", p.name)
            if not m:
                continue
            rnd = int(m.group(1))
            try:
                names = json.loads(p.read_text())
            except (OSError, ValueError):
                continue
            if isinstance(names, dict):
                for n, row in names.items():
                    # An `err` row (e.g. the retired no_oracle ANN
                    # entries) is not correctness evidence — leave the
                    # query at round 0 so it gets a real hash row.
                    if isinstance(row, dict) and row.get("err"):
                        continue
                    last[n] = max(last.get(n, 0), rnd)
        _LAST_CHECKED = (key, last)
    return _LAST_CHECKED[1]


# Queries whose BEHAVIOR (output values or semantics) changed since
# their last driver CORRECTNESS row. Listed names sort directly after
# the never-checked tier, so the next driver window re-verifies them
# even though they hold a (now-stale) green row — the round-5 judge
# flagged exactly this gap: a snapshot that omits behaviorally-changed
# queries can't substantiate a "stays green" claim.
#
# Since round 11 the bulk of this set is DERIVED FROM GIT, not curated:
# every query whose DEFINING MODULE changed since the last round
# boundary (the driver's "round N: verdict/..." commit) is boosted
# automatically (see ``_changed_modules_since_round``), so a missed
# hand entry can no longer silently postpone re-verification of changed
# code. This hand list remains ONLY for cross-module semantic changes
# git can't attribute (a helper in functions/ changing the values of a
# query defined elsewhere); clear entries once the next CORRECTNESS
# artifact lands rows for them.
_RECHECK_FIRST: frozenset[str] = frozenset(
    {
        # round 10 entries cleared: all nine landed green rows in
        # CORRECTNESS_r10 (driver re-verified the new shapes).
        #
        # Round-12 restructures that never got a driver oracle row: the
        # round-12 boundary regex matched the session's own snapshot
        # commit, so the git boost no-opped at driver time (verdict r12
        # ask #2), and these commits sit BEFORE the round-12 verdict
        # boundary, so the fixed git tier can't see them either — the
        # hand list is the only mechanism left. Clear once
        # CORRECTNESS_r13 lands green rows for them.
        "tpch_q2_min_cost_supplier",
        "tpch_q11_important_stock",
        "tpch_q15_top_supplier",
        "tpch_q17_small_quantity_revenue",
        "tpch_q21_suppliers_kept_waiting",
        "subquery_scalar_correlated",
        "join_priority_revenue",
        "tfidf_top_terms",
        "text_unigram_xent",
        "text_bigram_xent",
        "text_bigram_xent_kneser_ney",
        "search_trigram_index",
        "search_phrase_positional",
        "search_proximity_window",
        "graph_triangle_count",
        "graph_pagerank_nations",
        "pipeline_training_dataset",
        "sample_dsir_importance",
        "sample_temperature",
        "decontaminate_ngram_overlap",
        "pipeline_token_budget_plan",
    }
)

# -- git-derived recheck tier (round-11 verdict ask #3) ----------------
#
# The driver commits a "round N: verdict/advice/correctness/bench"
# boundary after each round's CORRECTNESS artifact, so `git diff
# <boundary>` is exactly "code changed since the last driver
# verification". Mapping those paths through each registered query's
# defining module (fn.__module__) yields the queries whose green rows
# are stale BY CONSTRUCTION. Computed once per process (the registry is
# consulted on every catalog call; a subprocess git per call would be
# driver-visible overhead) and defensively: a non-checkout install, a
# missing git binary, or no boundary commit all degrade to the empty
# set — the hand list above still applies.
#
# Anchored to the driver's VERDICT commit specifically: the harness also
# writes "round N: end-of-round snapshot" commits at session end, AFTER
# the round's work. A pattern matching those makes the boundary HEAD
# itself at driver-verification time, the diff empty, and the boost a
# silent no-op (round 12 shipped 17 restructured queries with no driver
# oracle row exactly this way).
_ROUND_BOUNDARY_SUBJECT = r"^round [0-9]+: verdict"
_CHANGED_MODULES: frozenset[str] | None = None


def _module_of_path(path: str, pkg: str) -> str | None:
    """Repo-relative ``.py`` path -> dotted module name, or None for a
    path outside the package. ``pkg/sub/__init__.py`` normalizes to
    ``pkg.sub`` — the same spelling ``_package_import_closure`` and
    ``fn.__module__`` use; keeping the raw ``pkg.sub.__init__`` here
    made every __init__ edit silently escape the recheck boost."""
    if not (path.startswith(f"{pkg}/") and path.endswith(".py")):
        return None
    return path[: -len(".py")].replace("/", ".").removesuffix(".__init__")


def _last_boundary_commit() -> str | None:
    """Hash of the driver's last round-boundary commit, or None when
    git / the boundary is unavailable (non-checkout installs)."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "-C", str(_REPO_ROOT), "log", "-n1", "--format=%H",
             "-E", f"--grep={_ROUND_BOUNDARY_SUBJECT}"],
            capture_output=True, text=True, timeout=30,
        ).stdout.strip()
        return out or None
    except (OSError, subprocess.SubprocessError):
        return None


def _changed_modules_since_round() -> frozenset[str]:
    """Dotted module names under this package whose source file changed
    (committed or working-tree) since the last round-boundary commit."""
    global _CHANGED_MODULES
    if _CHANGED_MODULES is not None:
        return _CHANGED_MODULES
    import subprocess

    changed: set[str] = set()
    try:
        boundary = _last_boundary_commit()
        if boundary:
            # diff to the WORKING TREE (not HEAD): uncommitted edits to
            # an operator module must boost its queries too
            out = subprocess.run(
                ["git", "-C", str(_REPO_ROOT), "diff", "--name-only", boundary],
                capture_output=True, text=True, timeout=30,
            ).stdout
            pkg = Path(__file__).resolve().parent.name  # mapreducegcp_spark
            for line in out.splitlines():
                mod = _module_of_path(line.strip(), pkg)
                if mod:
                    changed.add(mod)
    except (OSError, subprocess.SubprocessError):
        pass
    _CHANGED_MODULES = frozenset(changed)
    return _CHANGED_MODULES


_IMPORT_CLOSURE: dict[str, frozenset[str]] | None = None


def _package_import_closure() -> dict[str, frozenset[str]]:
    """module -> transitive set of PACKAGE modules it imports (itself
    included), from a static AST walk of the package sources. This is
    what lets a HELPER change (functions/checkpoint.py, plans/
    run_mapred.py) boost the queries defined in the operator modules
    that import it — defining-module mapping alone would miss every
    cross-module behavior change. Cached per process; a module whose
    source can't be read just maps to itself."""
    global _IMPORT_CLOSURE
    if _IMPORT_CLOSURE is not None:
        return _IMPORT_CLOSURE
    import ast

    pkg_dir = Path(__file__).resolve().parent
    pkg = pkg_dir.name  # mapreducegcp_spark
    direct: dict[str, set[str]] = {}
    for f in pkg_dir.rglob("*.py"):
        is_init = f.name == "__init__.py"
        mod = ".".join(
            (pkg, *f.relative_to(pkg_dir).with_suffix("").parts)
        ).removesuffix(".__init__")
        deps: set[str] = set()
        try:
            tree = ast.parse(f.read_text())
        except (OSError, SyntaxError):
            direct[mod] = deps
            continue
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                deps.update(a.name for a in node.names if a.name.startswith(pkg))
            elif isinstance(node, ast.ImportFrom):
                if node.level:  # relative: resolve against this module.
                    # For an __init__ (normalized to its package name
                    # above) level 1 is the package ITSELF, so it
                    # strips one segment fewer than a regular module.
                    cut = node.level - (1 if is_init else 0)
                    base = mod.split(".")[: -cut] if cut else mod.split(".")
                    target = ".".join(base + ([node.module] if node.module else []))
                else:
                    target = node.module or ""
                if target.startswith(pkg):
                    deps.add(target)
                    # `from pkg.mod import name` may bind a SUBMODULE
                    deps.update(f"{target}.{a.name}" for a in node.names)
        direct[mod] = deps
    # keep only real package modules as nodes/edges (the `from X import
    # name` submodule guesses that aren't modules drop out here)
    known = set(direct)
    closure: dict[str, frozenset[str]] = {}
    for mod in direct:
        seen = {mod}
        stack = [d for d in direct[mod] if d in known]
        while stack:
            d = stack.pop()
            if d in seen:
                continue
            seen.add(d)
            stack.extend(x for x in direct.get(d, ()) if x in known)
        closure[mod] = frozenset(seen)
    _IMPORT_CLOSURE = closure
    return closure


# -- symbol-level closure refinement (round-12 verdict ask #4) ---------
#
# The import-closure tier above is a SUPERSET guard: any edit to a
# helper module boosted all 80+ downstream queries, including
# docstring-only edits. These helpers narrow it to changes that can
# actually REACH an importer: a helper edit boosts a closure-derived
# query only when some module in the query's import closure binds a
# symbol whose semantic AST (docstrings stripped, intra-module uses
# propagated) changed since the round boundary. Anything unanalyzable
# (git unavailable, new file, parse failure, module-level statement
# change) degrades to "all symbols changed" — the old conservative
# behavior, never silence.


def _symbol_table(src: str) -> tuple[dict[str, str], tuple[str, ...], dict[str, set[str]]]:
    """Top-level symbols of a module source: name -> semantic AST dump
    (docstrings stripped), the dumps of module-level statements that
    define no symbol (imports, if/try blocks, expression statements —
    minus the module docstring), and name -> set of names each symbol
    references (for intra-module change propagation)."""
    import ast

    tree = ast.parse(src)

    def strip_doc(node) -> None:
        body = getattr(node, "body", None)
        if (
            body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            node.body = body[1:] or [ast.Pass()]

    strip_doc(tree)
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            strip_doc(node)

    symbols: dict[str, str] = {}
    nodes: dict[str, ast.AST] = {}
    module_level: list[str] = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            symbols[node.name] = ast.dump(node)
            nodes[node.name] = node
        elif isinstance(node, ast.Assign) and all(
            isinstance(t, ast.Name) for t in node.targets
        ):
            d = ast.dump(node)
            for t in node.targets:
                symbols[t.id] = d
                nodes[t.id] = node
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            symbols[node.target.id] = ast.dump(node)
            nodes[node.target.id] = node
        else:
            module_level.append(ast.dump(node))
    refs = {
        name: {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}
        for name, node in nodes.items()
    }
    return symbols, tuple(module_level), refs


def _symbol_diff(old_src: str, new_src: str) -> frozenset[str] | None:
    """Names of top-level symbols whose semantics changed between two
    sources of one module. ``None`` = a module-level statement changed
    (imports, conditional defs): effects are unattributable, treat as
    all. ``frozenset()`` = cosmetic only (docstrings/comments/
    formatting) — no importer can be affected. An edit to a private
    helper propagates to every symbol that references it, so a public
    function whose callee changed counts as changed even though its
    own AST did not."""
    old_syms, old_mod, old_refs = _symbol_table(old_src)
    new_syms, new_mod, new_refs = _symbol_table(new_src)
    if old_mod != new_mod:
        return None
    changed = {
        k
        for k in old_syms.keys() | new_syms.keys()
        if old_syms.get(k) != new_syms.get(k)
    }
    refs: dict[str, set[str]] = {}
    for k in old_refs.keys() | new_refs.keys():
        refs[k] = old_refs.get(k, set()) | new_refs.get(k, set())
    while True:
        add = {k for k, rs in refs.items() if k not in changed and rs & changed}
        if not add:
            break
        changed |= add
    return frozenset(changed)


_CHANGED_SYMBOLS: dict[str, frozenset[str] | None] | None = None


def _changed_symbols_since_round() -> dict[str, frozenset[str] | None]:
    """changed module -> its symbol diff vs the round boundary (see
    ``_symbol_diff``; ``None`` = treat every symbol as changed).
    Covers exactly ``_changed_modules_since_round()``; computed once
    per process (one ``git show`` per changed module — the changed set
    is small in any round)."""
    global _CHANGED_SYMBOLS
    if _CHANGED_SYMBOLS is not None:
        return _CHANGED_SYMBOLS
    import subprocess

    boundary = _last_boundary_commit()
    out: dict[str, frozenset[str] | None] = {}
    for mod in _changed_modules_since_round():
        out[mod] = None  # conservative until proven analyzable
        if not boundary:
            continue
        rel = mod.replace(".", "/")
        path = next(
            (c for c in (f"{rel}.py", f"{rel}/__init__.py")
             if (_REPO_ROOT / c).is_file()),
            None,
        )
        if path is None:  # deleted module — importers must recheck
            continue
        try:
            shown = subprocess.run(
                ["git", "-C", str(_REPO_ROOT), "show", f"{boundary}:{path}"],
                capture_output=True, text=True, timeout=30,
            )
            if shown.returncode != 0:  # new since the boundary
                continue
            out[mod] = _symbol_diff(shown.stdout, (_REPO_ROOT / path).read_text())
        except (OSError, subprocess.SubprocessError, SyntaxError, ValueError):
            continue
    _CHANGED_SYMBOLS = out
    return out


_MODULE_SYMBOLS: dict[str, frozenset[str]] = {}


def _module_symbols(mod: str) -> frozenset[str]:
    """Top-level symbol names of a package module's CURRENT source —
    lets the direct recheck tier tell 'this query fn is a top-level
    def whose AST did not change' from 'this query fn is
    closure-generated and unattributable'. Unreadable/unparsable
    sources return the empty set, which the caller treats as
    unattributable (conservative boost). Cached per process."""
    if mod in _MODULE_SYMBOLS:
        return _MODULE_SYMBOLS[mod]
    rel = mod.replace(".", "/")
    path = next(
        (c for c in (f"{rel}.py", f"{rel}/__init__.py")
         if (_REPO_ROOT / c).is_file()),
        None,
    )
    out: frozenset[str] = frozenset()
    if path is not None:
        try:
            symbols, _, _ = _symbol_table((_REPO_ROOT / path).read_text())
            out = frozenset(symbols)
        except (OSError, SyntaxError, ValueError):
            pass
    _MODULE_SYMBOLS[mod] = out
    return out


_IMPORT_BINDINGS: dict[str, dict[str, frozenset[str] | None]] | None = None


def _import_bindings() -> dict[str, dict[str, frozenset[str] | None]]:
    """importer module -> {package module -> names the importer binds
    from it, or ``None`` for a whole-module binding (``import m``,
    ``from p import m_sub``, ``from m import *`` — attribute access is
    unrestricted, so every symbol counts as bound)}. Static AST walk
    over the package, cached per process."""
    global _IMPORT_BINDINGS
    if _IMPORT_BINDINGS is not None:
        return _IMPORT_BINDINGS
    import ast

    pkg_dir = Path(__file__).resolve().parent
    pkg = pkg_dir.name
    mods = {
        f: ".".join(
            (pkg, *f.relative_to(pkg_dir).with_suffix("").parts)
        ).removesuffix(".__init__")
        for f in pkg_dir.rglob("*.py")
    }
    known = set(mods.values())
    out: dict[str, dict[str, frozenset[str] | None]] = {}
    for f, mod in mods.items():
        is_init = f.name == "__init__.py"
        binds: dict[str, set[str] | None] = {}

        def bind_all(target: str) -> None:
            binds[target] = None

        def bind_name(target: str, name: str) -> None:
            cur = binds.get(target)
            if target in binds and cur is None:
                return  # already whole-module
            binds[target] = (cur or set()) | {name}

        try:
            tree = ast.parse(f.read_text())
        except (OSError, SyntaxError):
            out[mod] = {}
            continue
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                for a in node.names:
                    if a.name.startswith(pkg):
                        bind_all(a.name)
            elif isinstance(node, ast.ImportFrom):
                if node.level:  # same resolution as _package_import_closure
                    cut = node.level - (1 if is_init else 0)
                    base = mod.split(".")[: -cut] if cut else mod.split(".")
                    target = ".".join(base + ([node.module] if node.module else []))
                else:
                    target = node.module or ""
                if not target.startswith(pkg):
                    continue
                for a in node.names:
                    if a.name == "*":
                        bind_all(target)
                        continue
                    bind_name(target, a.name)
                    if f"{target}.{a.name}" in known:
                        bind_all(f"{target}.{a.name}")
        out[mod] = {
            t: (None if v is None else frozenset(v)) for t, v in binds.items()
        }
    _IMPORT_BINDINGS = out
    return out


def _closure_change_reaches(qclosure: frozenset[str], helpers: frozenset[str]) -> bool:
    """True when any changed helper module's changed SYMBOLS are bound
    by some module inside the query's import closure — i.e. the change
    has a path to the query. A helper whose diff is cosmetic-only
    (empty set) reaches nothing; an unanalyzable helper reaches
    everything (conservative)."""
    syms = _changed_symbols_since_round()
    bindings = _import_bindings()
    for m in helpers:
        s = syms.get(m)  # a module outside the analyzed set -> None
        if s is None:
            return True
        if not s:
            continue
        for imp in qclosure:
            b = bindings.get(imp, {})
            if m in b:
                names = b[m]
                if names is None or names & s:
                    return True
    return False


def _recheck_tiers(reg: dict[str, RegisteredQuery]) -> dict[str, float]:
    """Recheck priorities for queries whose green rows are stale:

    - 0.4 — defining module changed AND the change can reach this
      query: its defining function's semantic AST changed (intra-module
      uses propagated — a query whose helper/constant changed counts),
      or the module diff is unanalyzable, or the query fn is not a
      top-level symbol of its module (closure-generated — symbol
      attribution impossible, stay conservative). Without the symbol
      filter, one two-query edit to a 20-query module floods the
      driver's bounded window with 20 boosts and pushes the queries
      that actually changed out of it (observed round 13: 62-query
      0.4 tier from three touched modules vs ~20 real changes).
    - 0.5 — curated cross-module hand list;
    - 0.6 — defining module transitively IMPORTS a changed package
      module (helpers, plan facades, sources) AND the change can reach
      it: some module in the query's import closure binds a symbol
      whose semantic AST changed (``_closure_change_reaches``).
      Docstring/comment-only edits boost nothing; anything
      unanalyzable still boosts the full superset.

    All three sort after never-checked (0) and before every real
    evidence round (>= 1), so a budgeted driver window covers the
    directly-touched queries first and the reachable import-closure
    set next."""
    # The dispatch layer itself is exempt from the closure: every
    # operator module imports it (for @register), so a registry edit
    # would blanket-boost the whole catalog and destroy the targeted
    # windowing this function implements — and registry changes alter
    # HOW queries are cataloged/ordered, not what any query computes
    # (a dispatch bug is loud and immediate, not a stale green row).
    changed = _changed_modules_since_round() - {__name__}
    tiers = {n: 0.5 for n in _RECHECK_FIRST if n in reg}
    if not changed:
        return tiers
    closure = _package_import_closure()
    syms = _changed_symbols_since_round()
    for n, rq in reg.items():
        mod = getattr(rq.fn, "__module__", None)
        if mod is None:
            continue
        if mod in changed:
            s = syms.get(mod)
            fn_name = getattr(rq.fn, "__name__", None)
            if (
                s is None  # unanalyzable module diff -> all changed
                or fn_name in s  # this query's own symbol changed
                or fn_name not in _module_symbols(mod)  # not attributable
            ):
                tiers[n] = min(tiers.get(n, 0.4), 0.4)
            # else: the module changed but this query's symbol (with
            # intra-module propagation) did not — its green row is not
            # stale; no boost.
        else:
            qclosure = closure.get(mod, frozenset({mod}))
            helpers = qclosure & changed
            if helpers and _closure_change_reaches(qclosure, helpers):
                tiers[n] = min(tiers.get(n, 0.6), 0.6)
    return tiers


def _recheck_names(reg: dict[str, RegisteredQuery]) -> frozenset[str]:
    """Every query in any recheck tier (see ``_recheck_tiers``)."""
    return frozenset(_recheck_tiers(reg))


def _evidence_rotation(reg: dict[str, RegisteredQuery]) -> dict[str, RegisteredQuery]:
    """Order the catalog by evidence age: never-driver-checked queries
    first (round 0), then queries whose behavior changed after their
    last driver row (``_recheck_names``: git-derived changed-module
    queries plus the curated cross-module list — their green rows are
    stale evidence), then ascending by the last round that checked them.
    Within an evidence tier, ``reference-parity``-tagged queries
    (the SURVEY §2.1 probes) come first — they are the operator
    inventory itself, so their driver rows matter most; registration
    order breaks remaining ties. A budget-limited consumer walking the
    front of this dict always spends its budget on the queries with the
    stalest correctness evidence."""
    last = _last_checked_round()
    recheck = _recheck_tiers(reg)
    idx = {name: i for i, name in enumerate(reg)}
    ordered = sorted(
        reg,
        key=lambda n: (
            0 if n not in last else recheck.get(n, last[n]),
            0 if "reference-parity" in reg[n].tags else 1,
            idx[n],
        ),
    )
    return {n: reg[n] for n in ordered}


def all_queries() -> dict[str, RegisteredQuery]:
    _load_all()
    return _evidence_rotation(_REGISTRY)


def get_query(name: str) -> RegisteredQuery:
    _load_all()
    return _REGISTRY[name]


def query_fns() -> dict[str, QueryFn]:
    return {name: rq.fn for name, rq in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {
        name: rq.oracle for name, rq in all_queries().items() if rq.oracle is not None
    }
