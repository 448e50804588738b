"""Registry rotation: the driver-evidence ordering must hold.

The driver checks ~50 catalog queries per round in iteration order;
``all_queries()`` orders by evidence age (never-checked first, then
least-recently-checked) so the window advances every round. A silent
regression here would stall the correctness-evidence union — worth a
plain unit test (no Spark needed)."""

from __future__ import annotations

import json
import os

import pytest

from mapreducegcp_spark import registry


@pytest.fixture
def fake_artifacts(tmp_path, monkeypatch):
    """Point the registry at a synthetic artifact dir and reset its cache."""
    monkeypatch.setattr(registry, "_REPO_ROOT", tmp_path)
    monkeypatch.setattr(registry, "_LAST_CHECKED", None)
    yield tmp_path
    registry._LAST_CHECKED = None  # do not leak fake evidence to other tests


def _write(tmp_path, rnd: int, rows: dict) -> None:
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(rows))


def test_never_checked_queries_iterate_first(fake_artifacts):
    reg = {n: registry.RegisteredQuery(n, fn=None) for n in ("a", "b", "c", "d")}
    _write(fake_artifacts, 1, {"b": {"err": None}, "d": {"err": None}})
    assert list(registry._evidence_rotation(reg)) == ["a", "c", "b", "d"]


def test_stalest_round_breaks_ties_before_registration_order(fake_artifacts):
    reg = {n: registry.RegisteredQuery(n, fn=None) for n in ("a", "b", "c")}
    _write(fake_artifacts, 1, {"c": {"err": None}})
    _write(fake_artifacts, 2, {"a": {"err": None}})
    # b never checked -> first; c checked r1 -> before a (checked r2)
    assert list(registry._evidence_rotation(reg)) == ["b", "c", "a"]


def test_err_rows_are_not_evidence(fake_artifacts):
    reg = {n: registry.RegisteredQuery(n, fn=None) for n in ("a", "b")}
    _write(fake_artifacts, 1, {"a": {"err": "no_oracle"}, "b": {"err": None}})
    # a's row carried an err -> still round 0 -> iterates first
    assert list(registry._evidence_rotation(reg)) == ["a", "b"]


def test_malformed_artifact_is_skipped(fake_artifacts):
    reg = {n: registry.RegisteredQuery(n, fn=None) for n in ("a", "b")}
    (fake_artifacts / "CORRECTNESS_r01.json").write_text("{not json")
    _write(fake_artifacts, 2, {"a": {"err": None}})
    assert list(registry._evidence_rotation(reg)) == ["b", "a"]


def test_real_catalog_front_has_no_stale_evidence():
    """Against the real committed artifacts: every query in the front-50
    window must be no more recently checked than anything after it —
    the monotone property the driver budget depends on. Queries in
    the recheck tier (behavior changed after their last driver row)
    carry effective age 0.5: after never-checked, before everything
    with still-valid evidence."""
    last = registry._last_checked_round()
    qs = registry.all_queries()
    tiers = registry._recheck_tiers(qs)
    names = list(qs)

    def age(n: str) -> float:
        if n not in last:
            return 0.0
        return tiers.get(n, float(last[n]))

    ages = [age(n) for n in names]
    assert ages == sorted(ages)


def test_defining_module_changes_outrank_closure_derived(monkeypatch):
    """Tier ordering: directly-touched queries (0.4) lead the window,
    the hand list (0.5) follows, import-closure-derived (0.6) after —
    so a budgeted driver window verifies the query whose own code
    changed before the conservative superset."""

    def fn_in(mod):
        def fn(spark, sf_dir):  # pragma: no cover
            return None

        fn.__module__ = mod
        return fn

    reg = {
        "q_direct": registry.RegisteredQuery("q_direct", fn=fn_in("pkg.a")),
        "q_closure": registry.RegisteredQuery("q_closure", fn=fn_in("pkg.b")),
        "q_hand": registry.RegisteredQuery("q_hand", fn=fn_in("pkg.c")),
        "q_cold": registry.RegisteredQuery("q_cold", fn=fn_in("pkg.d")),
    }
    monkeypatch.setattr(registry, "_CHANGED_MODULES", frozenset({"pkg.a", "pkg.h"}))
    monkeypatch.setattr(
        registry, "_IMPORT_CLOSURE",
        {"pkg.a": frozenset({"pkg.a"}), "pkg.b": frozenset({"pkg.b", "pkg.h"}),
         "pkg.c": frozenset({"pkg.c"}), "pkg.d": frozenset({"pkg.d"})},
    )
    # symbol-level: pkg.h's change is unanalyzable -> reaches everything
    monkeypatch.setattr(
        registry, "_CHANGED_SYMBOLS", {"pkg.a": None, "pkg.h": None}
    )
    monkeypatch.setattr(registry, "_RECHECK_FIRST", frozenset({"q_hand"}))
    tiers = registry._recheck_tiers(reg)
    assert tiers == {"q_direct": 0.4, "q_hand": 0.5, "q_closure": 0.6}
    # rotation respects the tiers among evidence-equal queries
    monkeypatch.setattr(registry, "_LAST_CHECKED", None)
    monkeypatch.setattr(
        registry, "_last_checked_round",
        lambda: {n: 3 for n in reg},
    )
    assert list(registry._evidence_rotation(reg)) == [
        "q_direct", "q_hand", "q_closure", "q_cold"
    ]


def test_recheck_tier_derives_from_git_changed_modules(monkeypatch):
    """Verdict r10 ask #3 'done' criterion, refined round 13: the boost
    set must cover every query in a changed defining module whose OWN
    symbol changed (or is unattributable) — computed here independently
    with the same git primitive the registry uses, so a regression in
    the path->module mapping (not just in the git call) fails loudly.
    Queries in a changed module whose top-level symbol did NOT change
    are deliberately excluded (round 13: a two-query edit to a
    20-query module must not flood the driver's bounded window)."""
    import subprocess
    from pathlib import Path

    repo = Path(registry.__file__).resolve().parent.parent
    boundary = subprocess.run(
        ["git", "-C", str(repo), "log", "-n1", "--format=%H",
         "-E", "--grep=^round [0-9]+: verdict"],
        capture_output=True, text=True,
    ).stdout.strip()
    if not boundary:
        pytest.skip("no round-boundary commit in this checkout (fresh clone)")
    diff = subprocess.run(
        ["git", "-C", str(repo), "diff", "--name-only", boundary],
        capture_output=True, text=True,
    ).stdout.splitlines()
    changed_mods = {
        p.strip()[:-3].replace("/", ".")
        for p in diff
        if p.strip().startswith("mapreducegcp_spark/") and p.strip().endswith(".py")
    }
    qs = registry.all_queries()
    monkeypatch.setattr(registry, "_CHANGED_MODULES", None)  # defeat the caches
    monkeypatch.setattr(registry, "_CHANGED_SYMBOLS", None)
    syms = registry._changed_symbols_since_round()
    expected = set()
    for n, rq in qs.items():
        mod = getattr(rq.fn, "__module__", None)
        if mod not in changed_mods:
            continue
        s = syms.get(mod)
        fn_name = getattr(rq.fn, "__name__", None)
        if (
            s is None
            or fn_name in s
            or fn_name not in registry._module_symbols(mod)
        ):
            expected.add(n)
    boost = registry._recheck_names(qs)
    assert boost >= expected, sorted(expected - boost)


def test_direct_tier_is_symbol_refined(monkeypatch):
    """A changed module boosts ONLY the queries whose own top-level
    symbol changed (intra-module propagation included), plus any
    unattributable (closure-generated) query fns — not every query the
    module defines. Without this, one edit to a 20-query module floods
    the driver's 50-row window and pushes the actually-changed queries
    out of it."""
    qs = registry.all_queries()
    # real module with many queries: pretend only q_tpch_q4's symbol
    # changed in tpch.py
    monkeypatch.setattr(
        registry, "_CHANGED_MODULES",
        frozenset({"mapreducegcp_spark.operators.tpch"}),
    )
    monkeypatch.setattr(
        registry, "_CHANGED_SYMBOLS",
        {"mapreducegcp_spark.operators.tpch": frozenset({"q_tpch_q4"})},
    )
    tiers = registry._recheck_tiers(qs)
    direct = {n for n, t in tiers.items() if t == 0.4}
    assert "tpch_q4_order_priority" in direct
    assert "tpch_q6_forecast_revenue" not in direct
    # unanalyzable diff degrades to the whole module (old behavior)
    monkeypatch.setattr(
        registry, "_CHANGED_SYMBOLS",
        {"mapreducegcp_spark.operators.tpch": None},
    )
    tiers = registry._recheck_tiers(qs)
    direct = {n for n, t in tiers.items() if t == 0.4}
    assert {"tpch_q4_order_priority", "tpch_q6_forecast_revenue"} <= direct


def test_snapshot_commit_is_not_a_round_boundary(monkeypatch, tmp_path):
    """Verdict r12 ask #1: the harness commits 'round N: end-of-round
    snapshot' AFTER the round's work. If that subject matched the
    boundary pattern, the boundary would be HEAD at driver-verification
    time, the diff empty, and the recheck boost a silent no-op (round 12
    shipped 17 restructures the driver never re-verified this way). The
    boundary must resolve to the driver's VERDICT commit even when a
    snapshot commit sits on top of it."""
    import subprocess

    def git(*args):
        subprocess.run(
            ["git", "-C", str(tmp_path), *args], check=True,
            capture_output=True,
            env={"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
                 "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
                 "PATH": os.environ["PATH"]},
        )

    git("init", "-q")
    (tmp_path / "f").write_text("1")
    git("add", "f")
    git("commit", "-q", "-m", "round 12: verdict/advice/correctness/bench")
    verdict = subprocess.run(
        ["git", "-C", str(tmp_path), "rev-parse", "HEAD"],
        capture_output=True, text=True,
    ).stdout.strip()
    (tmp_path / "f").write_text("2")
    git("commit", "-q", "-am", "optimize something")
    (tmp_path / "f").write_text("3")
    git("commit", "-q", "-am", "round 13: end-of-round snapshot (9 turns, 1s)")

    monkeypatch.setattr(registry, "_REPO_ROOT", tmp_path)
    assert registry._last_boundary_commit() == verdict


def test_helper_module_change_boosts_importing_queries(monkeypatch):
    """A change to a HELPER module (functions/checkpoint.py) must boost
    queries whose defining module imports it transitively — the
    defining-module map alone would miss every cross-module behavior
    change. The dispatch layer itself is exempt (every operator imports
    registry for @register; boosting the whole catalog would destroy
    the windowing)."""
    qs = registry.all_queries()
    monkeypatch.setattr(
        registry, "_CHANGED_MODULES",
        frozenset({"mapreducegcp_spark.functions.checkpoint"}),
    )
    # simulate a SEMANTIC change (the tree is actually clean, so the
    # real symbol diff would read cosmetic): unanalyzable -> all symbols
    monkeypatch.setattr(
        registry, "_CHANGED_SYMBOLS",
        {"mapreducegcp_spark.functions.checkpoint": None},
    )
    boost = registry._recheck_names(qs)
    # dedup imports safe_checkpoint; its cluster queries must be boosted
    assert {"dedup_clusters_localuf", "dedup_clusters_twophase",
            "dedup_minhash_lsh"} <= boost
    # a module that never touches checkpointing must NOT be boosted
    assert "wordcount" not in boost

    monkeypatch.setattr(
        registry, "_CHANGED_MODULES",
        frozenset({"mapreducegcp_spark.registry"}),
    )
    assert registry._recheck_names(qs) == registry._RECHECK_FIRST


def test_recheck_names_merges_hand_list_and_derived(monkeypatch):
    """Unit: a query whose defining module is in the changed set joins
    the hand-curated entries; untouched modules do not."""

    def fake_fn_in(mod):
        def fn(spark, sf_dir):  # pragma: no cover - never called
            return None

        fn.__module__ = mod
        return fn

    reg = {
        "q_touched": registry.RegisteredQuery("q_touched", fn=fake_fn_in("pkg.ops.a")),
        "q_hand": registry.RegisteredQuery("q_hand", fn=fake_fn_in("pkg.ops.c")),
        "q_cold": registry.RegisteredQuery("q_cold", fn=fake_fn_in("pkg.ops.b")),
    }
    monkeypatch.setattr(registry, "_CHANGED_MODULES", frozenset({"pkg.ops.a"}))
    monkeypatch.setattr(registry, "_IMPORT_CLOSURE", {})
    monkeypatch.setattr(
        registry, "_RECHECK_FIRST", frozenset({"q_hand", "q_retired_name"})
    )
    # merged; a hand entry no longer in the catalog is dropped
    assert registry._recheck_names(reg) == {"q_touched", "q_hand"}


def test_recheck_first_tier_sorts_after_never_checked(fake_artifacts, monkeypatch):
    """A behaviorally-changed query (green row, but listed in
    _RECHECK_FIRST) must iterate after never-checked queries but
    before other checked ones — its old row is stale evidence."""
    reg = {n: registry.RegisteredQuery(n, fn=None) for n in ("a", "b", "c")}
    _write(fake_artifacts, 1, {"b": {"err": None}, "c": {"err": None}})
    monkeypatch.setattr(registry, "_RECHECK_FIRST", frozenset({"c"}))
    # a never checked -> first; c changed -> recheck tier; b normal
    assert list(registry._evidence_rotation(reg)) == ["a", "c", "b"]


def test_module_of_path_normalizes_init():
    """ADVICE r11: ``pkg/sub/__init__.py`` must map to ``pkg.sub`` —
    the spelling the import closure and fn.__module__ use — or every
    __init__ edit silently escapes the git-derived recheck boost."""
    f = registry._module_of_path
    assert f("pkg/sub/__init__.py", "pkg") == "pkg.sub"
    assert f("pkg/__init__.py", "pkg") == "pkg"
    assert f("pkg/sub/mod.py", "pkg") == "pkg.sub.mod"
    assert f("other/mod.py", "pkg") is None
    assert f("pkg/data.txt", "pkg") is None


def test_init_change_boosts_importers(monkeypatch):
    """ADVICE r11 'done' criterion: a changed __init__ (normalized to
    its package dotted name) boosts the queries whose closure imports
    it — here via a synthetic importer binding a re-exported name."""

    def fn_in(mod):
        def fn(spark, sf_dir):  # pragma: no cover
            return None

        fn.__module__ = mod
        return fn

    reg = {"q_imp": registry.RegisteredQuery("q_imp", fn=fn_in("pkg.ops.a"))}
    # pkg.sub is a package (__init__) re-exporting `load`; pkg.ops.a
    # binds it
    monkeypatch.setattr(registry, "_CHANGED_MODULES", frozenset({"pkg.sub"}))
    monkeypatch.setattr(
        registry, "_IMPORT_CLOSURE",
        {"pkg.ops.a": frozenset({"pkg.ops.a", "pkg.sub"})},
    )
    monkeypatch.setattr(
        registry, "_CHANGED_SYMBOLS", {"pkg.sub": frozenset({"load"})}
    )
    monkeypatch.setattr(
        registry, "_IMPORT_BINDINGS",
        {"pkg.ops.a": {"pkg.sub": frozenset({"load"})}},
    )
    assert registry._recheck_names(reg) == {"q_imp"}
    # the same change with only OTHER names bound does not reach
    monkeypatch.setattr(
        registry, "_IMPORT_BINDINGS",
        {"pkg.ops.a": {"pkg.sub": frozenset({"unrelated"})}},
    )
    assert registry._recheck_names(reg) == frozenset()


def test_symbol_diff_classifies_edits():
    """Unit pins for the symbol-level recheck refinement (verdict r11
    ask #4): cosmetic edits -> empty set; signature changes -> the
    symbol; private-helper edits propagate to public users; module-
    level statement changes -> None (unattributable, treat as all)."""
    base = (
        '"""Module doc."""\n'
        "import os\n"
        "LIMIT = 5\n"
        "def _helper(x):\n"
        '    """helper doc"""\n'
        "    return x + 1\n"
        "def public(y):\n"
        "    return _helper(y) * LIMIT\n"
        "def other(z):\n"
        "    # a comment\n"
        "    return z\n"
    )
    # docstring + comment edits are invisible
    cosmetic = base.replace("Module doc.", "Better doc.").replace(
        "helper doc", "clearer doc"
    ).replace("# a comment", "# reworded comment")
    assert registry._symbol_diff(base, cosmetic) == frozenset()
    # signature change marks the symbol
    sig = base.replace("def other(z):", "def other(z, w=0):")
    assert registry._symbol_diff(base, sig) == frozenset({"other"})
    # private-helper body change propagates to its callers
    helper = base.replace("return x + 1", "return x + 2")
    assert registry._symbol_diff(base, helper) == frozenset({"_helper", "public"})
    # module-level constant change propagates by reference too
    const = base.replace("LIMIT = 5", "LIMIT = 6")
    assert registry._symbol_diff(base, const) == frozenset({"LIMIT", "public"})
    # a changed module-level statement (import) is unattributable
    imp = base.replace("import os", "import os, sys")
    assert registry._symbol_diff(base, imp) is None
    # added / removed symbols count as changed
    added = base + "def brand_new(a):\n    return a\n"
    assert registry._symbol_diff(base, added) == frozenset({"brand_new"})


def test_docstring_only_edit_boosts_no_closure_queries(monkeypatch):
    """Verdict r11 ask #4 'done' criterion, on real sources: a
    docstring-only edit to an operator module reads as cosmetic, and a
    cosmetic edit to the checkpoint HELPER (imported by the whole dedup
    family — 80+ closure queries under the old superset rule) boosts
    zero closure-derived queries. A real symbol change still boosts,
    and only where the changed name is actually bound."""
    from pathlib import Path

    pkg_dir = Path(registry.__file__).resolve().parent
    src = (pkg_dir / "operators" / "relational.py").read_text()
    edited = src.replace('"""', '"""EDITED-FOR-TEST. ', 1)
    assert edited != src
    assert registry._symbol_diff(src, edited) == frozenset()

    qs = registry.all_queries()
    ckpt = "mapreducegcp_spark.functions.checkpoint"
    monkeypatch.setattr(registry, "_CHANGED_MODULES", frozenset({ckpt}))
    monkeypatch.setattr(registry, "_CHANGED_SYMBOLS", {ckpt: frozenset()})
    assert registry._recheck_names(qs) == registry._RECHECK_FIRST
    # a change to a name nobody binds does not reach either
    monkeypatch.setattr(
        registry, "_CHANGED_SYMBOLS", {ckpt: frozenset({"_private_nobody_binds"})}
    )
    assert registry._recheck_names(qs) == registry._RECHECK_FIRST
    # the bound symbol changing still boosts the importing family
    monkeypatch.setattr(
        registry, "_CHANGED_SYMBOLS", {ckpt: frozenset({"safe_checkpoint"})}
    )
    boost = registry._recheck_names(qs)
    assert {"dedup_clusters_localuf", "dedup_minhash_lsh"} <= boost


def test_import_bindings_real_package():
    """The bindings map must reflect real import styles: dedup binds
    safe_checkpoint by name; a plain `import pkg.mod` (unrestricted
    attribute access) binds the whole module."""
    b = registry._import_bindings()
    dedup = b["mapreducegcp_spark.operators.dedup"]
    assert dedup["mapreducegcp_spark.functions.checkpoint"] == frozenset(
        {"safe_checkpoint"}
    )
    # every importer row maps package modules only
    for imp, targets in b.items():
        for t in targets:
            assert t.startswith("mapreducegcp_spark")


def test_oracle_and_query_key_sets_match():
    """Driver contract: every catalog entry needs BOTH a queries() and
    an oracle_sql() entry (zero rows-only since round 3)."""
    qs = registry.query_fns()
    os_ = registry.oracle_sqls()
    assert set(qs) == set(os_)


def test_catalog_md_matches_registry():
    """CATALOG.md is the generated authoritative inventory; it drifted
    silently in round 4 (registry 270 vs catalog 267). Fail loudly on
    any future drift: the set of backtick-quoted query names in the
    committed file must equal all_queries() exactly."""
    import re
    from pathlib import Path

    text = (Path(registry.__file__).resolve().parent.parent / "CATALOG.md").read_text()
    listed = set(re.findall(r"^\| `([a-z0-9_]+)` \|", text, flags=re.M))
    registered = set(registry.all_queries())
    assert listed == registered, (
        f"CATALOG.md drift: missing={sorted(registered - listed)} "
        f"extra={sorted(listed - registered)} — rerun tools/gen_catalog.py"
    )


def test_catalog_drift_fails_both_directions():
    """VERDICT r5 ask #8: the drift check is a set EQUALITY, so it must
    fire on an ADDED registry query missing from CATALOG.md AND on a
    REMOVED registry query the file still lists. Exercise both
    directions against the real committed file's name set."""
    import re
    from pathlib import Path

    text = (Path(registry.__file__).resolve().parent.parent / "CATALOG.md").read_text()
    listed = set(re.findall(r"^\| `([a-z0-9_]+)` \|", text, flags=re.M))
    registered = set(registry.all_queries())
    assert listed == registered  # baseline: in sync right now
    # a query added to the registry but not the catalog -> detected
    assert (registered | {"zz_brand_new_query"}) != listed
    # a query removed from the registry but still listed -> detected
    any_name = next(iter(registered))
    assert (registered - {any_name}) != listed
