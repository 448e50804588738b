"""Packaging metadata: the engine installs as a normal package.

The driver contract never imports an installed wheel (it adds the
checkout to sys.path), but `pip install` is the first thing a real
user runs — so the metadata is pinned executable here: the PEP 517
sdist hook must succeed from pyproject.toml alone, and the console
entry point must resolve to a real callable.

Container boundary (documented in SCALE.md's packaging row): the
`wheel` and `build` distributions are absent and cannot be installed
(no-pip environment), so `build_wheel` / `python -m build` are
validated in normal environments only; the sdist path needs neither.
"""

from __future__ import annotations

import importlib
import sys
import tarfile
import tomllib
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def test_sdist_builds_from_pyproject(tmp_path, monkeypatch):
    from setuptools import build_meta

    monkeypatch.chdir(REPO)
    name = build_meta.build_sdist(str(tmp_path))
    members = tarfile.open(tmp_path / name).getnames()
    assert any(m.endswith("pyproject.toml") for m in members)
    assert any(m.endswith("PKG-INFO") for m in members)
    # every package dir ships, not just the top level
    for probe in (
        "mapreducegcp_spark/registry.py",
        "mapreducegcp_spark/operators/dedup.py",
        "mapreducegcp_spark/sources/catalog.py",
        "mapreducegcp_spark/streaming/events.py",
        "mapreducegcp_spark/plans/run_mapred.py",
        "mapreducegcp_spark/functions/text.py",
    ):
        assert any(m.endswith(probe) for m in members), probe
    # build_sdist writes egg-info into cwd as a side effect; keep the
    # checkout clean for the copy/leak checkers
    import shutil

    shutil.rmtree(REPO / "mapreducegcp_spark.egg-info", ignore_errors=True)


def test_console_entry_point_resolves():
    meta = tomllib.loads((REPO / "pyproject.toml").read_text())
    scripts = meta["project"]["scripts"]
    assert "mapreducegcp-spark" in scripts
    target = scripts["mapreducegcp-spark"]
    mod_name, _, attr = target.partition(":")
    mod = importlib.import_module(mod_name)
    fn = getattr(mod, attr)
    assert callable(fn)


def test_declared_deps_match_what_the_engine_imports():
    """The [project] dependency list must cover the runtime imports —
    a user installing the wheel into a clean venv gets a working
    engine, not an ImportError at first query."""
    meta = tomllib.loads((REPO / "pyproject.toml").read_text())
    deps = " ".join(meta["project"]["dependencies"])
    for runtime_dep in ("pyspark", "pandas", "pyarrow", "numpy"):
        assert runtime_dep in deps, runtime_dep
    dev = " ".join(meta["project"]["optional-dependencies"]["dev"])
    assert "duckdb" in dev  # oracle harness only — NOT a runtime dep


@pytest.mark.skipif(
    importlib.util.find_spec("wheel") is None,
    reason="`wheel` absent in this container (documented packaging "
    "boundary, SCALE.md); build_wheel validated in normal envs",
)
def test_wheel_builds_from_pyproject(tmp_path, monkeypatch):
    from setuptools import build_meta

    monkeypatch.chdir(REPO)
    name = build_meta.build_wheel(str(tmp_path))
    assert name.endswith(".whl")
