"""CLI surface: python -m mapreducegcp_spark {list,run,explain,oracle,sql,mapred}.

Exercises the argparse wiring and each command's happy path against the
smoke-scale tables. The spark session is the shared test fixture; the
CLI's get_spark() returns the same active session, so no second JVM."""

from __future__ import annotations

import json

import pytest

from mapreducegcp_spark.__main__ import main

SF = "/root/testdata/sf0.001"


def test_list_names_catalog(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "wordcount" in out and "dedup_exact" in out


def test_list_tag_filter(capsys):
    assert main(["list", "--tag", "reference-parity"]) == 0
    out = capsys.readouterr().out
    assert "mapred_lifecycle" in out
    assert "tpch_q10_returned_items" not in out


def test_run_shows_rows(spark, capsys):
    assert main(["run", "wordcount", "--sf-dir", SF, "--show", "3"]) == 0
    assert "word" in capsys.readouterr().out


def test_run_writes_output(spark, tmp_path, capsys):
    out_dir = str(tmp_path / "wc_json")
    assert (
        main(
            ["run", "wordcount", "--sf-dir", SF, "--output", out_dir, "--format", "json"]
        )
        == 0
    )
    rows = spark.read.json(out_dir)
    assert rows.count() > 0 and set(rows.columns) == {"word", "cnt"}


def test_run_unknown_query_is_error(capsys):
    assert main(["run", "not_a_query", "--sf-dir", SF]) == 2


def test_explain_prints_physical_plan(spark, capsys):
    assert main(["explain", "dedup_exact", "--sf-dir", SF]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out


def test_oracle_prints_sql(capsys):
    assert main(["oracle", "wordcount"]) == 0
    assert "GROUP BY" in capsys.readouterr().out.upper()


def test_sql_over_views(spark, capsys):
    assert (
        main(
            [
                "sql",
                "SELECT count(*) AS n FROM orders",
                "--sf-dir",
                SF,
            ]
        )
        == 0
    )
    assert "n" in capsys.readouterr().out


def test_mapred_literal_roundtrip(spark, tmp_path, capsys):
    out_file = str(tmp_path / "wc.json")
    assert (
        main(
            [
                "mapred",
                "the quick fox and the lazy dog",
                "--app",
                "WordCount",
                "--output",
                out_file,
            ]
        )
        == 0
    )
    payload = json.loads(open(out_file, encoding="utf-8").read())
    assert payload["the"] == 2 and payload["fox"] == 1
