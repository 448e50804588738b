"""Driver-facing facade parity queries (operators/mapred_parity.py).

These five queries carry the §2.1 source/sink/generic-stage evidence
into the driver's CORRECTNESS gate; here we pin their engine-side
semantics against plain-Python recomputation so a regression is caught
before the driver run.
"""

import re
from collections import Counter

import pytest

from mapreducegcp_spark.operators import mapred_parity as mp

SF_DIR = "/root/testdata/sf0.001"


def _tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-z]+", " ", text.lower()).split() if t]


def test_literal_wordcount_matches_python(spark):
    got = {
        r["word"]: r["cnt"]
        for r in mp.q_mapred_literal_wordcount(spark, SF_DIR).collect()
    }
    assert got == dict(Counter(_tokens(mp._LITERAL)))


def test_dirscan_and_singlefile_agree_with_table(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where("doc_id < 12")
        .collect()
    }
    want_dir = Counter(t for i, x in docs.items() if i < 8 for t in _tokens(x))
    want_file = Counter(t for i, x in docs.items() if 8 <= i < 12 for t in _tokens(x))
    got_dir = {
        r["word"]: r["cnt"] for r in mp.q_mapred_dirscan_wordcount(spark, SF_DIR).collect()
    }
    got_file = {
        r["word"]: r["cnt"]
        for r in mp.q_mapred_singlefile_wordcount(spark, SF_DIR).collect()
    }
    assert got_dir == dict(want_dir)
    assert got_file == dict(want_file)


def test_generic_app_letter_histogram(spark):
    got = {
        r["letter"]: r["cnt"]
        for r in mp.q_mapred_generic_python_app(spark, SF_DIR).collect()
    }
    want = Counter(t[0] for t in _tokens(mp._LITERAL))
    assert got == dict(want)


def test_json_sink_roundtrip_schema(spark):
    df = mp.q_mapred_json_sink_roundtrip(spark, SF_DIR)
    assert [f.name for f in df.schema.fields] == ["word", "cnt"]
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["cnt"] >= 1 for r in rows)
