"""Edge-input behavior and observability.

Operators must degrade to empty/NULL results — never throw — when a
filter leaves nothing behind, and pipelines expose row-level metrics
through the Observation API without a second pass over the data.
"""

from pyspark.sql import Observation
from pyspark.sql import functions as F

from mapreducegcp_spark.registry import all_queries
from mapreducegcp_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def _empty_docs(spark):
    return (
        load_table(spark, SF_DIR, "documents").filter(F.lit(False))
    )


def test_wordcount_on_empty_corpus(spark, monkeypatch):
    import mapreducegcp_spark.operators.wordcount as wc

    empty = _empty_docs(spark)
    monkeypatch.setattr(wc, "load_table", lambda *a, **k: empty)
    assert all_queries()["wordcount"].fn(spark, SF_DIR).count() == 0


def test_jaccard_on_empty_corpus(spark, monkeypatch):
    import mapreducegcp_spark.operators.dedup as dd

    empty = _empty_docs(spark)
    monkeypatch.setattr(dd, "load_table", lambda *a, **k: empty)
    assert all_queries()["dedup_ngram_jaccard"].fn(spark, SF_DIR).count() == 0


def test_asof_with_no_clicks(spark, monkeypatch):
    import mapreducegcp_spark.operators.timeseries as ts

    ev = load_table(spark, SF_DIR, "events").filter(F.col("event_type") != "click")
    monkeypatch.setattr(ts, "load_table", lambda *a, **k: ev)
    out = all_queries()["asof_join_last_click"].fn(spark, SF_DIR)
    rows = out.collect()
    assert rows  # purchases still present
    assert all(r.last_click_us is None and r.gap_us is None for r in rows)


def test_shingle_queries_on_sub_k_token_docs(spark, monkeypatch):
    # docs shorter than SHINGLE_K tokens must contribute no shingles —
    # the naive sequence(1, size-k+1) yields the DESCENDING [1, 0] for
    # them and element_at(toks, 0) throws INVALID_INDEX_OF_ZERO
    import mapreducegcp_spark.operators.dedup as dd

    short = spark.createDataFrame(
        [(900001, "one two"), (900002, "solo"), (900003, ""), (900004, "a b c")],
        "doc_id long, text string",
    )
    monkeypatch.setattr(dd, "load_table", lambda *a, **k: short)
    pairs = all_queries()["dedup_ngram_jaccard"].fn(spark, SF_DIR).collect()
    assert pairs == []  # only the 3-token doc shingles; no pairs, no crash


def test_frame_sample_on_empty_payload(spark, monkeypatch):
    # zero-length payload => 0 frames and 0 sampled (sequence(0, -1)
    # would otherwise produce a phantom frame 0)
    import mapreducegcp_spark.operators.multimodal as mm

    docs = spark.createDataFrame(
        [(900001, ""), (900002, "x" * 40)], "doc_id long, text string"
    )
    monkeypatch.setattr(mm, "load_table", lambda *a, **k: docs)
    rows = {
        r.doc_id: r
        for r in all_queries()["multimodal_frame_sample"].fn(spark, SF_DIR).collect()
    }
    assert rows[900001].n_frames == 0 and rows[900001].n_sampled == 0
    assert rows[900002].n_frames == 3 and rows[900002].n_sampled == 1


def test_observe_emits_metrics_without_second_pass(spark):
    # Observation metrics ride the same action as the result — the
    # pattern for row-count / quality accounting in production sinks
    docs = load_table(spark, SF_DIR, "documents")
    obs = Observation("corpus")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("text")).alias("n_chars"),
    )
    kept = observed.filter(F.col("lang") == "en").count()
    assert obs.get["n_rows"] == docs.count()
    assert obs.get["n_chars"] > 0
    assert 0 < kept <= obs.get["n_rows"]
