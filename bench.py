#!/usr/bin/env python
"""Benchmark harness — wall-clock per headline query at one scale factor.

Runs a curated subset of the registry (one representative per operator
family) against ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1)
on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "headline_total_sec", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Each query executes end-to-end through the ``noop`` sink so the full
physical plan runs (scan -> shuffle -> agg) without driver-side collect
overhead distorting the numbers. A warmup query amortizes JVM/codegen
startup out of the per-query timings.

Breadth timings (every non-headline registered query, one pass each)
go to stderr and ``BENCH_BREADTH.json`` — stdout stays one compact
line so a bounded tail capture always parses the headline number.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mapreducegcp_spark.registry import all_queries
from mapreducegcp_spark.session import get_spark, sf_dir_from_env

# One representative per operator family (SURVEY.md §2 / §7 phases).
HEADLINE = [
    "wordcount",            # reference parity: scan->explode->agg
    "inverted_index",       # reference parity: (word, doc) matrix
    "agg_pricing_summary",  # TPC-H Q1-style wide aggregation
    "join_nation_revenue",  # multi-way broadcast + shuffle join
    "window_topn_per_customer",  # window rank + filter
    "top_k_orders",         # global top-k
    "dedup_exact",          # hash-based exact dedup
    "dedup_minhash_lsh",    # MinHash+LSH near-dup self-join
    "similarity_topk_bruteforce",  # cosine top-k over embeddings
    "similarity_ann_ivf",   # IVF coarse-quantized ANN (train + probe)
    "text_quality_scores",  # text-analysis pipeline pass
    "tfidf_top_terms",      # tf-idf scoring + per-doc top-k
    "subquery_scalar_correlated",  # decorrelated scalar subquery
    "tpch_q10_returned_items",     # multi-join + agg + top-k
    "asof_join_last_click",        # single-shuffle temporal as-of join
    "sessionize_events",           # gap sessionization (one exchange)
    "pipeline_corpus_clean",       # fused filter->dedup->rollup pipeline
    "stream_tumbling_counts",      # streaming windowed rollup (replay)
]


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def _raw_overrides() -> dict:
    """Headline plans timed by their RAW implementation where the
    registered query is a correctness wrapper: similarity_ann_ivf's
    registry entry is now the recall gate (ANN + exact + semi-join,
    so the driver gets a hash row), but the cross-round bench anchor
    is the physical ANN plan itself."""
    from mapreducegcp_spark.operators.similarity import q_similarity_ann_ivf

    return {"similarity_ann_ivf": q_similarity_ann_ivf}


def _run(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _calibrate() -> float:
    """Fixed-work machine-load probe: sha256 over 256 MiB of constant
    bytes, single-threaded, zero I/O — the same work every run on every
    box. Timed before the headliners and again after the breadth sweep
    and written into BOTH artifacts as ``calibration_sec``: an idle
    32-core box reads a stable ~0.2-0.4s; a loaded box (concurrent
    pytest, a second Spark session) inflates it roughly with the load,
    making a slow capture machine-adjudicable from the artifact alone
    instead of by round-over-round inference (the round-5 and round-6
    BENCH_BREADTH contention artifacts each needed a judge rerun to
    adjudicate; this field replaces that with arithmetic).
    tools/bench_trend.py reads it to mark movers as load-explained."""
    import hashlib

    buf = b"\x5a" * (1 << 20)
    t0 = time.perf_counter()
    h = hashlib.sha256()
    for _ in range(256):
        h.update(buf)
    assert h.digest()  # keep the loop un-elidable
    return round(time.perf_counter() - t0, 3)


def _calibrate_mt(n_threads: int = 8) -> float:
    """Multi-core companion to _calibrate: the same sha256 work run on
    ``n_threads`` concurrently (hashlib releases the GIL on large
    buffers, so the threads really run in parallel). The single-thread
    probe misses contention on OTHER cores — a box running a second
    32-way Spark job leaves one spare core for the probe but starves
    the 32-thread query stages; this one inflates whenever total CPU
    is oversubscribed. Idle 32-core box: ~= the single-thread number
    (all 8 threads get their own core)."""
    import hashlib
    import threading

    buf = b"\x5a" * (1 << 20)

    def work():
        h = hashlib.sha256()
        for _ in range(256):
            h.update(buf)
        assert h.digest()

    threads = [threading.Thread(target=work) for _ in range(n_threads)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return round(time.perf_counter() - t0, 3)


def _interleaved_field(root: Path | None = None) -> dict | None:
    """Newest round-mode ``BENCH_INTERLEAVE_r{N}.json``, compacted for
    embedding in the stdout headline object. Single-session captures
    carry ±10-15% session noise (measured round 10), so the canonical
    round-over-round ratio is the interleaved same-session prev-vs-head
    min-of-N — embedding it here puts that number INSIDE the
    driver-recorded ``BENCH_r{N}.json`` by construction (round-10
    verdict ask #1). ``at_current_head`` is False when commits landed
    after the capture — a stale embed is visible, not silent.

    COMPACT BY CONTRACT (round-11 verdict ask #1): the embed carries
    ratio / totals / commits / staleness ONLY — the per-query min
    dicts stay in the artifact file named by ``file`` (consumers such
    as tools/bench_trend.py load them from there). Round 11 embedded
    both full per-query dicts and pushed the single stdout JSON line
    past the driver's 2000-char tail capture, recording
    ``parsed: null`` in the external BENCH_r11.json; tests pin the
    stdout line under 1900 chars so that cannot recur."""
    repo = Path(__file__).resolve().parent  # git root, regardless of
    root = root or repo                     # where artifacts are read from
    arts = sorted(
        (p for p in root.glob("BENCH_INTERLEAVE_r*.json")
         if re.search(r"r(\d+)\.json$", p.name)),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    for p in reversed(arts):
        try:
            doc = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if "ratio" not in doc:  # pre-round-11 ad-hoc capture (e.g. r10)
            continue
        head_now = None
        stale_source: list[str] | None = None
        try:
            import subprocess

            head_now = subprocess.run(
                ["git", "-C", str(repo), "rev-parse", "HEAD"],
                capture_output=True, text=True, timeout=15,
            ).stdout.strip()
            cap = doc.get("head_commit")
            if head_now and cap and head_now != cap:
                # artifact/notes commits land AFTER the capture by
                # construction (the artifact itself is committed); the
                # ratio is only invalidated by SOURCE drift — list any
                # engine/bench paths changed since the capture so an
                # empty list reads as "artifact-only drift, ratio valid"
                proc = subprocess.run(
                    ["git", "-C", str(repo), "diff", "--name-only",
                     cap, "HEAD"],
                    capture_output=True, text=True, timeout=15,
                )
                if proc.returncode == 0:  # unknown capture commit -> None
                    stale_source = sorted(
                        p for p in (x.strip() for x in proc.stdout.splitlines())
                        if p.startswith("mapreducegcp_spark/") or p == "bench.py"
                    )
        except Exception:  # noqa: BLE001 — non-git installs still embed
            pass
        out = {
            "file": p.name,
            "round": doc.get("round"),
            "prev_rev": (doc.get("prev_rev") or "")[:12],
            "head_commit": (doc.get("head_commit") or "")[:12],
            "at_current_head": (
                None if not head_now
                else head_now == doc.get("head_commit")
            ),
            # bounded: a long-lived capture could trail dozens of
            # changed paths; the count is exact, the listing capped
            "stale_source_paths": (
                None if stale_source is None else stale_source[:5]
            ),
            "stale_source_n": (
                None if stale_source is None else len(stale_source)
            ),
            "runs": doc.get("runs"),
            "ratio": doc.get("ratio"),
            "prev_total_min": doc.get("prev", {}).get("total_min"),
            "head_total_min": doc.get("head", {}).get("total_min"),
        }
        # multi-capture rounds record the same-tree ratio spread (the
        # method's residual, ~±3%) so one ratio is never over-read
        if doc.get("residual_band") is not None:
            out["residual_band"] = doc["residual_band"]
        return out
    return None


def _cpu_snap() -> list[int] | None:
    """Aggregate jiffy counters from /proc/stat (user nice system idle
    iowait irq softirq steal ...). Diffed across the whole bench run
    they answer the question the fixed-work probes can't: was the
    INTERVAL itself disturbed — hypervisor steal (a noisy cloud
    neighbor), iowait (a contended disk) — versus the probes' clean
    before/after moments. A 14s and a 17s capture of identical code on
    this VM differed exactly this way (probes idle-flat both times)."""
    try:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:9]]
    except (OSError, ValueError):
        return None


def _cpu_profile(a: list[int] | None, b: list[int] | None) -> dict | None:
    if not a or not b:
        return None
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d) or 1
    names = ("user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal")
    return {n: round(v / tot * 100, 1) for n, v in zip(names, d)}


def main() -> None:
    headline_only = "--headline-only" in sys.argv
    # --smoke: no Spark, zero timings — exercises the REAL stdout
    # headline construction (including the interleave embed against
    # whatever artifacts are on disk) so tests can pin the driver's
    # tail-capture contract without a 15-minute bench run.
    smoke = "--smoke" in sys.argv
    known = {"--headline-only", "--all", "--smoke"}  # --all is the (default) breadth mode
    unknown = [a for a in sys.argv[1:] if a.startswith("--") and a not in known]
    if unknown:
        print(f"bench: unknown flags {unknown}", file=sys.stderr)
        sys.exit(2)

    if smoke:
        sf_dir = sf_dir_from_env()
        timings = {n: 0.0 for n in HEADLINE}
        runs = {n: [0.0, 0.0] for n in HEADLINE}
        _emit_headline(timings, runs, [0.0, 0.0], [0.0, 0.0], None, sf_dir)
        return

    sf_dir = sf_dir_from_env()
    spark = get_spark("mapreducegcp-bench")
    catalog = all_queries()

    # Warmup: run the cheapest query once to pay JVM + codegen startup.
    catalog["wordcount"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    raw = _raw_overrides()

    # Headliners get best-of-2: the first run can pay lazy codegen/
    # broadcast warmup that belongs to the JVM, not the plan — min is
    # the stable engine-side number (run-to-run noise at sf0.1 measured
    # up to 6x on short queries with a single pass). `value` sums ONLY
    # these 18 — the cross-round trend anchor.
    cal_before = _calibrate()
    cal_mt_before = _calibrate_mt()
    cpu0 = _cpu_snap()
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = raw.get(name) or (catalog[name].fn if name in catalog else None)
        if fn is None:  # a renamed headliner must not abort the whole bench
            print(f"bench: headline query {name!r} not registered", file=sys.stderr)
            continue
        runs[name] = [round(_run(fn, spark, sf_dir), 3) for _ in range(2)]
        timings[name] = min(runs[name])

    # Breadth: every other registered query, one pass each, so a
    # regression in a non-headline operator is visible round over round.
    # Breadth timings go to a SIDE ARTIFACT (BENCH_BREADTH.json) plus
    # stderr — NOT stdout. Round 2 lost its headline number because the
    # single stdout JSON line grew past the driver's tail capture; the
    # final stdout line must stay the compact headline object so
    # whatever tail window the driver keeps always parses.
    if not headline_only:
        breadth: dict[str, float] = {}
        reruns: dict[str, list[float]] = {}
        gates: list[dict] = []
        for name in sorted(catalog):
            # Headliners timed from the catalog are covered; a headliner
            # timed via a RAW override still gets its REGISTERED plan
            # (e.g. the ANN recall gate the driver actually runs) timed
            # here under a `_gate` key, so a regression in the wrapper
            # stays bench-visible.
            if name in timings and name not in raw:
                continue
            try:
                sec = round(_run(catalog[name].fn, spark, sf_dir), 3)
                # Suspect-rerun: a single breadth pass late in a
                # 260-query session picks up JVM/GC noise that a
                # standalone run doesn't (round-6: text_ngram_novelty
                # read 5.0 s in two bench passes but 1.3 s standalone).
                # Queries over the threshold get ONE re-run and the
                # min, with both passes recorded — the headline's
                # interference-proofing, bounded to the slow tail.
                if sec > 2.5:
                    again = round(_run(catalog[name].fn, spark, sf_dir), 3)
                    reruns[name] = [sec, again]
                    sec = min(sec, again)
            except Exception as e:  # noqa: BLE001 — a broken query must not hide the rest
                sec = -1.0
                print(f"bench error {name}: {e}", file=sys.stderr)
            if name not in timings:
                breadth[name] = sec
            else:
                # the registered wrapper of a RAW-overridden headliner:
                # keep the key a real catalog name so artifact consumers
                # can join on it; the variant field marks it as the
                # gate-wrapper timing, not the raw headline plan
                gates.append({"name": name, "variant": "gate", "sec": sec})
        breadth_doc = {
            "metric": "breadth_sec",
            "queries": breadth,
            "reruns": reruns,
            "gate_wrappers": gates,
            "calibration_sec": [cal_before, _calibrate()],
            "calibration_mt_sec": [cal_mt_before, _calibrate_mt()],
            "cpu_profile": _cpu_profile(cpu0, _cpu_snap()),
            "sf": _sf_of(sf_dir),
        }
        print(json.dumps(breadth_doc), file=sys.stderr)
        try:
            Path(__file__).resolve().parent.joinpath("BENCH_BREADTH.json").write_text(
                json.dumps(breadth_doc, indent=1) + "\n"
            )
        except OSError as e:
            print(f"bench: could not write BENCH_BREADTH.json: {e}", file=sys.stderr)

    _emit_headline(
        timings,
        runs,
        [cal_before, _calibrate()],
        [cal_mt_before, _calibrate_mt()],
        _cpu_profile(cpu0, _cpu_snap()),
        sf_dir,
    )


# The driver records the LAST ~2000 chars of stdout and parses the
# final JSON line out of that tail; a headline line longer than the
# window leaves the external BENCH_r{N}.json with ``parsed: null``
# (happened round 2 and again round 11). Budget enforced here AND
# pinned by tests/test_bench_trend.py against the real artifacts.
STDOUT_LINE_BUDGET = 1900


def _emit_headline(
    timings: dict[str, float],
    runs: dict[str, list[float]],
    cal: list[float],
    cal_mt: list[float],
    cpu_profile: dict | None,
    sf_dir: str,
) -> None:
    doc = {
        "metric": "headline_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        # both raw passes per headliner: the headline `value` sums the
        # mins, but the spread is what distinguishes external-load
        # interference (pass A >> pass B) from a real plan regression
        # (both passes slow) — the round-5 2.27x false alarm in one field
        "runs": runs,
        # fixed-work load probe before the headliners and at print
        # time: a loaded box inflates these, making the capture
        # self-adjudicating (see _calibrate)
        "calibration_sec": cal,
        "calibration_mt_sec": cal_mt,
        # whole-interval CPU accounting: steal/iowait expose
        # disturbances the before/after probes cannot
        "cpu_profile": cpu_profile,
        # the canonical round-over-round number: same-session
        # interleaved prev-round-vs-HEAD min-of-N, compact fields only
        # (see _interleaved_field); single-session `value` above is
        # the secondary capture
        "interleaved": _interleaved_field(),
        "sf": _sf_of(sf_dir),
    }
    line = json.dumps(doc)
    # Backstop, not the contract: the embed is compact by construction,
    # but if a future field pushes past the budget, degrade to a
    # still-parseable line instead of a truncated one. Drop order:
    # interleave detail (ratio/file survive), then cpu_profile, then
    # runs — `queries` and `value` are never dropped.
    if len(line) > STDOUT_LINE_BUDGET and doc.get("interleaved"):
        doc["interleaved"] = {
            k: doc["interleaved"].get(k)
            for k in ("file", "ratio", "runs", "prev_total_min",
                      "head_total_min", "at_current_head")
        }
        line = json.dumps(doc)
    for drop in ("cpu_profile", "runs"):
        if len(line) <= STDOUT_LINE_BUDGET:
            break
        doc.pop(drop, None)
        line = json.dumps(doc)
    if len(line) > STDOUT_LINE_BUDGET:
        print(f"bench: headline line {len(line)} chars exceeds "
              f"{STDOUT_LINE_BUDGET} even after degrade", file=sys.stderr)
    print(line)


if __name__ == "__main__":
    main()
