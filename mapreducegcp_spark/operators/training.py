"""Training-batch assembly operators — the last mile between a cleaned
corpus and an LLM training run: sequence packing, mixture sampling,
shard assignment with verifiable fingerprints, frequency-based rarity
scoring, PII scrubbing, and embedding centroid statistics.

The reference engine has none of this surface (its applications stop at
wordcount / inverted index, Worker/Worker.py:9-41); these operators are
part of the LLM-pipeline extension (SURVEY.md §7 phase 3). Everything
is built from deterministic primitives — md5 universe hashing
(`sampling.md5_bucket`), exact integer/decimal aggregation, and
fixed-order folds — so every query here value-hash-matches a DuckDB
oracle bit-exactly, the same cross-engine contract the dedup family
established.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreducegcp_spark.functions.exact import o_pct, o_sorted_list
from mapreducegcp_spark.functions.text import TOKEN_ORACLE_EXPR, tokens
from mapreducegcp_spark.operators.sampling import _o_bucket, md5_bucket
from mapreducegcp_spark.registry import register
from mapreducegcp_spark.sources.catalog import load_table

_TOKS = f"list_filter({TOKEN_ORACLE_EXPR.format(col='text')}, t -> t <> '')"


# ------------------------------------------------------ sequence packing

SEQ_BUDGET = 512  # tokens per packed training sequence
PACK_SHARDS = 8  # independent packing streams (parallelism unit)

_PACK_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, source, len({_TOKS}) AS n_tokens,
         {_o_bucket("CAST(doc_id AS VARCHAR)", PACK_SHARDS)} AS shard
  FROM documents
),
c AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM tk
)
SELECT source, shard,
       CAST(floor((cum - n_tokens) / {SEQ_BUDGET}.0) AS BIGINT) AS seq_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
FROM c
GROUP BY source, shard, seq_id
"""


@register("pack_sequences", oracle=_PACK_ORACLE, tags=("llm-pipeline",))
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: within each (source, shard)
    stream, documents concatenate in doc_id order and split into
    {SEQ_BUDGET}-token training sequences; a document belongs to the
    sequence its first token lands in. Output: per-sequence doc count
    and token mass — the packing manifest a dataloader consumes.

    Scale: packing is inherently sequential, so the parallelism unit is
    the (source, shard) stream — the md5 shard splits each source into
    PACK_SHARDS independent streams (raise the constant to match the
    cluster; each stream is one window partition, one task). One
    shuffle on (source, shard); the running sum is exact bigint."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        F.size(tokens("text")).alias("n_tokens"),
        md5_bucket(F.col("doc_id").cast("string"), PACK_SHARDS).alias("shard"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    seq = F.floor((cum - F.col("n_tokens")) / float(SEQ_BUDGET)).cast("long")
    return (
        base.withColumn("seq_id", seq)
        .groupBy("source", "shard", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
        )
    )


# ------------------------------------------------------ mixture sampling

# Per-source keep rates (percent) — the data-mixture recipe. Sources
# absent from the map fall back to the long-tail rate.
_MIX_RATES = {"src0": 100, "src1": 80, "src2": 60, "src3": 40, "src4": 20}
_MIX_DEFAULT = 10

_MIX_CASE = " ".join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_RATES.items())

_MIX_ORACLE = f"""
SELECT source,
       CAST(CASE source {_MIX_CASE} ELSE {_MIX_DEFAULT} END AS BIGINT) AS rate_pct,
       count(*) AS n_docs_kept,
       CAST(sum(n_chars) AS BIGINT) AS chars_kept
FROM documents
WHERE {_o_bucket("(CAST(doc_id AS VARCHAR) || ':mix')", 100)} <
      CASE source {_MIX_CASE} ELSE {_MIX_DEFAULT} END
GROUP BY source
"""


@register("sample_mixture_weights", oracle=_MIX_ORACLE, tags=("llm-pipeline",))
def q_sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-weighted mixture sampling: each source keeps a configured
    percentage of its documents (upweight curated sources, downsample
    the crawl tail) — the recipe step that turns a corpus into a
    training mixture. Membership is universe-hashed on doc_id with a
    ':mix' salt, so this sample is stable across runs AND independent
    of the train/val/test split's hash.

    Scale: map-only predicate in the scan stage plus one
    low-cardinality rollup; no data-sized state anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(_MIX_DEFAULT)
    for k, v in _MIX_RATES.items():
        rate = F.when(F.col("source") == k, v).otherwise(rate)
    kept = docs.filter(
        md5_bucket(F.concat(F.col("doc_id").cast("string"), F.lit(":mix")), 100) < rate
    )
    return kept.groupBy("source").agg(
        F.max(rate).cast("long").alias("rate_pct"),
        F.count("*").alias("n_docs_kept"),
        F.sum("n_chars").alias("chars_kept"),
    )


# ------------------------------------------------- shard fingerprinting

N_SHARDS = 32

# Order-independent 60-bit content signature: xor of a per-doc md5-derived
# integer. Constant aggregation state — the fingerprint that still works
# when a shard holds a billion documents (unlike md5-of-concatenation,
# which would need the full sorted id list in memory).
_DOC_SIG = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)"

_SHARD_ORACLE = f"""
SELECT {_o_bucket("CAST(doc_id AS VARCHAR)", N_SHARDS)} AS shard,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       bit_xor({_DOC_SIG}) AS content_sig
FROM documents
GROUP BY shard
"""


@register("shard_assign_fingerprint", oracle=_SHARD_ORACLE, tags=("llm-pipeline",))
def q_shard_assign_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment: hash every document
    into one of N_SHARDS output shards and emit per-shard row counts,
    byte mass, and an order-independent xor content signature — the
    manifest that lets a consumer verify a shard set is complete and
    untampered without re-reading the corpus. The physical write is
    ``repartition(N_SHARDS, shard).write`` using the same column.

    Scale: one hash-partition shuffle (what the write needs anyway);
    the xor signature folds map-side into 8 bytes of state per shard."""
    docs = load_table(spark, sf_dir, "documents")
    sig = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    return (
        docs.select(
            md5_bucket(F.col("doc_id").cast("string"), N_SHARDS).alias("shard"),
            "n_chars",
            sig.alias("sig"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.expr("bit_xor(sig)").alias("content_sig"),
        )
    )


# ------------------------------------------------------- rarity scoring

_RARITY_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS word FROM documents
),
vocab AS (
  SELECT word, count(*) AS corpus_freq FROM tok GROUP BY word
),
tot AS (
  SELECT CAST(sum(corpus_freq) AS BIGINT) AS n_total,
         count(*) AS n_vocab
  FROM vocab
)
SELECT t.doc_id,
       count(*) AS n_tokens,
       CAST(sum(v.corpus_freq) AS BIGINT) AS sum_freq,
       CAST(sum(v.corpus_freq) AS DOUBLE) / count(*) AS avg_freq,
       CAST(sum(CASE WHEN v.corpus_freq * tot.n_vocab * 2 < tot.n_total
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
       CAST(min(v.corpus_freq) AS BIGINT) AS min_freq
FROM tok t
JOIN vocab v USING (word)
CROSS JOIN tot
GROUP BY t.doc_id
"""


@register("text_rarity_score", oracle=_RARITY_ORACLE, tags=("llm-pipeline",))
def q_text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency rarity profile per document — the cheap,
    fully-relational stand-in for perplexity filtering: documents
    whose tokens are mostly rare in the corpus score differently from
    boilerplate. A token is "rare" when its corpus frequency is below
    half the mean vocabulary frequency (pure integer comparison, so
    the flag is exact on any engine). sum/avg/min of frequencies are
    exact bigints with one final double division.

    Scale: the vocabulary aggregates with map-side combine and is
    broadcast back (it scales with distinct tokens, not corpus size).
    The corpus-total row rides on the vocab table via an unpartitioned
    window rather than a separate aggregate, so the token stream is
    scanned and shuffled for the vocabulary exactly ONCE (a separate
    `vocab.agg(...)` plans a duplicate vocab subtree — the corpus
    would tokenize twice); the single-partition window step touches
    only vocabulary-sized data that must fit a broadcast anyway. One
    doc_id shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    # NOT checkpointed: round 12 measured the localCheckpoint of the
    # exploded token stream at 1.31x SLOWER (interleaved min-of-6) —
    # materializing per-token-instance rows costs more than re-running
    # the cheap scan+explode; the duplicated branch is pure map work
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("word"))
    vocab = tok.groupBy("word").agg(F.count("*").alias("corpus_freq"))
    everything = Window.partitionBy()
    vocab = vocab.select(
        "word",
        "corpus_freq",
        F.sum("corpus_freq").over(everything).alias("n_total"),
        F.count("*").over(everything).alias("n_vocab"),
    )
    is_rare = F.col("corpus_freq") * F.col("n_vocab") * 2 < F.col("n_total")
    return (
        tok.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("corpus_freq").alias("sum_freq"),
            (F.sum("corpus_freq").cast("double") / F.count("*")).alias("avg_freq"),
            F.sum(F.when(is_rare, 1).otherwise(0)).alias("n_rare"),
            F.min("corpus_freq").alias("min_freq"),
        )
    )


# --------------------------------------------------------- PII scrubbing

# Java regex (Spark) and RE2 (DuckDB) agree on these classes.
_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\+1-\d{3}-\d{4}"

# The corpus is synthetic lowercase prose with no real PII, so the
# query injects deterministic PII derived from doc_id (0-2 emails,
# a phone on even ids) and then proves the scrubber removes exactly
# what was injected. Both engines build the identical augmented text.
_PII_ORACLE = f"""
WITH aug AS (
  SELECT doc_id,
         text
         || repeat(' contact user' || CAST(doc_id AS VARCHAR) || '@example.com',
                   CAST(doc_id % 3 AS INTEGER))
         || CASE WHEN doc_id % 2 = 0
                 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END AS body
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(body, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(body, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(body, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_sig
FROM aug
"""


@register("text_pii_scrub", oracle=_PII_ORACLE, tags=("llm-pipeline",))
def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count and redact email addresses and phone
    numbers with compiled regexes, emitting per-document redaction
    counts plus an md5 of the scrubbed text (so the redacted output
    itself is cross-engine verified, not just the counts).

    Scale: map-only — regex evaluation inside whole-stage codegen, no
    shuffle at all; at 100 TB this runs at scan speed. The pattern
    list extends per deployment (SSNs, credit cards, IPs) as further
    regexp_replace chains in the same projection."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    body = F.concat(
        F.col("text"),
        F.expr(
            "repeat(concat(' contact user', CAST(doc_id AS STRING), '@example.com'), "
            "CAST(doc_id % 3 AS INT))"
        ),
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    aug = docs.select("doc_id", body.alias("body"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("body"), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return aug.select(
        "doc_id",
        F.regexp_count("body", F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count("body", F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_sig"),
    )


# ------------------------------------------------ embedding centroids

_Q_SCALE = 1_000_000.0  # fixed-point quantization for exact cross-row sums

_CENTROID_ORACLE = f"""
SELECT label, i AS pos,
       count(*) AS n_vecs,
       CAST(sum(q) AS BIGINT) AS sum_q,
       CAST(sum(q) AS DOUBLE) / (count(*) * {_Q_SCALE}) AS centroid
FROM (
  SELECT label, i,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {_Q_SCALE}) AS BIGINT) AS q
  FROM embeddings, unnest(range(1, len(embedding)+1)) AS t(i)
)
GROUP BY label, i
"""


@register("embedding_label_centroids", oracle=_CENTROID_ORACLE, tags=("llm-pipeline",))
def q_embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids — the class-prototype statistics
    behind embedding-space diagnostics (cluster drift, label purity,
    semantic sampling). Components are fixed-point quantized
    (floor(x * 1e6), exact in IEEE doubles on every engine) before the
    cross-row sum, because float addition is not associative and a
    distributed sum would otherwise depend on partitioning; the bigint
    sums ARE associative, so the result is bit-identical on any
    cluster layout. The final division back to a double centroid is a
    single deterministic operation.

    Scale: posexplode multiplies rows by dim (64), but the shuffle
    carries only (label, pos, partial sums) after map-side combine —
    O(labels x dim) regardless of corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    pe = emb.select("label", F.posexplode("embedding"))
    q = F.floor(F.col("col").cast("double") * F.lit(_Q_SCALE)).cast("long")
    return (
        pe.select("label", (F.col("pos") + 1).cast("long").alias("pos"), q.alias("q"))
        .groupBy("label", "pos")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("q").alias("sum_q"),
            (F.sum("q").cast("double") / (F.count("*") * F.lit(_Q_SCALE))).alias(
                "centroid"
            ),
        )
    )


# ------------------------------------------------- sliding-window chunking

CHUNK_WINDOW = 64  # tokens per chunk
CHUNK_STRIDE = 48  # overlap = WINDOW - STRIDE = 16 tokens

_CHUNK_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, {_TOKS} AS toks, len({_TOKS}) AS n FROM documents
),
starts AS (
  SELECT doc_id, toks, n, unnest(generate_series(0, n - 1, {CHUNK_STRIDE})) AS s
  FROM tk WHERE n > 0
)
SELECT doc_id,
       CAST(s / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(least(n - s, {CHUNK_WINDOW}) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(list_slice(toks, s + 1, least(s + {CHUNK_WINDOW}, n)), ' ')) AS chunk_md5
FROM starts
"""


@register("chunk_text_sliding", oracle=_CHUNK_ORACLE, tags=("llm-pipeline",))
def q_chunk_text_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking — RAG / context-window prep.

    Each document becomes ceil(n / stride) chunks of up to
    64 tokens starting every 48 (16-token
    overlap so no boundary context is lost). Emitted as a manifest
    (doc_id, chunk_id, token count, md5 of the space-joined chunk) so
    the oracle hash-checks the exact chunk CONTENT, not just counts.

    Scale: pure narrow ops — tokenize, sequence, explode, slice — no
    shuffle at all until a downstream consumer groups; chunk explosion
    is bounded by n/stride per doc, and the text column is projected
    away before any wide stage. Zero-token documents produce zero
    chunks (the WHERE n > 0 guard matches Spark's empty sequence).
    """
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select("doc_id", tokens("text").alias("toks")).withColumn(
        "n", F.size("toks")
    )
    starts = tk.where(F.col("n") > 0).select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(CHUNK_STRIDE))
        ).alias("s"),
    )
    chunk = F.slice("toks", F.col("s") + 1, F.lit(CHUNK_WINDOW))
    return starts.select(
        "doc_id",
        (F.col("s") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
        F.least(F.col("n") - F.col("s"), F.lit(CHUNK_WINDOW))
        .cast("long")
        .alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


# ------------------------------------- curriculum phases by length

_CURRICULUM_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, lang, len({_TOKS}) AS n_tokens FROM documents
),
cuts AS (
  SELECT lang,
         {o_pct('l', 0.25)} AS q1,
         {o_pct('l', 0.50)} AS q2,
         {o_pct('l', 0.75)} AS q3
  FROM (SELECT lang, {o_sorted_list('n_tokens')} AS l FROM tk GROUP BY lang)
)
SELECT t.doc_id, t.lang, CAST(t.n_tokens AS BIGINT) AS n_tokens,
       CASE WHEN t.n_tokens <= c.q1 THEN 1
            WHEN t.n_tokens <= c.q2 THEN 2
            WHEN t.n_tokens <= c.q3 THEN 3
            ELSE 4 END AS phase
FROM tk t JOIN cuts c ON t.lang = c.lang
"""


@register("curriculum_length_phases", oracle=_CURRICULUM_ORACLE, tags=("llm-pipeline",))
def q_curriculum_length_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-based curriculum assignment: each document gets a phase
    1-4 from its token count's quartile WITHIN its language — the
    short-to-long schedule curriculum training consumes, balanced per
    language so high-resource languages don't define the global cuts.

    Scale shape (the feature_quantile_bins pattern, per group): phase
    boundaries come from one distributed grouped ``percentile``
    aggregate (partial per partition, merged — NO per-language window
    sort, which would funnel each language through one task), the
    n_langs-row cutpoint table broadcasts back, and assignment is a
    map-side CASE. Equal-length ties land in the same phase by
    construction — the property a curriculum wants, and what makes the
    output independent of any sort order. Cutpoints interpolate
    between integers at quarter fractions (exact in doubles), so both
    engines' interpolation formulas agree bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    # NOT checkpointed: measured 1.19x slower with a localCheckpoint on
    # tk (round-12 interleaved min-of-6) — the doc-cardinality
    # materialization costs more than re-running the map-only count
    tk = docs.select("doc_id", "lang", F.size(tokens("text")).alias("n_tokens"))
    cuts = tk.groupBy("lang").agg(
        F.expr("percentile(n_tokens, array(0.25D, 0.50D, 0.75D))").alias("qs")
    ).select(
        "lang",
        F.col("qs")[0].alias("q1"),
        F.col("qs")[1].alias("q2"),
        F.col("qs")[2].alias("q3"),
    )
    return tk.join(F.broadcast(cuts), "lang").select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.when(F.col("n_tokens") <= F.col("q1"), 1)
        .when(F.col("n_tokens") <= F.col("q2"), 2)
        .when(F.col("n_tokens") <= F.col("q3"), 3)
        .otherwise(4)
        .alias("phase"),
    )


# --------------------------------- temperature-scaled mixture weights

_TEMP_ORACLE = f"""
WITH src AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
denom AS (
  SELECT list_reduce(
           list_transform(
             list_sort(list(struct_pack(source := source, n_tokens := n_tokens))),
             r -> sqrt(CAST(r.n_tokens AS DOUBLE))
           ),
           (a, b) -> a + b
         ) AS d
  FROM src
)
SELECT s.source, s.n_docs, s.n_tokens,
       CAST(s.n_tokens AS DOUBLE)
         / (SELECT CAST(sum(n_tokens) AS DOUBLE) FROM src) AS raw_share,
       sqrt(CAST(s.n_tokens AS DOUBLE)) / (SELECT d FROM denom) AS temp_weight
FROM src s
"""


@register("sample_temperature", oracle=_TEMP_ORACLE, tags=("llm-pipeline",))
def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights (alpha = 0.5): each source's
    training probability is proportional to sqrt(its token mass),
    normalized — the standard multilingual/multi-source rebalancing
    (raw token share flattens toward uniform as alpha -> 0) computed
    FROM the corpus instead of hand-configured like
    sample_mixture_weights' fixed recipe. alpha = 0.5 is exactly sqrt,
    which is IEEE-correctly-rounded in both engines — the reason this
    alpha is hash-stable where an arbitrary pow() exponent would not
    be.

    Determinism: token masses are exact bigint sums; the normalizer
    folds sqrt terms in SOURCE ORDER over a sorted collected array (a
    strict left fold, same order in both engines — a plain SUM would
    accumulate in partition order and drift in the last ulp). The
    collected array is one row per SOURCE — bounded model-size state,
    not data — so the fold is driver-scale-free at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    # src (source-cardinality, tiny) feeds the normalizer fold AND the
    # final projection — checkpoint so the corpus token-count pass runs
    # once, not once per consumer
    src = docs.select("source", F.size(tokens("text")).alias("nt")).groupBy(
        "source"
    ).agg(F.count("*").alias("n_docs"), F.sum("nt").alias("n_tokens")).localCheckpoint(
        eager=False
    )
    totals = src.agg(
        F.sum("n_tokens").alias("tok_total"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "n_tokens"))),
            F.lit(0.0),
            lambda acc, r: acc + F.sqrt(r["n_tokens"].cast("double")),
        ).alias("d"),
    )
    return src.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("tok_total").cast("double")).alias(
            "raw_share"
        ),
        (F.sqrt(F.col("n_tokens").cast("double")) / F.col("d")).alias("temp_weight"),
    )


# ---------------------------------------- hashing-trick term frequencies

FEATURE_DIM = 64  # hashed feature space (modulo buckets)

_HASHTF_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
)
SELECT doc_id,
       {_o_bucket('tok', FEATURE_DIM)} AS feature,
       CAST(count(*) AS BIGINT) AS tf
FROM tok
GROUP BY doc_id, {_o_bucket('tok', FEATURE_DIM)}
"""


@register("feature_hashing_tf", oracle=_HASHTF_ORACLE, tags=("llm-pipeline",))
def q_feature_hashing_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick term-frequency features (HashingTF): each token
    maps to one of {FEATURE_DIM} buckets by a stable hash and the
    document's feature value is the bucket's token count — fixed-width
    vectorization with NO vocabulary pass, the property that makes it
    the streaming/embarrassingly-parallel featurizer (sklearn
    HashingVectorizer / Spark MLlib HashingTF). Emitted in sparse
    (doc, feature, tf) triples — the layout a trainer consumes and the
    one that stays shuffle-light when dim >> nonzeros.

    The hash is the md5 universe bucket (sampling.md5_bucket), not
    murmur: bit-identical in DuckDB, so unlike MLlib's this featurizer
    is value-oracle-checked. Scale: explode -> one
    map-side-combinable rollup on (doc, feature); no global state of
    any kind."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    return tok.groupBy(
        "doc_id", md5_bucket(F.col("tok"), FEATURE_DIM).alias("feature")
    ).agg(F.count("*").alias("tf"))


# ------------------------------------------- span-corruption planning

SPAN_LEN = 3     # mean/fixed corruption span length (tokens)
MASK_PCT = 15    # share of spans masked


_SPAN_ORACLE = f"""
WITH tk AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
pos AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks) + 1),
                i -> CAST((i - 1) // {SPAN_LEN} AS BIGINT))) AS span
  FROM tk WHERE len(toks) > 0
),
spans AS (
  SELECT doc_id, span, count(*) AS span_len,
         ({_o_bucket("CAST(doc_id AS VARCHAR) || ':' || CAST(span AS VARCHAR)", 100)}
            < {MASK_PCT}) AS masked
  FROM pos GROUP BY doc_id, span
)
SELECT doc_id,
       CAST(sum(span_len) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN masked THEN span_len ELSE 0 END) AS BIGINT) AS n_masked,
       CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_spans_masked,
       CAST(sum(span_len)
            - sum(CASE WHEN masked THEN span_len ELSE 0 END)
            + sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS input_len,
       CAST(sum(CASE WHEN masked THEN span_len ELSE 0 END)
            + sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS target_len
FROM spans GROUP BY doc_id
"""


@register("mask_span_corruption", oracle=_SPAN_ORACLE, tags=("llm-pipeline",))
def q_mask_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption planning: partition every document's
    token stream into fixed-length spans, deterministically mask
    ~{MASK_PCT}% of them (md5 universe hash of doc:span — the same
    portable RNG-free family the split policy uses, so the mask is
    reproducible across engines, runs, and repartitioning), and emit
    the per-document budget the dataloader needs: total tokens, masked
    tokens, masked span count, and the resulting encoder input /
    decoder target lengths (each masked span collapses to one sentinel
    on the input side and expands to sentinel + span on the target).

    Scale: one scan -> posexplode -> two map-side-combinable rollups
    keyed by (doc, span) then doc — the same single-exchange shape as
    wordcount (span ids derive from token position, so no second
    shuffle). No RNG state anywhere: masking a 100 TB corpus is a pure
    map, and re-running any shard reproduces the identical mask."""
    docs = load_table(spark, sf_dir, "documents")
    pos = (
        docs.select("doc_id", F.posexplode(tokens("text")).alias("p", "w"))
        .select("doc_id", F.floor(F.col("p") / SPAN_LEN).alias("span"))
    )
    spans = pos.groupBy("doc_id", "span").agg(F.count("*").alias("span_len")).select(
        "doc_id",
        "span_len",
        (
            md5_bucket(
                F.concat_ws(":", F.col("doc_id").cast("string"), F.col("span").cast("string")),
                100,
            )
            < MASK_PCT
        ).alias("masked"),
    )
    masked_len = F.sum(F.when(F.col("masked"), F.col("span_len")).otherwise(0))
    masked_cnt = F.sum(F.when(F.col("masked"), 1).otherwise(0))
    total = F.sum("span_len")
    return spans.groupBy("doc_id").agg(
        total.alias("n_tokens"),
        masked_len.alias("n_masked"),
        masked_cnt.alias("n_spans_masked"),
        (total - masked_len + masked_cnt).alias("input_len"),
        (masked_len + masked_cnt).alias("target_len"),
    )


q_mask_span_corruption.__doc__ = q_mask_span_corruption.__doc__.format(
    MASK_PCT=MASK_PCT
)


# ------------------------------------------------- dataset card stats

_CARD_ORACLE = f"""
WITH d AS (
  SELECT source, lang, md5(text) AS h, len({_TOKS}) AS n_toks
  FROM documents
),
per_source AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT h) AS BIGINT) AS n_unique_texts,
         CAST(sum(n_toks) AS BIGINT) AS total_tokens
  FROM d GROUP BY source
),
langs AS (
  SELECT source, lang, count(*) AS cnt FROM d GROUP BY source, lang
),
lang_roll AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_langs,
         substr(max(lpad(CAST(cnt AS VARCHAR), 10, '0') || ':' || lang), 12)
           AS majority_lang
  FROM langs GROUP BY source
)
SELECT p.source, p.n_docs, p.total_tokens,
       CAST(p.total_tokens AS DOUBLE) / p.n_docs AS avg_doc_tokens,
       CAST(p.n_docs - p.n_unique_texts AS BIGINT) AS n_exact_dups,
       CAST(p.n_docs - p.n_unique_texts AS DOUBLE) / p.n_docs AS dup_fraction,
       l.n_langs, l.majority_lang
FROM per_source p JOIN lang_roll l USING (source)
"""


@register("dataset_card_stats", oracle=_CARD_ORACLE, tags=("llm-pipeline",))
def q_dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset datasheet — the summary table a dataset card
    publishes for every corpus slice: document and token volume, mean
    document length, exact-duplicate fraction (docs minus distinct
    text hashes), language count and majority language (argmax with a
    deterministic count-then-lang tiebreak, encoded as a zero-padded
    sortable string so both engines pick the identical winner without
    a window).

    Scale: one scan computes (source, lang, text-hash, token count)
    map-side; then two source-keyed rollups (sources = dozens, so the
    exchanges are trivial) and a broadcast-sized join. The distinct-
    hash count is the only memory-bearing aggregate and is bounded per
    source by doc count; at 100 TB swap count(DISTINCT h) for an HLL
    sketch (agg_hll_partitioned_union pattern) if exactness is not
    required."""
    docs = load_table(spark, sf_dir, "documents")
    # NOT checkpointed: measured 1.21x slower with a localCheckpoint on
    # d (round-12 interleaved min-of-6) — the two rollup branches'
    # duplicated md5+count is cheaper than materializing the rows
    d = docs.select(
        "source",
        "lang",
        F.md5("text").alias("h"),
        F.size(tokens("text")).alias("n_toks"),
    )
    per_source = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("h").alias("n_unique_texts"),
        F.sum("n_toks").alias("total_tokens"),
    )
    langs = d.groupBy("source", "lang").agg(F.count("*").alias("cnt"))
    lang_roll = langs.groupBy("source").agg(
        F.count("*").alias("n_langs"),
        F.substring(
            F.max(
                F.concat_ws(
                    ":", F.lpad(F.col("cnt").cast("string"), 10, "0"), F.col("lang")
                )
            ),
            12,
            1_000,
        ).alias("majority_lang"),
    )
    return per_source.join(lang_roll, "source").select(
        "source",
        "n_docs",
        "total_tokens",
        (F.col("total_tokens").cast("double") / F.col("n_docs")).alias("avg_doc_tokens"),
        (F.col("n_docs") - F.col("n_unique_texts")).alias("n_exact_dups"),
        (
            (F.col("n_docs") - F.col("n_unique_texts")).cast("double") / F.col("n_docs")
        ).alias("dup_fraction"),
        "n_langs",
        "majority_lang",
    )


# --------------------------------- tokenizer-dataset capstone

def _tokenizer_dataset_oracle() -> str:
    """Trainer chain -> encoded vocab -> per-doc symbol counts ->
    budget packing, as one DuckDB statement mirroring the Spark DAG."""
    from mapreducegcp_spark.operators.textstats import _bpe_encoded_chain_oracle

    return f"""{_bpe_encoded_chain_oracle()},
enc AS (
  SELECT d.doc_id, CAST(sum(e.n_syms) AS BIGINT) AS n_bpe_symbols
  FROM doc_words d JOIN encoded e ON d.word = e.word
  GROUP BY d.doc_id
),
base AS (
  SELECT e.doc_id, d.source, e.n_bpe_symbols,
         {_o_bucket("CAST(e.doc_id AS VARCHAR)", PACK_SHARDS)} AS shard
  FROM enc e JOIN documents d USING (doc_id)
),
c AS (
  SELECT *, sum(n_bpe_symbols) OVER (PARTITION BY source, shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM base
)
SELECT source, shard,
       CAST(floor((cum - n_bpe_symbols) / {SEQ_BUDGET}.0) AS BIGINT) AS seq_id,
       count(*) AS n_docs,
       CAST(sum(n_bpe_symbols) AS BIGINT) AS seq_symbols
FROM c
GROUP BY source, shard, seq_id
"""


@register(
    "pipeline_tokenizer_dataset",
    oracle=_tokenizer_dataset_oracle(),
    tags=("llm-pipeline",),
)
def q_pipeline_tokenizer_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training capstone: learn the BPE merges from the
    corpus, encode every document with them, and pack documents into
    fixed-budget training sequences BY LEARNED-TOKEN COUNT — the
    end-to-end path from raw text to the dataloader manifest a real
    run consumes (pack_sequences budgets by raw whitespace tokens;
    this budgets by what the model will actually see).

    One composed DAG: the trainer's vocab-sized rounds (bounded 1-row
    driver syncs), the encode join, a doc_id equi-join to recover the
    source column, and the per-(source, shard) packing window. The
    only corpus-sized stages are the tokenize scan, the encode rollup,
    and the packing shuffle — everything else is vocabulary- or
    manifest-sized. The DuckDB oracle replays the entire chain
    (recursive-CTE trainer included), so train -> encode -> pack is
    value-hash-checked end to end."""
    from mapreducegcp_spark.operators.textstats import q_bpe_encode_corpus

    enc = q_bpe_encode_corpus(spark, sf_dir).select("doc_id", "n_bpe_symbols")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    base = enc.join(docs, "doc_id").select(
        "doc_id",
        "source",
        "n_bpe_symbols",
        md5_bucket(F.col("doc_id").cast("string"), PACK_SHARDS).alias("shard"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_bpe_symbols").over(w)
    seq = F.floor((cum - F.col("n_bpe_symbols")) / float(SEQ_BUDGET)).cast("long")
    return (
        base.withColumn("seq_id", seq)
        .groupBy("source", "shard", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bpe_symbols").alias("seq_symbols"),
        )
    )


# --------------------------------- Neyman (optimal) stratified allocation

SAMPLE_BUDGET = 1000  # total sample size to allocate across strata

# The per-stratum std-dev term, as ONE IEEE double expression over the
# exact integer moments (n, s = sum, ss = sum of squares) — written
# once and instantiated identically in both engines so the fold and
# the per-row weight agree bit-for-bit. Sample variance
# (ss - s^2/n) / (n - 1), clamped at 0 against last-ulp negatives.
def _sd_expr_sql(n: str, s: str, ss: str) -> str:
    nd, sd_, ssd = f"CAST({n} AS DOUBLE)", f"CAST({s} AS DOUBLE)", f"CAST({ss} AS DOUBLE)"
    return (
        f"CASE WHEN {n} > 1 THEN "
        f"sqrt(greatest(({ssd} - {sd_} * {sd_} / {nd}) / ({nd} - 1), 0.0)) "
        f"ELSE 0.0 END"
    )


_NEYMAN_ORACLE = f"""
WITH src AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(n_chars) AS BIGINT) AS s,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS ss
  FROM documents GROUP BY source
),
denom AS (
  SELECT list_reduce(
           list_transform(
             list_sort(list(struct_pack(source := source, n := n, s := s, ss := ss))),
             r -> CAST(r.n AS DOUBLE) * ({_sd_expr_sql('r.n', 'r.s', 'r.ss')})
           ),
           (a, b) -> a + b
         ) AS d
  FROM src
)
SELECT source, n AS n_docs,
       {_sd_expr_sql('n', 's', 'ss')} AS sd_chars,
       CASE WHEN (SELECT d FROM denom) > 0
            THEN CAST(floor({SAMPLE_BUDGET} * CAST(n AS DOUBLE)
                 * ({_sd_expr_sql('n', 's', 'ss')}) / (SELECT d FROM denom)) AS BIGINT)
            ELSE NULL END AS neyman_alloc,
       CAST(floor({SAMPLE_BUDGET} * CAST(n AS DOUBLE)
            / (SELECT CAST(sum(n) AS DOUBLE) FROM src)) AS BIGINT) AS proportional_alloc
FROM src
"""


@register("sample_neyman_allocation", oracle=_NEYMAN_ORACLE, tags=("llm-pipeline",))
def q_sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation: split a fixed
    sample budget across strata proportional to N_h * sigma_h — the
    variance-minimizing design for estimating a corpus mean (here
    document length by source), beside the naive proportional
    allocation for comparison. This is how a 100 TB corpus gets a
    defensible quality-audit sample: more budget to large AND
    heterogeneous sources, less to uniform ones.

    Determinism: per-stratum moments (count, sum, sum of squares) are
    exact bigint aggregates; sigma is ONE shared IEEE expression over
    those integers (sqrt is correctly rounded — hash-stable); the
    denominator folds N_h*sigma_h in SOURCE ORDER over a sorted
    collected array (strict left fold, both engines — a plain SUM
    would drift in the last ulp with partition order). The collected
    array is one row per SOURCE — bounded, not data-sized."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("ss"),
    )

    def sd_of(n, s, ss):
        nd, sd_, ssd = n.cast("double"), s.cast("double"), ss.cast("double")
        return F.when(
            n > 1, F.sqrt(F.greatest((ssd - sd_ * sd_ / nd) / (nd - 1), F.lit(0.0)))
        ).otherwise(F.lit(0.0))

    totals = src.agg(
        F.sum("n").alias("n_total"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "n", "s", "ss"))),
            F.lit(0.0),
            lambda acc, r: acc + r["n"].cast("double") * sd_of(r["n"], r["s"], r["ss"]),
        ).alias("d"),
    )
    sd = sd_of(F.col("n"), F.col("s"), F.col("ss"))
    return src.crossJoin(F.broadcast(totals)).select(
        "source",
        F.col("n").alias("n_docs"),
        sd.alias("sd_chars"),
        F.when(
            F.col("d") > 0,
            F.floor(SAMPLE_BUDGET * F.col("n").cast("double") * sd / F.col("d")),
        ).alias("neyman_alloc"),
        F.floor(
            SAMPLE_BUDGET * F.col("n").cast("double") / F.col("n_total").cast("double")
        ).alias("proportional_alloc"),
    )


# ---------------- trained quality classifier (closed-form linear fit)

_CLF_POS_LANG = "en"   # weak-label positive class (the curated-domain stand-in)
_CLF_MIN_CHARS = 200   # funnel stage 0: heuristic length gate

# Closed-form diagonal-LDA weight per hashed feature, quantized to
# nano units: w_f = (mu1 - mu0) / (pooled_var + 1). Every operand is
# an exact int64 sufficient statistic (s/q/n) and the double ops are
# written ONCE here, parsed identically by Spark SQL and DuckDB, so
# the rounded weights are bit-identical across engines. Single-class
# corpora (n1 or n0 = 0) get all-zero weights rather than NaN/NULL
# divergence.
_WQ_EXPR = (
    "CASE WHEN n1 = 0 OR n0 = 0 THEN CAST(0 AS BIGINT) ELSE CAST(round(1e9 * ("
    "((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) - (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)))"
    " / ((((CAST(q1 AS DOUBLE) - (CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))))"
    " + (CAST(q0 AS DOUBLE) - (CAST(s0 AS DOUBLE) * (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)))))"
    " / CAST(n1 + n0 AS DOUBLE)) + 1.0))) AS BIGINT) END"
)


def _clf_chain_sql() -> str:
    """Shared DuckDB WITH-body replaying the whole train+infer chain:
    weak labels -> hashed TF -> per-feature class stats -> closed-form
    nano-quantized weights -> exact-integer scores and the midpoint
    decision rule (cross-multiplied so no division ever happens).
    The midpoint cross-products go through HUGEINT here (DuckDB's
    exact int128) mirroring Spark's DECIMAL(38,0) — same values, same
    comparisons, just each engine's exact wide-integer type."""
    return f"""lab AS (
  SELECT doc_id, n_chars,
         CAST(CASE WHEN lang = '{_CLF_POS_LANG}' THEN 1 ELSE 0 END AS BIGINT) AS label
  FROM documents
),
tf AS (
  SELECT doc_id, label, {_o_bucket('tok', FEATURE_DIM)} AS feature,
         CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id,
               CAST(CASE WHEN lang = '{_CLF_POS_LANG}' THEN 1 ELSE 0 END AS BIGINT) AS label,
               unnest({_TOKS}) AS tok
        FROM documents)
  GROUP BY 1, 2, 3
),
cls AS (
  SELECT CAST(coalesce(sum(label), 0) AS BIGINT) AS n1,
         CAST(count(*) - coalesce(sum(label), 0) AS BIGINT) AS n0
  FROM lab
),
fs AS (
  SELECT feature,
         CAST(coalesce(sum(CASE WHEN label = 1 THEN tf END), 0) AS BIGINT) AS s1,
         CAST(coalesce(sum(CASE WHEN label = 0 THEN tf END), 0) AS BIGINT) AS s0,
         CAST(coalesce(sum(CASE WHEN label = 1 THEN tf * tf END), 0) AS BIGINT) AS q1,
         CAST(coalesce(sum(CASE WHEN label = 0 THEN tf * tf END), 0) AS BIGINT) AS q0
  FROM tf GROUP BY feature
),
w AS (SELECT feature, s1, s0, {_WQ_EXPR} AS wq FROM fs, cls),
thr AS (
  SELECT CAST(coalesce(sum(CAST(wq AS HUGEINT) * ((CAST(s1 AS HUGEINT) * c.n0)
                                                 + (CAST(s0 AS HUGEINT) * c.n1))), 0)
              AS HUGEINT) AS thr2
  FROM w, cls c
),
sc AS (
  SELECT t.doc_id, CAST(sum(w.wq * t.tf) AS BIGINT) AS score_nano
  FROM tf t JOIN w USING (feature) GROUP BY t.doc_id
),
scored AS (
  SELECT l.doc_id, l.n_chars, CAST(l.label AS INT) AS label,
         CAST(coalesce(sc.score_nano, 0) AS BIGINT) AS score_nano,
         CAST(CASE WHEN CAST(coalesce(sc.score_nano, 0) AS HUGEINT)
                        * ((CAST(2 AS HUGEINT) * c.n1) * c.n0) > t.thr2
                   THEN 1 ELSE 0 END AS INT) AS predicted
  FROM lab l LEFT JOIN sc ON sc.doc_id = l.doc_id, cls c, thr t
)"""


def _clf_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the classifier in-engine and score every document — the
    shared Spark-side chain of the quality_classifier_* queries.

    Model: diagonal LDA (Gaussian class-conditional with pooled
    per-feature variance — the closed-form linear classifier) over
    {FEATURE_DIM}-bucket hashed-TF features, weakly supervised by the
    curated-domain label (the fastText/LLaMA-style setup: positives =
    reference-domain docs, negatives = the rest; here the positive
    slice is lang = 'en'). Training is ONE corpus scan: explode ->
    map-side-combinable (doc, feature) rollup -> {FEATURE_DIM}-row
    class-stats rollup; the learned weight vector is a broadcast-sized
    table, never a driver loop. Inference is map-only: join the TF
    triples to the broadcast weights, one exact int64 dot product per
    doc. The midpoint decision rule is cross-multiplied into pure
    integer arithmetic (score * 2*n1*n0 vs sum(w*(s1*n0 + s0*n1))) so
    predictions are exact. The cross-products run in DECIMAL(38,0)
    (Spark) / HUGEINT (DuckDB) — both exact integer types to ~1e38 —
    because nano-quantized weights times corpus-count products exhaust
    int64 at around 50k docs; score_nano itself (one per-doc dot
    product) stays comfortably inside int64. Overflow headroom is
    pinned by test_classifier_decimal_midpoint_survives_int64_overflow,
    which drives the stats past 2^63 and checks predictions cross-engine."""
    docs = load_table(spark, sf_dir, "documents")
    label = F.when(F.col("lang") == _CLF_POS_LANG, 1).otherwise(0).cast("long")
    lab = docs.select("doc_id", "n_chars", label.alias("label"))
    tok = docs.select(
        "doc_id", label.alias("label"), F.explode(tokens("text")).alias("tok")
    )
    tf = tok.groupBy(
        "doc_id", "label", md5_bucket(F.col("tok"), FEATURE_DIM).alias("feature")
    ).agg(F.count("*").alias("tf"))
    tf = tf.localCheckpoint(eager=False)  # feeds class stats AND scoring
    cls = lab.agg(
        F.coalesce(F.sum("label"), F.lit(0)).cast("long").alias("n1"),
        (F.count("*") - F.coalesce(F.sum("label"), F.lit(0)))
        .cast("long")
        .alias("n0"),
    )
    fs = tf.groupBy("feature").agg(
        F.coalesce(F.sum(F.when(F.col("label") == 1, F.col("tf"))), F.lit(0))
        .cast("long")
        .alias("s1"),
        F.coalesce(F.sum(F.when(F.col("label") == 0, F.col("tf"))), F.lit(0))
        .cast("long")
        .alias("s0"),
        F.coalesce(
            F.sum(F.when(F.col("label") == 1, F.col("tf") * F.col("tf"))), F.lit(0)
        )
        .cast("long")
        .alias("q1"),
        F.coalesce(
            F.sum(F.when(F.col("label") == 0, F.col("tf") * F.col("tf"))), F.lit(0)
        )
        .cast("long")
        .alias("q0"),
    )
    w = (
        fs.crossJoin(F.broadcast(cls))
        .select("feature", "s1", "s0", "n1", "n0", F.expr(_WQ_EXPR).alias("wq"))
        .localCheckpoint(eager=False)  # feeds threshold AND scoring
    )
    dec = "decimal(38,0)"
    thr = w.agg(
        F.coalesce(
            F.sum(
                F.col("wq").cast(dec)
                * (
                    (F.col("s1").cast(dec) * F.col("n0"))
                    + (F.col("s0").cast(dec) * F.col("n1"))
                )
            ),
            F.lit(0).cast(dec),
        )
        .cast(dec)
        .alias("thr2")
    )
    sc = (
        tf.join(F.broadcast(w.select("feature", "wq")), "feature")
        .groupBy("doc_id")
        .agg(F.sum(F.col("wq") * F.col("tf")).cast("long").alias("score_nano"))
    )
    return (
        lab.join(sc, "doc_id", "left")
        .crossJoin(F.broadcast(cls))
        .crossJoin(F.broadcast(thr))
        .select(
            "doc_id",
            "n_chars",
            F.col("label").cast("int").alias("label"),
            F.coalesce(F.col("score_nano"), F.lit(0)).cast("long").alias("score_nano"),
            F.when(
                F.coalesce(F.col("score_nano"), F.lit(0)).cast(dec)
                * ((F.lit(2).cast(dec) * F.col("n1")) * F.col("n0"))
                > F.col("thr2"),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("predicted"),
        )
    )


_clf_scored.__doc__ = _clf_scored.__doc__.format(FEATURE_DIM=FEATURE_DIM)


@register(
    "quality_classifier_scores",
    oracle=f"WITH {_clf_chain_sql()}\n"
    "SELECT doc_id, label, score_nano, predicted FROM scored",
    tags=("llm-pipeline",),
)
def q_quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-scored quality filtering, train + inference in one plan:
    fit the closed-form linear classifier (diagonal LDA over hashed-TF
    features, weak curated-domain labels) in-engine, then score every
    document with an exact-integer dot product and the midpoint
    decision rule. This is the missing piece between heuristic gates
    (text_quality_scores) and perplexity bucketing
    (quality_perplexity_buckets): CCNet/LLaMA/RefinedWeb all filter
    with a TRAINED scorer, not heuristics alone. See _clf_scored for
    the scale shape; the DuckDB oracle replays the entire fit from the
    same sufficient statistics, so learned weights, scores, and
    predictions are all value-hash-checked."""
    return _clf_scored(spark, sf_dir).select(
        "doc_id", "label", "score_nano", "predicted"
    )


@register(
    "quality_classifier_eval",
    oracle=f"""WITH {_clf_chain_sql()}
SELECT CAST(sum(CASE WHEN label = 1 AND predicted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(sum(CASE WHEN label = 0 AND predicted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(sum(CASE WHEN label = 1 AND predicted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       CAST(sum(CASE WHEN label = 0 AND predicted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       CAST((sum(CASE WHEN label = predicted THEN 1 ELSE 0 END) * 1000) // count(*) AS BIGINT)
         AS accuracy_milli
FROM scored""",
    tags=("llm-pipeline",),
)
def q_quality_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + exact-milli accuracy of the trained quality
    classifier against its weak labels — the in-training-set fit audit
    a pipeline runs before trusting the scorer on held-out data (the
    leakage-safe split variant trains on the train split only; this
    row is the sanity floor: a linear model that cannot even separate
    its own training labels has no signal). Single aggregation over
    the scored frame, all counts exact.

    Reading it on the bundled synthetic corpus: every language draws
    from ONE shared vocabulary (zero lexical signal for the lang
    label by construction), so accuracy lands near the majority-class
    base rate — which is precisely the failure mode this row exists
    to surface before a scorer ships."""
    s = _clf_scored(spark, sf_dir)
    return s.agg(
        F.sum(((F.col("label") == 1) & (F.col("predicted") == 1)).cast("long")).alias("tp"),
        F.sum(((F.col("label") == 0) & (F.col("predicted") == 1)).cast("long")).alias("fp"),
        F.sum(((F.col("label") == 1) & (F.col("predicted") == 0)).cast("long")).alias("fn"),
        F.sum(((F.col("label") == 0) & (F.col("predicted") == 0)).cast("long")).alias("tn"),
        F.expr(
            "CAST((sum(CASE WHEN label = predicted THEN 1 ELSE 0 END) * 1000)"
            " div count(*) AS BIGINT)"
        ).alias("accuracy_milli"),
    )


@register(
    "quality_classifier_funnel",
    oracle=f"""WITH {_clf_chain_sql()}
SELECT CAST(0 AS BIGINT) AS stage_idx, 'min_chars' AS stage,
       (SELECT CAST(count(*) AS BIGINT) FROM scored) AS n_in,
       (SELECT CAST(count(*) AS BIGINT) FROM scored WHERE n_chars >= {_CLF_MIN_CHARS}) AS n_kept
UNION ALL
SELECT CAST(1 AS BIGINT), 'classifier',
       (SELECT CAST(count(*) AS BIGINT) FROM scored WHERE n_chars >= {_CLF_MIN_CHARS}),
       (SELECT CAST(count(*) AS BIGINT) FROM scored
        WHERE n_chars >= {_CLF_MIN_CHARS} AND predicted = 1)""",
    tags=("llm-pipeline",),
)
def q_quality_classifier_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filter-funnel integration row for the trained scorer: docs
    flow through the heuristic length gate, survivors through the
    classifier gate — per stage, how many entered and how many
    survived (the kept-rate table a pipeline dashboard shows per
    snapshot). One aggregation pass; the two stage rows unpack from a
    single 1-row aggregate, so adding stages never adds scans."""
    s = _clf_scored(spark, sf_dir)
    keep_len = F.col("n_chars") >= _CLF_MIN_CHARS
    agg = s.agg(
        F.count("*").alias("n_all"),
        F.sum(keep_len.cast("long")).alias("n_len"),
        F.sum((keep_len & (F.col("predicted") == 1)).cast("long")).alias("n_clf"),
    )
    return agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).cast("long").alias("stage_idx"),
                    F.lit("min_chars").alias("stage"),
                    F.col("n_all").cast("long").alias("n_in"),
                    F.col("n_len").cast("long").alias("n_kept"),
                ),
                F.struct(
                    F.lit(1).cast("long").alias("stage_idx"),
                    F.lit("classifier").alias("stage"),
                    F.col("n_len").cast("long").alias("n_in"),
                    F.col("n_clf").cast("long").alias("n_kept"),
                ),
            )
        ).alias("r")
    ).select("r.*")


# --------------------------------- DSIR importance resampling (data selection)

_DSIR_DIM = 128          # hashed unigram feature buckets
_DSIR_TARGET_LANG = "en"  # the "target domain" the selector steers toward


_DSIR_ORACLE = f"""
WITH dc AS (
  SELECT doc_id, lang,
         {_o_bucket('tok', _DSIR_DIM)} AS f,
         CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, lang, unnest({_TOKS}) AS tok FROM documents)
  GROUP BY doc_id, lang, f
),
bucket AS (
  SELECT f,
         CAST(sum(tf) AS BIGINT) AS cr,
         CAST(sum(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN tf ELSE 0 END)
              AS BIGINT) AS ct
  FROM dc GROUP BY f
),
tot AS (
  SELECT CAST(sum(cr) AS BIGINT) AS tr, CAST(sum(ct) AS BIGINT) AS tt
  FROM bucket
),
llr AS (
  SELECT f,
         CAST(round(ln(CAST(ct + 1 AS DOUBLE) / CAST(tt + {_DSIR_DIM} AS DOUBLE))
                    * {1_000_000_000}) AS BIGINT)
         - CAST(round(ln(CAST(cr + 1 AS DOUBLE) / CAST(tr + {_DSIR_DIM} AS DOUBLE))
                      * {1_000_000_000}) AS BIGINT) AS llr_nano
  FROM bucket, tot
)
SELECT dc.doc_id,
       CAST(sum(dc.tf) AS BIGINT) AS n_tokens,
       CAST(sum(dc.tf * llr.llr_nano) AS BIGINT) AS logw_nano,
       (sum(dc.tf * llr.llr_nano) > 0) AS selected
FROM dc JOIN llr USING (f)
GROUP BY dc.doc_id
"""


@register("sample_dsir_importance", oracle=_DSIR_ORACLE, tags=("llm-pipeline",))
def q_sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by the log importance ratio log p_target(x)/p_raw(x)
    under two bag-of-hashed-ngrams models — the published recipe for
    steering a web-scale corpus toward a target domain without
    training a classifier. Target model = the '{_DSIR_TARGET_LANG}'
    slice of the corpus, raw model = the whole corpus; features are
    {_DSIR_DIM} hashed unigram buckets (md5 universe — the same
    portable hash family as feature_hashing_tf, so the featurizer is
    value-oracle-checked); both models are add-one smoothed.

    Determinism: the two per-bucket log-probabilities are quantized to
    integer nano-nats SEPARATELY (each a round() whose 1-ulp libm
    disagreement is ~1e-7 of the rounding step — the text_unigram_xent
    argument), so the per-bucket log-likelihood-ratio is an exact
    bigint and each document's log-weight is an associative integer
    sum(tf * llr) — partitioning-independent and hash-stable.
    `selected` marks documents more target-like than raw (logw > 0) —
    the deterministic analogue of DSIR's Gumbel resampling step.

    Scale shape: one (doc, bucket) rollup with map-side combine (at
    most {_DSIR_DIM} rows per doc); the bucket/LLR model is
    {_DSIR_DIM} rows — model-sized, broadcast back; one doc_id rollup
    ends the plan. No state scales with the corpus except the two
    exchanges, both combiner-reduced. The reference engine's closest
    surface is wordcount (Worker/Worker.py:9-24); this is the
    importance-weighted generalization a training pipeline needs."""
    docs = load_table(spark, sf_dir, "documents")
    # dc feeds the model branch (bucket -> tot/llr) AND the final
    # per-doc rollup; bucket feeds tot and llr. localCheckpoint both
    # (round 12) or the corpus is tokenized three times — lazy is
    # race-free because the tot/llr broadcast jobs are dependencies of
    # the main stage and materialize the blocks first. groupBy outputs
    # are hash-balanced: no repartition guard needed.
    dc = (
        docs.select("doc_id", "lang", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "lang", md5_bucket(F.col("tok"), _DSIR_DIM).alias("f"))
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    bucket = dc.groupBy("f").agg(
        F.sum("tf").alias("cr"),
        F.sum(
            F.when(F.col("lang") == _DSIR_TARGET_LANG, F.col("tf")).otherwise(F.lit(0))
        ).alias("ct"),
    ).localCheckpoint(eager=False)
    tot = bucket.agg(F.sum("cr").alias("tr"), F.sum("ct").alias("tt"))

    def _lnq(cnt: F.Column, total: F.Column) -> F.Column:
        return F.round(
            F.log(
                (cnt + F.lit(1)).cast("double")
                / (total + F.lit(_DSIR_DIM)).cast("double")
            )
            * F.lit(1_000_000_000)
        ).cast("long")

    llr = bucket.crossJoin(F.broadcast(tot)).select(
        "f",
        (_lnq(F.col("ct"), F.col("tt")) - _lnq(F.col("cr"), F.col("tr"))).alias(
            "llr_nano"
        ),
    )
    return (
        dc.join(F.broadcast(llr), "f")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("llr_nano")).alias("logw_nano"),
            (F.sum(F.col("tf") * F.col("llr_nano")) > 0).alias("selected"),
        )
    )


# ------------------------------- token-budget planning (epochs per source)

_BUDGET_MULT = 4  # train-token budget as a multiple of the corpus token mass


_BUDGET_ORACLE = f"""
WITH src AS (
  SELECT source, CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
denom AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS tok_total,
         list_reduce(
           list_transform(
             list_sort(list(struct_pack(source := source, n_tokens := n_tokens))),
             r -> sqrt(CAST(r.n_tokens AS DOUBLE))
           ),
           (a, b) -> a + b) AS d
  FROM src
)
SELECT s.source,
       s.n_tokens,
       sqrt(CAST(s.n_tokens AS DOUBLE)) / denom.d AS temp_weight,
       CAST(round(CAST({_BUDGET_MULT} AS DOUBLE) * CAST(denom.tok_total AS DOUBLE)
                  * (sqrt(CAST(s.n_tokens AS DOUBLE)) / denom.d)) AS BIGINT)
         AS allocated_tokens,
       CAST(least(
           CAST(round(CAST({_BUDGET_MULT} AS DOUBLE) * CAST(denom.tok_total AS DOUBLE)
                      * (sqrt(CAST(s.n_tokens AS DOUBLE)) / denom.d)) AS BIGINT),
           s.n_tokens) AS BIGINT) AS fresh_tokens,
       CAST(greatest(
           CAST(round(CAST({_BUDGET_MULT} AS DOUBLE) * CAST(denom.tok_total AS DOUBLE)
                      * (sqrt(CAST(s.n_tokens AS DOUBLE)) / denom.d)) AS BIGINT)
           - s.n_tokens, 0) AS BIGINT) AS repeated_tokens
FROM src s, denom
"""


@register("pipeline_token_budget_plan", oracle=_BUDGET_ORACLE, tags=("llm-pipeline",))
def q_pipeline_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget planner for a data-constrained training run
    (Muennighoff et al. 2023 regime): given a train budget of
    {_BUDGET_MULT}x the corpus token mass and temperature-scaled
    (alpha = 0.5) source weights, allocate tokens per source and split
    the allocation into fresh vs repeated tokens — the table that
    tells you each source's epoch count before the run starts.

    Shares sample_temperature's determinism contract: exact bigint
    token masses, the sqrt-fold normalizer accumulated in SOURCE ORDER
    over a bounded collected array (one row per source — model-sized,
    not data-sized), and every derived quantity is either an exact
    bigint (round once, then integer min/max) or a short fixed
    sequence of IEEE ops on identical operands in both engines.

    Scale: one corpus scan for the per-source rollup; everything after
    operates on the source-count-sized table. Map-side combine does
    the heavy lifting; the plan is corpus-size-free past the first
    exchange."""
    docs = load_table(spark, sf_dir, "documents")
    src = (
        docs.select("source", F.size(tokens("text")).alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").alias("n_tokens"))
        # feeds the normalizer AND the allocation projection — one
        # corpus token-count pass, not two (sample_temperature's fix)
        .localCheckpoint(eager=False)
    )
    denom = src.agg(
        F.sum("n_tokens").alias("tok_total"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "n_tokens"))),
            F.lit(0.0),
            lambda acc, r: acc + F.sqrt(r["n_tokens"].cast("double")),
        ).alias("d"),
    )
    w = F.sqrt(F.col("n_tokens").cast("double")) / F.col("d")
    alloc = F.round(
        F.lit(float(_BUDGET_MULT)) * F.col("tok_total").cast("double") * w
    ).cast("long")
    return src.crossJoin(F.broadcast(denom)).select(
        "source",
        "n_tokens",
        w.alias("temp_weight"),
        alloc.alias("allocated_tokens"),
        F.least(alloc, F.col("n_tokens")).alias("fresh_tokens"),
        F.greatest(alloc - F.col("n_tokens"), F.lit(0).cast("long")).alias(
            "repeated_tokens"
        ),
    )
