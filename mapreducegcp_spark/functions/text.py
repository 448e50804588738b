"""Text column functions.

The reference's entire scalar-function surface is a two-line tokenizer
duplicated in both mappers (Worker/Worker.py:11-12,21-22): lowercase,
replace non-alphabetic chars with space, split on whitespace. That exact
contract (SURVEY.md §2.3) is ``tokens()`` here, expressed as built-in
column functions so it stays inside whole-stage codegen — no Python UDF
in the hot path.

DuckDB oracle equivalent (kept in sync with ``TOKEN_ORACLE_EXPR``):
``string_split_regex(regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' ')``
with empty tokens dropped.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# SQL fragment for DuckDB oracles: produces the token list for a text column.
TOKEN_ORACLE_EXPR = (
    "string_split_regex(regexp_replace(lower({col}), '[^a-z]+', ' ', 'g'), ' ')"
)


def tokens(col: Column | str) -> Column:
    """Tokenize per the reference contract: lower, strip non-alpha, split.

    Returns an array<string> with empty tokens removed. Note the
    reference uses Unicode-aware ``str.isalpha()``; for the ASCII
    corpora in play ``[^a-z]`` is equivalent (SURVEY.md §2.3).
    """
    c = F.col(col) if isinstance(col, str) else col
    arr = F.split(F.regexp_replace(F.lower(c), "[^a-z]+", " "), " ")
    return F.filter(arr, lambda t: t != "")


# Unicode-aware twin: the reference tokenizer is ``str.isalpha()``
# (Worker/Worker.py:11-12), which accepts EVERY Unicode letter — the
# ASCII ``[^a-z]`` above is only equivalent on ASCII corpora
# (SURVEY.md §2.3). ``\p{L}`` reproduces the isalpha() contract for
# non-ASCII text; Java regex (Spark) and RE2 (DuckDB) agree on the
# class, and lower() is full-Unicode in both engines.
TOKEN_UNICODE_ORACLE_EXPR = (
    r"string_split_regex(regexp_replace(lower({col}), '[^\p{{L}}]+', ' ', 'g'), ' ')"
)


def tokens_unicode(col: Column | str) -> Column:
    """Tokenize with the reference's FULL ``str.isalpha()`` semantics:
    lowercase, replace any non-LETTER (Unicode class ``\\p{L}``) run
    with a space, split, drop empties. Matches ``tokens()`` exactly on
    ASCII input; diverges only where the corpus carries non-ASCII
    letters ("café" -> "café", not "caf")."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.split(F.regexp_replace(F.lower(c), r"[^\p{L}]+", " "), " ")
    return F.filter(arr, lambda t: t != "")


def words_of(col: Column | str) -> Column:
    """Exploded token stream (one row per token) for flatMap-style plans.

    Spark equivalent of the reference mapper emission loop
    (Worker/Worker.py:13-15, 23-25) — ``explode`` is the flatMap.
    """
    return F.explode(tokens(col))
