"""mapreducegcp_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference MapReduce framework ``milanchheta/mapReduceGCP`` (an XML-RPC
Master/Worker/KeyValueStore MapReduce with WordCount and InvertedIndex
applications; see /root/reference and SURVEY.md), extended with the
relational operator surface Spark provides natively and with
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Architecture: everything is a declarative DataFrame/SQL plan compiled by
Catalyst. There is no master, no worker pool, no hand-rolled shuffle and
no key-value store — the reference's map -> shuffle -> reduce lifecycle
(Master/Master.py:61-94) collapses to ``read -> transform -> groupBy/agg
-> write`` with the Exchange planned by Spark.
"""

__version__ = "0.1.0"

from mapreducegcp_spark.registry import all_queries, get_query, oracle_sqls  # noqa: F401
