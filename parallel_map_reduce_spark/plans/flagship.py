"""The flagship query: the reference's entire program as one pipeline.

documents(doc_id, text)
  → tokenize (explode/split)          # reference src/tema1.cpp:142-166
  → normalize (lower/strip non-alpha) # src/tema1.cpp:88-99
  → filter empty                      # src/tema1.cpp:148-151
  → distinct (word, doc_id)           # src/tema1.cpp:153-163
  → groupBy word → sorted postings    # src/tema1.cpp:194-210,227
  → df, letter columns                # src/tema1.cpp:111,203
  → per-letter order df desc, word asc# src/tema1.cpp:110-115,234

The returned DataFrame carries (word, postings, df, letter); callers pick
the ordered/formatted view via ``rank_within_letter``/``format_index_rows``
or the comparison-friendly flat view via ``flagship_flat``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.inverted_index import inverted_index
from ..sources.catalog import load_table


def flagship_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → inverted index (word, postings, df, letter)."""
    docs = load_table(spark, sf_dir, "documents")
    return inverted_index(docs)


def flagship_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-friendly projection: postings rendered as a string so the
    hash compare sees identical scalar values in Spark and DuckDB."""
    idx = flagship_inverted_index(spark, sf_dir)
    return idx.select(
        "word",
        F.col("df").cast("bigint").alias("df"),
        F.array_join("postings", " ").alias("postings"),
        "letter",
    )
