"""Python UDTF surface: sentence splitting as a table function.

Completes the Python API surface alongside mapInPandas (multimodal/),
applyInPandas (operators/grouped_stats.py) and applyInPandasWithState
(streaming/sessionize.py). A UDTF is the right shape for one-row →
many-rows logic too irregular for ``explode(split(...))`` composition;
this demo is deliberately simple enough to have an exact SQL oracle.

Hot-path note (SURVEY §2.2 "UDF surface"): built-in explode/split covers
the flagship tokenizer at JVM speed — a Python UDTF is the ESCAPE HATCH,
not the default. Registered with ``useArrow=True`` so batches cross the
boundary via Arrow.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import lit, udtf


SENTENCE_SPLIT_REGEX = r"[.!?]+"


@udtf(returnType="sent_idx: int, sentence: string", useArrow=True)
class SplitSentences:
    """One row per non-empty sentence; sent_idx is the 0-based index of
    the segment in the raw split (empties keep their slot numbering, so
    indices are stable under trailing punctuation)."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, seg in enumerate(re.split(SENTENCE_SPLIT_REGEX, text)):
            s = seg.strip()
            if s:
                yield i, s


def split_sentences(spark, docs):
    """documents(doc_id, text) → (doc_id, sent_idx, sentence) via the
    UDTF in lateral-join position."""
    docs.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("split_sentences", SplitSentences)
    return spark.sql(
        "SELECT d.doc_id, s.sent_idx, s.sentence "
        "FROM _udtf_docs d, LATERAL split_sentences(d.text) s"
    )
