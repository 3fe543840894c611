"""Pin rank_within_letter's part-file-name-order contract.

The single-file golden-parity sink independently re-sorts each letter in
Python, so byte parity alone never exercises the claim in
``operators/inverted_index.py:rank_within_letter`` that, on the
partitioned (scale) layout, concatenating a letter's part files in
FILENAME order reproduces the reference's row order (df DESC, word ASC).
This test checks that claim directly: range partitioning assigns each
letter's rows to partitions in sort order, partition ids become the
part-file name prefix, and sortWithinPartitions orders rows inside each
file — so filename-order concatenation must equal the total order.
"""

from __future__ import annotations

import glob
import os

from parallel_map_reduce_spark.operators.inverted_index import inverted_index
from parallel_map_reduce_spark.sinks.text_sink import write_letter_files
from parallel_map_reduce_spark.sources.catalog import load_table


def _df_of(line: str) -> int:
    _, _, rest = line.partition(":[")
    ids = rest.rstrip("]")
    return ids.count(" ") + 1 if ids else 0


def _word_of(line: str) -> str:
    return line.partition(":[")[0]


def test_partitioned_layout_part_name_order_is_row_order(spark, sf_dir, tmp_path):
    idx = inverted_index(load_table(spark, sf_dir, "documents"))
    out = str(tmp_path / "letters_partitioned")
    # Force enough range partitions that letters span part-file
    # boundaries — otherwise every letter fits one file and the
    # cross-file half of the contract goes untested.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    # AQE would coalesce the tiny test shuffle back to one partition per
    # letter, hiding the cross-file case this test exists to check.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        write_letter_files(idx, out, single_file=False)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev_coalesce)

    checked_letters = 0
    multi_file_letters = 0
    for letter_dir in sorted(glob.glob(os.path.join(out, "letter=*"))):
        lines: list[str] = []
        parts = sorted(glob.glob(os.path.join(letter_dir, "part-*")))
        for p in parts:
            with open(p, encoding="utf-8") as fh:
                lines.extend(fh.read().splitlines())
        if not lines:
            continue
        assert lines == sorted(lines, key=lambda ln: (-_df_of(ln), _word_of(ln))), (
            f"{letter_dir}: filename-order concatenation is not (df desc, word asc)"
        )
        checked_letters += 1
        if len([p for p in parts if os.path.getsize(p)]) > 1:
            multi_file_letters += 1
    assert checked_letters > 0
    # At least one letter must actually cross a file boundary, or the
    # filename-order claim was never really tested.
    assert multi_file_letters > 0
