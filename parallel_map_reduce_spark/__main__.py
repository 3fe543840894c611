"""Drop-in CLI: the reference binary's invocation, served by Spark.

The reference runs as ``./program <mappers> <reducers> <input_file>``
and writes ``a.txt`` … ``z.txt`` into the working directory
(reference ``README.md`` Usage; arg parse at ``src/tema1.cpp:256-266``,
output files opened at ``src/tema1.cpp:293-309``). This module makes
the switch literal:

    python -m parallel_map_reduce_spark <mappers> <reducers> <input_file> \
        [--out DIR]

Same manifest format, same 26 output files, byte-identical content
(the golden tests pin parity on the reference's own corpus and
checker). The thread counts map onto Spark's resource knobs —
``mappers`` caps the scan-side partition count, ``reducers`` sets
``spark.sql.shuffle.partitions`` — and, exactly like the reference
(whose checker diffs all M×R configs against one golden set,
``checker/checker.sh:141-247``), the OUTPUT is independent of both:
parallelism here tunes throughput, never semantics.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m parallel_map_reduce_spark",
        description="Build the reference's inverted index with Spark.",
    )
    ap.add_argument("mappers", type=int, help="scan-side parallelism cap")
    ap.add_argument("reducers", type=int, help="shuffle partition count")
    ap.add_argument("input_file", help="manifest: first line N, then N paths")
    ap.add_argument(
        "--out",
        default=".",
        help="directory for a.txt..z.txt (reference writes to cwd)",
    )
    args = ap.parse_args(argv)
    if args.mappers < 1 or args.reducers < 1:
        ap.error("mappers and reducers must be >= 1")
    if not os.path.exists(args.input_file):
        ap.error(f"input file {args.input_file!r} not found")

    from .operators.inverted_index import index_order_partitions, inverted_index
    from .session import get_spark
    from .sinks.text_sink import write_letter_files
    from .sources.text_manifest import manifest_total_bytes, read_manifest_documents

    from pyspark.sql import SparkSession

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark(
        app_name="parallel_map_reduce_spark.cli",
        shuffle_partitions=args.reducers,
    )
    docs = read_manifest_documents(spark, args.input_file)
    # The reference hands each mapper whole files from a shared queue
    # (src/tema1.cpp:118-140); the Spark analogue of "at most M mappers"
    # is capping the scan-side partition count. coalesce() narrows
    # without a shuffle — ids are already assigned, so this cannot
    # change output (the M×R-determinism contract).
    if args.mappers < docs.rdd.getNumPartitions():
        docs = docs.coalesce(args.mappers)
    write_letter_files(
        inverted_index(docs),
        args.out,
        order_partitions=index_order_partitions(
            manifest_total_bytes(args.input_file)
        ),
    )
    if not preexisting:  # don't tear down a caller-owned session
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
