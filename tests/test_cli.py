"""The drop-in CLI must reproduce the reference binary's contract:
same invocation shape, same 26 letter files, golden-equal content,
output independent of the mapper/reducer arguments."""

from __future__ import annotations

import os
import string

import pytest

from parallel_map_reduce_spark.__main__ import main

REF_SMALL_MANIFEST = "/root/reference/checker/test_small.txt"
REF_SMALL_GOLDEN_DIR = "/root/reference/checker/test_out_small"

needs_reference = pytest.mark.skipif(
    not os.path.exists(REF_SMALL_MANIFEST), reason="reference corpus not present"
)


def _read(path: str) -> list[str]:
    if not os.path.exists(path):
        return []
    with open(path, encoding="utf-8", errors="replace") as fh:
        return [" ".join(ln.split()) for ln in fh.read().splitlines()]


@needs_reference
def test_cli_matches_reference_goldens_and_is_mr_independent(spark, tmp_path):
    # spark fixture keeps the shared session; main() getOrCreate()s onto
    # it, so shuffle_partitions becomes a no-op conf set — fine: the
    # CONTRACT is that M/R never affect bytes, which is what we assert
    # by running two different M×R configs.
    out1 = tmp_path / "mr11"
    out2 = tmp_path / "mr43"
    assert main(["1", "1", REF_SMALL_MANIFEST, "--out", str(out1)]) == 0
    assert main(["4", "3", REF_SMALL_MANIFEST, "--out", str(out2)]) == 0
    for letter in string.ascii_lowercase:
        golden = _read(os.path.join(REF_SMALL_GOLDEN_DIR, f"{letter}.txt"))
        got1 = _read(str(out1 / f"{letter}.txt"))
        got2 = _read(str(out2 / f"{letter}.txt"))
        assert got1 == golden, f"{letter}.txt diverges from reference golden"
        assert got2 == golden, f"{letter}.txt depends on M/R arguments"


def test_cli_rejects_bad_args(tmp_path):
    with pytest.raises(SystemExit):
        main(["0", "1", REF_SMALL_MANIFEST])
    with pytest.raises(SystemExit):
        main(["1", "1", str(tmp_path / "missing.txt")])
