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
@pytest.mark.parametrize("mappers", [1, 2, 4])
@pytest.mark.parametrize("reducers", [1, 2, 4])
def test_cli_matches_reference_goldens_full_mr_sweep(spark, tmp_path, mappers, reducers):
    # The reference checker's own gate diffs EVERY M×R in {1,2,4}²
    # against one golden set (checker/checker.sh:141-247); this is the
    # same 9-config sweep on the same small fixture (VERDICT r10 task
    # 6). The spark fixture keeps the shared session; main()
    # getOrCreate()s onto it, so shuffle_partitions becomes a no-op
    # conf set — fine: the CONTRACT is that M/R never affect bytes.
    out = tmp_path / f"m{mappers}r{reducers}"
    assert main([str(mappers), str(reducers), REF_SMALL_MANIFEST, "--out", str(out)]) == 0
    for letter in string.ascii_lowercase:
        golden = _read(os.path.join(REF_SMALL_GOLDEN_DIR, f"{letter}.txt"))
        got = _read(str(out / f"{letter}.txt"))
        assert got == golden, (
            f"{letter}.txt diverges from reference golden at M={mappers} R={reducers}"
        )


def test_cli_rejects_bad_args(tmp_path):
    with pytest.raises(SystemExit):
        main(["0", "1", REF_SMALL_MANIFEST])
    with pytest.raises(SystemExit):
        main(["1", "1", str(tmp_path / "missing.txt")])
