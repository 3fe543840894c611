"""tools/parity.py must be at least as strict as the driver's gate.

Round-9 shipping defect: `embedding_pca_whitened` returned a raw
ARRAY<DOUBLE> column; parity.py's rows-only path just counted rows and
printed OK, while the driver's pandas-based canonicalizer crashed with
``TypeError: unhashable type: 'list'`` before it could record even a
row count (CORRECTNESS_r09.json). These tests pin that parity.py's
canonicalization now reproduces the driver's failure mode on the
pre-fix shape, and accepts the fixed (string-rendered) shape.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_PARITY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "parity.py",
)


def _load_parity():
    spec = importlib.util.spec_from_file_location("pmrs_tools_parity", _PARITY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_driver_canon_crashes_on_raw_array_cells():
    """The exact r9 failure: list cells are unhashable for pandas'
    multi-column sort factorization — the driver crashed, so the local
    replica must too."""
    parity = _load_parity()
    rows = [(1, [0.1, 0.2]), (2, [0.3, 0.4])]
    with pytest.raises(TypeError):
        parity._driver_canon(rows, ["vec_id", "comps"])


def test_driver_canon_accepts_rendered_arrays_and_is_order_insensitive():
    parity = _load_parity()
    a = parity._driver_canon(
        [(1, "0.100000 0.200000"), (2, "0.300000 0.400000")],
        ["vec_id", "comps"],
    )
    b = parity._driver_canon(
        [(2, "0.300000 0.400000"), (1, "0.100000 0.200000")],
        ["vec_id", "comps"],
    )
    assert a == b


def test_fixed_pca_entry_passes_driver_canon(spark, sf_dir):
    """End-to-end on the real entry: the r10 rendering fix must make
    the exact frame the driver collects canonicalizable."""
    from parallel_map_reduce_spark.queries.similarity import (
        embedding_pca_whitened,
    )

    parity = _load_parity()
    df = embedding_pca_whitened(spark, sf_dir)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint",
        "string",
    ] or all(
        not f.dataType.simpleString().startswith(("array", "map", "struct"))
        for f in df.schema.fields
    )
    rows = [tuple(r) for r in df.limit(50).collect()]
    assert rows, "pca entry returned no rows"
    assert parity._driver_canon(rows, df.columns)


def test_twins_table_contract():
    """Every twins.py entry must name a REGISTERED rows-only query
    (twins replace the missing oracle — an oracle-backed entry getting
    a twin instead would silently downgrade its evidence), and every
    TWIN_COMPARE key must be a TWINS key."""
    from parallel_map_reduce_spark.queries.twins import TWIN_COMPARE, TWINS
    from parallel_map_reduce_spark.registry import all_queries

    specs = all_queries()
    for name in TWINS:
        assert name in specs, f"twin for unregistered entry {name}"
        assert specs[name].oracle is None, (
            f"{name} is oracle-backed; a twin would downgrade its evidence"
        )
    assert set(TWIN_COMPARE) <= set(TWINS)


def test_twin_collect_guard_refuses_large_frames(spark):
    """collect_bounded is the shared guard on every twin's driver-side
    collect (VERDICT r12 task 6): twins are fixture-scale verification
    scaffolding, and pointing one at a real corpus must refuse loudly
    instead of OOM-ing the driver."""
    import pytest as _pytest

    from parallel_map_reduce_spark.queries.twins import (
        TWIN_COLLECT_CAP,
        collect_bounded,
    )

    small = spark.range(10)
    assert len(collect_bounded(small, "small")) == 10
    big = spark.range(TWIN_COLLECT_CAP + 1)
    with _pytest.raises(ValueError, match="refuses to collect"):
        collect_bounded(big, "big")


def test_every_twin_collect_goes_through_guard():
    """No twin may collect a corpus-sized frame around the guard: the
    only ``.collect()`` calls allowed in twins.py are on k-row metadata
    (centroids) or inside collect_bounded itself."""
    import inspect

    from parallel_map_reduce_spark.queries import twins

    src = inspect.getsource(twins)
    allowed_ctx = ("train_ivf_centroids", "collect_bounded")
    for i, line in enumerate(src.splitlines(), 1):
        if ".collect()" in line:
            window = "\n".join(src.splitlines()[max(0, i - 8) : i])
            assert any(a in window for a in allowed_ctx), (
                f"twins.py:{i} collects outside collect_bounded: {line.strip()}"
            )


def test_evidence_program_complete():
    """VERDICT r13 task 1: every no-oracle registry entry carries a
    TWIN or a TOLERANCE witness — bare rows-only = 0. Oracle-backed
    entries must carry neither (a weaker grade would shadow the hash
    oracle), and no entry carries both."""
    from parallel_map_reduce_spark.queries.tolerance import TOLERANCE
    from parallel_map_reduce_spark.queries.twins import TWINS
    from parallel_map_reduce_spark.registry import all_queries

    specs = all_queries()
    no_oracle = {n for n, s in specs.items() if s.oracle is None}
    assert set(TOLERANCE) <= no_oracle
    assert set(TOLERANCE).isdisjoint(TWINS)
    bare = no_oracle - set(TWINS) - set(TOLERANCE)
    assert not bare, f"entries with no recorded evidence grade: {sorted(bare)}"


def test_tolerance_witnesses_pass_and_fail(spark, sf_dir):
    """Each witness must (a) pass on the entry's real output with a
    recorded bound+observed, and (b) FAIL when the estimates are
    perturbed past the bound — a witness that cannot reject is not
    evidence. Perturbation multiplies every estimate column 3x, far
    outside every family's relative bound."""
    from parallel_map_reduce_spark.queries.tolerance import TOLERANCE
    from parallel_map_reduce_spark.registry import all_queries, release_pins

    specs = all_queries()
    est_cols = {
        "event_type_distinct_users_approx": "n_users_approx",
        "event_value_quantiles_approx": "value_approx",
        "event_users_hll_rollup": "n_users_est",
        "events_rolling_7d_users_hll": "n_users_7d_est",
        "event_type_user_overlap_hll": "n_overlap_est",
        "streaming_sliding_users_approx": "n_users_approx",
    }
    assert set(est_cols) == set(TOLERANCE)
    # one batch entry per exact-reference shape is enough for the
    # pass/fail mechanics; the full sweep runs in tools/parity.py
    for name in (
        "event_type_distinct_users_approx",
        "event_value_quantiles_approx",
        "event_type_user_overlap_hll",
    ):
        label, witness = TOLERANCE[name]
        release_pins()
        df = specs[name].build(spark, sf_dir)
        scols = df.columns
        srows = [tuple(r) for r in df.collect()]
        rec = witness(spark, sf_dir, srows, scols)
        assert rec["ok"], (name, rec)
        assert rec["bound"] and rec["observed"]
        j = scols.index(est_cols[name])
        perturbed = [
            tuple(
                (v * 3 + 10) if k == j else v for k, v in enumerate(r)
            )
            for r in srows
        ]
        bad = witness(spark, sf_dir, perturbed, scols)
        assert not bad["ok"], (name, bad)
