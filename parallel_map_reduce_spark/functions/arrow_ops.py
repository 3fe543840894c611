"""mapInArrow surface — columnar Python compute without the pandas hop.

``mapInArrow`` hands each partition to Python as raw Arrow RecordBatches:
no pandas Series materialization, no per-element boxing — the embedding
matrix is reshaped zero-copy-ish into numpy and processed as one BLAS
call per batch. This is the escape hatch of choice when the compute is
genuinely numerical-columnar (here: L2 norms over array<float> columns);
for scalar/grouped logic the pandas UDF surfaces in
``operators/grouped_stats.py`` stay preferable.

The engine's 6 Python surfaces, each with a gated query:
pandas scalar UDF, pandas grouped-map (applyInPandas), pandas
grouped-agg, mapInPandas, Arrow UDTF, applyInPandasWithState — and this
mapInArrow operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMBEDDING_DIM = 64  # embeddings.parquet fixture dimension


def l2_norms_arrow(embs: DataFrame) -> DataFrame:
    """(vec_id, l2_norm, unit_head): per-vector L2 norm and the first
    component of the unit-normalized vector, computed batch-at-a-time in
    Arrow→numpy. Rounding happens Spark-side (JVM round, matching the
    oracle's ROUND) — the Arrow stage is pure float64 compute."""

    def _norms(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            emb = b.column("embedding")
            n = len(emb)
            if n == 0:
                continue
            mat = (
                emb.flatten()
                .to_numpy(zero_copy_only=False)
                .astype("float64")
                .reshape(n, -1)
            )
            norms = np.sqrt((mat * mat).sum(axis=1))
            head = mat[:, 0] / np.where(norms == 0.0, 1.0, norms)
            yield pa.RecordBatch.from_arrays(
                [b.column("vec_id"), pa.array(norms), pa.array(head)],
                ["vec_id", "l2_norm", "unit_head"],
            )

    raw = embs.select("vec_id", "embedding").mapInArrow(
        _norms, "vec_id long, l2_norm double, unit_head double"
    )
    return raw.select(
        "vec_id",
        F.round("l2_norm", 4).alias("l2_norm"),
        F.round("unit_head", 6).alias("unit_head"),
    )
