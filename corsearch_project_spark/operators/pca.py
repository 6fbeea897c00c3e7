"""Distributed PCA over the embedding column — the preprocessing step the
embedding-curation family (SemDeDup-style clustering, IVF coarse quantizers,
whitening before cosine thresholds) assumes upstream.

Spark-first shape: PCA at 10^12 rows is NOT an iterative distributed solve —
it is one pass of per-batch numpy matmuls producing the d×d sufficient
statistics (Gramian, column sums, count), one tiny partial/final aggregate
over d(d+1)/2 + d + 1 keys, and a driver-side eigendecomposition of the
d×d covariance (microseconds at d=64). The projection back over the data is
a second single Arrow matmul stage with the component matrix broadcast by
closure. Shuffle volume is #tasks × ~2 k rows regardless of input size.

Exactness contract (same discipline as simsearch.lsh_signature_arrow):
embeddings quantize to int64 via the shared HALF_UP rule (bit-identical to
F.round(x·1000, 0) and the DuckDB oracle's round()); all sufficient
statistics are integer sums — associative, so partial/final order cannot
change them and the DuckDB twin matches bit-for-bit. Overflow bound:
|q|≤~10^4 ⇒ a Gramian cell grows ≤10^8 per row, so int64 holds to ~10^10
rows per partial; beyond that, raise the quantization scale down or widen
to decimal at the final agg (documented, not silently wrong).

The float work (covariance from the integer stats, eigh) happens once on
the driver over a d×d matrix; component sign is fixed deterministically
(largest-|coefficient| entry made positive) so runs are reproducible.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, functions as F

DIM = 64


def _quantize(np, pdf_col) -> "object":
    v = np.stack(pdf_col.values).astype(np.float64) * 1000.0
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def embedding_stats(
    df: DataFrame, dim: int = DIM, emb_col: str = "embedding"
) -> DataFrame:
    """One-pass sufficient statistics for PCA as a long relation
    ``(i, j, value)``:

      * ``(i, j)`` with ``0 <= i <= j < dim`` — Gramian cell Σ qᵢqⱼ
      * ``(i, -1)`` — column sum Σ qᵢ
      * ``(-1, -1)`` — row count

    One Arrow matmul stage emits per-batch partial matrices (already
    reduced over the batch's rows — the map-side combine happens inside
    numpy), then a single groupBy(i, j) partial/final BIGINT sum merges
    ~2 k keys. All integer math ⇒ exact under any aggregation order."""

    def stats(batches):
        import numpy as np
        import pyarrow as pa

        iu = np.triu_indices(dim)
        out_schema = pa.schema(
            [
                pa.field("i", pa.int32()),
                pa.field("j", pa.int32()),
                pa.field("value", pa.int64()),
            ]
        )
        for rb in batches:
            pdf = rb.to_pandas()
            if not len(pdf):
                continue
            q = _quantize(np, pdf[emb_col])
            g = q.T @ q  # d×d int64, exact
            s = q.sum(axis=0)
            i_out = np.concatenate(
                [iu[0], np.arange(dim), [-1]]
            ).astype(np.int32)
            j_out = np.concatenate(
                [iu[1], np.full(dim, -1), [-1]]
            ).astype(np.int32)
            v_out = np.concatenate(
                [g[iu], s, [len(pdf)]]
            ).astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [pa.array(i_out), pa.array(j_out), pa.array(v_out)],
                schema=out_schema,
            )

    partials = df.select(emb_col).mapInArrow(
        stats, schema="i int, j int, value long"
    )
    return partials.groupBy("i", "j").agg(F.sum("value").alias("value"))


def pca_components(
    stats_df: DataFrame, dim: int = DIM, k: int = 8
) -> Tuple["object", "object", "object"]:
    """Driver-side finish: ``(components dim×k, eigenvalues k, mean dim)``
    from the collected sufficient statistics (≤ 2 145 rows at d=64 — this
    .collect() is bounded driver metadata, not data). Covariance uses the
    quantized scale; eigenvalues are in quantized units². Sign convention:
    each component's largest-|coefficient| entry is positive."""
    import numpy as np

    rows = stats_df.collect()
    g = np.zeros((dim, dim), dtype=np.float64)
    s = np.zeros(dim, dtype=np.float64)
    n = 0
    for r in rows:
        i, j, v = r["i"], r["j"], r["value"]
        if i == -1:
            n = int(v)
        elif j == -1:
            s[i] = float(v)
        else:
            g[i, j] = float(v)
            g[j, i] = float(v)
    if n < 2:
        raise ValueError("PCA needs at least 2 rows")
    mean = s / n
    cov = (g - np.outer(mean, s)) / (n - 1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order]
    flips = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(len(order))])
    flips[flips == 0] = 1.0
    return comps * flips, w[order], mean


def pca_project(
    df: DataFrame,
    components,
    mean,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(id, projected array<double>) — centered quantized vectors times the
    broadcast component matrix, one Arrow matmul stage (components and mean
    ride the task closure: d×k doubles, far under broadcast thresholds)."""
    import numpy as np

    comps = np.asarray(components, dtype=np.float64)
    mu = np.asarray(mean, dtype=np.float64)

    def project(batches):
        import numpy as np
        import pyarrow as pa

        out_schema = pa.schema(
            [
                pa.field(id_col, pa.int64()),
                pa.field("projected", pa.list_(pa.float64())),
            ]
        )
        for rb in batches:
            pdf = rb.to_pandas()
            if not len(pdf):
                continue
            q = _quantize(np, pdf[emb_col]).astype(np.float64)
            p = (q - mu) @ comps
            yield pa.RecordBatch.from_arrays(
                [pa.array(pdf[id_col].values, type=pa.int64()), pa.array(list(p))],
                schema=out_schema,
            )

    return df.select(id_col, emb_col).mapInArrow(
        project, schema=f"{id_col} long, projected array<double>"
    )
