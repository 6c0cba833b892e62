"""Distributed PCA over an embedding column (MLlib RowMatrix pattern).

The reference's statistical layer is a single-node GLM (run_analysis.Rmd
:80-99); its Spark-scale analogue for embedding tables is dimensionality
reduction — whitening / compressing `array<float>` vectors before ANN
(operators/similarity.py) or clustering (operators/kmeans.py).

Architecture (the standard tall-skinny decomposition split):
  * The *distributed* part is the Gram accumulation: one `mapInPandas`
    pass emits per-partition partial moments (count, Σx, Σx xᵀ flattened)
    — d + d² doubles per partition, never per row — which the driver
    reduces. Shuffle-free; the only data movement is #partitions small
    rows to the driver.
  * The *driver* part is the d×d eigendecomposition — O(d³) on a matrix
    whose size is independent of row count (64×64 here), exactly how
    Spark MLlib's ``RowMatrix.computePrincipalComponents`` splits the
    work. At 100 TB of rows with d ≤ a few thousand this stays trivial.
  * Projection back over the data is an Arrow-batched `pandas_udf`
    matrix multiply (one BLAS GEMM per batch).

Determinism: eigenvectors are sign-normalized (largest-|coordinate|
entry positive) so results are reproducible across runs and platforms.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType


def _partial_moments(dim: int):
    schema = "n long, s array<double>, outer array<double>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        outer = np.zeros((dim, dim))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.asarray(list(pdf["embedding"]), dtype=np.float64)
            n += mat.shape[0]
            s += mat.sum(axis=0)
            outer += mat.T @ mat
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "outer": [outer.ravel().tolist()]}
            )

    return gen, schema


def covariance_matrix(
    df: DataFrame, col: str = "embedding", dim: int | None = None
) -> tuple[np.ndarray, np.ndarray, int]:
    """Population covariance of an array column: (cov d×d, mean d, n).

    One shuffle-free pass; partials are reduced on the driver in sorted
    order for run-to-run determinism.
    """
    if dim is None:
        dim = len(df.select(col).first()[0])
    gen, schema = _partial_moments(dim)
    parts = (
        df.select(F.col(col).cast("array<double>").alias("embedding"))
        .mapInPandas(gen, schema=schema)
        .collect()
    )
    parts.sort(key=lambda r: (r["n"], r["s"][0] if r["s"] else 0.0))
    n = sum(r["n"] for r in parts)
    s = np.sum([np.array(r["s"]) for r in parts], axis=0)
    outer = np.sum([np.array(r["outer"]).reshape(dim, dim) for r in parts], axis=0)
    mean = s / n
    cov = outer / n - np.outer(mean, mean)
    return cov, mean, n


def pca_components(
    df: DataFrame, col: str = "embedding", k: int = 2
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Top-k principal axes: (components k×d, eigenvalues k, mean d)."""
    cov, mean, _ = covariance_matrix(df, col)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    for i in range(comps.shape[0]):  # deterministic sign
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, vals[order], mean


def project(
    df: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    col: str = "embedding",
    out: str = "pc",
) -> DataFrame:
    """Append ``out`` = components @ (vec - mean) per row (Arrow GEMM)."""
    comps = components.astype(np.float64)
    mu = mean.astype(np.float64)

    @F.pandas_udf(ArrayType(DoubleType()))
    def _proj(vecs: pd.Series) -> pd.Series:
        mat = np.asarray(list(vecs), dtype=np.float64) - mu
        return pd.Series(list(mat @ comps.T))

    return df.withColumn(out, _proj(F.col(col).cast("array<double>")))
