"""Document chunking: split long documents into fixed-size token
windows with overlap — the context-construction primitive behind RAG
indexing and long-document training (a doc longer than the model
context is chunked with a stride so no boundary text is lost).

Everything is one narrow projection: ``sequence`` generates the chunk
start positions, ``explode`` fans them out, ``slice`` takes the token
window — all JVM-side array expressions inside the scan stage, no
Python, no shuffle. At 100 TB chunking is therefore free: it pipelines
with the parquet scan and whatever filter precedes it, and the output
is naturally partitioned exactly like the input (chunk rows inherit
their doc's partition — no co-location lost for a downstream
embed/index stage keyed by doc).

``chunk_id`` derives from the start offset, not the explode position,
so it is stable under any re-ordering and the operator stays
oracle-checkable in plain SQL.

No counterpart in the reference (relational-only data model); extends
the engine for LLM-corpus construction alongside operators/packing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Explode each document into overlapping token chunks.

    Output: ``id_col``, ``chunk_id`` (0-based, ``(start-1)/stride``),
    ``n_chunk_tokens`` (< ``window`` only for the final chunk), and
    ``chunk_text``. ``stride < window`` gives ``window - stride``
    tokens of overlap between consecutive chunks.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = F.split(F.col(text_col), " ")
    n = F.size(F.col("__toks"))
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    chunk = F.slice(F.col("__toks"), F.col("start"), window)
    return (
        df.select(id_col, toks.alias("__toks"))
        .select(id_col, "__toks", F.explode(starts).alias("start"))
        .select(
            id_col,
            ((F.col("start") - 1) / stride).cast("long").alias("chunk_id"),
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


def chunk_documents_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`chunk_documents` (a full SELECT)."""
    return f"""
    WITH t AS (
      SELECT {id_col}, string_split({text_col}, ' ') AS toks
      FROM {table}
    ),
    s AS (
      SELECT {id_col}, toks,
             unnest(generate_series(1, greatest(len(toks), 1), {stride}))
               AS start
      FROM t
    )
    SELECT {id_col},
           CAST(FLOOR((start - 1) / {stride}) AS BIGINT) AS chunk_id,
           CAST(least(start + {window} - 1, len(toks)) - start + 1 AS BIGINT)
             AS n_chunk_tokens,
           array_to_string(list_slice(toks, start, start + {window} - 1), ' ')
             AS chunk_text
    FROM s
    """
