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


# --------------------------------------------------------------------------
# content-defined chunking (CDC) — boundary-shift-immune dedup units
# --------------------------------------------------------------------------

#: a token is a chunk boundary iff its md5 starts with this many '0'
#: hex chars: 1 -> P(boundary) = 1/16 -> expected chunk ~16 tokens.
#: Content-defined (depends only on the token, never on position), so
#: an insertion near the top of a document shifts NO downstream chunk
#: boundaries — the property fixed-size chunking lacks and the reason
#: CDC is the standard dedup unit in storage systems (LBFS, Muthitacharoen
#: et al. SOSP'01) and long-document corpus dedup.
_CDC_BOUNDARY_HEX = "0"


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into content-defined chunks: a chunk ends at
    every token whose md5 starts with '0' (P=1/16, expected ~16-token
    chunks). Returns one row per chunk: (``id_col``, ``chunk_text``).

    Implementation is a single narrow projection — O(tokens), no
    shuffle, no per-position window: each token is rewritten as
    ``token + (boundary ? SEP : ' ')``, the array is joined and split
    on SEP, so the chunker pipelines with the parquet scan like
    :func:`chunk_documents`. SEP is chr(1), which cannot appear in
    whitespace-tokenized text. Trailing partial chunks are kept
    (rtrim'd); empty chunks (boundary-final documents) are dropped.
    """
    marked = (
        f"array_join(transform(split({text_col}, ' '), "
        f"t -> concat(t, if(substring(md5(t), 1, 1) = '{_CDC_BOUNDARY_HEX}', "
        f"char(1), ' '))), '')"
    )
    chunks = f"filter(transform(split({marked}, char(1)), c -> rtrim(c)), c -> c <> '')"
    return df.select(
        F.col(id_col), F.explode(F.expr(chunks)).alias("chunk_text")
    )


def cdc_chunks_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`cdc_chunks` (a full SELECT producing
    (id_col, chunk_text))."""
    marked = (
        f"array_to_string(list_transform(string_split({text_col}, ' '), "
        f"t -> t || CASE WHEN substring(md5(t), 1, 1) = '{_CDC_BOUNDARY_HEX}' "
        f"THEN chr(1) ELSE ' ' END), '')"
    )
    return f"""
    SELECT {id_col},
           u.chunk_text
    FROM (
      SELECT {id_col},
             list_filter(list_transform(string_split({marked}, chr(1)),
                                        c -> rtrim(c)),
                         c -> c <> '') AS cs
      FROM {table}
    ), LATERAL unnest(cs) AS u(chunk_text)
    """
