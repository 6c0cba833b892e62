"""Wave-11 extension spec: EXACT set-similarity join with prefix-filter
pruning, oracle-checked against the naive all-pairs join (equality
proves the pruning lost no pair — the complement of the
recall-trading MinHash path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.sampling import hash_bucket, hash_bucket_sql
from ..operators.setjoin import naive_jaccard_join_sql, prefix_filter_jaccard_join
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


#: deterministic 5% evaluation slice — the ORACLE is quadratic in the
#: slice, the Spark side is the near-linear prefix-filter join that
#: runs on the full corpus at scale
_SLICE_PCT = 5
_THRESHOLD = 0.6


@_spec(
    "prefix_filter_jaccard_pairs",
    naive_jaccard_join_sql(
        f"(SELECT doc_id, text FROM documents "
        f"WHERE {hash_bucket_sql('doc_id')} < {_SLICE_PCT})",
        "doc_id",
        "text",
        _THRESHOLD,
    ),
    "training-data op — EXACT similarity join (operators/setjoin.py): "
    "every pair with token-set Jaccard >= 0.6 via PPJoin-style prefix "
    "filtering — rarest-first global token order, candidates only from "
    "shared PREFIX tokens (hot stopwords sit at the order's end and "
    "never become join keys), exact int-array verification. Recall is "
    "exactly 1, which is why the oracle can be the NAIVE all-pairs "
    "join on the same slice: equal output proves the pruning sound. "
    "Complements minhash_lsh_portable (approx) with the "
    "guaranteed-complete variant",
)
def prefix_filter_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        hash_bucket("doc_id") < _SLICE_PCT
    )
    return prefix_filter_jaccard_join(docs, "doc_id", "text", _THRESHOLD)
