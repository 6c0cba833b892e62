"""Exact edit-distance self-join via deletion-neighborhood blocking
(the SymSpell scheme, Garbe 2012; same family as FastSS, Bocek et al.
2007).

Finding all string pairs with Levenshtein distance <= 1 by brute force
is O(n^2) verifications — a cartesian product no optimizer can save.
The deletion-neighborhood theorem makes it an equi-join: if
lev(s, t) <= 1 then D(s) ∩ D(t) != ∅, where D(s) is {s} plus every
single-character deletion of s. Proof sketch: a substitution at
position i means deleting position i from both sides yields the same
string; an insertion/deletion means one side IS a deletion of the
other; equality shares s itself.

So: explode each string into its |s|+1 deletion keys (a scan-stage
``transform`` + ``explode`` — no UDF), equi-join on the key, dedupe the
(pair, key) multiplicity with a distinct on ids, and run the exact
``levenshtein`` verifier on the few candidates. Candidates shuffle as
(key-hash, id) pairs; the full strings travel only into the bounded
verify stage. Generalizes to distance d with d-deletion neighborhoods
(key count C(|s|, d) — practical for d <= 2, the regime dedup cares
about).

Reference parity: extends the fuzzy-match family (`fuzzy_match_names`
broadcast kernel, `sorted_neighborhood_pairs` windowed blocking) with
the EXACT-recall blocking scheme; the oracle is the brute-force theta
join, so equality proves completeness, not just precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_keys(col: str) -> F.Column:
    """array of the string itself plus every single-deletion variant."""
    return F.expr(
        f"array_union(array({col}), transform(sequence(1, length({col})), "
        f"i -> concat(substring({col}, 1, i - 1), substring({col}, i + 1, length({col})))))"
    )


def edit_distance_pairs(
    df: DataFrame, id_col: str, str_col: str
) -> DataFrame:
    """All unordered pairs (a_id < b_id) with lev <= 1 between
    ``str_col`` values: ``(a_id, b_id, a_str, b_str, dist)``."""
    # shuffle 8-byte key hashes, not key strings: a hash collision can
    # only ADD a candidate, and the exact levenshtein verify kills it
    keyed = df.select(
        F.col(id_col).alias("__id"),
        F.col(str_col).alias("__s"),
        F.explode(deletion_keys(str_col)).alias("__ks"),
    ).select("__id", "__s", F.xxhash64("__ks").alias("__k"))
    a = keyed.select(
        F.col("__id").alias("a_id"), F.col("__s").alias("a_str"), "__k"
    )
    b = keyed.select(
        F.col("__id").alias("b_id"), F.col("__s").alias("b_str"), "__k"
    )
    cands = (
        a.join(b, "__k")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_str", "b_str")
        .distinct()
    )
    return cands.withColumn(
        "dist", F.levenshtein("a_str", "b_str")
    ).filter(F.col("dist") <= 1)
