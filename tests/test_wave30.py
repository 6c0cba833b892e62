"""Wave-30 tests: centroid separation pinned against numpy."""

from __future__ import annotations

import numpy as np
import pytest


def test_centroid_separation_matches_numpy(spark):
    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.plans.curation_specs import label_centroid_separation
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    data = {}
    for r in emb.collect():
        # same Q20 grid the operator uses
        data.setdefault(r.label, []).append(
            [int(np.floor(float(x) * (1 << 20))) for x in r.embedding]
        )
    cents = {
        lbl: np.array(vecs, dtype=np.float64).mean(axis=0)
        for lbl, vecs in data.items()
    }
    rows = label_centroid_separation(spark, SF_SMALL).collect()
    labels = sorted(data)
    assert len(rows) == len(labels) * (len(labels) - 1) // 2
    for r in rows:
        want = float(np.sqrt(((cents[r.label_a] - cents[r.label_b]) ** 2).sum()))
        assert r.centroid_dist == pytest.approx(want, rel=1e-9)
        assert r.n_a == len(data[r.label_a])
        assert r.n_b == len(data[r.label_b])
