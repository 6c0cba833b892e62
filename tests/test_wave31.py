"""Wave-31 tests: audio active segments vs pure-python replay."""

from __future__ import annotations

import hashlib


def test_audio_segments_match_python_replay(spark):
    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.plans.curation_specs import (
        _ENERGY_T,
        audio_active_segments,
    )
    from tests.conftest import SF_SMALL

    got = {r.media_id: r for r in audio_active_segments(spark, SF_SMALL).collect()}
    docs = load_table(spark, SF_SMALL, "documents").collect()
    for d in docs:
        payload = d.text.encode()
        hx = (
            hashlib.md5(payload + b":0").hexdigest()
            + hashlib.md5(payload + b":1").hexdigest()
        )
        env = [int(c, 16) for c in hx]
        segs = []
        run = 0
        for e in env + [0]:
            if e >= _ENERGY_T:
                run += 1
            elif run:
                segs.append(run)
                run = 0
        if not segs:
            assert d.doc_id not in got
            continue
        r = got[d.doc_id]
        assert r.n_segments == len(segs)
        assert r.active_frames == sum(segs)
        assert r.longest_segment == max(segs)
