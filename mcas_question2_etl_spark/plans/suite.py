"""The query suite: every operator from SURVEY.md §2 as a named
(spark, sf_dir) -> DataFrame plan with a matching DuckDB oracle.

Grouped to mirror the survey inventory; each spec's ``survey_ref`` names
the inventory rows it covers. Plans are built from the operator/function
modules so the suite doubles as integration coverage for the library.
"""

from __future__ import annotations

from ..registry import QuerySpec
from . import data_pipeline as _data_pipeline
from . import extensions as _extensions
from . import flagship as _flagship
from . import ml_geo_media as _ml_geo_media
from . import relational as _relational
from . import tpch as _tpch

SPECS: list[QuerySpec] = [
    QuerySpec(
        name="flagship_school_analysis",
        fn=_flagship.flagship_school_analysis,
        oracle=_flagship.FLAGSHIP_ORACLE_SQL,
        survey_ref="§2.3 J3+J4, §2.4 A1+A2 (dashboard/sql/get_school_analysis_data.sql)",
    ),
    *_relational.SPECS,
    *_data_pipeline.SPECS,
    *_extensions.SPECS,
    *_ml_geo_media.SPECS,
    *_tpch.SPECS,
]
