"""PySpark-native analytics engine with the query and data-processing
capabilities of julestucher/mcas-question2-etl (the reference).

The reference is a pandas/geopandas/Postgres/R ETL + analysis stack; its
query semantics (SURVEY.md §2) are re-expressed here Spark-first:
declarative DataFrame/SQL plans optimized by Catalyst, scaled by
partitioning/AQE, with Pandas UDFs only where built-ins cannot express
the semantics (geometry, multimodal decode).

Layout:
    session     - tuned SparkSession factory (AQE, shuffle sizing, Arrow)
    catalog     - parquet table registry over the testdata star schema
    quality     - join-cardinality validation (pandas validate= / dplyr
                  relationship= semantics; SURVEY §2.9 T1-T3)
    functions/  - scalar function library (SURVEY §2.7 F1-F14, G1-G3)
    operators/  - reshape, joins, aggregates, windows, dedup, similarity,
                  text analysis (SURVEY §2.2-2.6 + training-data ops)
    sources/    - ingestion adapters (HTML-rows, CSV, JDBC; SURVEY §2.1)
    plans/      - end-to-end query plans (flagship, benchmark suite)
    pipelines/  - the reference's three ETL transform pipelines as pure
                  DataFrame programs (SURVEY §3.1-3.3)
    streaming/  - Structured Streaming analogues (event-time windows)
    ml/         - GLM layer (SURVEY §2.12 M1-M2)
"""

__version__ = "0.1.0"
