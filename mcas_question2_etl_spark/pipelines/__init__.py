"""The reference's three ETL transform pipelines + dashboard read path,
as pure DataFrame programs (SURVEY.md §3.1-3.4). Extraction (Selenium /
HTTP) is I/O, not query semantics — inputs arrive as DataFrames via
sources.ingest; these modules own everything from raw rows to loadable
tables."""
