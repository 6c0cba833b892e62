"""Structured Streaming layer (SURVEY.md §2.10).

The reference has no streaming — its closest recurrence is the daily
full-refresh Airflow DAG (dags/district_gis_etl.py:84). This package
exceeds parity with the standard Spark streaming surface: file-source
readStream over the events table, event-time tumbling/sliding windows
with watermarks, session windows, and a custom stateful operator via
applyInPandasWithState. ``Trigger.AvailableNow`` gives the reference's
scheduled-batch semantics (process everything new, then stop) with
streaming exactly-once bookkeeping."""
