"""Ingestion adapters and sinks (SURVEY.md §2.1 S1-S8, K1-K5)."""
