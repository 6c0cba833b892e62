"""Operator library mirroring SURVEY.md §2 as composable
DataFrame -> DataFrame functions, plus the training-data-pipeline
operators (dedup, similarity, text analysis, multimodal plumbing)."""
