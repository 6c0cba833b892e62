"""Statistical/ML layer (SURVEY.md §2.12)."""
