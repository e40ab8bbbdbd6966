"""End-to-end pipelines (SURVEY.md §3)."""
