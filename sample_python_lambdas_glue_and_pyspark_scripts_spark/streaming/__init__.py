"""Incremental / streaming processing (SURVEY.md §2.8)."""
