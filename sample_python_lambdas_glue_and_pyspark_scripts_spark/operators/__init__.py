"""Engine operators (SURVEY.md §2)."""
