"""ML pipelines (SURVEY.md §2.11 estimator surface)."""
