"""LLM-training-data pipeline operators (BASELINE.json north star).

Net-new surface beyond the reference (SURVEY.md Phase 4): deduplication
families, embedding similarity search, text analysis, multimodal column
plumbing — all designed for 100 TB (shuffle-on-key fan-outs, broadcast query
sides, sketch-based pre-filters, no driver-side loops).
"""
