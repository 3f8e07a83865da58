"""Structured Streaming forms (SURVEY.md §2.10).

The reference is strictly batch; these are the streaming-native counterparts
of its batch mechanisms (per-day incremental loop → file-source +
``availableNow`` trigger; cross-day dedup → watermark + dropDuplicates;
day-overwrite discipline → idempotent ``foreachBatch`` sink) plus the
net-new windowed/stateful surface (tumbling/sliding/session windows).
"""
