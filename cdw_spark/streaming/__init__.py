"""Structured Streaming subsystem (SURVEY.md §7.2 M5).

The reference is batch-only (etl.py:30-43 is a one-shot main; SURVEY.md
§2.4) — this package is the engine's genuinely new subsystem: event-time
windowed aggregation with watermarks, session windows, and a custom
stateful sessionizer via ``applyInPandasWithState``.

Design rule: every streaming query has a batch twin in
``cdw_spark/suite/windows.py`` computing the same aggregation with the same
column aliases, so finalized streaming output is differential-testable
against the batch/DuckDB answer (tests/test_streaming.py).
"""
