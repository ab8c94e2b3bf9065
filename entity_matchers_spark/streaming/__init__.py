"""Structured Streaming operators (SURVEY.md §2.9).

The reference is pure batch; its only incremental behaviors are
bootstrapping iterations and stage-wise pickle checkpoints
(/root/reference/bert-int/run_full_bert.py:46-64). A 100 TB ingestion
pipeline additionally needs true streaming ingest — these operators give
the engine that surface with *batch-parity semantics*: every streaming
query run with ``Trigger.AvailableNow`` over a static source produces
byte-identical results to its batch-SQL equivalent, which is how the
DuckDB oracle verifies them.
"""
