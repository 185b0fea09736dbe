"""Structured Streaming surface (SURVEY §2.8).

The reference emulates streaming with a daily batch cron
(/root/reference/dags/quant_pipeline_dag.py:21); the engine provides the
real thing: file-source readStream over a landing zone, watermarked
tumbling-window bar building, stateful dedup, and idempotent foreachBatch
sinks."""
