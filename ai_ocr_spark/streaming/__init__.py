"""Structured Streaming ingest (incremental work discovery).

The reference's only streaming-ish construct is a Redis work queue
(redis_client.py:121-185); SURVEY.md §2.10 maps it to batch anti-join
resume OR, for incremental ingest, readStream + Trigger.AvailableNow —
implemented in streaming.ingest.
"""
