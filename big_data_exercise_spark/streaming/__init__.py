"""Structured Streaming layer — the reference's core architecture
(Kafka → micro-batch transforms → foreachBatch sink) re-expressed with
event-time semantics the reference lacked (watermarks, windows,
streaming dedup).
"""
