"""Structured Streaming execution: the engine's sink-connector role.

The reference's MorphlineSinkTask consumes Kafka batches with per-put
transaction notifications and failure-drop semantics
(MorphlineSinkTask.java:129-149).  Here the same pipeline transforms run
unchanged over a streaming DataFrame; micro-batches play the role of `put`
batches, checkpointing replaces commit/rollback notifications, and failed
records route to a quarantine (DLQ) sink instead of being silently dropped.
"""
