"""Structured Streaming re-expression of the real-time QPE daemon
(SURVEY §2.9, §7 Phase 5)."""
