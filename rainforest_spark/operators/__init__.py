"""Relational operator library (SURVEY §2.2-2.8)."""
