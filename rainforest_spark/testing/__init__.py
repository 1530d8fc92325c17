"""Deterministic rainforest-shaped fixtures (FIXTURES.md)."""
