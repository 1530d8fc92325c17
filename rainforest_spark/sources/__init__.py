"""Scan / source / sink helpers (SURVEY §2.1)."""
