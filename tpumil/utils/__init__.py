"""Utilities: platform selection, profiling counters, logging."""
