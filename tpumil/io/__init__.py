"""Checkpoint and config I/O: torch .pth-compatible import/export, typed configs."""
