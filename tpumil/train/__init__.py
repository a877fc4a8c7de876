"""Training harnesses: compiled per-bag trainers, eval schemes, metrics."""
