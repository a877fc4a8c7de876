"""Inference stages: batched feature extraction, bag inference, heatmaps."""
