"""Data layer: padded bag batching, feature stores, MIL benchmark parsers,
patch datasets, and slide tiling."""
