"""Multi-chip parallelism: device meshes, sharded training steps, and
instance-axis (sequence-parallel) attention for giant bags."""
