"""Model cores: DSMIL dual-stream aggregator, ABMIL alternative, ResNet embedders."""
