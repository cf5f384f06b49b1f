"""Low-level TPU ops: shape tables, geometry, rasterization, clustering."""
