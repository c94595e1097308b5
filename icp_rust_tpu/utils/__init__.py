"""Host-side utilities: scan IO, the f64 oracle, metrics, checkpointing."""
