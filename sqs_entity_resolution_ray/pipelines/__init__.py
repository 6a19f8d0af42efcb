"""End-to-end pipelines (the reference's consumer/redoer/exporter units)."""
