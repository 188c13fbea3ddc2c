"""Index layout, shard storage and build pipeline."""
