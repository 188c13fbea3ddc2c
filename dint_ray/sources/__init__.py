"""External source formats (ds2i binary collections, query logs)."""
