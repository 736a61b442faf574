"""End-to-end pipeline compositions, the query registry, and the query layer."""
