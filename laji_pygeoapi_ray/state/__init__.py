"""Broadcast side tables, deterministic polygon fixtures, checkpoint state."""
