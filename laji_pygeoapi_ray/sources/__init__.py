"""Readers, writers, and the synthetic input-table generators."""
