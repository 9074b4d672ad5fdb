"""Lineage manifests, resumable execution, metrics aggregation."""
