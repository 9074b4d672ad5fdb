"""Composed pipelines: flagship KG construction, relational library, eval."""
