"""Reusable operator implementations behind the query registry."""
