"""Composed Dataset pipelines (the texrex/clarax/tender entry points)."""
