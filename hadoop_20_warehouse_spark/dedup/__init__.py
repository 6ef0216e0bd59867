"""Subpackage: dedup."""
