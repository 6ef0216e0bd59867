"""Subpackage: similarity."""
