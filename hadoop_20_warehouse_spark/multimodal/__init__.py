"""Subpackage: multimodal."""
