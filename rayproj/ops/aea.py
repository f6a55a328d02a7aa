"""Placeholder — operators added incrementally."""
