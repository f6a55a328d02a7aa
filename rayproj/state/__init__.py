"""Stateful side-input models: shift grids, spatial indexes.

These are the objects held once-per-actor in Ray actor pools
(SURVEY.md §4): loaded in ``__init__``, applied vectorized per batch.
"""
