"""Spatial-join + tiling layer (north rule, SURVEY.md §2.5/M6).

New engine-side design (no reference equivalent): hierarchical cell
encoding, web-mercator tile assignment, point-in-polygon against an
actor-held index, and kNN via per-batch partial top-k + small merge.
"""
