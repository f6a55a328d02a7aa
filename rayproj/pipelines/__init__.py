"""End-to-end pipelines: flagship spatial-join + tiling, lineage."""
