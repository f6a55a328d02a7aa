"""Ray Data stage factories: vectorized per-batch UDFs over Arrow."""
