"""Training-data-pipeline operators: text analysis, dedup, similarity.

Each operator is a vectorized per-batch function designed for
``Dataset.map_batches`` (stateless) or a callable class for actor
pools (stateful setup in __init__).
"""
