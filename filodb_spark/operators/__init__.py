"""Large-scale training-data pipeline operators: dedup, similarity, text."""
