"""Data layer: task formats, token-budget batching, delay-pattern collation."""
