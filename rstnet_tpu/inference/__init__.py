"""Inference: jitted streaming frame generation and offline/batch decoding."""
