"""Inference: single-image CLI, greedy + beam-search decoding."""
