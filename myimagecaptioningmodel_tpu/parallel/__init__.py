"""Parallelism: device mesh, sharding rules, the pjit'd train/decode steps."""
