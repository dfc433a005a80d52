"""IO: session construction, table read/write, checkpoints, synthetic data."""
