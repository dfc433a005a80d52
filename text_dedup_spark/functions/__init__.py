"""Vectorized UDFs (Arrow-batched pandas UDFs) and Catalyst expression
builders. No per-row Python UDFs anywhere (north rule)."""
