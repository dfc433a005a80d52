"""DataFrame operators. Everything here takes and returns DataFrames so
Catalyst/AQE owns physical planning; no RDDs anywhere."""
