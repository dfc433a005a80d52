from .incremental import (  # noqa: F401
    streaming_band_rows,
    streaming_exact_dedup,
    streaming_minhash_signatures,
)
