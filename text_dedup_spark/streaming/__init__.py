from .incremental import (  # noqa: F401
    streaming_band_rows,
    streaming_exact_dedup,
    streaming_minhash_signatures,
)
from .stateful import (  # noqa: F401
    collapse_near_dup_flags,
    streaming_simhash_near_dup,
)
