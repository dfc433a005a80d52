"""End-to-end pipelines composing the operators."""

from .image_pipeline import ImageDedupResult, image_dedup, verify_fidelity  # noqa: F401
from .minhash_pipeline import MinHashDedupResult, minhash_dedup  # noqa: F401
from .staged import run_staged, stage_dedup, stage_hash, stage_remove  # noqa: F401
from .staged_image import (  # noqa: F401
    run_staged_image,
    stage_apply,
    stage_cluster,
    stage_features,
)
