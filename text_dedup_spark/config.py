"""Pipeline configuration.

Defaults mirror the reference CLI (utils/add_args.py:83-93: ngram 5,
num_perm 256, threshold 0.7; SimHash: f=64, bit_diff 3, num_bucket 4,
char-ngram 3; suffix-array k=100). The fork's production config is
ngram 13 / num_perm 64 / threshold 0.8 (RunFullSet.sh:41).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .kernel.minhash import hash_ranges, optimal_param


@dataclass(frozen=True)
class MinHashConfig:
    ngram_size: int = 5
    num_perm: int = 256
    threshold: float = 0.7
    b: int | None = None
    r: int | None = None
    seed: int = 42

    def resolve(self) -> "MinHashConfig":
        """Fill (b, r) from optimal_param when not explicitly given
        (minhash_spark.py:304-310 honors explicit --b/--r)."""
        if self.b is not None and self.r is not None:
            return self
        b, r = optimal_param(self.threshold, self.num_perm)
        return MinHashConfig(self.ngram_size, self.num_perm, self.threshold, b, r, self.seed)

    @property
    def ranges(self):
        cfg = self.resolve()
        return hash_ranges(cfg.b, cfg.r)


@dataclass(frozen=True)
class SimHashConfig:
    f: int = 64
    bit_diff: int = 3
    num_bucket: int = 4
    ngram: int = 3


@dataclass(frozen=True)
class SuffixConfig:
    k: int = 100  # min duplicate byte length (utils/add_args.py:152-154)
    merge_strategy: str = "overlapping"
    global_scope: bool = False  # True => single-partition exact global pass
