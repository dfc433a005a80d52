import random

import pytest

from text_dedup_spark.sources.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(master="local[4]", app_name="tests", shuffle_partitions=4)
    yield s
    s.stop()


VOCAB = (
    "spark data table row group filter join sort merge hash scan query stream "
    "batch window small fast slow key value the a of and part line order customer"
).split()


def synth_corpus(n: int, seed: int = 42, dup_frac: float = 0.3):
    """Deterministic corpus with planted near/exact duplicates.

    Returns list of (id, text). Ids are assigned so clusters span the id
    space (not adjacent), exercising the CC min-propagation.
    """
    rng = random.Random(seed)
    texts = []
    for _ in range(n):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(8, 40))]
        texts.append(" ".join(words))
    n_dups = int(n * dup_frac)
    for i in range(n_dups):
        src = texts[rng.randrange(n)]
        kind = rng.random()
        if kind < 0.4:
            texts.append(src)  # exact duplicate
        elif kind < 0.8:
            words = src.split()
            k = max(1, len(words) // 12)  # light edit -> near duplicate
            for _ in range(k):
                words[rng.randrange(len(words))] = rng.choice(VOCAB)
            texts.append(" ".join(words))
        else:
            texts.append(src + " " + rng.choice(VOCAB))
    # a couple of degenerate short docs (all-MAX_HASH signature bucket)
    texts.extend(["one two", "three four", ""])
    ids = list(range(len(texts)))
    rng.shuffle(ids)
    return list(zip(ids, texts))
