"""Language identification — character-n-gram profile heuristic.

A tiny trigram-cosine language identifier (the classic Cavnar-Trenkle
n-gram approach) as an Arrow-batched pandas UDF. Profiles are built from
embedded marker text per language — deliberately small: the operator
contract (schema, batching, determinism) is the point; swap the profile
table for a real fastText/CLD model on a cluster.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import StringType

_SAMPLES = {
    "en": "the quick brown fox jumps over the lazy dog and then it runs away with "
          "some of the other animals that were there in the field",
    "de": "der schnelle braune fuchs springt über den faulen hund und dann läuft er "
          "weg mit einigen der anderen tiere die dort auf dem feld waren",
    "es": "el rápido zorro marrón salta sobre el perro perezoso y luego se escapa "
          "con algunos de los otros animales que estaban allí en el campo",
    "fr": "le rapide renard brun saute par dessus le chien paresseux et puis il "
          "s'enfuit avec certains des autres animaux qui étaient là dans le champ",
}


def _trigrams(text: str) -> Counter:
    t = f"  {text.lower()}  "
    return Counter(t[i : i + 3] for i in range(len(t) - 2))


_PROFILES = {lang: _trigrams(s) for lang, s in _SAMPLES.items()}


def detect_language(text: str) -> str:
    if not text or not text.strip():
        return "und"
    # CJK short-circuit on unicode ranges
    cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
    if cjk > len(text) * 0.2:
        return "zh"
    grams = _trigrams(text)
    if not grams:
        return "und"
    best, best_score = "und", 0.0
    norm_g = sum(v * v for v in grams.values()) ** 0.5
    for lang, prof in _PROFILES.items():
        dot = sum(v * prof.get(k, 0) for k, v in grams.items())
        norm_p = sum(v * v for v in prof.values()) ** 0.5
        score = dot / (norm_g * norm_p) if norm_g and norm_p else 0.0
        if score > best_score:
            best, best_score = lang, score
    return best


@pandas_udf(StringType())
def langid(texts: pd.Series) -> pd.Series:
    return pd.Series([detect_language(t if t is not None else "") for t in texts])
