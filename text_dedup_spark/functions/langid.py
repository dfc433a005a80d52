"""Language identification — character-n-gram profile heuristic.

A trigram-cosine language identifier (the classic Cavnar-Trenkle n-gram
approach) as an Arrow-batched pandas UDF, with script-range short circuits
for languages whose Unicode block is decisive (CJK, Kana, Hangul,
Cyrillic, Arabic, Devanagari, Greek, Hebrew, Thai). Profiles are built
from embedded marker text per language — intentionally compact: the
operator contract (schema, batching, determinism) is the point; swap the
profile table for a real fastText/CLD model on a cluster (the UDF body is
the only seam).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import StringType

_SAMPLES = {
    "en": "the quick brown fox jumps over the lazy dog and then it runs away with "
          "some of the other animals that were there in the field because they "
          "wanted to see what would happen next during the long afternoon",
    "de": "der schnelle braune fuchs springt über den faulen hund und dann läuft er "
          "weg mit einigen der anderen tiere die dort auf dem feld waren weil sie "
          "sehen wollten was als nächstes am langen nachmittag geschehen würde",
    "es": "el rápido zorro marrón salta sobre el perro perezoso y luego se escapa "
          "con algunos de los otros animales que estaban allí en el campo porque "
          "querían ver lo que pasaría después durante la larga tarde",
    "fr": "le rapide renard brun saute par dessus le chien paresseux et puis il "
          "s'enfuit avec certains des autres animaux qui étaient là dans le champ "
          "parce qu'ils voulaient voir ce qui se passerait ensuite pendant l'après midi",
    "it": "la rapida volpe marrone salta sopra il cane pigro e poi scappa via con "
          "alcuni degli altri animali che erano lì nel campo perché volevano vedere "
          "cosa sarebbe successo dopo durante il lungo pomeriggio",
    "pt": "a rápida raposa marrom pula sobre o cachorro preguiçoso e depois foge "
          "com alguns dos outros animais que estavam lá no campo porque queriam "
          "ver o que aconteceria em seguida durante a longa tarde",
    "nl": "de snelle bruine vos springt over de luie hond en rent daarna weg met "
          "enkele van de andere dieren die daar in het veld waren omdat ze wilden "
          "zien wat er daarna zou gebeuren tijdens de lange middag",
    "id": "rubah coklat yang cepat melompati anjing malas itu dan kemudian lari "
          "bersama beberapa hewan lain yang ada di ladang karena mereka ingin "
          "melihat apa yang akan terjadi selanjutnya sepanjang sore itu",
    "tr": "hızlı kahverengi tilki tembel köpeğin üzerinden atlar ve sonra tarladaki "
          "diğer hayvanlardan bazılarıyla birlikte kaçar çünkü uzun öğleden sonra "
          "ne olacağını görmek istiyorlardı",
    "pl": "szybki brązowy lis przeskakuje nad leniwym psem a potem ucieka z "
          "niektórymi innymi zwierzętami które były tam na polu ponieważ chciały "
          "zobaczyć co wydarzy się później podczas długiego popołudnia",
    "sv": "den snabba bruna räven hoppar över den lata hunden och springer sedan "
          "iväg med några av de andra djuren som var där på fältet eftersom de "
          "ville se vad som skulle hända härnäst under den långa eftermiddagen",
    "vi": "con cáo nâu nhanh nhẹn nhảy qua con chó lười biếng rồi chạy đi cùng "
          "một vài con vật khác ở ngoài đồng vì chúng muốn xem điều gì sẽ xảy ra "
          "tiếp theo trong suốt buổi chiều dài",
}

# decisive Unicode script ranges: (lang, lo, hi). Checked before profiles —
# a fifth of the characters in one of these blocks decides the language
# (or the script-level tag where one block serves many languages).
_SCRIPTS = [
    ("zh", 0x4E00, 0x9FFF),   # CJK unified ideographs
    ("ja", 0x3040, 0x30FF),   # Hiragana + Katakana
    ("ko", 0xAC00, 0xD7AF),   # Hangul syllables
    ("ru", 0x0400, 0x04FF),   # Cyrillic (script-level: ru/uk/bg/sr...)
    ("ar", 0x0600, 0x06FF),   # Arabic
    ("he", 0x0590, 0x05FF),   # Hebrew
    ("hi", 0x0900, 0x097F),   # Devanagari (hi/mr/ne...)
    ("el", 0x0370, 0x03FF),   # Greek
    ("th", 0x0E00, 0x0E7F),   # Thai
]


def _trigrams(text: str) -> Counter:
    t = f"  {text.lower()}  "
    return Counter(t[i : i + 3] for i in range(len(t) - 2))


_PROFILES = {lang: _trigrams(s) for lang, s in _SAMPLES.items()}
_PROFILE_NORMS = {
    lang: sum(v * v for v in prof.values()) ** 0.5 for lang, prof in _PROFILES.items()
}


def detect_language(text: str, min_score: float = 0.15) -> str:
    if not text or not text.strip():
        return "und"
    sample = text[:2000]  # profiles saturate quickly; bound per-row cost
    counts = Counter()
    for ch in sample:
        cp = ord(ch)
        for lang, lo, hi in _SCRIPTS:
            if lo <= cp <= hi:
                counts[lang] += 1
                break
    if counts:
        lang, n = counts.most_common(1)[0]
        if n > len(sample) * 0.2:
            return lang
    grams = _trigrams(sample)
    if not grams:
        return "und"
    best, best_score = "und", min_score
    norm_g = sum(v * v for v in grams.values()) ** 0.5
    for lang, prof in _PROFILES.items():
        dot = sum(v * prof.get(k, 0) for k, v in grams.items())
        score = dot / (norm_g * _PROFILE_NORMS[lang]) if norm_g else 0.0
        if score > best_score:
            best, best_score = lang, score
    return best


@pandas_udf(StringType())
def langid(texts: pd.Series) -> pd.Series:
    return pd.Series([detect_language(t if t is not None else "") for t in texts])
