"""EXIF privacy UDFs over opaque JPEG binary columns — the image-side
twin of the text PII pass. Arrow-batched pandas UDFs wrapping the
pure-Python segment walk in ``sources/exif.py``; non-JPEG rows degrade to
neutral values / passthrough instead of failing the task (privacy scrub
runs over mixed-container corpora)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..sources.exif import parse_exif, strip_jpeg_metadata, strip_webp_metadata

EXIF_INFO = StructType(
    [
        StructField("has_exif", BooleanType()),
        StructField("has_gps", BooleanType()),
        StructField("orientation", IntegerType()),
        StructField("make", StringType()),
        StructField("exif_datetime", StringType()),
    ]
)


@pandas_udf(EXIF_INFO)
def exif_info(data: pd.Series) -> pd.DataFrame:
    rows = []
    for blob in data:
        try:
            m = parse_exif(bytes(blob))
        except ValueError:
            m = {"has_exif": False, "has_gps": False, "orientation": 0,
                 "make": None, "datetime": None}
        rows.append(
            {
                "has_exif": m["has_exif"],
                "has_gps": m["has_gps"],
                "orientation": m["orientation"],
                "make": m["make"],
                "exif_datetime": m["datetime"],
            }
        )
    return pd.DataFrame(rows, columns=[f.name for f in EXIF_INFO.fields])


@pandas_udf(BinaryType())
def strip_metadata(data: pd.Series) -> pd.Series:
    """Container-dispatched lossless metadata scrub: JPEG APPn/COM splice,
    WebP EXIF/XMP/ICCP chunk drop (pixel chunks byte-identical); other
    containers pass through untouched."""
    out = []
    for blob in data:
        b = bytes(blob)
        try:
            if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
                out.append(strip_webp_metadata(b))
            else:
                out.append(strip_jpeg_metadata(b))
        except ValueError:
            out.append(b)  # not a strippable container: passthrough
    return pd.Series(out)
