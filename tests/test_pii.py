"""PII redaction vs a pure-Python re restatement."""

import re

from text_dedup_spark.operators.pii import PII_PATTERNS, redact_pii


def _oracle(text):
    counts = {}
    for name, pat, token in PII_PATTERNS:
        counts[f"n_{name}"] = len(re.findall(pat, text))
    red = text
    for name, pat, token in PII_PATTERNS:
        red = re.sub(pat, token, red)
    counts["n_pii"] = sum(counts.values())
    return red, counts


def test_redact_pii(spark):
    docs = [
        (1, "mail u7@ex-a.com or u8@ex.co.uk ip 10.0.0.250 end"),
        (2, "ssn 123-45-6789 call +1-555-0134 twice +1-555-0134"),
        (3, "clean text with numbers 12345 and dots 1.2 only"),
        (4, ""),
        (5, "edge 999.999.999.999 and version 1.2.3.4 both redact"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in redact_pii(df, "text", "doc_id").collect()}
    for did, text in docs:
        red, counts = _oracle(text)
        assert got[did]["text"] == red, did
        for k, v in counts.items():
            assert got[did][k] == v, (did, k)
    assert got[1]["text"] == "mail <EMAIL> or <EMAIL> ip <IP> end"
    assert got[2]["n_phone"] == 2 and got[2]["n_ssn"] == 1
    assert got[3]["n_pii"] == 0 and got[3]["text"] == docs[2][1]
