"""PII detection + redaction (operators/pii.py)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from batch_import_spark.operators.pii import PII_PATTERNS, redact_pii


def test_hand_cases(spark):
    df = spark.createDataFrame(
        [
            (0, "mail alice.b+x@sub.example.org now"),
            (1, "call (415) 555-0133 or 415-555-0134"),
            (2, "host 10.0.255.3 down"),
            (3, "ssn 123-45-6789."),
            (4, "a@b.co and 1.2.3.4 and 987-65-4321 and 212-555-0100"),
            (5, "nothing here 12345"),
            (6, None),
        ],
        "doc_id: long, text: string",
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert (out[0].n_email, out[0].redacted) == (1, "mail <EMAIL> now")
    assert out[1].n_phone == 2
    assert out[1].redacted == "call <PHONE> or <PHONE>"
    assert (out[2].n_ipv4, out[2].redacted) == (1, "host <IP> down")
    assert (out[3].n_ssn, out[3].redacted) == (1, "ssn <SSN>.")
    r4 = out[4]
    assert (r4.n_email, r4.n_ipv4, r4.n_ssn, r4.n_phone, r4.n_pii) == (
        1, 1, 1, 1, 4,
    )
    assert r4.redacted == "<EMAIL> and <IP> and <SSN> and <PHONE>"
    assert (out[5].n_pii, out[5].redacted) == (0, "nothing here 12345")
    assert (out[6].n_pii, out[6].redacted) == (0, None)


def test_phone_boundary_cases(spark):
    """The phone pattern is start-anchored with explicitly paired
    parens: the tail of a longer digit run must NOT match, and an
    unpaired '(' must never be consumed into the match."""
    df = spark.createDataFrame(
        [
            (0, "id 1234-567-8901 is not a phone"),
            (1, "call (415 555 1234 now"),
            (2, "call (415) 555 1234 now"),
        ],
        "doc_id: long, text: string",
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    # suffix of a 4-digit-led run: no match at all
    assert out[0].n_phone == 0
    assert out[0].redacted == "id 1234-567-8901 is not a phone"
    # unpaired '(': the bare digit form still matches, paren left out
    assert out[1].n_phone == 1
    assert out[1].redacted == "call (<PHONE> now"
    # properly paired parens: whole thing matches
    assert out[2].n_phone == 1
    assert out[2].redacted == "call <PHONE> now"


def test_zero_false_negatives_on_planted_corpus(spark):
    """Every planted PII string in the registry fixture is detected,
    and the redacted output contains no residual pattern match."""
    import __spark_entry__ as entry

    out = entry.queries()["pii_redact"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        mod = r.doc_id % 7
        if mod == 0:
            assert r.n_email >= 1
        elif mod == 1:
            assert r.n_phone >= 1
        elif mod == 2:
            assert r.n_ipv4 >= 1
        elif mod == 3:
            assert r.n_ssn >= 1
        elif mod == 4:
            assert r.n_email >= 1 and r.n_phone >= 1
        for _, pattern, _ in PII_PATTERNS:
            assert not re.search(pattern, r.redacted or ""), (
                r.doc_id,
                r.redacted,
            )


def test_placeholders_inert_to_later_patterns(spark):
    """An earlier redaction can never create a later match (the
    placeholder tokens are digit-free)."""
    df = spark.createDataFrame(
        [(0, "x@y.io 555-123-4567")], "doc_id: long, text: string"
    )
    r = redact_pii(df).collect()[0]
    assert (r.n_email, r.n_phone) == (1, 1)
    assert r.redacted == "<EMAIL> <PHONE>"
