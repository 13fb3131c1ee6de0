"""Luhn-validated credit-card detection (`functions/quality.with_ccn_signals`):
checksum semantics, separator handling, lookalike rejection, conditional
redaction — plus a DuckDB replay of the sequence→transform→aggregate fold."""

from __future__ import annotations

import duckdb
import pytest

from edspdf_spark.functions.quality import with_ccn_signals

VALID_16 = "4532015112830366"          # passes Luhn
VALID_SEP = "4532 0151 1283 0366"      # same PAN, spaced
VALID_AMEX = "378282246310005"         # 15-digit
INVALID_16 = "4532015112830367"        # last digit off by one

ROWS = [
    ("d0", f"pay with {VALID_16} today"),
    ("d1", f"pay with {VALID_SEP} or {VALID_AMEX}"),
    ("d2", f"order #{INVALID_16} is not a card"),
    ("d3", "digits 1234 5678 too short, and 12345678901234567890 too long"),
    ("d4", "no digits at all"),
]


def _luhn_py(d: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(d)):
        v = int(ch)
        if i % 2 == 1:
            v *= 2
            if v > 9:
                v -= 9
        total += v
    return total % 10 == 0


@pytest.fixture(scope="module")
def ccn_rows(spark):
    df = spark.createDataFrame(ROWS, "id string, text string")
    return {r["id"]: r.asDict() for r in with_ccn_signals(df).collect()}


def test_sanity_fixtures():
    assert _luhn_py(VALID_16) and _luhn_py(VALID_AMEX)
    assert not _luhn_py(INVALID_16)


def test_counts(ccn_rows):
    assert ccn_rows["d0"]["pii_ccn_count"] == 1
    assert ccn_rows["d1"]["pii_ccn_count"] == 2   # spaced PAN + amex
    assert ccn_rows["d2"]["pii_ccn_count"] == 0   # fails checksum
    assert ccn_rows["d3"]["pii_ccn_count"] == 0   # length window
    assert ccn_rows["d4"]["pii_ccn_count"] == 0


def test_redaction_is_conditional(ccn_rows):
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert ccn_rows["d0"]["ccn_redacted_md5"] == md5("pay with <CCN> today")
    assert ccn_rows["d1"]["ccn_redacted_md5"] == md5("pay with <CCN> or <CCN>")
    # the Luhn-invalid lookalike must be left untouched
    assert ccn_rows["d2"]["ccn_redacted_md5"] == md5(ROWS[2][1])
    assert ccn_rows["d3"]["ccn_redacted_md5"] == md5(ROWS[3][1])


def test_duckdb_differential(ccn_rows):
    """DuckDB replays candidate extraction + Luhn fold + conditional
    replace with list_transform/list_filter/list_reduce."""
    con = duckdb.connect()
    for rid, text in ROWS:
        got = con.execute(
            r"""
            WITH cand AS (
              SELECT list_transform(
                       regexp_extract_all($t, '\b(?:\d[ \-]?){12,18}\d\b'),
                       c -> struct_pack(raw := c,
                                        digits := regexp_replace(c, '[ \-]', '', 'g'))
                     ) AS pairs
            ),
            valid AS (
              SELECT list_filter(pairs, p ->
                       len(p.digits) BETWEEN 13 AND 19 AND
                       list_reduce(
                         list_transform(generate_series(1, len(p.digits)),
                           i -> CASE WHEN i % 2 = 0 THEN
                                  CASE WHEN (ascii(substr(reverse(p.digits), i, 1)) - 48) * 2 > 9
                                       THEN (ascii(substr(reverse(p.digits), i, 1)) - 48) * 2 - 9
                                       ELSE (ascii(substr(reverse(p.digits), i, 1)) - 48) * 2 END
                                ELSE ascii(substr(reverse(p.digits), i, 1)) - 48 END),
                         (a, b) -> a + b) % 10 = 0
                     ) AS v FROM cand
            )
            SELECT len(v),
                   md5(list_reduce(list_prepend($t, list_transform(v, p -> p.raw)),
                                   (acc, r) -> replace(acc, r, '<CCN>')))
            FROM valid
            """,
            {"t": text},
        ).fetchone()
        assert got[0] == ccn_rows[rid]["pii_ccn_count"], rid
        assert got[1] == ccn_rows[rid]["ccn_redacted_md5"], rid
