"""PII detection/scrub (operators/pii.py): per-kind counts, scrub
completeness, placeholder form, cross-kind non-interference."""

from pyspark.sql import functions as F

from feathr_online_spark.operators.pii import (
    luhn_valid,
    pii_counts,
    scrub_pii,
    with_pii_scrubbed,
    write_pii_fixture,
)


def test_luhn_valid_known_numbers(spark):
    """Industry test numbers are Luhn-valid; a single-digit perturbation is
    not; separators are ignored; non-card lengths are rejected."""
    rows = [
        (1, "4111-1111-1111-1111", True),    # classic Visa test number
        (2, "4111 1111 1111 1112", False),   # check digit off by one
        (3, "5500-0000-0000-0004", True),    # MC test number
        (4, "378282246310005", True),        # Amex (15 digits, no separators)
        (5, "1234", False),                  # too short
        (6, "", False),
    ]
    df = spark.createDataFrame(rows, "id long, s string, want boolean")
    got = {r.id: r.ok for r in df.select("id", luhn_valid(F.col("s")).alias("ok")).collect()}
    for rid, _s, want in rows:
        assert got[rid] == want, (rid, _s, got[rid])


def test_counts_and_scrub_golden(spark):
    rows = [
        (1, "mail me at alice.smith+x@sub.example.org or bob@ex.io thanks"),
        (2, "call (555) 123-4567 or 555.987.6543 from 192.168.1.100"),
        (3, "ssn 123-45-6789 card 4111-1111-1111-1111 ok"),
        (4, "no pii here just words and the number 42"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    c = pii_counts(F.col("text"))
    got = {r.id: (r.e, r.p, r.i, r.s, r.c) for r in df.select(
        "id", c["email"].alias("e"), c["phone"].alias("p"),
        c["ipv4"].alias("i"), c["ssn"].alias("s"), c["cc"].alias("c")).collect()}
    assert got[1] == (2, 0, 0, 0, 0)
    assert got[2] == (0, 2, 1, 0, 0)
    assert got[3] == (0, 0, 0, 1, 1)
    assert got[4] == (0, 0, 0, 0, 0)

    scrubbed = {r.id: r.s for r in df.select("id", scrub_pii(F.col("text")).alias("s")).collect()}
    assert scrubbed[1] == "mail me at <EMAIL> or <EMAIL> thanks"
    assert "<PHONE>" in scrubbed[2] and "<IPV4>" in scrubbed[2]
    assert "<SSN>" in scrubbed[3] and "<CC>" in scrubbed[3]
    assert scrubbed[4] == rows[3][1]
    # residual: scrubbing leaves nothing any detector still matches
    rc = pii_counts(scrub_pii(F.col("text")))
    residual = df.select(sum(rc.values(), F.lit(0).cast("long")).alias("r")) \
        .agg(F.sum("r")).collect()[0][0]
    assert residual == 0


def test_with_pii_scrubbed_columns(spark):
    df = spark.createDataFrame([(1, "x@y.io calls (555) 123-4567")], "id long, text string")
    out = with_pii_scrubbed(df, "text", out_col="clean", count_prefix="pii_")
    r = out.collect()[0]
    assert r.pii_email == 1 and r.pii_phone == 1
    assert r.text.startswith("x@y.io")          # original kept
    assert r.clean == "<EMAIL> calls <PHONE>"


def test_fixture_expected_counts(spark, tmp_path):
    """The planted fixture's counts are exact integer functions of n."""
    p = str(tmp_path / "pii.parquet")
    write_pii_fixture(p, n=120)
    df = spark.read.parquet(p)
    c = pii_counts(F.col("text"))
    r = df.agg(F.sum(c["email"]).alias("e"), F.sum(c["phone"]).alias("p"),
               F.sum(c["ipv4"]).alias("i"), F.sum(c["ssn"]).alias("s"),
               F.sum(c["cc"]).alias("cc"),
               F.sum(c["cc_luhn_valid"]).alias("lv")).collect()[0]
    # i ranges over [0, 120): multiples of k number ceil(120/k)
    assert (r.e, r.p, r.i, r.s, r.cc, r.lv) == (
        120 // 3, 120 // 4, 120 // 5, 120 // 6, 120 // 8, (120 + 15) // 16)
