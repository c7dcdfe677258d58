"""Text cleaning / PII redaction (operators/textclean.py)."""

from pyspark.sql import functions as F

from bi_utils_spark.operators import textclean as tc


def _one(spark, text, col):
    return (
        spark.createDataFrame([(text,)], ["text"])
        .select(col.alias("out"))
        .first()["out"]
    )


def test_redact_email_url(spark):
    out = _one(
        spark,
        "mail me at a.b+c@example.co.uk or see https://x.io/p?q=1 and www.y.de/z",
        tc.redact_pii("text"),
    )
    assert out == "mail me at <EMAIL> or see <URL> and <URL>"


def test_redact_phone_and_ip(spark):
    out = _one(
        spark,
        "call +49 (30) 123-4567 from 10.0.0.1 but not v1.2.3.4beta or id 12345678x",
        tc.redact_pii("text"),
    )
    assert "<PHONE>" in out
    assert "<IP>" in out
    assert "v1.2.3.4beta" in out          # embedded in a word: untouched
    assert "12345678x" in out             # digit run glued to a letter: untouched


def test_strip_markup_and_entities(spark):
    out = _one(
        spark,
        "<p>a &amp; b</p><br/>c &lt;tag&gt;",
        tc.normalize_whitespace(tc.strip_markup("text")),
    )
    assert out == 'a & b c <tag>'


def test_normalize_whitespace_and_control(spark):
    out = _one(spark, "  a\x00b\t\tc\n\n d  ", tc.normalize_whitespace("text"))
    assert out == "a b c d"


def test_clean_text_composes_one_projection(spark):
    df = spark.createDataFrame([("<b>Hi</b> a@b.com  now",)], ["text"])
    plan = df.select(tc.clean_text("text").alias("c"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan          # map-only: no shuffle anywhere
    assert df.select(tc.clean_text("text").alias("c")).first()["c"] == "Hi <EMAIL> now"


def test_pii_counts(spark):
    cnt = tc.pii_counts("text")
    row = (
        spark.createDataFrame([("a@b.co and c@d.org at https://e.f",)], ["text"])
        .select(*[v.alias(k) for k, v in cnt.items()])
        .first()
    )
    assert row["n_emails"] == 2
    assert row["n_urls"] == 1
    assert row["n_phones"] == 0
