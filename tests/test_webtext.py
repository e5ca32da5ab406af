from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.webtext import (
    extract_main_text,
    strip_html,
)


def _extract(spark, html: str) -> str:
    return (
        spark.createDataFrame([(1, html)], "doc_id long, html string")
        .select(strip_html(F.col("html")).alias("t"))
        .collect()[0]["t"]
    )


def test_scripts_styles_dropped_with_contents(spark):
    html = (
        "<p>keep</p><script>var a = '<p>not text</p>';</script>"
        "<STYLE media=all>p { color: red }</STYLE><p>also keep</p>"
    )
    assert _extract(spark, html) == "keep also keep"


def test_block_boundaries_become_spaces(spark):
    # without step 3, 'one' and 'two' would fuse into 'onetwo'
    assert _extract(spark, "<div>one</div><div>two</div>") == "one two"
    assert _extract(spark, "line<br>break") == "line break"


def test_entities_decoded_amp_last(spark):
    assert _extract(spark, "a &lt;b&gt; &quot;c&quot; &#39;d&#39;") == (
        "a <b> \"c\" 'd'"
    )
    # '&amp;lt;' is the ESCAPED text '&lt;' — decoding &amp; first
    # would double-decode it into a bare '<'; the chain must not
    assert _extract(spark, "x &amp;lt; y") == "x &lt; y"


def test_comments_and_whitespace_collapse(spark):
    html = "<p>a</p>\n\n<!-- nav\n menu -->\t<p>b</p>"
    assert _extract(spark, html) == "a b"


def test_encoding_stats_flags_damage(spark):
    from batch_processing_on_aws_spark.operators.webtext import (
        encoding_stats,
    )

    df = spark.createDataFrame(
        [
            (1, "clean ascii text"),
            (2, "bad � decode � here"),          # replacement chars
            (3, "ctrl\x00chars\x07inside"),                # C0 controls
            (4, "café résumé"),             # honest non-ASCII
            (5, "mojibake Ã© and â€™ artifacts"),          # double-decode
            (6, ""),                                        # empty: no div-by-0
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in encoding_stats(df).collect()}
    assert got[1]["replacement_ratio"] == 0.0
    assert got[1]["control_ratio"] == 0.0
    assert got[1]["mojibake_hits"] == 0
    assert got[2]["replacement_ratio"] > 0
    assert got[3]["control_ratio"] > 0
    assert got[4]["nonascii_ratio"] > 0 and got[4]["mojibake_hits"] == 0
    assert got[5]["mojibake_hits"] == 2
    assert got[6]["n_chars"] == 0 and got[6]["replacement_ratio"] == 0.0


def test_encoding_stats_tab_newline_not_control(spark):
    from batch_processing_on_aws_spark.operators.webtext import (
        encoding_stats,
    )

    df = spark.createDataFrame(
        [(1, "tabs\tand\nnewlines\rok")], "doc_id long, text string"
    )
    assert encoding_stats(df).collect()[0]["control_ratio"] == 0.0


def test_extract_main_text_density(spark):
    df = spark.createDataFrame(
        [(7, "<html><body><p>ten chars!</p></body></html>")],
        "doc_id long, html string",
    )
    row = extract_main_text(df).collect()[0]
    assert row["text"] == "ten chars!"
    assert row["text_len"] == 10
    assert row["html_len"] == len("<html><body><p>ten chars!</p></body></html>")
    assert 0 < row["text_density"] < 1
