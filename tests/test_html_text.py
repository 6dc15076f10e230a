"""HTML→clean-text extraction (operators/html_text): dual-path
agreement, reference-HTML fixtures, sludge tolerance, and the
quality family running downstream of the extractor."""

from __future__ import annotations

from pyspark.sql import functions as F

from product_etl_spark.operators.html_text import (
    extract_text_py,
    html_to_text,
    html_to_text_tolerant,
)

WELLFORMED = [
    # (html, expected)
    (
        "<html><head><title>T</title></head><body><p>hello "
        "world</p></body></html>",
        "T\nhello world",
    ),
    (
        "<p>a</p><p>b</p><div>c<br>d</div>",
        "a\nb\nc\nd",
    ),
    (
        "<ul><li>one</li><li>two</li></ul>",
        "one\ntwo",
    ),
    # inline tags break nothing; block tags break lines
    (
        "<p>x <b>bold</b> and <span>span</span> y</p>",
        "x bold and span y",
    ),
    # script/style/comment content never leaks
    (
        '<style>p { color: red; }</style><script type="text/js">if '
        '(1 < 2) { f("x&y"); }</script><!-- <p>ghost</p> --><p>kept</p>',
        "kept",
    ),
    # entities, incl. the double-escape order and nbsp
    (
        "<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; "
        "c&nbsp;d &amp;lt;literal&amp;gt;</p>",
        'a & b <tag> "q" \'s\' c d &lt;literal&gt;',
    ),
    # whitespace: runs collapse, one line per block, ends trimmed
    (
        "  <div>  a   b  </div>\n\n  <div>c</div>  ",
        "a b\nc",
    ),
    # stray '<' that is not a tag survives as text
    ("<p>1 < 2 and 3 > 2</p>", "1 < 2 and 3 > 2"),
    # doctype and self-closed br
    ("<!DOCTYPE html><p>a<br/>b</p>", "a\nb"),
]


def test_dual_paths_agree_on_wellformed(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(WELLFORMED)], "i long, h string"
    )
    rows = df.select(
        "i",
        html_to_text("h").alias("exact"),
        html_to_text_tolerant("h").alias("tolerant"),
    ).collect()
    for r in rows:
        want = WELLFORMED[r["i"]][1]
        assert r["exact"] == want, (r["i"], r["exact"], want)
        assert r["tolerant"] == want, (r["i"], r["tolerant"], want)


def test_null_in_null_out(spark):
    df = spark.createDataFrame([(1, None)], "i long, h string")
    r = df.select(
        html_to_text("h").alias("e"), html_to_text_tolerant("h").alias("t")
    ).collect()[0]
    assert r["e"] is None and r["t"] is None


def test_reference_details_html_fixture(spark):
    """The reference's own HTML surface (details_html,
    db_orchestrator.py:65-68 / 1_image_extractor_from_html.py:21-23):
    product markup with <img> tags — the text side keeps the visible
    description and drops the image markup entirely, while the
    existing enrichment img-URL extractor still harvests the URLs
    from the SAME column: the two consumers are complementary."""
    from product_etl_spark.pipelines.enrichment import _img_urls

    html = (
        '<div class="detail"><img src="https://img.example.com/a.jpg" />'
        "<p>Stainless&nbsp;steel water bottle &amp; cap</p>"
        '<img src="https://img.example.com/b.png"><span>500ml</span></div>'
    )
    df = spark.createDataFrame([(1, html)], "id long, details_html string")
    r = df.select(
        html_to_text("details_html").alias("text"),
        _img_urls(F.col("details_html")).alias("urls"),
    ).collect()[0]
    assert r["text"] == "Stainless steel water bottle & cap\n500ml"
    assert "img.example.com/a.jpg" in " ".join(r["urls"])
    assert "img.example.com/b.png" in " ".join(r["urls"])


def test_tolerant_path_handles_sludge(spark):
    """Malformed-input divergences are the tolerant path's contract:
    numeric charrefs decode, attribute values containing '>' don't
    truncate the tag, unclosed script swallows to EOF instead of
    leaking code."""
    rows = [
        # numeric character references (codegen path leaves these)
        (0, "<p>&#65;&#x42;</p>", "AB"),
        # '>' inside a quoted attribute value
        (1, '<p title="a > b">kept</p>', "kept"),
        # unclosed script: code must not leak into the text
        (2, "<p>before</p><script>var x = 1;", "before"),
        # interleaved misnesting
        (3, "<b><p>a</b> c</p>", "a c"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h, _ in rows], "i long, h string"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select(
            "i", html_to_text_tolerant("h").alias("t")
        ).collect()
    }
    for i, _, want in rows:
        assert got[i] == want, (i, got[i], want)
    # and the UDF kernel is the same function tests can call directly
    assert extract_text_py("<p>&#65;</p>") == "A"


def test_quality_family_downstream(spark):
    """The extraction feeds the quality family (the r14 verdict's
    point: Gopher flags assumed clean text 'from somewhere'): a
    120-word article in HTML passes the Gopher battery after
    extraction and a boilerplate page of repeated nav blocks flags
    high duplicate-trigram fraction — on the RAW html neither signal
    is readable (tag soup inflates symbols and dedups)."""
    from product_etl_spark.functions.text import (
        dup_ngram_fraction,
        gopher_quality_flags,
    )

    words = " ".join(
        f"alpha{i} bravo{i} charlie{i} delta{i} evening{i} foxtrot{i}"
        for i in range(20)
    )
    article = "<html><body><h1>Title here</h1><p>" + words + "</p></body></html>"
    nav = "<div><a href='/x'>home products about contact</a></div>"
    boiler = "<html><body>" + nav * 30 + "<p>one real sentence</p></body></html>"
    df = spark.createDataFrame(
        [(1, article), (2, boiler)], "id long, html string"
    )
    out = df.select(
        "id",
        gopher_quality_flags(html_to_text("html")).alias("g"),
        dup_ngram_fraction(html_to_text("html"), 3).alias("dup3"),
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["g"]["keep"] is True
    assert by_id[1]["dup3"] < 0.2
    # repeated nav text dominates the boilerplate page's trigrams
    assert by_id[2]["dup3"] > 0.8


def test_c4_line_filters_battery(spark):
    """Line-level C4 rules: min-word, terminal-punctuation and
    boilerplate-marker drops, trim-on-keep, and the counts
    surface; NULL text behaves as empty."""
    from product_etl_spark.functions.text import c4_line_filters

    text = (
        "This line is long enough to keep.\n"
        "too short\n"
        "This one mentions JavaScript cookies here.\n"
        "this line has no terminal punctuation at all\n"
        "   Indented but perfectly fine line!\n"
        "function() { return 1; }.\n"
    )
    df = spark.createDataFrame([(1, text), (2, None)], "i long, x string")
    out = {r["i"]: r["s"] for r in
           df.select("i", c4_line_filters("x").alias("s")).collect()}
    assert out[1]["text"] == (
        "This line is long enough to keep.\n"
        "Indented but perfectly fine line!"
    )
    assert out[1]["n_lines_kept"] == 2
    # trailing newline yields a final empty line in the split
    assert out[1]["n_lines"] == 7
    assert out[2]["text"] == "" and out[2]["n_lines_kept"] == 0
