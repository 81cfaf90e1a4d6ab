"""HTML -> text extraction semantics (the oracle gate checks the
fingerprint; these tests check the actual cleaned STRING on hand-built
pages, plus the plan claim)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apmbackend_spark.operators.webtext import (
    _strip_expr,
    html_strip,
    synth_html,
)


@pytest.fixture(autouse=True)
def _clean_cache(spark):
    spark.catalog.clearCache()
    yield


def _clean(spark, html: str) -> tuple[str, int, int]:
    df = spark.createDataFrame([(html,)], "html string")
    clean, n_tags, n_entities = _strip_expr(F.col("html"))
    row = df.select(
        clean.alias("c"), n_tags.alias("t"), n_entities.alias("e")
    ).first()
    return row["c"], row["t"], row["e"]


def test_basic_tag_strip_and_entity_decode(spark):
    c, t, e = _clean(
        spark, "<p>Tom &amp; Jerry say &quot;hi&quot; &gt; twice</p>"
    )
    assert c == 'Tom & Jerry say "hi" > twice'
    assert t == 2  # <p> </p>
    assert e == 4  # amp, 2x quot, gt


def test_script_body_with_angle_brackets_is_removed_whole(spark):
    # the '<' inside the script body must not derail the tag regex
    c, _, _ = _clean(
        spark,
        "<p>before</p><script>if (a < b && b > c) { x('<div>'); }</script>"
        "<p>after</p>",
    )
    assert c == "before after"


def test_style_block_removed_and_tags_become_spaces(spark):
    c, _, _ = _clean(
        spark, "<style>p{color:red}</style>word1<br>word2<b>word3</b>"
    )
    # tags turn into spaces: adjacent words never fuse
    assert c == "word1 word2 word3"


def test_amp_decoded_last_no_double_decode(spark):
    # '&amp;lt;' is the ESCAPED text '&lt;' — must decode to literal
    # '&lt;', never cascade to '<'
    c, _, _ = _clean(spark, "x &amp;lt; y")
    assert c == "x &lt; y"


def test_unknown_entity_passes_through(spark):
    c, _, _ = _clean(spark, "<p>&copy; 2026&nbsp;corp</p>")
    assert c == "&copy; 2026 corp"


def test_whitespace_collapse_and_trim(spark):
    c, _, _ = _clean(spark, "  <div>\n\n a \t b \n</div>  ")
    assert c == "a b"


def test_gate_shape_on_synth_pages(spark):
    docs = spark.createDataFrame(
        [(1, "alpha the beta", "en", "s0", 14)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    row = html_strip(synth_html(docs)).first()
    # boilerplate contributes a fixed tag count; ' the ' injection adds
    # <b></b>
    assert row["n_tags"] > 10
    assert row["n_entities"] == 7  # amp, gt, 2x quot, 2x #39, nbsp
    assert row["len_clean"] < row["len_html"]


def test_plan_is_single_stage_no_shuffle_no_python(spark):
    docs = spark.createDataFrame(
        [(1, "alpha the beta", "en", "s0", 14)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    p = html_strip(synth_html(docs))._sc._jvm.PythonSQLUtils.explainString(
        html_strip(synth_html(docs))._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in p
    # no Python evaluation nodes (the ExistingRDD scan is a test-input
    # artifact; the parquet-backed gate scans columnar files)
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in p
    assert "codegen id" in p  # the strip chain runs inside codegen


# ---------------------------------------------------------------------------
# property fuzz: the strip pipeline vs a pure-Python re-derivation


def _strip_reference(html: str) -> tuple[str, int, int]:
    import re as _re

    no_script = _re.sub(
        r"<(script|style)[^>]*>.*?</(script|style)>", " ", html, flags=_re.S
    )
    n_tags = len(_re.findall(r"<[^>]*>", no_script))
    no_tags = _re.sub(r"<[^>]*>", " ", no_script)
    n_entities = len(_re.findall(r"&(amp|lt|gt|quot|#39|nbsp);", no_tags))
    decoded = no_tags
    for ent, ch in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ):
        decoded = decoded.replace(ent, ch)
    clean = _re.sub(r"\s+", " ", decoded).strip()
    return clean, n_tags, n_entities


def test_html_strip_property_vs_python_reference(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    piece = st.sampled_from(
        [
            "word", " ", "  ", "\n", "<b>", "</b>", "<p class='x'>", "<br>",
            "&amp;", "&lt;", "&amp;lt;", "&nbsp;", "&copy;", "&#39;",
            "<script>var a = '<div>' && b < 9;</script>",
            "<style>p { x: '<'; }</style>",
            "<", ">", "&", "tail",
        ]
    )

    @settings(max_examples=15, deadline=None)
    @given(parts=st.lists(piece, min_size=0, max_size=12))
    def check(parts):
        html = "".join(parts)
        df = spark.createDataFrame([(html,)], "html string")
        from pyspark.sql import functions as F2

        clean, n_tags, n_entities = _strip_expr(F2.col("html"))
        row = df.select(
            clean.alias("c"), n_tags.alias("t"), n_entities.alias("e")
        ).first()
        want_c, want_t, want_e = _strip_reference(html)
        assert (row["c"], row["t"], row["e"]) == (want_c, want_t, want_e)

    check()
