"""HTML → text extraction: byte-identity per url (the north rule's
per-row invariant) plus the pinned entity-unescape order."""

import pandas as pd

from gdal_spark.functions.html import extract_text_pdf


def test_entity_order_amp_last():
    s = pd.Series([b"&amp;lt; stays escaped, &lt; unescapes, &#39;q&#39;"])
    out = extract_text_pdf(s).iloc[0]
    assert out == "&lt; stays escaped, < unescapes, 'q'"


def test_tag_strip_with_attributes():
    s = pd.Series([b'<html><body class="c7" data-x="1"><p>hello world</p></body></html>'])
    assert extract_text_pdf(s).iloc[0] == "hello world"


def test_byte_identity_on_synth_corpus(spark):
    from gdal_spark.functions.html import with_extracted_text
    from gdal_spark.sources.pages import synth_pages
    import pyspark.sql.functions as F

    pages = synth_pages(spark, 5000, 4)
    ext = with_extracted_text(pages)
    bad = ext.filter(F.col("text_extracted") != F.col("text")).count()
    assert bad == 0
    # and the invariant is per-URL byte identity: same url always maps
    # to the same extracted bytes across independent syntheses
    again = with_extracted_text(synth_pages(spark, 5000, 8)).select(
        "url", F.col("text_extracted").alias("t2")
    )
    joined = ext.select("url", "text_extracted").join(again, "url")
    assert joined.filter(F.col("text_extracted") != F.col("t2")).count() == 0
