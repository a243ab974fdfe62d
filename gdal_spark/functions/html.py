"""Deterministic HTML → text extraction (the north rule's per-row
invariant: extracted text must be byte-identical per url).

The extraction spec is pinned so that ANY engine can replay it
byte-for-byte (the DuckDB oracle does, q133):

  1. decode the raw bytes as UTF-8 (strict),
  2. drop every ``<...>`` tag: regex ``<[^>]*>`` replaced globally
     with the empty string (no nesting — '>' inside attribute values
     is out of contract, as it is for the reference's simple
     stripping paths),
  3. unescape exactly five pinned entities, in this order:
     ``&lt; &gt; &quot; &#39; &amp;`` (amp LAST, so double-escaped
     text stays single-escaped — the standard one-pass rule).

No whitespace collapsing: the synthesizer emits body text verbatim
inside the tags, and collapsing would destroy byte-identity for
pre-formatted content.  Vectorized end-to-end (pandas ``.str``
methods over the whole Arrow batch — never per-row Python).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TAG_RE = r"<[^>]*>"
# (entity, replacement) in pinned order — amp last
ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def extract_text_pdf(html: pd.Series) -> pd.Series:
    """The whole extraction spec over one Arrow batch."""
    s = html.map(lambda b: bytes(b).decode("utf-8"))
    s = s.str.replace(_TAG_RE, "", regex=True)
    for ent, rep in ENTITIES:
        s = s.str.replace(ent, rep, regex=False)
    return s


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    return extract_text_pdf(html)


def with_extracted_text(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """pages + ``text_extracted`` column; the byte-identity invariant is
    ``text_extracted == text`` for every url (tests/test_extract_text.py
    asserts it; q133 oracle-checks the spec replay itself)."""
    return pages.withColumn("text_extracted", extract_text(F.col(html_col)))
