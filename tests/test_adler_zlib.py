"""q557's Adler-32 formula pinned against the REAL zlib on the real
testdata: the closed-form aggregation A = 1 + sum(b), B = n +
sum((n-i)*b_i) (mod 65521) and the adler32_combine identity must
reproduce zlib.adler32 byte-for-byte on every document prefix the
query hashes.  Reference semantics: zlib RFC 1950 §2.3 (the
reference repo consumes it via its /vsigzip/ stack, port/cpl_vsil_gzip.cpp)."""
import zlib

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
M = 65521


@pytest.fixture(scope="module")
def docs():
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).df()


def test_texts_are_ascii(docs):
    # the ascii(substr(..)) == byte assumption q557 relies on
    for t in docs.text:
        assert t and all(ord(c) < 128 for c in t)


def test_closed_form_matches_zlib(docs):
    for t in docs.text:
        data = t[:96].encode()
        n = len(data)
        a = (1 + sum(data)) % M
        b = (n + sum((n - i) * data[i] for i in range(n))) % M
        assert (b << 16) | a == zlib.adler32(data)


def test_combine_identity_matches_zlib(docs):
    for t in docs.text:
        data = t[:96].encode()
        n = len(data)
        h = n // 2
        z1, z2 = zlib.adler32(data[:h]), zlib.adler32(data[h:])
        a1, b1 = z1 & 0xFFFF, z1 >> 16
        a2, b2 = z2 & 0xFFFF, z2 >> 16
        a = (a1 + a2 - 1 + M) % M
        b = (b1 + b2 + ((n - h) % M) * ((a1 - 1 + M) % M)) % M
        assert (b << 16) | a == zlib.adler32(data)


def test_oracle_per_doc_equals_zlib(docs):
    # the exact SQL text q557 aggregates, checked doc-by-doc vs zlib
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')")
    df = con.execute("""
        WITH idx AS (SELECT DISTINCT doc_id % 96 AS i FROM documents),
        db AS (SELECT doc_id, text, least(length(text), 96) AS n
               FROM documents),
        byt AS (SELECT d.doc_id, d.n, x.i,
                       CAST(ascii(substr(d.text, x.i + 1, 1)) AS BIGINT) AS c
                FROM db d JOIN idx x ON x.i < d.n)
        SELECT doc_id,
               ((n + sum((n - i) * c)) % 65521) * 65536
               + (1 + sum(c)) % 65521 AS adler
        FROM byt GROUP BY doc_id, n""").df()
    got = dict(zip(df.doc_id, df.adler))
    for r in docs.itertuples():
        assert got[r.doc_id] == zlib.adler32(r.text[:96].encode())
