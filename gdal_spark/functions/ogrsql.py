"""ExecuteSQL veneer — the reference's SQL entry points on Spark.

Reference lifecycle (SURVEY.md §3): ``GDALDataset::ExecuteSQL`` parses
OGR SQL into a swq_select tree and pull-executes it
(gcore/gdaldataset.cpp:7411-7705); the SQLite dialect registers ST_*
functions over virtual tables (ogr/ogrsf_frmts/sqlite/
ogrsqliteexecutesql.cpp:788).  Here Catalyst IS the
parser/planner/executor — the veneer just (a) registers layers as temp
views, (b) registers the ST_* function surface
(ogrsqlitesqlfunctions.cpp:1111-1240 names), and (c) maps the few OGR
SQL spellings Spark SQL writes differently.

Supported OGR SQL surface maps 1:1 onto Spark SQL: SELECT lists with
``*``/aliases, WHERE (=, <>, <=, >=, <, >, LIKE, ILIKE, IN, BETWEEN,
IS NULL, AND/OR/NOT), CONCAT/SUBSTR/CAST, summary aggregates
(MIN/MAX/COUNT/COUNT(DISTINCT)/SUM/AVG/STDDEV_*), DISTINCT, ORDER BY,
LIMIT/OFFSET, UNION ALL, JOIN..ON / LEFT JOIN..ON.  The OGR
pseudo-columns map to: FID → a bigint id column, OGR_GEOMETRY/geometry
→ the WKB column, OGR_GEOM_AREA → ST_Area(geom).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from gdal_spark.functions.st import register_st_functions

_REWRITES = [
    # OGR SQL spells remainder as %, LIKE escapes with ESCAPE — both
    # native in Spark SQL; the only spellings needing help:
    (re.compile(r"\bHSTORE_GET_VALUE\s*\(\s*([^,]+),", re.I),
     r"element_at(str_to_map(regexp_replace(\1, '[{}\"]', ''), ',', ':'),"),
    (re.compile(r"\bOGR_GEOM_AREA\b", re.I), "ST_Area(geom)"),
    (re.compile(r"\bOGR_GEOMETRY\b", re.I), "geom"),
    (re.compile(r"\bFID\b"), "fid"),
]


def execute_sql(
    spark: SparkSession, sql: str, layers: dict[str, DataFrame] | None = None
) -> DataFrame:
    """Run an OGR-SQL-dialect query: register ``layers`` as temp views,
    expose the ST_* surface, rewrite OGR spellings, hand to Catalyst."""
    register_st_functions(spark)
    for name, df in (layers or {}).items():
        df.createOrReplaceTempView(name)
    # OGR_STYLE pseudo-column (ogr/ogr_p.h:168-175 SPF_OGR_STYLE;
    # OGRFeature::GetStyleString): the layer's style string when the
    # layer carries one, NULL otherwise — resolved against the
    # registered layers, and aliased back to OGR_STYLE when it stands
    # bare in a select list so the output schema matches the reference
    style_expr = (
        "style" if any("style" in df.columns
                       for df in (layers or {}).values())
        else "CAST(NULL AS STRING)")

    def _style_sub(m):  # one pass — two chained subs would rewrite
        # the alias the first one just inserted
        tail = m.group(1) or ""
        if tail:
            return f"{style_expr} AS OGR_STYLE{tail}"
        return style_expr

    sql = re.sub(r"\bOGR_STYLE\b(\s*(?:,|FROM\b))?", _style_sub, sql,
                 flags=re.I)
    for pat, repl in _REWRITES:
        sql = pat.sub(repl, sql)
    return spark.sql(sql)
