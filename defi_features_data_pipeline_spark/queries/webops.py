"""URL/host canonicalization + host-level aggregation (r10 verdict
item 6) — the crawl-curation family every large-scale LLM data
pipeline runs BEFORE per-document passes (CommonCrawl/C4/RefinedWeb
lineage): dedup and filter by canonicalized URL, aggregate quality
signals per registrable domain, and gate documents on their host's
reputation.

The testdata has no URL column, so each gate SYNTHESIZES messy URLs
deterministically from ``documents`` columns — same discipline as the
PII/unicode gates: the synthesis is one shared SQL template rendered
into both engines, the CANONICAL target fields depend only on
``doc_id`` while the MESS knobs depend on ``doc_id + variant``, so a
doc's variants provably collapse to one canonical URL and the
canonicalizer (the operator under test) is what does the collapsing.

Canonicalization semantics (RFC 3986 §6.2 normalizations + the strips
crawl pipelines apply):
  - scheme and host lowercased; leading ``www.`` stripped
  - default port removed (``:80`` for http, ``:443`` for https);
    other ports kept
  - PATH percent-normalization: ``%XX`` decoded when the octet is an
    RFC 3986 UNRESERVED character (ALPHA / DIGIT / ``-._~``),
    otherwise kept with uppercase hex — one index-aware lambda over
    ``split(path, '%')``, zero UDFs
  - trailing slash stripped (except the root path); empty path → /
  - query: tracking params dropped (utm_*, gclid, fbclid, msclkid,
    igshid), remainder SORTED, empty → no ``?``
  - fragment dropped

Documented non-goals (stated so the contract is honest): userinfo
(``user@host``) is not stripped, query VALUES are not
percent-normalized (the synthesized params are unencoded), and
duplicate path slashes are kept — each would be one more expression in
the same chain.

Registrable domain: last two host labels, or last three when the
2-label suffix is in a small embedded public-suffix set (co.uk,
org.uk, com.au, co.jp) — the bounded-model stand-in for a full PSL
join; a deployment swaps in the PSL as a broadcast dim.

100 TB notes: everything here is JVM column arithmetic on the
documents scan (no shuffle until the rollup); the rollup is one
map-side-combinable groupBy on registrable_domain; the join-back is a
shuffle equi-join on the same key (domain cardinality is corpus-scaled
— crawl-scale is 10^7+ registrable domains — so it is deliberately NOT
broadcast; AQE's skew-join splitting handles mega-hosts).

Reference scope note: the reference pipeline (pandas + Athena SQL,
``src/pipelines/features``) has no web-curation surface; this family
extends the engine for training-data curation per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .core import _davg, davg_sql
from .extensions import _spread, _t

# ---------------------------------------------------------------------------
# shared messy-URL synthesis (one template, both dialects)
# ---------------------------------------------------------------------------

# {id}: doc id SQL expr; {v}: integer variant offset (mess knobs use
# ({id}+{v}) so variants of one doc share every canonical field);
# {str}: CAST target (STRING for Spark, VARCHAR for DuckDB).
_MESSY_URL_TMPL = """
CASE WHEN {id} % 4 <= 1
     THEN CASE ({id} + {v}) % 3 WHEN 0 THEN 'http' WHEN 1 THEN 'HTTP' ELSE 'HtTp' END
     ELSE CASE ({id} + {v}) % 3 WHEN 0 THEN 'https' WHEN 1 THEN 'HTTPS' ELSE 'HtTpS' END END
|| '://'
|| CASE ({id} + 1) % 6
     WHEN 0 THEN (CASE ({id} + {v}) % 2 WHEN 0 THEN 'news.' ELSE 'News.' END)
     WHEN 1 THEN (CASE ({id} + {v}) % 2 WHEN 0 THEN 'cdn.' ELSE 'CDN.' END)
     ELSE (CASE ({id} + {v}) % 3 WHEN 0 THEN '' WHEN 1 THEN 'www.' ELSE 'WWW.' END) END
|| CASE ({id} + {v}) % 2 WHEN 0 THEN upper(source) ELSE source END
|| CASE {id} % 3 WHEN 0 THEN (CASE ({id} + {v}) % 2 WHEN 0 THEN '-news' ELSE '-News' END) ELSE '' END
|| CASE {id} % 4
     WHEN 0 THEN (CASE ({id} + {v}) % 2 WHEN 0 THEN '.com' ELSE '.COM' END)
     WHEN 1 THEN (CASE ({id} + {v}) % 2 WHEN 0 THEN '.org' ELSE '.Org' END)
     WHEN 2 THEN (CASE ({id} + {v}) % 2 WHEN 0 THEN '.co.uk' ELSE '.co.UK' END)
     ELSE '.io' END
|| CASE WHEN {id} % 5 = 1 THEN ':8080'
        WHEN ({id} + {v}) % 4 = 0 AND {id} % 4 <= 1 THEN ':80'
        WHEN ({id} + {v}) % 4 = 0 THEN ':443'
        ELSE '' END
|| '/articles/' || CAST({id} % 23 AS {str}) || '/'
|| CASE ({id} + {v}) % 3 WHEN 0 THEN '~' WHEN 1 THEN '%7E' ELSE '%7e' END
|| 'user' || CAST({id} % 7 AS {str})
|| CASE WHEN {id} % 6 = 0
        THEN '/a' || (CASE ({id} + {v}) % 2 WHEN 0 THEN '%2F' ELSE '%2f' END) || 'b'
        ELSE '' END
|| CASE ({id} + {v}) % 2 WHEN 0 THEN '/' ELSE '' END
|| CASE WHEN {id} % 11 = 0 THEN ''
        WHEN {id} % 3 = 0 THEN
          CASE ({id} + {v}) % 3
            WHEN 0 THEN '?id=' || CAST({id} % 41 AS {str})
            WHEN 1 THEN '?utm_source=feed&id=' || CAST({id} % 41 AS {str})
            ELSE '?id=' || CAST({id} % 41 AS {str}) || '&fbclid=x9' END
        ELSE
          CASE ({id} + {v}) % 3
            WHEN 0 THEN '?id=' || CAST({id} % 41 AS {str}) || '&lang=' || lang
            WHEN 1 THEN '?lang=' || lang || '&gclid=g7&id=' || CAST({id} % 41 AS {str})
            ELSE '?msclkid=m1&id=' || CAST({id} % 41 AS {str}) || '&lang=' || lang END END
|| CASE ({id} + {v}) % 4 WHEN 0 THEN '#section-2' ELSE '' END
"""


def messy_url_spark(variant: int, id_expr: str = "doc_id") -> str:
    return _MESSY_URL_TMPL.format(id=id_expr, v=variant, str="STRING")


def messy_url_duck(variant: int, id_expr: str = "doc_id") -> str:
    return _MESSY_URL_TMPL.format(id=id_expr, v=variant, str="VARCHAR")


# ---------------------------------------------------------------------------
# canonicalizer — pure column expressions, mirrored per dialect
# ---------------------------------------------------------------------------

TRACKING_FILTER_SQL = (
    "p -> p <> '' AND NOT (substr(p, 1, 4) = 'utm_'"
    " OR substr(p, 1, 6) = 'gclid='"
    " OR substr(p, 1, 7) = 'fbclid='"
    " OR substr(p, 1, 8) = 'msclkid='"
    " OR substr(p, 1, 7) = 'igshid=')"
)

# index-aware percent-normalization of a path expression. Element 0 of
# split(path,'%') is literal text; every later element starts with the
# 2 hex digits of one %XX triplet. Decode when the octet is ASCII
# (hex <= '7E' — 2-digit uppercase hex compares like the number) AND
# the char is RFC 3986 unreserved; otherwise keep %XX with upper hex.
# Malformed tails (too short / non-hex) are passed through untouched.
_PCT_SPARK = (
    "array_join(transform(split({x}, '%'), (x, i) -> CASE"
    " WHEN i = 0 THEN x"
    " WHEN length(x) < 2 OR NOT (upper(substr(x, 1, 2)) RLIKE '^[0-9A-F]{{2}}$')"
    "   THEN '%' || x"
    " WHEN upper(substr(x, 1, 2)) <= '7E'"
    "   AND decode(unhex(upper(substr(x, 1, 2))), 'UTF-8') RLIKE '^[A-Za-z0-9._~-]$'"
    "   THEN decode(unhex(upper(substr(x, 1, 2))), 'UTF-8') || substr(x, 3)"
    " ELSE '%' || upper(substr(x, 1, 2)) || substr(x, 3) END), '')"
)

# DuckDB list lambdas index from 1, Spark transform from 0
_PCT_DUCK = (
    "array_to_string(list_transform(str_split({x}, '%'), (x, i) -> CASE"
    " WHEN i = 1 THEN x"
    " WHEN length(x) < 2 OR NOT regexp_matches(upper(substr(x, 1, 2)), '^[0-9A-F]{{2}}$')"
    "   THEN '%' || x"
    " WHEN upper(substr(x, 1, 2)) <= '7E'"
    "   AND regexp_matches(decode(from_hex(upper(substr(x, 1, 2)))), '^[A-Za-z0-9._~-]$')"
    "   THEN decode(from_hex(upper(substr(x, 1, 2)))) || substr(x, 3)"
    " ELSE '%' || upper(substr(x, 1, 2)) || substr(x, 3) END), '')"
)

# two-step on the Spark side (params array first, CASE second): the
# one-expression form inlines the filter TWICE and, combined with the
# rest of the chain, pushed url_canonicalize's single-Project codegen
# method past janino's 64 KB hard cap — interpreted fallback, ~4x wall
_QPARAMS_SPARK = "array_sort(filter(split({q}, '&'), {flt}))"
_QCANON_SPARK = (
    "CASE WHEN size({p}) = 0 THEN ''"
    " ELSE '?' || array_join({p}, '&') END"
)
_QCANON_DUCK = (
    "CASE WHEN len(list_filter(str_split({q}, '&'), {flt})) = 0 THEN ''"
    " ELSE '?' || array_to_string(list_sort(list_filter(str_split({q}, '&'), {flt})), '&') END"
)

# 2-label public suffixes that push the registrable domain to 3 labels
_SUFFIX2 = "('co.uk', 'org.uk', 'com.au', 'co.jp')"

# {l} is a pre-split label-array column (same codegen-size rationale
# as _QPARAMS_SPARK: the one-expression form re-split the host 7x)
_REG_SPARK = (
    "CASE WHEN size({l}) <= 1 THEN {h}"
    " WHEN size({l}) >= 3"
    "  AND element_at({l}, -2) || '.' || element_at({l}, -1)"
    f"  IN {_SUFFIX2}"
    " THEN element_at({l}, -3) || '.'"
    "  || element_at({l}, -2) || '.' || element_at({l}, -1)"
    " ELSE element_at({l}, -2) || '.' || element_at({l}, -1) END"
)
_REG_DUCK = (
    "CASE WHEN len(str_split({h}, '.')) <= 1 THEN {h}"
    " WHEN len(str_split({h}, '.')) >= 3"
    "  AND str_split({h}, '.')[-2] || '.' || str_split({h}, '.')[-1]"
    f"  IN {_SUFFIX2}"
    " THEN str_split({h}, '.')[-3] || '.' || str_split({h}, '.')[-2] || '.' || str_split({h}, '.')[-1]"
    " ELSE str_split({h}, '.')[-2] || '.' || str_split({h}, '.')[-1] END"
)


def with_canonical_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``canon_url``, ``host``, ``registrable_domain`` to a frame
    with a URL column — the whole chain is Catalyst-collapsible column
    arithmetic (one projection, WholeStageCodegen, no UDFs)."""
    flt = TRACKING_FILTER_SQL
    return (
        df.withColumn("__nofrag", F.expr(f"split_part({url_col}, '#', 1)"))
        .withColumn("__scheme", F.expr("lower(split_part(__nofrag, '://', 1))"))
        .withColumn(
            "__rest",
            F.expr("substr(__nofrag, length(split_part(__nofrag, '://', 1)) + 4)"),
        )
        .withColumn("__auth", F.expr("lower(split_part(__rest, '/', 1))"))
        .withColumn("__pathq", F.expr("substr(__rest, length(__auth) + 1)"))
        .withColumn("__host0", F.expr("split_part(__auth, ':', 1)"))
        .withColumn(
            "__port",
            F.expr(
                "CASE WHEN instr(__auth, ':') > 0"
                " THEN substr(__auth, instr(__auth, ':') + 1) ELSE '' END"
            ),
        )
        .withColumn(
            "host",
            F.expr(
                "CASE WHEN __host0 LIKE 'www.%' THEN substr(__host0, 5)"
                " ELSE __host0 END"
            ),
        )
        .withColumn(
            "__portc",
            F.expr(
                "CASE WHEN __port = '' OR (__scheme = 'http' AND __port = '80')"
                " OR (__scheme = 'https' AND __port = '443')"
                " THEN '' ELSE ':' || __port END"
            ),
        )
        .withColumn(
            "__path0",
            F.expr(
                "CASE WHEN instr(__pathq, '?') > 0"
                " THEN substr(__pathq, 1, instr(__pathq, '?') - 1)"
                " ELSE __pathq END"
            ),
        )
        .withColumn(
            "__query0",
            F.expr(
                "CASE WHEN instr(__pathq, '?') > 0"
                " THEN substr(__pathq, instr(__pathq, '?') + 1) ELSE '' END"
            ),
        )
        .withColumn("__path1", F.expr(_PCT_SPARK.format(x="__path0")))
        .withColumn(
            "__pathc",
            F.expr(
                "CASE WHEN __path1 = '' THEN '/'"
                " WHEN length(__path1) > 1"
                "  AND substr(__path1, length(__path1), 1) = '/'"
                " THEN substr(__path1, 1, length(__path1) - 1)"
                " ELSE __path1 END"
            ),
        )
        .withColumn(
            "__qparams", F.expr(_QPARAMS_SPARK.format(q="__query0", flt=flt))
        )
        .withColumn("__qc", F.expr(_QCANON_SPARK.format(p="__qparams")))
        .withColumn(
            "canon_url",
            F.expr("__scheme || '://' || host || __portc || __pathc || __qc"),
        )
        .withColumn("__labels", F.expr("split(host, '\\\\.')"))
        .withColumn(
            "registrable_domain",
            F.expr(_REG_SPARK.format(h="host", l="__labels")),
        )
        .drop(
            "__nofrag", "__scheme", "__rest", "__auth", "__pathq", "__host0",
            "__port", "__portc", "__path0", "__query0", "__path1", "__pathc",
            "__qparams", "__qc", "__labels",
        )
    )


def _canon_cte_duck(raw_select: str) -> str:
    """DuckDB CTE chain mirroring with_canonical_url over ``raw``
    (must yield columns ending in ``url``; keeps every raw column)."""
    flt = TRACKING_FILTER_SQL
    return f"""
WITH raw AS ({raw_select}),
p1 AS (SELECT *, split_part(url, '#', 1) AS nofrag FROM raw),
p2 AS (SELECT *, lower(split_part(nofrag, '://', 1)) AS scheme,
              substr(nofrag, length(split_part(nofrag, '://', 1)) + 4) AS rest
       FROM p1),
p3 AS (SELECT *, lower(split_part(rest, '/', 1)) AS auth,
              substr(rest, length(split_part(rest, '/', 1)) + 1) AS pathq
       FROM p2),
p4 AS (SELECT *, split_part(auth, ':', 1) AS host0,
              CASE WHEN instr(auth, ':') > 0
                   THEN substr(auth, instr(auth, ':') + 1) ELSE '' END AS port
       FROM p3),
p5 AS (SELECT *,
              CASE WHEN host0 LIKE 'www.%' THEN substr(host0, 5) ELSE host0 END AS host,
              CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                   OR (scheme = 'https' AND port = '443')
                   THEN '' ELSE ':' || port END AS portc,
              CASE WHEN instr(pathq, '?') > 0
                   THEN substr(pathq, 1, instr(pathq, '?') - 1) ELSE pathq END AS path0,
              CASE WHEN instr(pathq, '?') > 0
                   THEN substr(pathq, instr(pathq, '?') + 1) ELSE '' END AS query0
       FROM p4),
p6 AS (SELECT *, {_PCT_DUCK.format(x='path0')} AS path1 FROM p5),
p7 AS (SELECT *,
              CASE WHEN path1 = '' THEN '/'
                   WHEN length(path1) > 1 AND substr(path1, length(path1), 1) = '/'
                   THEN substr(path1, 1, length(path1) - 1)
                   ELSE path1 END AS pathc,
              {_QCANON_DUCK.format(q='query0', flt=flt)} AS qc
       FROM p6),
canon AS (SELECT *, scheme || '://' || host || portc || pathc || qc AS canon_url,
                 {_REG_DUCK.format(h='host')} AS registrable_domain
          FROM p7)
"""


# ---------------------------------------------------------------------------
# gates
# ---------------------------------------------------------------------------


def _docs_with_url(spark, sf_dir) -> DataFrame:
    d = _spread(spark, _t(spark, sf_dir, "documents")).select(
        "doc_id", "source", "lang", "n_chars"
    )
    return d.withColumn("url", F.expr(messy_url_spark(0)))


def q_url_canonicalize(spark, sf_dir):
    """URL CANONICALIZATION: messy crawl URL → canonical form + host +
    registrable domain. Map-only column arithmetic — at 100 TB this is
    a projection fused into the scan (WholeStageCodegen, zero
    shuffles, zero UDFs)."""
    return with_canonical_url(_docs_with_url(spark, sf_dir)).select(
        "doc_id", "url", "canon_url", "host", "registrable_domain"
    )


ORACLE_URL_CANONICALIZE = (
    _canon_cte_duck(
        "SELECT doc_id, "
        + messy_url_duck(0)
        + " AS url FROM documents"
    )
    + "SELECT doc_id, url, canon_url, host, registrable_domain FROM canon"
)


def q_url_dedup_canonical(spark, sf_dir):
    """CANONICAL-URL DEDUP: each doc arrives via 3 differently-messy
    raw URLs (mirror/syndication simulation); group by canonical form.
    n_raw = 3 x n_docs on every row proves the collapse. One groupBy
    shuffle on canon_url — at 100 TB the canonical string is the dedup
    key exactly as in CommonCrawl index dedup."""
    d = _spread(spark, _t(spark, sf_dir, "documents")).select(
        "doc_id", "source", "lang"
    )
    raw = d.select(
        "doc_id",
        F.explode(
            F.array(
                F.expr(messy_url_spark(0)),
                F.expr(messy_url_spark(1)),
                F.expr(messy_url_spark(2)),
            )
        ).alias("url"),
    )
    return (
        with_canonical_url(raw)
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("keeper_doc"),
            F.min("url").alias("min_url"),
        )
    )


ORACLE_URL_DEDUP = (
    _canon_cte_duck(
        "SELECT doc_id, unnest(["
        + messy_url_duck(0)
        + ", "
        + messy_url_duck(1)
        + ", "
        + messy_url_duck(2)
        + "]) AS url FROM documents"
    )
    + """
SELECT canon_url,
       count(*) AS n_raw,
       count(DISTINCT doc_id) AS n_docs,
       min(doc_id) AS keeper_doc,
       min(url) AS min_url
FROM canon GROUP BY canon_url
"""
)


# host-reputation rule: enough documents to judge, and an average
# quality proxy above the bar. The proxy (chars capped at 400) is
# integer per doc, averaged through DECIMAL(38,10) so both engines
# land on the same double (core.py module doc).
_MIN_DOCS = 10
_MIN_AVG_QUALITY = 280.0


def _host_rollup(spark, sf_dir) -> DataFrame:
    per_doc = with_canonical_url(_docs_with_url(spark, sf_dir))
    return per_doc.groupBy("registrable_domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("host").alias("n_hosts"),
        F.countDistinct("canon_url").alias("n_urls"),
        _davg(F.least(F.col("n_chars"), F.lit(400))).alias("avg_quality"),
    ).withColumn(
        "keep",
        (F.col("n_docs") >= _MIN_DOCS)
        & (F.col("avg_quality") >= _MIN_AVG_QUALITY),
    )


def q_host_reputation_rollup(spark, sf_dir):
    """HOST REPUTATION ROLLUP: per-registrable-domain doc counts,
    distinct hosts/URLs, decimal-exact average quality proxy, and the
    keep decision. One map-side-combinable groupBy — the domain
    relation is corpus-scaled (10^7+ at crawl scale), so downstream
    joins stay shuffle joins, never broadcasts."""
    return _host_rollup(spark, sf_dir)


_ROLLUP_DUCK_BODY = f"""
SELECT registrable_domain,
       count(*) AS n_docs,
       count(DISTINCT host) AS n_hosts,
       count(DISTINCT canon_url) AS n_urls,
       {davg_sql('least(n_chars, 400)')} AS avg_quality
FROM canon GROUP BY registrable_domain
"""

ORACLE_HOST_ROLLUP = (
    _canon_cte_duck(
        "SELECT doc_id, source, lang, n_chars, "
        + messy_url_duck(0)
        + " AS url FROM documents"
    )
    + f""", rollup_agg AS ({_ROLLUP_DUCK_BODY})
SELECT *, n_docs >= {_MIN_DOCS} AND avg_quality >= {_MIN_AVG_QUALITY} AS keep
FROM rollup_agg
"""
)


def q_host_filtered_docs(spark, sf_dir):
    """HOST-REPUTATION FILTER: docs joined back against the domains
    that pass the rollup rule — the pre-pass a crawl pipeline runs
    before any per-document scoring.

    Plan shape: ONE repartition(registrable_domain) exchange feeds
    BOTH the rollup aggregate and the join's doc side — ReuseExchange
    dedups the identical subtrees, so the canonicalization chain runs
    ONCE and the post-shuffle stages (agg, join) carry none of it.
    Two reasons over the naive rollup-then-join composition: (a) the
    per-doc rows must shuffle on registrable_domain for the join
    anyway, so pre-partitioning costs nothing extra while saving the
    rollup's second canonicalization pass + its separate agg exchange;
    (b) fusing the full canon chain into a partial-HashAggregate stage
    pushed the generated hashAgg method past janino's 64 KB cap
    (interpreted fallback, measured ~3x wall). AQE skew-split handles
    mega-hosts; the rollup side is corpus-scaled so never broadcast."""
    # host-only extraction: this gate's keep rule reads n_docs +
    # avg_quality, so the heavy path/query normalization is dead code
    # on this path — registrable_domain derives from the authority
    # alone (oracle-identical; the full chain's stage also blew the
    # 64 KB codegen method cap when fused here)
    per_doc = (
        _docs_with_url(spark, sf_dir)
        .withColumn("__auth", F.expr(
            "lower(split_part(split_part(split_part(url, '#', 1),"
            " '://', 2), '/', 1))"
        ))
        .withColumn("__host0", F.expr("split_part(__auth, ':', 1)"))
        .withColumn("host", F.expr(
            "CASE WHEN __host0 LIKE 'www.%' THEN substr(__host0, 5)"
            " ELSE __host0 END"
        ))
        .withColumn("__labels", F.expr("split(host, '\\\\.')"))
        .withColumn(
            "registrable_domain",
            F.expr(_REG_SPARK.format(h="host", l="__labels")),
        )
        .select(
            "doc_id",
            "registrable_domain",
            F.least(F.col("n_chars"), F.lit(400)).alias("__quality"),
        )
    )
    part = per_doc.repartition(F.col("registrable_domain"))
    good = (
        part.groupBy("registrable_domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            _davg(F.col("__quality")).alias("avg_quality"),
        )
        .filter(
            (F.col("n_docs") >= _MIN_DOCS)
            & (F.col("avg_quality") >= _MIN_AVG_QUALITY)
        )
        .select("registrable_domain")
    )
    # null-safe equi-join, deliberately: an inner equi-join makes
    # Catalyst infer isnotnull(registrable_domain) and push it below
    # the exchange, SUBSTITUTING the whole synthesis+derivation
    # expression into one Filter whose generated method blows the
    # janino 64 KB cap (measured: interpreted fallback). The key is
    # never null (non-null string concat), so <=> is semantically
    # identical and keeps every stage inside codegen.
    docs_side = part.select("doc_id", "registrable_domain")
    return docs_side.join(
        good,
        docs_side["registrable_domain"].eqNullSafe(
            good["registrable_domain"]
        ),
    ).select(docs_side["doc_id"], docs_side["registrable_domain"])


ORACLE_HOST_FILTERED = (
    _canon_cte_duck(
        "SELECT doc_id, source, lang, n_chars, "
        + messy_url_duck(0)
        + " AS url FROM documents"
    )
    + f""", rollup_agg AS ({_ROLLUP_DUCK_BODY}),
good AS (
  SELECT registrable_domain FROM rollup_agg
  WHERE n_docs >= {_MIN_DOCS} AND avg_quality >= {_MIN_AVG_QUALITY}
)
SELECT c.doc_id, c.registrable_domain
FROM canon c JOIN good g USING (registrable_domain)
"""
)


WEBOPS_QUERIES = {
    "url_canonicalize": q_url_canonicalize,
    "url_dedup_canonical": q_url_dedup_canonical,
    "host_reputation_rollup": q_host_reputation_rollup,
    "host_filtered_docs": q_host_filtered_docs,
}
WEBOPS_ORACLES = {
    "url_canonicalize": ORACLE_URL_CANONICALIZE,
    "url_dedup_canonical": ORACLE_URL_DEDUP,
    "host_reputation_rollup": ORACLE_HOST_ROLLUP,
    "host_filtered_docs": ORACLE_HOST_FILTERED,
}


# ---------------------------------------------------------------------------
# streaming twin: ingest-time canonical-URL dedup
# ---------------------------------------------------------------------------


def q_streaming_url_dedup(spark, sf_dir):
    """STREAMING CANONICAL-URL DEDUP — the ingest-path twin of
    ``url_dedup_canonical`` and THE crawl-frontier pattern: mirrors/
    syndicated copies of a page arrive over time as differently-messy
    raw URLs; each micro-batch canonicalizes its arrivals and flags
    every arrival whose canonical form was already seen — an earlier
    batch via the accumulated canonical-URL store, earlier in-batch
    via min-arrival firsts — then appends its UNSEEN canonical URLs to
    the store. Arrivals are ordered (arrival = doc_id*3 + variant;
    batches partitioned by arrival range), so the final per-arrival
    verdict must equal the batch semantics exactly ("canonical URL
    first held by a smaller arrival") — the gate's oracle is that
    batch SQL, proving the incremental state transition lossless, the
    same discipline as the novelty/winnowed gates.

    100 TB notes: state is ONE ROW PER DISTINCT CANONICAL URL — the
    minimal exact dedup ledger (what a crawl frontier keeps anyway);
    per-batch work is one anti-join + one semi-join against the store
    plus an in-batch min rollup; per-batch appended-state counts land
    in STREAM_STATE_METRICS; the store is append-only per-batch
    partitions (overwrite = idempotent replay)."""
    import glob as _glob
    import os as _os
    import tempfile
    import time as _time

    src = tempfile.mkdtemp(prefix="stream_url_src_")
    seen_store = tempfile.mkdtemp(prefix="stream_url_seen_")
    out_store = tempfile.mkdtemp(prefix="stream_url_out_")

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    arrivals = d.select(
        "doc_id",
        F.posexplode(
            F.array(
                F.expr(messy_url_spark(0)),
                F.expr(messy_url_spark(1)),
                F.expr(messy_url_spark(2)),
            )
        ).alias("variant", "url"),
    ).withColumn("arrival", F.col("doc_id") * 3 + F.col("variant"))
    arrivals.repartitionByRange(4, F.col("arrival")).write.mode(
        "overwrite"
    ).parquet(src)
    # file-source trigger order = (mtime, path); restamp so batches
    # arrive in arrival-range order (partition id == arrival range
    # under repartitionByRange) — the precondition of min-arrival logic
    base = int(_time.time()) + 10
    for i, p in enumerate(sorted(_glob.glob(_os.path.join(src, "part-*")))):
        _os.utime(p, (base + i, base + i))
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    from .extensions import STREAM_STATE_METRICS, timed_foreach

    STREAM_STATE_METRICS["streaming_url_dedup"] = []

    def score_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        sel = (
            with_canonical_url(batch_df)
            .select("doc_id", "variant", "arrival", "canon_url")
            .localCheckpoint(eager=True)  # one canonicalize, three uses
        )
        seen_dirs = [
            p for p in _os.listdir(seen_store) if p.startswith("dq_batch=")
        ]
        if seen_dirs:
            seen = (
                spark.read.option("basePath", seen_store)
                .parquet(_os.path.join(seen_store, "dq_batch=*"))
                .select("canon_url")
            )
            in_store = sel.join(seen, "canon_url", "left_semi").withColumn(
                "__prior", F.lit(True)
            )
        else:
            seen = None
            in_store = sel.limit(0).withColumn("__prior", F.lit(True))
        firsts = sel.groupBy("canon_url").agg(
            F.min("arrival").alias("first_arrival")
        )
        verdicts = (
            sel.join(firsts, "canon_url")
            .join(
                in_store.select("arrival", "canon_url", "__prior"),
                ["arrival", "canon_url"],
                "left",
            )
            .select(
                "doc_id",
                "variant",
                (
                    F.coalesce(F.col("__prior"), F.lit(False))
                    | (F.col("first_arrival") < F.col("arrival"))
                ).alias("is_dup"),
            )
        )
        verdicts.write.mode("overwrite").parquet(
            _os.path.join(out_store, f"dq_batch={batch_id}")
        )
        fresh = sel.select("canon_url").distinct()
        if seen is not None:
            fresh = fresh.join(seen, "canon_url", "left_anti")
        seen_dir = _os.path.join(seen_store, f"dq_batch={batch_id}")
        fresh.write.mode("overwrite").parquet(seen_dir)
        STREAM_STATE_METRICS["streaming_url_dedup"].append(
            {
                "batch": int(batch_id),
                "arrivals": int(batch_df.count()),
                "state_rows_appended": int(
                    spark.read.parquet(seen_dir).count()
                ),
            }
        )

    q = (
        stream.writeStream.foreachBatch(
            timed_foreach("streaming_url_dedup", score_batch)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.option("basePath", out_store)
        .parquet(_os.path.join(out_store, "dq_batch=*"))
        .select("doc_id", "variant", "is_dup")
    )


_ARRIVALS_DUCK = " UNION ALL ".join(
    f"SELECT doc_id, {v} AS variant, doc_id * 3 + {v} AS arrival, "
    + messy_url_duck(v)
    + " AS url FROM documents"
    for v in (0, 1, 2)
)

# lossless incremental state transition: the BATCH semantics, verbatim
ORACLE_STREAMING_URL_DEDUP = (
    _canon_cte_duck(_ARRIVALS_DUCK)
    + """
, firsts AS (
  SELECT canon_url, min(arrival) AS first_arrival FROM canon
  GROUP BY canon_url
)
SELECT c.doc_id, c.variant, c.arrival > f.first_arrival AS is_dup
FROM canon c JOIN firsts f USING (canon_url)
"""
)

WEBOPS_QUERIES["streaming_url_dedup"] = q_streaming_url_dedup
WEBOPS_ORACLES["streaming_url_dedup"] = ORACLE_STREAMING_URL_DEDUP
