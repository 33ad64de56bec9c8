"""String function family (SURVEY.md §2.8 fn_string).

One composite query covering the family; all expressions are JVM
built-ins inside whole-stage codegen — never Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


@query(
    "fn_string",
    oracle="""
        SELECT c_custkey,
               upper(c_name)                              AS name_upper,
               lower(c_mktsegment)                        AS seg_lower,
               trim(concat('  ', c_name, '  '))           AS name_trimmed,
               substring(c_name, 1, 8)                    AS name_prefix,
               concat_ws('|', c_name, c_mktsegment)       AS name_seg,
               length(c_name)                             AS name_len,
               replace(c_name, 'Customer', 'Cust')        AS name_short,
               lpad(CAST(c_custkey AS VARCHAR), 10, '0')  AS key_padded,
               regexp_extract(c_name, '([0-9]+)', 1)      AS name_digits,
               regexp_replace(c_name, '[0-9]', '#', 'g')  AS name_masked,
               CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END AS has_one
        FROM customer
    """,
    phase="P2",
    tags=("function", "string"),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/trim/substring/concat/length/replace/lpad/regexp."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias(
            "name_trimmed"
        ),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("name_seg"),
        F.length("c_name").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
            "name_short"
        ),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("name_masked"),
        F.when(F.col("c_name").like("%1%"), 1).otherwise(0).alias("has_one"),
    )


@query(
    "fn_split_explode",
    oracle="""
        SELECT p_partkey, unnest(string_split(p_type, ' ')) AS type_word
        FROM part
    """,
    phase="P3",
    tags=("function", "string", "explode"),
)
def fn_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode — one output row per word (UDTF-shaped)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.explode(F.split(F.col("p_type"), " ")).alias("type_word"),
    )


@query(
    "fn_regex",
    oracle=r"""
        SELECT c_custkey,
               CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS name_num,
               regexp_replace(c_name, '^Customer#0*', '') AS short_name,
               regexp_matches(c_name, '00$') AS ends_00
        FROM customer
        WHERE regexp_matches(c_name, '[0-9]{2}$')
    """,
    phase="P3",
    tags=("fn", "regex"),
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface: extract a capture group, strip a prefix, boolean
    match, and an rlike filter. Patterns are kept in the common subset
    of Java regex (Spark) and RE2 (DuckDB) — digit classes, anchors,
    bounded repetition — so both engines agree byte-for-byte. All four
    expressions evaluate inside whole-stage codegen on the scan."""
    c = load(spark, sf_dir, "customer")
    return c.filter(F.col("c_name").rlike("[0-9]{2}$")).select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1)
        .cast("bigint")
        .alias("name_num"),
        F.regexp_replace("c_name", "^Customer#0*", "").alias("short_name"),
        F.col("c_name").rlike("00$").alias("ends_00"),
    )


@query(
    "fn_fuzzy_match",
    oracle="""
        SELECT p_partkey, p_name,
               levenshtein(p_name, 'red widget') AS dist
        FROM part
        WHERE levenshtein(p_name, 'red widget') <= 4
    """,
    phase="P3",
    tags=("fn", "fuzzy", "text"),
)
def fn_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching by edit distance — the
    entity-resolution / typo-tolerant-lookup shape. levenshtein is
    integer-exact on both engines, so this gets a full value oracle;
    the filter evaluates in the scan stage. At 100 TB you'd block
    first (length band or first-char bucket) before pairwise edit
    distances — here the pattern side is a constant, so cost is one
    linear pass."""
    p = load(spark, sf_dir, "part")
    dist = F.levenshtein(F.col("p_name"), F.lit("red widget"))
    return (
        p.select("p_partkey", "p_name", dist.alias("dist"))
        .filter(F.col("dist") <= 4)
    )


@query(
    "fn_hash",
    oracle="""
        SELECT c_custkey,
               md5(c_name)    AS name_md5,
               sha256(c_name) AS name_sha256
        FROM customer
    """,
    phase="P3",
    tags=("fn", "hash"),
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digests over strings — the content-addressing
    primitives every dedup/caching layer keys on; byte-identical hex on
    both engines over the same UTF-8 input."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5(F.col("c_name").cast("binary")).alias("name_md5"),
        F.sha2(F.col("c_name").cast("binary"), 256).alias("name_sha256"),
    )


@query(
    "fn_url",
    oracle="""
        WITH urls AS (
            SELECT doc_id,
                   'https://www.' || source || '.org/docs/'
                     || CAST(doc_id AS VARCHAR) || '?lang=' || lang
                     || '&ref=home' AS url
            FROM documents
        )
        SELECT doc_id, url, host,
               regexp_extract(url, '^[a-z]+://[^/]+(/[^?#]*)', 1) AS path,
               regexp_extract(url, '[?&]lang=([^&#]+)', 1) AS lang_param,
               regexp_extract(host, '([^./]+\\.[^./]+)$',
                              1) AS reg_domain_tail,
               CASE WHEN url LIKE 'https://%' THEN 'https'
                    ELSE 'http' END AS scheme
        FROM (SELECT doc_id, url,
                     regexp_extract(url, '^https?://([^/]+)', 1) AS host
              FROM urls)
    """,
    phase="P2",
    tags=("function", "string", "url"),
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing family (parse_url-shaped): host / path / query-param
    / scheme extraction over deterministic synthesized URLs. Spark's
    native parse_url exists, but its quirks (null vs empty on missing
    parts) aren't portable, so both engines share the SAME regexes from
    the Java ∩ RE2 common subset (no lookarounds, no backrefs) — the
    pii_redact house rule. Map-only projection: codegen'd, scan-stage
    at any scale.

    reg_domain_tail anchors at end-of-host ONLY because these fixture
    URLs have no path ambiguity for the pattern; the honest general
    form extracts host first and then takes its last two labels."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://www."),
        F.col("source"),
        F.lit(".org/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&ref=home"),
    )
    host = F.regexp_extract("url", r"^https?://([^/]+)", 1)
    return (
        d.select("doc_id", url.alias("url"))
        .select(
            "doc_id",
            "url",
            host.alias("host"),
            F.regexp_extract("url", r"^[a-z]+://[^/]+(/[^?#]*)", 1).alias(
                "path"
            ),
            F.regexp_extract("url", r"[?&]lang=([^&#]+)", 1).alias(
                "lang_param"
            ),
            F.regexp_extract(host, r"([^./]+\.[^./]+)$", 1).alias(
                "reg_domain_tail"
            ),
            F.when(F.col("url").startswith("https://"), "https")
            .otherwise("http")
            .alias("scheme"),
        )
    )


@query(
    "fn_binary",
    oracle="""
        SELECT c_custkey,
               to_base64(CAST(c_name AS BLOB)) AS name_b64,
               CAST(decode(from_base64(to_base64(CAST(c_name AS BLOB))))
                    AS VARCHAR) AS name_roundtrip,
               lower(to_hex(CAST(c_name AS BLOB))) AS name_hex,
               CAST(octet_length(CAST(c_name AS BLOB)) AS BIGINT)
                 AS name_bytes
        FROM customer
    """,
    phase="P2",
    tags=("function", "binary", "encoding"),
)
def fn_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary/encoding function family: base64 encode + decode
    round-trip, hex rendering, byte length — the content-addressing
    and wire-format primitives (blob keys, payload envelopes). ASCII
    fixture names make string↔blob casts byte-exact in both engines
    (guarded by the multimodal ASCII fixture test). Map-only,
    codegen'd, scan-stage at any scale."""
    c = load(spark, sf_dir, "customer")
    blob = F.col("c_name").cast("binary")
    return c.select(
        "c_custkey",
        F.base64(blob).alias("name_b64"),
        F.unbase64(F.base64(blob)).cast("string").alias("name_roundtrip"),
        F.lower(F.hex(blob)).alias("name_hex"),
        F.octet_length("c_name").cast("bigint").alias("name_bytes"),
    )


@query(
    "fn_collate",
    oracle="""
        WITH variants AS (
            SELECT doc_id, source,
                   upper(substring(source, 1, 1))
                     || substring(source, 2) AS source_mixed
            FROM documents
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN source_mixed = source
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_binary_eq,
               CAST(sum(CASE WHEN lower(source_mixed) = lower(source)
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_collation_eq
        FROM variants
        GROUP BY source
        ORDER BY source
    """,
    phase="P2",
    tags=("function", "collation"),
)
def fn_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive comparison through Spark 4's COLLATION surface:
    a mixed-case variant of each source tag (initcapped first letter)
    compares unequal under binary semantics but EQUAL under the
    ``UTF8_LCASE`` collation — ``collate(a, 'UTF8_LCASE') = collate(b,
    'UTF8_LCASE')`` is the engine-native form (comparison, grouping,
    and joins all honor it; no lower() scattering through the query).
    The oracle expresses the same predicate with explicit lower() —
    exactly the rewrite collations exist to eliminate — so the
    collation path is value-verified against its manual twin.

    Scale: collation compares are scan-stage expressions inside
    codegen; a collated JOIN key at 100 TB hashes the collation key
    form, which is why engine-level collation beats wrapping every
    predicate in lower() (one canonical form, index/bucket friendly).
    """
    d = load(spark, sf_dir, "documents")
    variants = d.select(
        "doc_id",
        "source",
        F.concat(
            F.upper(F.substring("source", 1, 1)), F.expr("substring(source, 2)")
        ).alias("source_mixed"),
    )
    coll_eq = F.expr(
        "collate(source_mixed, 'UTF8_LCASE') = collate(source, 'UTF8_LCASE')"
    )
    return (
        variants.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("source_mixed") == F.col("source")).cast("bigint")).alias(
                "n_binary_eq"
            ),
            F.sum(coll_eq.cast("bigint")).alias("n_collation_eq"),
        )
        .orderBy("source")
    )


# RFC-4122 version-3 (name-based, md5) UUID formatting from a 32-hex
# digest, spelled once: version nibble forced to '3', variant nibble
# mapped into the 8/9/a/b range by its high two bits.
_UUID3 = (
    "substr({h}, 1, 8) || '-' || substr({h}, 9, 4) || '-3' ||"
    " substr({h}, 14, 3) || '-' ||"
    " CASE WHEN substr({h}, 17, 1) IN ('0','1','2','3') THEN '8'"
    "      WHEN substr({h}, 17, 1) IN ('4','5','6','7') THEN '9'"
    "      WHEN substr({h}, 17, 1) IN ('8','9','a','b') THEN 'a'"
    "      ELSE 'b' END ||"
    " substr({h}, 18, 3) || '-' || substr({h}, 21, 12)"
)


@query(
    "fn_uuid_name",
    oracle=f"""
        WITH minted AS (
            SELECT c_custkey,
                   {_UUID3.format(
                       h="md5('customer:' || CAST(c_custkey AS VARCHAR))"
                   )} AS entity_uuid
            FROM customer
        )
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT entity_uuid) AS BIGINT) AS n_distinct,
               min(entity_uuid) AS uuid_min,
               max(entity_uuid) AS uuid_max,
               CAST(sum(CASE WHEN entity_uuid LIKE
                    '________-____-3___-____-____________'
                    AND substr(entity_uuid, 20, 1) IN ('8','9','a','b')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_rfc_valid
        FROM minted
    """,
    phase="P2",
    tags=("function", "uuid", "identity"),
)
def fn_uuid_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Name-based (RFC-4122 version-3) UUID minting from natural keys
    — deterministic entity IDs for cross-system joins: the same
    'customer:<key>' name yields the SAME UUID on every run, engine,
    and table (unlike uuid()/rand-based IDs, banned here like RNG
    sampling; the string-keyed sibling of etl_surrogate_key_plan's
    dense integers).  The namespace prefix keeps customer:1 and
    supplier:1 distinct.  The audit row proves bijectivity (distinct
    = rows), RFC shape (version nibble 3, variant in 8/9/a/b), and
    pins the lexical envelope.

    Exactness: md5 hex is byte-identical cross-engine
    (sample_hash_consistent's rule) and the UUID is pure shared-
    spelling string surgery on it — scan-stage expressions, one
    combinable audit reduce.  At 100 TB, minting is map-only work
    with zero coordination — the entire point versus sequence-based
    IDs."""
    c = load(spark, sf_dir, "customer")
    minted = c.select(
        "c_custkey",
        F.expr(
            _UUID3.format(
                h="md5(cast('customer:' || CAST(c_custkey AS STRING) as binary))"
            )
        ).alias("entity_uuid"),
    )
    rfc_ok = F.col("entity_uuid").rlike(
        "^[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    )
    return minted.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("entity_uuid").cast("bigint").alias("n_distinct"),
        F.min("entity_uuid").alias("uuid_min"),
        F.max("entity_uuid").alias("uuid_max"),
        F.sum(F.when(rfc_ok, 1).otherwise(0))
        .cast("bigint")
        .alias("n_rfc_valid"),
    )
