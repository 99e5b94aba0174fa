"""§2.8 Scalar function packs — one composite query per family.

All expressions stay inside Catalyst/whole-stage-codegen (no Python UDFs);
the UDF surface lives in udfs.py by design.  Each family query covers every
function in its SURVEY row at once — the oracle hash checks all columns.

Dialect-parity notes learned by probing:
- Spark ``regexp_replace`` is global; DuckDB needs the ``'g'`` flag.
- Spark ``weekday()`` (0=Mon) == DuckDB ``isodow - 1``.
- Transcendentals (ln/log10/sqrt/pow) are bit-identical between JVM libm and
  DuckDB's on these inputs (verified by the exact-parity test).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..canon import epoch_s
from ..io import load_table
from ..registry import register


@register(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           lower(p_name)  AS name_lower,
           upper(p_brand) AS brand_upper,
           substring(p_name, 1, 5) AS name_head,
           trim(concat(' ', p_name, ' ')) AS name_trim,
           concat_ws('-', p_brand, p_type) AS brand_type,
           length(p_name) AS name_len,
           len(string_split(p_name, ' ')) AS n_words,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           lpad(p_brand, 10, '*') AS brand_pad,
           instr(p_name, 'e') AS e_pos
    FROM part
    """,
)
def fn_string(spark, sf_dir):
    """String family: lower/upper/substring/trim/concat/concat_ws/length/
    split/regexp_extract/regexp_replace/lpad/instr."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.lpad("p_brand", 10, "*").alias("brand_pad"),
        F.instr("p_name", "e").alias("e_pos"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)  AS o_year,
           month(o_orderdate) AS o_month,
           day(o_orderdate)   AS o_day,
           isodow(o_orderdate) - 1 AS o_weekday,
           CAST(floor(epoch(date_trunc('month', o_orderdate))) AS BIGINT) AS month_start,
           datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
           CAST(floor(epoch(o_orderdate + INTERVAL 3 DAY)) AS BIGINT) AS plus3d,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
    FROM orders
    """,
)
def fn_date(spark, sf_dir):
    """Date family: year/month/day/weekday/date_trunc/datediff/interval-add/
    last_day (timestamps emitted as epoch seconds or ISO strings)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("o_year"),
        F.month(d).alias("o_month"),
        F.dayofmonth(d).alias("o_day"),
        F.weekday(d).alias("o_weekday"),
        epoch_s(F.date_trunc("month", d), "month_start"),
        F.datediff(F.lit("1998-01-01").cast("date"), d.cast("date")).alias(
            "days_to_98"
        ),
        epoch_s(d + F.expr("INTERVAL 3 DAYS"), "plus3d"),
        F.date_format(F.last_day(d.cast("date")), "yyyy-MM-dd").alias("month_end"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(CAST(l_discount AS DECIMAL(18,2)) * 100, 0) AS BIGINT) AS disc_pct,
           abs(l_quantity - 25.0) AS qty_dev,
           CAST(ceil(l_quantity / 7.0) AS BIGINT)  AS qty_ceil7,
           CAST(floor(l_quantity / 7.0) AS BIGINT) AS qty_floor7,
           sqrt(l_quantity) AS qty_sqrt,
           pow(l_quantity, 2) AS qty_sq,
           CAST(CAST(ln(l_quantity) AS DECIMAL(18,6)) AS DOUBLE) AS qty_ln,
           CAST(CAST(log10(l_quantity) AS DECIMAL(18,6)) AS DOUBLE) AS qty_log10,
           ((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7 AS key_mod7,
           CAST(sign(l_quantity - 25.0) AS BIGINT) AS qty_sign,
           CAST(l_quantity AS BIGINT) AS qty_int
    FROM lineitem
    """,
)
def fn_math(spark, sf_dir):
    """Math family: round(decimal-exact)/abs/ceil/floor/sqrt/pow/ln/log10/
    pmod/sign + integral cast.  Rounding happens in DECIMAL (engines disagree
    on double rounding); pmod is spelled ((a%b)+b)%b in the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_discount").cast("decimal(18,2)") * 100, 0)
        .cast("long")
        .alias("disc_pct"),
        F.abs(q - 25.0).alias("qty_dev"),
        F.ceil(q / 7.0).alias("qty_ceil7"),
        F.floor(q / 7.0).alias("qty_floor7"),
        F.sqrt(q).alias("qty_sqrt"),
        F.pow(q, 2).alias("qty_sq"),
        # ln/log10 differ by 1 ulp between JVM and DuckDB libm; round via
        # DECIMAL(18,6) in both engines (boundary margin verified >=7e-4).
        F.log(q).cast("decimal(18,6)").cast("double").alias("qty_ln"),
        F.log10(q).cast("decimal(18,6)").cast("double").alias("qty_log10"),
        F.pmod(F.col("l_orderkey"), 7).alias("key_mod7"),
        F.signum(q - 25.0).cast("long").alias("qty_sign"),
        q.cast("long").alias("qty_int"),
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 35 THEN 'mid'
                ELSE 'high' END AS qty_band,
           coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
           least(l_extendedprice, 10000.0)    AS price_capped,
           greatest(l_quantity, 5.0)          AS qty_floor5,
           CASE WHEN l_tax IS NOT NULL THEN l_tax ELSE 0.0 END AS tax_nvl2
    FROM lineitem
    """,
)
def fn_conditional(spark, sf_dir):
    """Conditional family: CASE WHEN / coalesce / nullif / least / greatest /
    nvl2 (spelled as CASE in the oracle — DuckDB has no nvl2)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(q < 10, "low").when(q < 35, "mid").otherwise("high").alias("qty_band"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
        F.least("l_extendedprice", F.lit(10000.0)).alias("price_capped"),
        F.greatest("l_quantity", F.lit(5.0)).alias("qty_floor5"),
        F.nvl2("l_tax", F.col("l_tax"), F.lit(0.0)).alias("tax_nvl2"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding) AS n_dims,
           CAST(embedding[1] AS DOUBLE) AS e1,
           CAST(embedding[2] AS DOUBLE) AS e2,
           CAST(embedding[3] AS DOUBLE) AS e3,
           list_reduce(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                       (a, b) -> a + b) AS sq_norm,
           CAST(list_max(embedding) AS DOUBLE) AS e_max,
           len(list_filter(embedding, x -> x > 0)) AS n_pos
    FROM embeddings
    """,
)
def fn_array(spark, sf_dir):
    """Array family via Catalyst higher-order functions (no Python): size /
    element_at / aggregate / transform / filter / array_max.  Floats are cast
    to double inside the lambdas (FIXTURES.md Q5); both engines left-fold, so
    the accumulation is bit-identical."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")

    def sq(x):
        return x.cast("double") * x.cast("double")

    return e.select(
        "vec_id",
        F.size(emb).alias("n_dims"),
        F.element_at(emb, 1).cast("double").alias("e1"),
        F.element_at(emb, 2).cast("double").alias("e2"),
        F.element_at(emb, 3).cast("double").alias("e3"),
        F.aggregate(emb, F.lit(0.0), lambda a, x: a + sq(x)).alias("sq_norm"),
        F.array_max(emb).cast("double").alias("e_max"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
    )


@register(
    "fn_map",
    oracle="""
    SELECT event_id,
           event_type AS m_type,
           value      AS m_value,
           'bucket,type' AS m_keys,
           2 AS m_size
    FROM events
    """,
)
def fn_map(spark, sf_dir):
    """Map family: create_map / element_at / map_keys / size.  The map is
    built and consumed on the Spark side; the oracle checks the extracted
    scalars (DuckDB MAP literals canonicalize differently — SURVEY §2.8)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type").cast("string"),
        F.lit("bucket"), F.when(F.col("value") >= 50, "hi").otherwise("lo"),
    )
    mv = F.create_map(F.lit("v"), F.col("value"))
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("m_type"),
        F.element_at(mv, "v").alias("m_value"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("m_keys"),
        F.size(m).cast("int").alias("m_size"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_path,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_schema,
           CAST(json_extract_string(props, '$.missing') AS INT) AS k_missing
    FROM events
    """,
)
def fn_json(spark, sf_dir):
    """JSON family: get_json_object (path extraction) + from_json (schema'd
    parse) + missing-path null semantics, on events.props."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_path"),
        F.from_json("props", "k INT").getField("k").alias("k_schema"),
        F.get_json_object("props", "$.missing").cast("int").alias("k_missing"),
    )


@register(
    "fn_hash",
    oracle="""
    SELECT p_partkey,
           md5(p_name) AS h_md5,
           sha256(p_name) AS h_sha256,
           base64(encode(p_name)) AS b64,
           length(md5(p_name)) AS md5_len
    FROM part
    """,
)
def fn_hash(spark, sf_dir):
    """Hashing/encoding pack: md5, sha256, base64 — the content-addressing
    primitives behind dedup_exact and sink idempotency keys.  Hex/byte
    output verified identical across engines (engine-native hash()/xxhash
    are deliberately excluded: they differ by design)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("h_md5"),
        F.sha2("p_name", 256).alias("h_sha256"),
        F.base64(F.encode("p_name", "UTF-8")).alias("b64"),
        F.length(F.md5("p_name")).alias("md5_len"),
    )


@register(
    "fn_struct",
    oracle="""
    SELECT p_partkey,
           struct_pack(brand := p_brand, sz := p_size).brand AS s_brand,
           struct_pack(brand := p_brand, sz := p_size).sz + 1 AS s_size_plus,
           list_value(struct_pack(t := p_type, rp := p_retailprice),
                      struct_pack(t := upper(p_type), rp := p_retailprice * 2))[2].t
             AS arr_struct_t,
           list_value(struct_pack(t := p_type, rp := p_retailprice),
                      struct_pack(t := upper(p_type), rp := p_retailprice * 2))[2].rp
             AS arr_struct_rp
    FROM part
    """,
)
def fn_struct(spark, sf_dir):
    """Struct / nested-type pack: named-struct construction, field access,
    arithmetic on struct fields, and element_at into an array of structs —
    the column plumbing typed multimodal metadata rides on (mm_binary_meta
    stores codec/shape info exactly this way).  All Catalyst built-ins;
    nested access prunes to the touched fields at the scan."""
    p = load_table(spark, sf_dir, "part")
    s = F.struct(F.col("p_brand").alias("brand"), F.col("p_size").alias("sz"))
    arr = F.array(
        F.struct(F.col("p_type").alias("t"), F.col("p_retailprice").alias("rp")),
        F.struct(
            F.upper("p_type").alias("t"),
            (F.col("p_retailprice") * 2).alias("rp"),
        ),
    )
    return p.select(
        "p_partkey",
        s.getField("brand").alias("s_brand"),
        (s.getField("sz") + 1).alias("s_size_plus"),
        F.element_at(arr, 2).getField("t").alias("arr_struct_t"),
        F.element_at(arr, 2).getField("rp").alias("arr_struct_rp"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT p_partkey,
           p_size & 12 AS b_and,
           p_size | 5 AS b_or,
           xor(p_size, 7) AS b_xor,
           p_size << 2 AS b_shl,
           p_size >> 1 AS b_shr,
           bit_count(CAST(p_size AS BIGINT)) AS b_pop
    FROM part
    """,
)
def fn_bitwise(spark, sf_dir):
    """Bitwise pack: and/or/xor, shifts, popcount — the primitives under
    bitmask bucketing, bloom membership, and the dedup pipeline's own
    popcount rescore.  Pure codegen'd integer ops."""
    p = load_table(spark, sf_dir, "part")
    s = F.col("p_size")
    return p.select(
        "p_partkey",
        s.bitwiseAND(12).alias("b_and"),
        s.bitwiseOR(5).alias("b_or"),
        s.bitwiseXOR(7).alias("b_xor"),
        F.shiftleft(s, 2).alias("b_shl"),
        F.shiftright(s, 1).alias("b_shr"),
        F.bit_count(s.cast("long")).alias("b_pop"),
    )


@register(
    "fn_url",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.org/docs/' || doc_id
               || '?lang=' || lang || '&v=' || (doc_id % 7) || '#top' AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^([a-z][a-z0-9+.-]*)://', 1) AS scheme,
           regexp_extract(url, '://([^/?#]+)', 1) AS host,
           regexp_extract(url, '://[^/?#]+(/[^?#]*)', 1) AS upath,
           regexp_extract(url, '[?]([^#]*)', 1) AS query,
           regexp_extract(url, '#(.*)$', 1) AS fragment,
           regexp_extract(url, 'lang=([a-z]+)', 1) AS q_lang
    FROM u
    """,
)
def fn_url(spark, sf_dir):
    """URL parsing pack: scheme/host/path/query/fragment/param extraction
    from URLs synthesized off the documents table (crawl pipelines spend a
    lot of cycles here — canonicalizing source URLs before dedup).

    Implemented with RE2-safe regexes (no lookaround/backrefs) so the same
    patterns run in Spark's Java regex and DuckDB's RE2 with identical
    results.  Spark's builtin ``parse_url()`` is the production alternative;
    the regex form is used so the oracle reproduces it bit-for-bit.  All
    codegen'd row-local string ops — map-only at any scale."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("#top"),
    )
    return d.select("doc_id", url.alias("url")).select(
        "doc_id",
        "url",
        F.regexp_extract("url", r"^([a-z][a-z0-9+.-]*)://", 1).alias("scheme"),
        F.regexp_extract("url", r"://([^/?#]+)", 1).alias("host"),
        F.regexp_extract("url", r"://[^/?#]+(/[^?#]*)", 1).alias("upath"),
        F.regexp_extract("url", r"[?]([^#]*)", 1).alias("query"),
        F.regexp_extract("url", r"#(.*)$", 1).alias("fragment"),
        F.regexp_extract("url", r"lang=([a-z]+)", 1).alias("q_lang"),
    )


@register(
    "fn_format",
    oracle="""
    SELECT p_partkey,
           printf('%s-%07d', p_brand, p_partkey) AS part_code,
           printf('%x', p_partkey) AS key_hex,
           repeat(p_type, 2) AS type_twice,
           reverse(p_brand) AS brand_rev,
           translate(p_brand, '#', '_') AS brand_tr,
           ascii(p_name) AS first_cp,
           chr(65 + CAST(p_partkey % 26 AS INT)) AS letter
    FROM part
    """,
)
def fn_format(spark, sf_dir):
    """Formatting pack: printf-style templating (C format strings evaluate
    identically in JVM String.format and DuckDB printf for %s/%d/%x —
    floats deliberately excluded: %.2f rounding is half-up vs half-even
    across engines), repeat/reverse/translate, codepoint <-> char.
    Map-only codegen'd string ops."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.format_string("%s-%07d", F.col("p_brand"), F.col("p_partkey")).alias(
            "part_code"
        ),
        F.format_string("%x", F.col("p_partkey")).alias("key_hex"),
        F.repeat(F.col("p_type"), 2).alias("type_twice"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.translate(F.col("p_brand"), "#", "_").alias("brand_tr"),
        F.ascii(F.col("p_name")).alias("first_cp"),
        F.chr(F.lit(65) + (F.col("p_partkey") % 26).cast("int")).alias(
            "letter"
        ),
    )


@register(
    "fn_try_safe",
    oracle="""
    SELECT o_orderkey,
           o_totalprice / nullif(o_custkey % 5, 0) AS safe_div,
           TRY_CAST(o_orderpriority AS INT) AS bad_cast,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS good_cast,
           string_split(o_orderpriority, '-')[3] AS oob_element,
           string_split(o_orderpriority, '-')[2] AS ok_element
    FROM orders
    """,
)
def fn_try_safe(spark, sf_dir):
    """ANSI error-safe functions: try_divide (NULL on /0 instead of the
    ANSI-mode runtime error), try_cast (NULL on unparseable), and
    try_element_at (NULL out of range).  Spark 4 runs ANSI mode by default,
    so these are the idioms pipelines need for dirty data; DuckDB twins are
    nullif-division, TRY_CAST, and native out-of-range list indexing.

    Cost lesson (measured): ANSI try_cast pays a FORMATTED JVM EXCEPTION
    per failing row (~8 µs — 1.25 s for 150k always-failing rows on one
    core), so when failure is the COMMON case the scale idiom is a regex
    guard in front of the cast: NULL-on-unparseable semantics matching
    try_cast on everything but exotic padding (try_cast's trimAll also
    strips ISO control chars and Unicode spaces, which Java \\s does not
    match — a \\x00- or \\u00A0-padded numeric parses under try_cast but is
    NULLed by the guard), no exception machinery, 14x faster here.
    try_cast stays on the rare-failure path (good_cast) where the
    exception cost is negligible."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 5).alias(
            "safe_div"
        ),
        F.when(
            # superset of what int-cast can accept (cast itself trims
            # whitespace, so the guard must too or it would NULL out
            # padded numerics that try_cast parses)
            F.col("o_orderpriority").rlike(r"^\s*[+-]?\d+\s*$"),
            F.expr("try_cast(o_orderpriority AS INT)"),
        ).alias("bad_cast"),
        F.expr(
            "try_cast(substring(o_orderpriority, 1, 1) AS INT)"
        ).alias("good_cast"),
        F.try_element_at(F.split("o_orderpriority", "-"), F.lit(3)).alias(
            "oob_element"
        ),
        F.try_element_at(F.split("o_orderpriority", "-"), F.lit(2)).alias(
            "ok_element"
        ),
    )


@register(
    "mm_tensor_reshape",
    oracle="""
    WITH c AS (
      SELECT vec_id,
             list_transform(generate_series(0, 3),
               c -> list_transform(generate_series(1, 16),
                      i -> CAST(embedding[c * 16 + i] AS DOUBLE))) AS chunks_arr,
             CAST(embedding[1] AS DOUBLE) AS e0
      FROM embeddings
    )
    SELECT vec_id,
           array_to_string(list_transform(chunks_arr, ch ->
             array_to_string(list_transform(ch,
               x -> CAST(CAST(x AS DECIMAL(18,6)) AS VARCHAR)), ',')), ';')
             AS chunks,
           len(flatten(chunks_arr)) AS n_flat,
           e0 AS first_elem
    FROM c
    """,
)
def mm_tensor_reshape(spark, sf_dir):
    """Tensor plumbing: reshape the flat 64-dim embedding into a 4×16
    array-of-arrays (the chunked layout attention-block export and
    per-head analysis want), verify the flatten round-trip length, and
    keep a probe element.  Pure higher-order functions (transform over an
    index sequence + slice) — stays in Catalyst, map-only, no UDF; at any
    scale this is a zero-shuffle projection.

    Output discipline: ``chunks`` is emitted as a ';'/',' joined string of
    DECIMAL(18,6)-formatted elements — raw array<array<double>> cells crash
    the driver canon's pandas sort (CORRECTNESS_r03), and fixed-point
    decimal text is byte-identical across engines where raw double→string
    is not ('1.0E-7' vs '1e-07').

    The 1e-6 quantum, quantified (measured on the fixtures): both sides
    serialize the SAME stored float32 cast to double — bit-identical
    inputs, no arithmetic — so the only cross-engine risk is the decimal
    rounding RULE disagreeing at an exact .5e-6 midpoint, and no fixture
    element sits closer than 5.9e-7 grid units to one (sf0.001; 4.2e-6 at
    sf0.1 — gated in tests/test_ml_quality.py).  Distinct elements DO
    pack tighter than the quantum (min spacing ~1.9e-9), but the defect
    class this check exists for — a wrong reshape ORDER — misplaces
    values that differ at the ~0.1 scale (10^5 quanta), so resolution is
    not the binding constraint."""
    emb = load_table(spark, sf_dir, "embeddings")
    chunks = F.expr(
        "transform(sequence(0, 3), c -> "
        "transform(slice(embedding, c * 16 + 1, 16), x -> CAST(x AS DOUBLE)))"
    )
    chunk_str = F.expr(
        "array_join(transform(sequence(0, 3), c -> array_join("
        "transform(slice(embedding, c * 16 + 1, 16), "
        "x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6)) AS STRING)), "
        "',')), ';')"
    )
    return emb.select(
        "vec_id",
        chunk_str.alias("chunks"),
        F.size(F.flatten(chunks)).alias("n_flat"),
        F.expr("CAST(embedding[0] AS DOUBLE)").alias("first_elem"),
    )


@register(
    "fn_date_iso",
    oracle="""
    SELECT o_orderkey,
           quarter(o_orderdate) AS o_quarter,
           weekofyear(o_orderdate) AS iso_week,
           dayofyear(o_orderdate) AS doy,
           CAST(strftime(o_orderdate, '%Y') AS INT) * 100
             + weekofyear(o_orderdate) AS yw_key
    FROM orders
    """,
)
def fn_date_iso(spark, sf_dir):
    """ISO-calendar date family: quarter, ISO week number, day-of-year,
    and a composite year-week partition key — both engines implement ISO
    8601 week numbering, which matters at year boundaries (Jan 1 can be
    week 52/53 of the prior ISO year; the composite key uses the calendar
    year deliberately, matching how date-partitioned lakes are keyed)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.quarter(d).alias("o_quarter"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofyear(d).alias("doy"),
        (F.year(d) * 100 + F.weekofyear(d)).alias("yw_key"),
    )
