"""Scalar function suites (SURVEY §2b Q48-Q55): string / regexp / date /
math / array / explode / json / map+struct.

All expressions are built-in pyspark.sql.functions (JVM-side, inside
whole-stage codegen) — no Python UDFs in these paths. Per-query docstrings
note DuckDB spelling differences (instr<->strpos, 1-based list indexing,
dayofweek origin, regexp_replace 'g' flag, ...).
"""

from __future__ import annotations

from .base import F, dec, tbl, views
from .registry import register


@register(
    "q48",
    oracle="""SELECT p_partkey,
                     concat(p_name, '!') AS c1,
                     upper(p_name) AS up, lower(p_type) AS lo,
                     trim(concat(' ', p_name, ' ')) AS tr,
                     substring(p_name, 2, 5) AS sub,
                     length(p_name) AS len,
                     replace(p_name, 'a', '@') AS repl,
                     lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '.') AS rp,
                     string_split(p_name, ' ')[1] AS first_word,
                     strpos(p_name, 'e') AS pos_e,
                     left(p_name, 3) AS l3, right(p_name, 3) AS r3,
                     reverse(p_name) AS rev,
                     repeat(p_brand, 2) AS rep2
              FROM part ORDER BY p_partkey""",
    tags=("scalar", "string"),
)
def q48(spark, sf_dir):
    """String suite (Spark instr <-> DuckDB strpos; split is 0-based via
    element_at(.,1) <-> DuckDB 1-based [1])."""
    p = tbl(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(F.col("p_name"), F.lit("!")).alias("c1"),
        F.upper("p_name").alias("up"),
        F.lower("p_type").alias("lo"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("tr"),
        F.substring("p_name", 2, 5).alias("sub"),
        F.length("p_name").alias("len"),
        F.replace(F.col("p_name"), F.lit("a"), F.lit("@")).alias("repl"),
        F.lpad("p_brand", 12, "*").alias("lp"),
        F.rpad("p_brand", 12, ".").alias("rp"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
        F.instr("p_name", "e").alias("pos_e"),
        F.expr("left(p_name, 3)").alias("l3"),
        F.expr("right(p_name, 3)").alias("r3"),
        F.reverse("p_name").alias("rev"),
        F.repeat("p_brand", 2).alias("rep2"),
    ).orderBy("p_partkey")


@register(
    "q49",
    oracle="""SELECT doc_id,
                     regexp_extract(text, '(t[a-z]+)', 1) AS first_t_word,
                     length(regexp_replace(text, 'table', 'TBL', 'g')) AS len_repl,
                     regexp_matches(text, 'spark .* merge') AS has_span
              FROM documents ORDER BY doc_id""",
    tags=("scalar", "regexp"),
)
def q49(spark, sf_dir):
    """Regexp suite (Spark regexp_replace is global by default — DuckDB
    needs the 'g' flag; rlike <-> regexp_matches)."""
    d = tbl(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", "(t[a-z]+)", 1).alias("first_t_word"),
        F.length(F.regexp_replace("text", "table", "TBL")).alias("len_repl"),
        F.col("text").rlike("spark .* merge").alias("has_span"),
    ).orderBy("doc_id")


@register(
    "q50",
    oracle="""SELECT o_orderkey,
                     year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
                     dayofweek(o_orderdate) + 1 AS dow,
                     CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
                     CAST(o_orderdate AS DATE) + 5 AS plus5,
                     date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_2000,
                     last_day(CAST(o_orderdate AS DATE)) AS eom,
                     CAST(epoch(o_orderdate) AS BIGINT) AS unix_sec
              FROM orders ORDER BY o_orderkey""",
    tags=("scalar", "date"),
)
def q50(spark, sf_dir):
    """Date/time suite (Spark dayofweek is 1=Sunday; DuckDB dayofweek is
    0=Sunday, hence the +1 in the oracle; datediff arg order flips)."""
    o = tbl(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 5).alias("plus5"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2000"
        ),
        F.last_day(F.col("o_orderdate")).alias("eom"),
        F.unix_timestamp(F.col("o_orderdate")).alias("unix_sec"),
    ).orderBy("o_orderkey")


@register(
    "q51",
    oracle="""SELECT l_orderkey, l_linenumber,
                     CAST(floor(l_extendedprice) AS BIGINT) AS fl,
                     CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
                     abs(l_discount - 0.05) AS ab,
                     CAST(sign(l_quantity - 25) AS INT) AS sg,
                     l_orderkey % 7 AS md,
                     power(l_quantity, 2) AS pw,
                     sqrt(l_quantity) AS sq,
                     CAST(FLOOR(ln(l_quantity) * 100000000 + 0.5) AS BIGINT) AS ln_q8,
                     CAST(FLOOR(log10(l_quantity) * 100000000 + 0.5) AS BIGINT) AS log_q8,
                     CAST(FLOOR(exp(l_discount) * 100000000 + 0.5) AS BIGINT) AS ex8
              FROM lineitem WHERE l_orderkey < 2000
              ORDER BY l_orderkey, l_linenumber""",
    tags=("scalar", "math"),
)
def q51(spark, sf_dir):
    """Math suite. floor/ceil/abs/sign/mod/power/sqrt are IEEE-exact (raw
    doubles compare bit-identically); ln/log10/exp are libm calls that may
    differ by 1 ulp between JVM and C — emitted as FLOOR-scaled 1e-8 units
    (a 1-ulp input difference flips the integer only within ~1e-16 of a
    boundary; no double->decimal cast, see base.py discipline)."""
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    u8 = F.lit(1e8)
    half = F.lit(0.5)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor("l_extendedprice").alias("fl"),
        F.ceil("l_extendedprice").alias("ce"),
        F.abs(F.col("l_discount") - 0.05).alias("ab"),
        F.signum(F.col("l_quantity") - 25).cast("int").alias("sg"),
        (F.col("l_orderkey") % 7).alias("md"),
        F.pow("l_quantity", F.lit(2)).alias("pw"),
        F.sqrt("l_quantity").alias("sq"),
        F.floor(F.log(F.col("l_quantity")) * u8 + half).cast("bigint").alias("ln_q8"),
        F.floor(F.log10(F.col("l_quantity")) * u8 + half).cast("bigint").alias("log_q8"),
        F.floor(F.exp(F.col("l_discount")) * u8 + half).cast("bigint").alias("ex8"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q52",
    oracle="""SELECT vec_id,
                     len(embedding) AS dim,
                     embedding[1] AS e1,
                     list_aggregate(list_sort(list_transform(embedding[1:8],
                               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))),
                               'string_agg', ',') AS head_sorted,
                     list_contains([label, 99], 3) AS has3
              FROM embeddings ORDER BY vec_id""",
    tags=("scalar", "array"),
)
def q52(spark, sf_dir):
    """Array suite on the embedding column (size/element_at/slice/transform/
    sort_array/array_contains; floats canonicalized to FLOOR-scaled 1e-6
    integer units — float->double widening is exact and the scale ops are
    single IEEE instructions, so both engines produce identical integers;
    lists sorted per rule 4 then serialized to a CSV scalar — the driver's
    pandas sort crashes on raw ArrayType cells, see q32/r3)."""
    e = tbl(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("e1"),
        F.concat_ws(
            ",",
            F.sort_array(
                F.transform(
                    F.slice("embedding", 1, 8),
                    lambda x: F.floor(x.cast("double") * F.lit(1e6) + F.lit(0.5)).cast("bigint"),
                )
            ),
        ).alias("head_sorted"),
        F.array_contains(F.array(F.col("label"), F.lit(99)), 3).alias("has3"),
    ).orderBy("vec_id")


@register(
    "q53",
    oracle="""SELECT doc_id,
                     unnest(generate_series(1, len(parts))) - 1 AS pos,
                     unnest(parts) AS token
              FROM (SELECT doc_id, string_split(text, ' ') AS parts
                    FROM documents WHERE doc_id % 20 = 0)
              ORDER BY doc_id, pos, token""",
    tags=("scalar", "explode"),
)
def q53(spark, sf_dir):
    """posexplode / unnest: tokenize into (doc_id, pos, token) rows. Spark
    posexplode is 0-based; the DuckDB oracle zips generate_series-1.
    Sampled (doc_id % 20) to bound the exploded row count in the gate."""
    d = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .orderBy("doc_id", "pos", "token")
    )


@register(
    "q54",
    oracle="""SELECT event_id,
                     CAST(json_extract_string(props, '$.k') AS INT) AS k_val
              FROM events ORDER BY event_id""",
    tags=("scalar", "json"),
)
def q54(spark, sf_dir):
    """JSON extraction (Spark get_json_object <-> DuckDB
    json_extract_string), cast to INT on both sides."""
    e = tbl(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    ).orderBy("event_id")


@register(
    "q55",
    oracle="""SELECT doc_id,
                     lang AS lang_from_map,
                     source AS source_from_map,
                     doc_id AS id_from_struct,
                     lang AS lang_from_struct
              FROM documents ORDER BY doc_id""",
    tags=("scalar", "map", "struct"),
)
def q55(spark, sf_dir):
    """Map + struct ops: build create_map/named_struct then extract back to
    plain columns (rule 4: maps are never hash-compared directly — the
    oracle is the extracted identity)."""
    d = tbl(spark, sf_dir, "documents")
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    s = F.named_struct(F.lit("id"), F.col("doc_id"), F.lit("lang"), F.col("lang"))
    return d.select(
        "doc_id",
        m.getItem("lang").alias("lang_from_map"),
        m.getItem("source").alias("source_from_map"),
        s.getField("id").alias("id_from_struct"),
        s.getField("lang").alias("lang_from_struct"),
    ).orderBy("doc_id")


@register(
    "xh_date_series",
    oracle="""WITH months AS (
                SELECT CAST(unnest(generate_series(TIMESTAMP '1995-01-01',
                                                   TIMESTAMP '1998-12-01',
                                                   INTERVAL 1 MONTH)) AS DATE) AS month
              ),
              per AS (
                SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                       COUNT(*) AS n
                FROM orders GROUP BY 1)
              SELECT m.month, COALESCE(p.n, 0) AS n_orders
              FROM months m LEFT JOIN per p USING (month)
              ORDER BY m.month""",
    tags=("scalar", "series"),
)
def h_date_series(spark, sf_dir):
    """Calendar-series generation (sequence/explode <-> generate_series):
    month spine left-joined to per-month order counts — the standard
    'dense time axis' pattern for reporting over sparse facts."""
    o = tbl(spark, sf_dir, "orders")
    months = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1998-12-01").cast("date"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("month")
    )
    per = (
        o.groupBy(F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        months.join(per, "month", "left")
        .select("month", F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"))
        .orderBy("month")
    )


@register(
    "xh_higher_order",
    oracle="""SELECT vec_id,
                     CAST(COALESCE((SELECT SUM(CAST(FLOOR(CAST(x AS DOUBLE) * 10000000 + 0.5) AS BIGINT))
                                    FROM unnest(embedding) AS t(x) WHERE x > 0), 0)
                          AS BIGINT) AS pos_sum_e7,
                     len(list_filter(embedding, x -> x > 0)) AS n_pos,
                     len(list_filter(embedding, x -> x > 0.25)) > 0 AS has_big
              FROM embeddings ORDER BY vec_id""",
    tags=("scalar", "higherorder"),
)
def h_higher_order(spark, sf_dir):
    """Higher-order array functions: filter -> aggregate (exact integer
    fold over FLOOR-scaled 1e-7 units — float->double is exact, the scaling
    is single IEEE ops, the sum is exact int), size, exists — all JVM-side
    lambdas, no Python. Round 1 used a decimal(20,10) fold whose
    double->decimal cast was engine-version dependent (driver hash fail)."""
    e = tbl(spark, sf_dir, "embeddings")
    pos = F.filter(F.col("embedding"), lambda x: x > 0)
    pos_sum = F.aggregate(
        F.transform(pos, lambda x: F.floor(x.cast("double") * F.lit(1e7) + F.lit(0.5)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return e.select(
        "vec_id",
        pos_sum.alias("pos_sum_e7"),
        F.size(pos).alias("n_pos"),
        F.exists(F.col("embedding"), lambda x: x > 0.25).alias("has_big"),
    ).orderBy("vec_id")


@register("xp_uuid_keys", oracle=None, tags=("keygen",))
def p_uuid_keys(spark, sf_dir):
    """P-class (R10 parity): uuid() request-id generation per row —
    nondeterministic by design, excluded from hashing (SURVEY §7.3);
    tests assert uniqueness + RFC-4122 format."""
    n = tbl(spark, sf_dir, "nation")
    return n.select("n_nationkey", F.expr("uuid()").alias("request_id")).orderBy("n_nationkey")


@register(
    "xh_datetime_matrix",
    oracle="""SELECT event_id,
       CAST(quarter(ts) AS INT) AS q,
       CAST(weekofyear(ts) AS INT) AS iso_week,
       CAST(dayofyear(ts) AS INT) AS doy,
       CAST(hour(ts) AS INT) AS hh,
       CAST(minute(ts) AS INT) AS mi,
       CAST(second(ts) AS INT) AS ss,
       CAST(epoch(date_trunc('week', ts)) AS BIGINT) AS week_start_sec,
       CAST(epoch(date_trunc('quarter', ts)) AS BIGINT) AS quarter_start_sec,
       CAST(epoch(CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS TIMESTAMP))
            AS BIGINT) AS plus2mo_sec
FROM events ORDER BY event_id""",
    tags=("functions", "datetime", "oracle-twin"),
)
def xh_datetime_matrix(spark, sf_dir):
    """Datetime function-parity matrix (round 12) — extends q50's date
    suite to the time-of-day and calendar functions it skipped, on the
    events stream (which, unlike o_orderdate, has non-midnight
    components): quarter, ISO week number (both engines implement the
    ISO-8601 week), day-of-year, hour/minute/second, Monday-start week
    and quarter truncation (as epoch seconds — the q61/q63 timestamp
    discipline), and add_months' MONTH-END CLAMP (Jan 31 + 2 months =
    Mar 31 via clamping through Feb — Spark add_months and DuckDB's
    date + INTERVAL share the clamp; applied on the DATE to keep the
    arithmetic integer). Fractional months_between stays out (float,
    engine-divergent denominator convention).

    Scale: scan -> project inside whole-stage codegen -> order by the
    unique key; no exchange before the output sort."""
    e = tbl(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.quarter("ts").alias("q"),
        F.weekofyear("ts").alias("iso_week"),
        F.dayofyear("ts").alias("doy"),
        F.hour("ts").alias("hh"),
        F.minute("ts").alias("mi"),
        F.second("ts").alias("ss"),
        F.unix_timestamp(F.date_trunc("week", "ts"))
        .cast("long")
        .alias("week_start_sec"),
        F.unix_timestamp(F.date_trunc("quarter", "ts"))
        .cast("long")
        .alias("quarter_start_sec"),
        F.unix_timestamp(
            F.add_months(F.col("ts").cast("date"), 2).cast("timestamp")
        )
        .cast("long")
        .alias("plus2mo_sec"),
    ).orderBy("event_id")
