"""Scalar function families (SURVEY §2.2): string, date, math,
conditional, cast, array, JSON.

All JVM-side built-ins (whole-stage codegen) — no Python in the hot path.
Each query bundles one family over a test table, with the DuckDB spelling
of the identical semantics as oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_map_reduce_spark.functions import round4
from kafka_map_reduce_spark.registry import query
from kafka_map_reduce_spark.sources import load_table


@query(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           substr(p_type, 1, 5) AS type_pfx,
           concat(p_brand, '-', p_type) AS brand_type,
           trim(p_name) AS name_trim,
           CAST(length(p_name) AS INTEGER) AS name_len,
           replace(p_name, 'a', '@') AS name_repl,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           string_split(p_name, ' ')[1] AS first_tok
    FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substr/concat/trim/length/replace/regexp/split."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 5).alias("type_pfx"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.trim("p_name").alias("name_trim"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_name"), F.lit("a"), F.lit("@")).alias("name_repl"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.split("p_name", " ").getItem(0).alias("first_tok"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(day(o_orderdate) AS INTEGER) AS dom,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(datediff('day', TIMESTAMP '2024-01-01', o_orderdate) AS INTEGER)
             AS days_since,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           strftime(o_orderdate, '%Y-%m-%d') AS d_str
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/date_trunc/datediff/date_add/format."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("2024-01-01").cast("timestamp_ntz")).alias(
            "days_since"
        ),
        F.date_format(F.date_add(F.to_date("o_orderdate"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d_str"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor((abs(l_discount - 0.05)) * 10000 + 0.5) / 10000 AS abs_disc,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           floor((pow(l_quantity, 2)) * 10000 + 0.5) / 10000 AS qty_sq,
           CAST(l_linenumber % 3 AS INTEGER) AS line_mod,
           floor((sqrt(l_extendedprice)) * 10000 + 0.5) / 10000 AS price_sqrt,
           floor((ln(l_extendedprice + 1)) * 10000 + 0.5) / 10000 AS price_ln
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/pow/mod/sqrt/log (README.md:91-93 arithmetic)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        round4(F.abs(F.col("l_discount") - 0.05)).alias("abs_disc"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        round4(F.pow("l_quantity", F.lit(2))).alias("qty_sq"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
        round4(F.sqrt("l_extendedprice")).alias("price_sqrt"),
        round4(F.log(F.col("l_extendedprice") + 1)).alias("price_ln"),
    )


@query(
    "q_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' THEN 'done'
                WHEN o_orderstatus = 'O' THEN 'open'
                ELSE 'other' END AS status_desc,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           floor((greatest(o_totalprice, 25000.0)) * 10000 + 0.5) / 10000 AS at_least,
           floor((least(o_totalprice, 25000.0)) * 10000 + 0.5) / 10000 AS at_most
    FROM orders
    """,
)
def q_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / greatest / least."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "done")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_desc"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        round4(F.greatest(F.col("o_totalprice"), F.lit(25000.0))).alias("at_least"),
        round4(F.least(F.col("o_totalprice"), F.lit(25000.0))).alias("at_most"),
    )


@query(
    "q_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(floor(o_totalprice) AS BIGINT) AS price_int,
           CAST(o_custkey AS DOUBLE) AS cust_dbl,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts_str,
           CAST('42' AS INTEGER) AS lit_int
    FROM orders
    """,
)
def q_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric <-> string <-> timestamp casts (the u32/u64/DateTime model
    of the reference demo, main.rs:14-20)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.floor("o_totalprice").cast("long").alias("price_int"),
        F.col("o_custkey").cast("double").alias("cust_dbl"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.lit("42").cast("int").alias("lit_int"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           floor((CAST(embedding[1] AS DOUBLE)) * 10000 + 0.5) / 10000 AS first_val,
           array_to_string(list_transform(embedding[1:3],
                           x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)),
                           ',') AS head3,
           floor((list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))))
                 * 10000 + 0.5) / 10000 AS vec_sum
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/slice/transform/aggregate over ArrayType (Tier C
    multimodal columns). head3 is emitted as a comma-joined string of
    floor-scaled ints — the driver canonicalizer only hashes scalar cells,
    and integer-to-string rendering is engine-stable (doubles are not)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        round4(F.element_at("embedding", 1).cast("double")).alias("first_val"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice("embedding", 1, 3),
                lambda x: F.floor(x.cast("double") * 10000 + F.lit(0.5))
                .cast("long")
                .cast("string"),
            ),
        ).alias("head3"),
        round4(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
            )
        ).alias("vec_sum"),
    )


@query(
    "q_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           CAST(json_extract_string(props, '$.k') AS INTEGER) % 2 = 0 AS k_even
    FROM events
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction — the JSONEachRow sink model
    (/root/reference/src/clickhouse.rs:86-88)."""
    ev = load_table(spark, sf_dir, "events")
    k_str = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k_str.alias("k_str"),
        k_str.cast("int").alias("k_int"),
        (k_str.cast("int") % 2 == 0).alias("k_even"),
    )
