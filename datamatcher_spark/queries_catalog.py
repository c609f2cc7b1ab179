"""The operator catalog behind ``__spark_entry__``: paired
(Spark DataFrame builder, DuckDB oracle SQL) per operator.

Conventions (driver compare is row-count + schema + order-insensitive
value-hash, columns sorted by name):
  * every computed column is aliased identically on both sides;
  * doubles are rounded to fixed precision on both sides;
  * limits/top-k always carry a deterministic ORDER BY;
  * DuckDB regexp_replace gets the 'g' flag (Spark is global by default).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datamatcher_spark.norm.keys import (
    ean_variants_expr,
    is_empty_expr,
    normalize_key_expr,
    normalize_path_expr,
)
from datamatcher_spark.norm.transforms import (
    TRANSFORMS,
    template_expr,
    value_mapping_expr,
)
from datamatcher_spark.functions.similarity import levenshtein_sim_expr
from datamatcher_spark.functions.textstats import (
    fingerprint_expr,
    lang_id_expr,
    quality_score_expr,
    token_count_expr,
)
from datamatcher_spark.operators.batchfilter import (
    filter_key_list,
    filter_key_regex,
    filter_range,
)
from datamatcher_spark.operators.dedup import (
    cosine_sim_expr,
    embedding_near_duplicates,
    exact_duplicates,
    fingerprint_duplicates,
    minhash_near_duplicates,
    ngram_jaccard_duplicates,
    simhash_near_duplicates,
)
from datamatcher_spark.operators.merge import (
    WriteMode,
    apply_write_mode,
)
from datamatcher_spark.operators.reporter import (
    key_stats,
    uniqueness_profile,
)


@dataclass
class CatalogEntry:
    spark: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]  # None → rows-only check (non-SQL-expressible)


CATALOG: dict[str, CatalogEntry] = {}


def register(name: str, sql: Optional[str]):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from datamatcher_spark.session import ensure_package_shipped

            ensure_package_shipped(spark)
            return fn(spark, sf_dir)

        CATALOG[name] = CatalogEntry(spark=wrapped, sql=sql)
        return wrapped

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# flagship: near-dup clustering of documents (blocking → pairs → clusters)
# --------------------------------------------------------------------------

def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datamatcher_spark.plans.clustering import connected_components
    from datamatcher_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(
        docs, "doc_id", "text", jaccard_threshold=0.6
    ).select(
        F.col("id_a").cast("string").alias("src"),
        F.col("id_b").cast("string").alias("dst"),
    )
    cc, _ = connected_components(pairs)
    assigned = cc.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("cluster_id"),
    )
    singles = docs.join(assigned, "doc_id", "left_anti").select(
        F.col("doc_id"), F.col("doc_id").alias("cluster_id")
    )
    return assigned.unionByName(singles)


# --------------------------------------------------------------------------
# §2.2 projections / filters / predicates
# --------------------------------------------------------------------------

@register(
    "p1_filter_range",
    """
    WITH numbered AS (
      SELECT o_orderkey, o_totalprice,
             row_number() OVER (ORDER BY o_orderkey) - 1 AS rn
      FROM orders
    )
    SELECT o_orderkey, o_totalprice FROM numbered WHERE rn BETWEEN 100 AND 199
    """,
)
def q_p1(spark, sf_dir):
    return filter_range(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        "o_orderkey", 100, 199,
    )


@register(
    "p2_filter_key_list",
    "SELECT c_custkey, c_name FROM customer WHERE CAST(c_custkey AS VARCHAR) IN "
    "('1','7','42','99','123','500')",
)
def q_p2(spark, sf_dir):
    return filter_key_list(
        _t(spark, sf_dir, "customer").select("c_custkey", "c_name"),
        "c_custkey", ["1", "7", "42", "99", "123", "500"],
    )


@register(
    "p3_filter_limit",
    "SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey LIMIT 50",
)
def q_p3(spark, sf_dir):
    from datamatcher_spark.operators.batchfilter import filter_limit

    return filter_limit(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus"),
        50, "o_orderkey",
    )


@register(
    "p4_filter_key_regex",
    "SELECT p_partkey, p_name FROM part WHERE regexp_matches(p_name, '(?i)r.d\\s+w.dget')",
)
def q_p4(spark, sf_dir):
    return filter_key_regex(
        _t(spark, sf_dir, "part").select("p_partkey", "p_name"), "p_name", r"r.d\s+w.dget"
    )


@register(
    "p5_empty_key_skip",
    """
    SELECT o_orderkey FROM orders
    WHERE NOT (o_orderpriority IS NULL OR trim(o_orderpriority) = ''
               OR upper(trim(o_orderpriority)) IN
                  ('NULL','N/A','#N/A','-','BRAK','NAN','NONE'))
    """,
)
def q_p5(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.filter(~is_empty_expr(F.col("o_orderpriority"))).select("o_orderkey")


@register(
    "p9_search_predicate",
    """
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE concat_ws(' ', c_name, c_mktsegment) LIKE '%BUILDING%'
    """,
)
def q_p9(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.filter(
        F.concat_ws(" ", "c_name", "c_mktsegment").contains("BUILDING")
    ).select("c_custkey", "c_name", "c_mktsegment")


# --------------------------------------------------------------------------
# §2.8 scalar functions / normalization
# --------------------------------------------------------------------------

@register(
    "normalize_key_options",
    """
    SELECT p_partkey,
      CASE WHEN p_brand IS NULL OR trim(p_brand) = ''
                OR upper(trim(p_brand)) IN ('NULL','N/A','#N/A','-','BRAK','NAN','NONE')
           THEN NULL
           ELSE ltrim(regexp_replace(lower(
                  CASE WHEN regexp_matches(trim(p_brand), '^[-0-9]*[0-9][-0-9]*\\.0$')
                       THEN substring(trim(p_brand), 1, length(trim(p_brand)) - 2)
                       ELSE trim(p_brand) END), ' {2,}', ' ', 'g'), '0')
      END AS norm_key
    FROM part
    """,
)
def q_normkey(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    nk = normalize_key_expr(
        F.col("p_brand"), case_insensitive=True, strip_leading_zeros=True
    )
    # DuckDB ltrim('', '0')-of-all-zero edge ('0' survivor) can't hit on
    # this data (brands are 'Brand#12'), so plain ltrim matches.
    return p.select("p_partkey", nk.alias("norm_key"))


@register(
    "ean_variant_explode",
    """
    WITH keyed AS (
      SELECT l_orderkey, l_linenumber, CAST(l_partkey AS VARCHAR) AS k
      FROM lineitem WHERE l_orderkey <= 1000
    ), stripped AS (
      SELECT l_orderkey, l_linenumber, k,
             CASE WHEN ltrim(k, '0') = '' THEN '0' ELSE ltrim(k, '0') END AS s
      FROM keyed
    )
    SELECT l_orderkey, l_linenumber, unnest(list_distinct(
             list_append(list_transform(range(length(s), 15),
                                        n -> lpad(s, CAST(n AS INTEGER), '0')), k)
           )) AS variant
    FROM stripped
    """,
)
def q_ean(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter("l_orderkey <= 1000")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.explode(ean_variants_expr(F.col("l_partkey"))).alias("variant"),
    )


@register(
    "transform_chain",
    """
    SELECT p_partkey,
           trim(p_name) AS t_trim,
           upper(p_name) AS t_upper,
           lower(p_type) AS t_lower,
           substring(p_name, 1, 100) AS t_first100,
           regexp_replace(o.pr, '[^0-9]', '', 'g') AS t_numbers,
           replace(regexp_replace(o.pr, '[^0-9.,]', '', 'g'), ',', '.') AS t_decimal
    FROM part, (SELECT '1 234,56 zl' AS pr) o
    """,
)
def q_transforms(spark, sf_dir):
    p = _t(spark, sf_dir, "part").withColumn("pr", F.lit("1 234,56 zl"))
    return p.select(
        "p_partkey",
        TRANSFORMS["trim"](F.col("p_name")).alias("t_trim"),
        TRANSFORMS["upper"](F.col("p_name")).alias("t_upper"),
        TRANSFORMS["lower"](F.col("p_type")).alias("t_lower"),
        TRANSFORMS["first_100"](F.col("p_name")).alias("t_first100"),
        TRANSFORMS["extract_numbers"](F.col("pr")).alias("t_numbers"),
        TRANSFORMS["extract_decimal"](F.col("pr")).alias("t_decimal"),
    )


@register(
    "transform_numeric",
    """
    SELECT o_orderkey,
           CAST(round(o_totalprice, 2) AS VARCHAR) AS t_round2,
           CAST(CAST(round_even(o_totalprice, 0) AS BIGINT) AS VARCHAR) AS t_round0,
           CAST(CAST(trunc(o_totalprice) AS BIGINT) AS VARCHAR) AS t_int
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def q_transform_numeric(spark, sf_dir):
    # prices have ≤2 decimals → Python/JVM/DuckDB rounding agree;
    # int() truncates toward zero in all three.
    o = _t(spark, sf_dir, "orders").filter("o_orderkey <= 2000")
    return o.select(
        "o_orderkey",
        TRANSFORMS["round_2"](F.col("o_totalprice")).alias("t_round2"),
        TRANSFORMS["round_0"](F.col("o_totalprice")).alias("t_round0"),
        F.col("o_totalprice").cast("long").cast("string").alias("t_int"),
    )


@register(
    "path_normalization",
    """
    SELECT n_nationkey,
           trim(regexp_replace(lower(replace(replace(replace(replace(replace(
             concat(r_name, ' > ', n_name), '"', ''), ' > ', '/'), '>', '/'),
             ' / ', '/'), ' ', '')), '/+', '/', 'g'), '/') AS norm_path
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_pathnorm(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = n.join(r, n.n_regionkey == r.r_regionkey)
    path = F.concat(F.col("r_name"), F.lit(" > "), F.col("n_name"))
    return j.select("n_nationkey", normalize_path_expr(path).alias("norm_path"))


@register(
    "template_render",
    "SELECT c_custkey, concat(coalesce(c_name, ''), ' [', coalesce(c_mktsegment, ''), "
    "']') AS rendered FROM customer",
)
def q_template(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        template_expr("{c_name} [{c_mktsegment}]", lambda n: F.col(n)).alias("rendered"),
    )


@register(
    "value_mapping",
    """
    SELECT o_orderkey,
           CASE trim(o_orderstatus) WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Finished'
                WHEN 'P' THEN 'Pending' ELSE o_orderstatus END AS status_label
    FROM orders
    """,
)
def q_valuemap(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        value_mapping_expr(
            F.col("o_orderstatus"), {"O": "Open", "F": "Finished", "P": "Pending"}
        ).alias("status_label"),
    )


@register(
    "regex_find_replace",
    "SELECT p_partkey, regexp_replace(p_name, '[aeiou]', '_', 'g') AS redacted FROM part",
)
def q_regex_replace(spark, sf_dir):
    from datamatcher_spark.norm.transforms import regex_transform_expr

    return _t(spark, sf_dir, "part").select(
        "p_partkey", regex_transform_expr(F.col("p_name"), "[aeiou]", "_").alias("redacted")
    )


# --------------------------------------------------------------------------
# §2.3 joins
# --------------------------------------------------------------------------

@register(
    "j2_enrich_left_join",
    """
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    """,
)
def q_j2(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "j3_best_row_per_key",
    """
    WITH ranked AS (
      SELECT c_nationkey, c_custkey, c_name, c_acctbal,
             row_number() OVER (
               PARTITION BY c_nationkey
               ORDER BY (c_acctbal IS NOT NULL AND CAST(c_acctbal AS VARCHAR) <> '') DESC,
                        c_custkey ASC
             ) AS rn
      FROM customer
    )
    SELECT c_nationkey, c_custkey, c_name, c_acctbal FROM ranked WHERE rn = 1
    """,
)
def q_j3(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    has_data = (~is_empty_expr(F.col("c_acctbal"))).cast("int")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("__has"), F.asc("c_custkey")
    )
    return (
        c.withColumn("__has", has_data)
        .withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
    )


@register(
    "j4_fuzzy_levenshtein_join",
    """
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           round(1.0 - CAST(levenshtein(lower(a.n_name), lower(b.n_name)) AS DOUBLE)
                 / greatest(length(a.n_name), length(b.n_name)), 6) AS sim
    FROM nation a JOIN nation b ON a.n_name < b.n_name
    WHERE 1.0 - CAST(levenshtein(lower(a.n_name), lower(b.n_name)) AS DOUBLE)
          / greatest(length(a.n_name), length(b.n_name)) >= 0.4
    """,
)
def q_j4(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    a, b = n.alias("a"), n.alias("b")
    sim = levenshtein_sim_expr(
        F.lower(F.col("a.n_name")), F.lower(F.col("b.n_name"))
    )
    return (
        a.join(b, F.col("a.n_name") < F.col("b.n_name"))
        .withColumn("sim_raw", sim)
        .filter(F.col("sim_raw") >= 0.4)
        .select(
            F.col("a.n_name").alias("name_a"),
            F.col("b.n_name").alias("name_b"),
            F.round("sim_raw", 6).alias("sim"),
        )
    )


@register(
    "j6_partial_containment",
    """
    WITH t AS (SELECT DISTINCT p_type FROM part)
    SELECT a.p_type AS type_a, b.p_type AS type_b
    FROM t a JOIN t b ON a.p_type <> b.p_type
    WHERE contains(lower(a.p_type), lower(b.p_type))
       OR contains(lower(b.p_type), lower(a.p_type))
    """,
)
def q_j6(spark, sf_dir):
    t = _t(spark, sf_dir, "part").select("p_type").distinct()
    a, b = t.alias("a"), t.alias("b")
    la, lb = F.lower(F.col("a.p_type")), F.lower(F.col("b.p_type"))
    return (
        a.join(b, F.col("a.p_type") != F.col("b.p_type"))
        .filter(la.contains(lb) | lb.contains(la))
        .select(F.col("a.p_type").alias("type_a"), F.col("b.p_type").alias("type_b"))
    )


@register(
    "j8_anti_join_unmatched",
    "SELECT c_custkey, c_name FROM customer WHERE c_custkey NOT IN "
    "(SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)",
)
def q_j8(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "j9_semi_join_matched",
    "SELECT c_custkey FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)",
)
def q_j9(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")


@register(
    "j7_normalized_path_join",
    """
    WITH base AS (
      SELECT n_nationkey AS kod,
             lower(replace(concat(r_name, ' > ', n_name), ' ', '')) AS raw
      FROM nation JOIN region ON n_regionkey = r_regionkey
    ), batch AS (
      SELECT lower(replace(concat(r_name, '/', n_name), ' ', '')) AS raw2, n_name
      FROM nation JOIN region ON n_regionkey = r_regionkey
    )
    SELECT b.n_name, base.kod
    FROM batch b LEFT JOIN base
      ON replace(b.raw2, '>', '/') = replace(base.raw, '>', '/')
    """,
)
def q_j7(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = n.join(r, n.n_regionkey == r.r_regionkey)
    base = j.select(
        F.col("n_nationkey").alias("kod"),
        normalize_path_expr(
            F.concat(F.col("r_name"), F.lit(" > "), F.col("n_name"))
        ).alias("_klucz"),
    )
    batch = j.select(
        F.col("n_name"),
        normalize_path_expr(
            F.concat(F.col("r_name"), F.lit("/"), F.col("n_name"))
        ).alias("_klucz"),
    )
    return batch.join(base, "_klucz", "left").select("n_name", "kod")


# --------------------------------------------------------------------------
# §2.4 aggregations + §2.5 windows + §2.6 top-k
# --------------------------------------------------------------------------

@register(
    "a1_group_counts",
    "SELECT event_type AS change_type, count(*) AS n FROM events GROUP BY event_type",
)
def q_a1(spark, sf_dir):
    from datamatcher_spark.operators.reporter import change_type_counts

    return change_type_counts(_t(spark, sf_dir, "events"), "event_type")


@register(
    "a2_key_stats",
    """
    WITH k AS (
      SELECT CASE WHEN o_custkey IS NULL THEN NULL
                  ELSE CAST(o_custkey AS VARCHAR) END AS nk
      FROM orders
    ), per AS (
      SELECT nk, count(*) AS c FROM k WHERE nk IS NOT NULL GROUP BY nk
    )
    SELECT (SELECT count(*) FROM k) AS total_rows,
           (SELECT count(*) FROM per) AS unique_keys,
           (SELECT count(*) FROM per WHERE c > 1) AS duplicated_keys,
           (SELECT count(*) FROM k WHERE nk IS NULL) AS empty_keys
    """,
)
def q_a2(spark, sf_dir):
    return key_stats(_t(spark, sf_dir, "orders"), "o_custkey")


@register(
    "a3_duplicate_key_count",
    """
    SELECT count(*) AS duplicate_keys FROM (
      SELECT CAST(l_partkey AS VARCHAR) AS k, count(*) AS c
      FROM lineitem GROUP BY 1 HAVING count(*) > 1
    )
    """,
)
def q_a3(spark, sf_dir):
    from datamatcher_spark.operators.reporter import duplicate_key_count

    return duplicate_key_count(_t(spark, sf_dir, "lineitem"), "l_partkey")


@register(
    "a6_uniqueness_profile",
    """
    SELECT 'c_custkey' AS column, round(CAST(count(DISTINCT c_custkey) AS DOUBLE)
           / count(c_custkey), 6) AS uniqueness FROM customer
    UNION ALL
    SELECT 'c_name', round(CAST(count(DISTINCT c_name) AS DOUBLE) / count(c_name), 6)
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', round(CAST(count(DISTINCT c_mktsegment) AS DOUBLE)
           / count(c_mktsegment), 6) FROM customer
    """,
)
def q_a6(spark, sf_dir):
    return uniqueness_profile(
        _t(spark, sf_dir, "customer"), ["c_custkey", "c_name", "c_mktsegment"]
    )


@register(
    "a8_score_histogram",
    """
    SELECT CAST(least(floor(l_discount * 20), 19) AS BIGINT) AS bucket,
           count(*) AS n
    FROM lineitem GROUP BY 1
    """,
)
def q_a8(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    bucket = F.least(F.floor(F.col("l_discount") * 20), F.lit(19)).cast("long")
    return li.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n"))


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "w2_topk_per_group",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM ranked WHERE rnk <= 3
    """,
)
def q_w2(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter("rnk <= 3")
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


@register(
    "o4_fuzzy_argmax",
    """
    WITH ranked AS (
      SELECT c_nationkey, c_name, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_name DESC) AS rn,
             max(c_acctbal) OVER (PARTITION BY c_nationkey) AS mx
      FROM customer
    )
    SELECT c_nationkey, c_name AS best_name, round(mx, 2) AS best_score
    FROM ranked WHERE rn = 1
    """,
)
def q_o4(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.max_by("c_name", F.struct("c_acctbal", "c_name")).alias("best_name"),
        F.round(F.max("c_acctbal"), 2).alias("best_score"),
    )


@register(
    "events_hourly_agg",
    """
    SELECT user_id, date_trunc('hour', ts) AS hour, event_type,
           count(*) AS n, round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def q_events_hourly(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))


@register(
    "events_sessionize",
    """
    WITH marked AS (
      SELECT user_id, ts, event_type,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)
    ), sessions AS (
      SELECT user_id, ts, event_type,
             -- CAST: DuckDB's windowed sum() yields HUGEINT, which the
             -- driver's type-sensitive value hash sees as float64 while
             -- Spark emits BIGINT (round-1 hash_match=false, values equal)
             CAST(sum(new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_type) AS BIGINT)
               AS session_seq
      FROM marked
    )
    SELECT user_id, session_seq, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sessions GROUP BY user_id, session_seq
    """,
)
def q_events_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity): lag + cumulative sum
    over a per-user window — the standard large-scale formulation (one
    shuffle on user_id covers both windows and the final groupBy)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_type")
    secs = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = secs - F.lag(secs).over(w)
    marked = e.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    sess = marked.withColumn(
        "session_seq",
        F.sum("new_session").over(
            Window.partitionBy("user_id").orderBy("ts", "event_type")
        ),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "events_asof_join",
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), errors AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'error'
    )
    SELECT c.event_id, c.user_id,
           e.value AS asof_value, e.ts AS asof_ts
    FROM clicks c ASOF LEFT JOIN errors e
      ON c.user_id = e.user_id AND c.ts >= e.ts
    """,
)
def q_events_asof(spark, sf_dir):
    """Most recent prior 'error' for each 'click', per user — the as-of
    join Spark lacks, as a one-shuffle window composition."""
    from datamatcher_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    errors = ev.filter("event_type = 'error'").select("user_id", "ts", "value")
    return asof_join(
        clicks, errors, ["user_id"], "ts", "ts", right_payload=["value"]
    ).select("event_id", "user_id", "asof_value", "asof_ts")


@register(
    "rollup_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 2) AS revenue, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "events_json_extract",
    """
    SELECT event_id, CAST(json_extract(props, '$.k') AS VARCHAR) AS k_value
    FROM events WHERE event_id < 500
    """,
)
def q_events_json(spark, sf_dir):
    e = _t(spark, sf_dir, "events").filter("event_id < 500")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").alias("k_value")
    )


# --------------------------------------------------------------------------
# §2.9 write modes + rules (base = orders, source = customer)
# --------------------------------------------------------------------------

_WRITE_MODE_BASE_SQL = """
    WITH j AS (
      SELECT o_orderkey,
             CASE WHEN o_orderpriority LIKE '1-%' THEN NULL
                  ELSE o_orderpriority END AS cur,
             c_mktsegment AS new
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    ),
    e AS (
      SELECT o_orderkey, cur, new,
        (cur IS NULL OR trim(cur) = '' OR upper(trim(cur)) IN
           ('NULL','N/A','#N/A','-','BRAK','NAN','NONE')) AS cur_empty,
        (new IS NULL OR trim(new) = '' OR upper(trim(new)) IN
           ('NULL','N/A','#N/A','-','BRAK','NAN','NONE')) AS new_empty
      FROM j
    )
"""


def _write_mode_df(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey, "left")
    cur = F.when(
        F.col("o_orderpriority").startswith("1-"), F.lit(None).cast("string")
    ).otherwise(F.col("o_orderpriority"))
    return j.select(
        "o_orderkey", cur.alias("cur"), F.col("c_mktsegment").alias("new")
    )


def _register_write_mode(mode: WriteMode, sql_value: str, sql_change: str):
    @register(
        f"write_mode_{mode.value}",
        _WRITE_MODE_BASE_SQL
        + f"SELECT o_orderkey, {sql_value} AS merged, {sql_change} AS change_type FROM e",
    )
    def q(spark, sf_dir, _mode=mode):
        df = _write_mode_df(spark, sf_dir)
        value, change = apply_write_mode(F.col("cur"), F.col("new"), _mode)
        return df.select(
            "o_orderkey", value.alias("merged"), change.alias("change_type")
        )


_register_write_mode(
    WriteMode.OVERWRITE,
    "CASE WHEN cur_empty OR cur IS DISTINCT FROM new THEN new ELSE cur END",
    "CASE WHEN cur_empty THEN 'new' WHEN cur IS DISTINCT FROM new THEN 'changed' "
    "ELSE 'unchanged' END",
)
_register_write_mode(
    WriteMode.FILL_EMPTY,
    "CASE WHEN cur_empty AND NOT new_empty THEN new ELSE cur END",
    "CASE WHEN cur_empty AND NOT new_empty THEN 'new' ELSE 'unchanged' END",
)
_register_write_mode(
    WriteMode.APPEND,
    "CASE WHEN NOT new_empty THEN (CASE WHEN cur_empty THEN new "
    "ELSE concat(cur, ' | ', new) END) ELSE cur END",
    "CASE WHEN NOT new_empty THEN (CASE WHEN cur_empty THEN 'new' ELSE 'changed' END) "
    "ELSE 'unchanged' END",
)
_register_write_mode(
    WriteMode.OVERWRITE_IF_DIFFERENT,
    "CASE WHEN cur IS DISTINCT FROM new THEN new ELSE cur END",
    "CASE WHEN cur IS DISTINCT FROM new THEN "
    "(CASE WHEN cur_empty THEN 'new' ELSE 'changed' END) ELSE 'unchanged' END",
)
_register_write_mode(
    WriteMode.OVERWRITE_IF_LONGER,
    "CASE WHEN coalesce(length(new), 0) > coalesce(length(cur), 0) THEN new "
    "ELSE cur END",
    "CASE WHEN coalesce(length(new), 0) > coalesce(length(cur), 0) THEN "
    "(CASE WHEN cur_empty THEN 'new' ELSE 'changed' END) ELSE 'unchanged' END",
)
_register_write_mode(
    WriteMode.OVERWRITE_IF_NOT_EMPTY,
    "CASE WHEN NOT new_empty AND (cur_empty OR cur IS DISTINCT FROM new) THEN new "
    "ELSE cur END",
    "CASE WHEN NOT new_empty AND cur_empty THEN 'new' "
    "WHEN NOT new_empty AND cur IS DISTINCT FROM new THEN 'changed' "
    "ELSE 'unchanged' END",
)


@register(
    "rule_operators_filter",
    """
    SELECT o_orderkey FROM orders
    WHERE contains(lower(coalesce(o_orderpriority, '')), 'urgent')
      AND coalesce(TRY_CAST(coalesce(CAST(o_totalprice AS VARCHAR), '') AS DOUBLE)
                   > 50000.0, false)
    """,
)
def q_rules(spark, sf_dir):
    from datamatcher_spark.operators.merge import RuleOperator, rule_predicate

    o = _t(spark, sf_dir, "orders")
    p1 = rule_predicate(RuleOperator.CONTAINS, F.col("o_orderpriority"), "URGENT")
    p2 = rule_predicate(RuleOperator.GREATER_THAN, F.col("o_totalprice"), "50000")
    return o.filter(p1 & p2).select("o_orderkey")


# --------------------------------------------------------------------------
# training-data operators: dedup / text / similarity (documents, embeddings)
# --------------------------------------------------------------------------

@register(
    "dedup_exact",
    """
    WITH keyed AS (
      SELECT doc_id AS id,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS dup_key
      FROM documents
    )
    SELECT id, dup_key,
           count(*) OVER (PARTITION BY dup_key) AS group_size,
           min(id) OVER (PARTITION BY dup_key) AS keep_id,
           id <> min(id) OVER (PARTITION BY dup_key) AS is_duplicate
    FROM keyed
    """,
)
def q_dedup_exact(spark, sf_dir):
    return exact_duplicates(_t(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "dedup_fingerprint",
    """
    WITH keyed AS (
      SELECT doc_id AS id,
             md5(array_to_string(list_sort(list_distinct(list_filter(
               string_split_regex(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),
                                  '\\s+'), t -> t <> ''))), ' ')) AS dup_key
      FROM documents
    )
    SELECT id, dup_key,
           count(*) OVER (PARTITION BY dup_key) AS group_size,
           min(id) OVER (PARTITION BY dup_key) AS keep_id,
           id <> min(id) OVER (PARTITION BY dup_key) AS is_duplicate
    FROM keyed
    """,
)
def q_dedup_fp(spark, sf_dir):
    return fingerprint_duplicates(_t(spark, sf_dir, "documents"), "doc_id", "text")


@register("dedup_minhash_lsh", None)  # seeded UDF — rows-only + pytest oracle
def q_dedup_minhash(spark, sf_dir):
    return minhash_near_duplicates(
        _t(spark, sf_dir, "documents"), "doc_id", "text", jaccard_threshold=0.6
    )


@register("dedup_simhash", None)  # seeded UDF — rows-only + pytest oracle
def q_dedup_simhash(spark, sf_dir):
    return simhash_near_duplicates(
        _t(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=8
    )


@register(
    "dedup_ngram_jaccard",
    """
    WITH base AS (
      SELECT doc_id AS id,
             regexp_replace(lower(text), '\\s+', ' ', 'g') AS norm
      FROM documents
    ), grams AS (
      SELECT id, substring(norm, 1, 24) AS bk,
             list_distinct(list_transform(
               range(0, greatest(length(norm) - 5, 0) + 1),
               i -> substring(norm, CAST(i + 1 AS INTEGER), 5))) AS g
      FROM base
    )
    SELECT a.id AS id_a, b.id AS id_b,
           round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.g, b.g))), 6) AS jaccard
    FROM grams a JOIN grams b ON a.bk = b.bk AND a.id < b.id
    WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
          / len(list_distinct(list_concat(a.g, b.g))) >= 0.6
    """,
)
def q_dedup_ngram(spark, sf_dir):
    return ngram_jaccard_duplicates(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=5, threshold=0.6
    )


@register(
    "embedding_near_dup_exact",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding, b.embedding), 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
    """,
)
def q_embed_dedup(spark, sf_dir):
    return embedding_near_duplicates(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        threshold=0.95, n_planes=0,
    )


@register(
    "text_stats",
    """
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                t -> t <> '')) AS BIGINT) AS n_tokens,
           md5(array_to_string(list_sort(list_distinct(list_filter(
             string_split_regex(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),
                                '\\s+'), t -> t <> ''))), ' ')) AS fp
    FROM documents
    """,
)
def q_textstats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count_expr(F.col("text")).alias("n_tokens"),
        fingerprint_expr(F.col("text")).alias("fp"),
    )


@register("text_quality_langid", None)  # heuristic composites — rows-only
def q_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        quality_score_expr(F.col("text")).alias("quality"),
        lang_id_expr(F.col("text")).alias("lang_pred"),
    )


@register(
    "simsearch_topk",
    """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, round(list_cosine_similarity(embedding, q.qv), 6) AS cosine
    FROM embeddings, q
    ORDER BY list_cosine_similarity(embedding, q.qv) DESC, vec_id ASC
    LIMIT 10
    """,
)
def q_simsearch(spark, sf_dir):
    from datamatcher_spark.operators.similarity_search import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    return cosine_topk(emb, "embedding", qv, k=10)


@register(
    "simsearch_topk_per_label",
    """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT vec_id, label,
             round(list_cosine_similarity(embedding, q.qv), 6) AS cosine
      FROM embeddings, q
    ), ranked AS (
      SELECT vec_id, label, cosine,
             row_number() OVER (PARTITION BY label
                                ORDER BY cosine DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT vec_id, label, cosine, rank FROM ranked WHERE rank <= 3
    """,
)
def q_simsearch_label(spark, sf_dir):
    from datamatcher_spark.operators.similarity_search import cosine_topk_per_label

    emb = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    return cosine_topk_per_label(emb, "embedding", qv, "label", k=3)


@register("simsearch_ivf", None)  # driver-fit centroids — rows-only
def q_simsearch_ivf(spark, sf_dir):
    from datamatcher_spark.operators.similarity_search import IVFIndex

    emb = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
    idx = IVFIndex.fit(emb, "embedding", nlist=8, seed=5)
    return idx.search(idx.assign(emb, "embedding"), "embedding", qv, k=10, nprobe=4)


@register("multimodal_features", None)  # binary plumbing — rows-only
def q_multimodal(spark, sf_dir):
    from datamatcher_spark.operators.multimodal import (
        extract_features,
        synthesize_media,
    )

    return extract_features(synthesize_media(spark, n=48, seed=3), decoder="fake")


@register(
    "validation_number_soft",
    """
    WITH t AS (
      SELECT CASE WHEN c_custkey % 7 = 0 THEN c_name
                  ELSE CAST(c_acctbal AS VARCHAR) END AS mixed
      FROM customer
    )
    SELECT 'mixed' AS column, 'number' AS expected_type,
           count(*) FILTER (WHERE NOT (
             mixed IS NULL OR trim(mixed) = ''
             OR TRY_CAST(replace(trim(mixed), ',', '.') AS DOUBLE) IS NOT NULL
           )) AS warning_count,
           count(*) AS total_rows
    FROM t
    """,
)
def q_validation_number(spark, sf_dir):
    from datamatcher_spark.operators.finalize import validation_warnings

    c = _t(spark, sf_dir, "customer").withColumn(
        "mixed",
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_name")).otherwise(
            F.col("c_acctbal").cast("string")
        ),
    )
    return validation_warnings(c, "mixed", "number")


@register(
    "validation_date_soft",
    """
    WITH t AS (
      SELECT CASE WHEN o_orderkey % 5 = 0 THEN o_orderpriority
                  ELSE strftime(o_orderdate, '%Y-%m-%d') END AS d
      FROM orders
    )
    SELECT 'd' AS column, 'date' AS expected_type,
           count(*) FILTER (WHERE NOT (
             d IS NULL OR trim(d) = ''
             OR regexp_matches(trim(d), '^\\d{4}-\\d{2}-\\d{2}')
             OR regexp_matches(trim(d), '^\\d{2}[./-]\\d{2}[./-]\\d{4}')
             OR regexp_matches(trim(d), '^\\d{2}[./-]\\d{2}[./-]\\d{2}$')
           )) AS warning_count,
           count(*) AS total_rows
    FROM t
    """,
)
def q_validation_date(spark, sf_dir):
    from datamatcher_spark.operators.finalize import validation_warnings

    o = _t(spark, sf_dir, "orders").withColumn(
        "d",
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_orderpriority")).otherwise(
            F.date_format("o_orderdate", "yyyy-MM-dd")
        ),
    )
    return validation_warnings(o, "d", "date")


@register(
    "text_extraction_chain",
    """
    SELECT doc_id,
           regexp_replace(trim(replace(replace(
             regexp_replace(text, '<[^<]+?>', '', 'g'),
             chr(10), ' '), chr(13), '')), '\\s+', ' ', 'g') AS extracted
    FROM documents
    """,
)
def q_extract(spark, sf_dir):
    from datamatcher_spark.norm.text import extract_text_expr

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", extract_text_expr(F.col("text")).alias("extracted"))
