"""Layer B — the relational/scalar operator surface (SURVEY §2B).

One registry entry per `queries()` key: ``(spark_fn, oracle_sql)``.
``spark_fn(spark, sf_dir) -> DataFrame``; ``oracle_sql`` is the ANSI
equivalent DuckDB runs on the same parquet (pre-registered views) —
``None`` marks a non-SQL-expressible op (driver then records a weaker
rows-only check per __spark_entry__.py:35-36; the full check lives in
pytest).

Alias discipline (driver compare is by SORTED column name +
order-insensitive value hash): every computed column is aliased
IDENTICALLY on both sides; double aggregates are rounded on both
sides (Spark and DuckDB may sum doubles in different orders); integer
computed columns are cast to BIGINT on both sides (DuckDB's sum(int)
is HUGEINT, length() is BIGINT, while Spark uses int — explicit casts
keep the schemas aligned).

Scale notes: these are the building blocks the crawl engine uses
(SURVEY §2B "Used by" column); each is written the way it should run
on 100 TB — filters before joins (Catalyst pushes them into the scan),
broadcast hints on dimension tables, window tiebreaks that keep
ordering deterministic under any partitioning.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------- scans

def scan_parquet(spark, sf):
    return _t(spark, sf, "lineitem").agg(F.count("*").alias("n"))


def scan_projection_pushdown(spark, sf):
    # column pruning: ReadSchema in explain() shows only 2 columns
    return _t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")


def filter_pred(spark, sf):
    o = _t(spark, sf, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_totalprice") > 1000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", "o_custkey", "o_totalprice")


def filter_range_ts(spark, sf):
    e = _t(spark, sf, "events")
    return e.filter(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
    ).agg(F.count("*").alias("n"))


def project_expr(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("rev"),
        (F.col("l_quantity") * 2).cast("double").alias("qty2"),
    )


# --------------------------------------------------------------- joins

def join_inner_equi(spark, sf):
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 4).alias("sum_bal"),
        )
    )


def join_broadcast(spark, sf):
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")  # dimension: force broadcast (A11 shape)
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_cust"))
    )


def join_left_anti(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def join_left_semi(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 50000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


def join_left_outer(spark, sf):
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n_items"))
    )


def join_full_outer(spark, sf):
    """Full-outer equi-join as a standalone taxonomy key (previously
    only exercised inside sink_merge_upsert): customers with no
    orders AND orders whose customer fell outside the filtered dim
    slice both survive with NULLs — the reconciliation shape (state
    diff, ledger merge) where losing either side's unmatched rows is
    the bug."""
    c = _t(spark, sf, "customer").filter(
        F.col("c_custkey") % 3 == 0
    ).select("c_custkey", "c_acctbal")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderkey") < 6000
    ).select("o_orderkey", "o_custkey", "o_totalprice")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "full_outer")
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("c_acctbal", 2).alias("bal"),
            F.round("o_totalprice", 2).alias("price"),
        )
    )


def join_nested_loop_theta(spark, sf):
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    return (
        s.crossJoin(n)
        .filter(
            (F.col("s_acctbal") > F.col("n_nationkey") * 100)
            & (F.col("s_nationkey") != F.col("n_nationkey"))
        )
        .select("s_suppkey", "n_nationkey")
    )


def join_range_interval(spark, sf):
    """Pairs of same-user events within a 1-hour window, TIME-BANDED.

    A bare equi-join on user_id alone emits O(events-per-user²)
    intermediate rows before the interval filter — a hot user with
    10^6 events yields 10^12 pairs at 100 TB.  Banding adds
    floor(epoch/3600) to the join key: a qualifying pair
    (0 < b_ts - a_ts <= 1h) always has band(b) ∈ {band(a), band(a)+1},
    so the left side explodes to those two bands and the join key
    (user, band) bounds each key group to TWO hours of one user's
    events — skew now depends on events/user/hour, not on total user
    history.  Each qualifying pair matches exactly one exploded band
    (band(b) is a single value), so counts are unchanged.  The band is
    date_trunc('hour') — wall-clock arithmetic on the tz-naive ts,
    immune to session-timezone/DST surprises an epoch-seconds bucket
    (unix_timestamp) could pick up.
    """
    e = _t(spark, sf, "events")

    def band(c):
        return F.date_trunc("hour", c)

    a = e.select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("a_ts"),
    ).withColumn(
        "band",
        F.explode(F.array(
            band(F.col("a_ts")),
            band(F.col("a_ts")) + F.expr("INTERVAL 1 HOUR"),
        )),
    )
    b = e.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("b_ts"),
        band(F.col("ts")).alias("band"),
    )
    return (
        a.join(b, ["u", "band"])
        .filter(
            (F.col("b_ts") > F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("u")
        .agg(F.count("*").alias("n_pairs"))
    )


def join_asof(spark, sf):
    """AS-OF (point-in-time) join — the training-pipeline staple Spark
    has no native operator for: each 'error' event is matched to the
    most recent 'purchase' by the same user at or before it (the
    attribution/feature-lookup shape: "state as of event time").

    Implemented as the scale-safe union + sorted carry-forward, NOT a
    pair join: tag both sides, sort each user's rows by (ts, side)
    with the right side first at ties (so a purchase at exactly e.ts
    matches, mirroring ASOF's ``<=``), and carry the last non-null
    purchase forward with ``last(..., ignorenulls=True)`` over a
    running row frame.  One shuffle on user_id, O(n log n) per user,
    ZERO intermediate pair blowup — a hot user with 10^6 events costs
    10^6 window rows, not the 10^12 pairs an equi-join + filter would
    emit; this is the plan that survives 100 TB.  The right side is
    pre-deduped to one purchase per (user, ts) — max(event_id), same
    on both engines — because ASOF semantics are otherwise undefined
    under timestamp ties.  Unmatched errors keep NULLs (left asof).
    Epoch-micros arithmetic for the gap, tz-independent.  DuckDB
    verifies with its native ASOF LEFT JOIN."""
    e = _t(spark, sf, "events")
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )
    err = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    un = p.select(
        "user_id", "ts", F.lit(0).alias("src"),
        F.lit(None).cast("long").alias("event_id"), "purchase_id",
    ).unionByName(
        err.select(
            "user_id", "ts", F.lit(1).alias("src"), "event_id",
            F.lit(None).cast("long").alias("purchase_id"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    return (
        un.withColumn("pid", F.last("purchase_id", ignorenulls=True).over(w))
        .withColumn(
            "p_us",
            F.last(F.when(F.col("src") == 0, us), ignorenulls=True).over(w),
        )
        .filter(F.col("src") == 1)
        .select(
            "event_id", "user_id", F.col("pid").alias("purchase_id"),
            (us - F.col("p_us")).alias("gap_us"),
        )
    )


# ---------------------------------------------------------------- aggs

def agg_hash_counts(spark, sf):
    # TPC-H Q1 shape: partial (map-side) + final agg, free from Catalyst
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("n"),
        )
    )


def agg_count_distinct(spark, sf):
    return _t(spark, sf, "orders").agg(
        F.countDistinct("o_custkey").alias("n_cust")
    )


def agg_approx_distinct(spark, sf):
    # approximate — rows-only driver check (SURVEY §2B)
    return _t(spark, sf, "orders").agg(
        F.approx_count_distinct("o_custkey").alias("n_approx")
    )


def agg_rollup(spark, sf):
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_cust"))
    )


def agg_cube(spark, sf):
    return (
        _t(spark, sf, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
    )


def agg_first_by_key(spark, sf):
    # A8 first-discovery-wins shape: max_by with a unique tiebreak
    c = _t(spark, sf, "customer")
    return c.groupBy("c_nationkey").agg(
        F.expr("max_by(c_custkey, struct(c_acctbal, c_custkey))").alias("top_cust")
    )


# ------------------------------------------------------------- windows

def win_row_number(spark, sf):
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).cast("long").alias("rn"),
    )


def win_rank_dense(spark, sf):
    c = _t(spark, sf, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return c.select(
        "c_custkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


def win_lag_lead(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
        .cast("long")
        .alias("gap_s"),
    )


def win_frame_agg(spark, sf):
    # running fetch totals vs cap C shape (A10)
    o = _t(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("run_total"),
    )


# -------------------------------------------------------- sorts/limits

def sort_key(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .limit(100)
    )


def limit_global(spark, sf):
    return (
        _t(spark, sf, "orders")
        .orderBy("o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .limit(50)
    )


def topk_per_group(spark, sf):
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.col("rn").cast("long").alias("rn"))
    )


# ------------------------------------------------------------- set ops

def set_union_dedup(spark, sf):
    c = _t(spark, sf, "customer")
    a = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return a.union(b).distinct()


def set_intersect(spark, sf):
    o = _t(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


def set_except(spark, sf):
    o = _t(spark, sf, "orders")
    a = o.select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.subtract(b)  # EXCEPT (distinct) semantics


# ------------------------------------------------------ scalar functions

def str_fns(spark, sf):
    p = _t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.length("p_type").cast("long").alias("type_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.trim(F.col("p_name")).alias("tname"),
        F.lpad("p_brand", 12, "*").alias("padded"),
        F.regexp_extract("p_type", "([A-Z]+)", 1).alias("first_word"),
        F.col("p_name").startswith("a").alias("starts_a"),
    )


def date_fns(spark, sf):
    e = _t(spark, sf, "events")
    return (
        e.groupBy(
            F.date_trunc("day", "ts").alias("day"),
            F.year("ts").cast("long").alias("y"),
            F.month("ts").cast("long").alias("m"),
        )
        .agg(F.count("*").alias("n"))
    )


def math_fns(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.ceil("l_quantity").cast("long").alias("cq"),
        F.floor("l_quantity").cast("long").alias("fq"),
        F.abs(F.col("l_discount") - 0.05).cast("double").alias("adisc"),
        F.round(F.log2(F.col("l_extendedprice") + 1), 4).alias("lg"),
        F.greatest("l_tax", "l_discount").alias("gmax"),
        F.least("l_tax", "l_discount").alias("gmin"),
    )


def array_fns(spark, sf):
    em = _t(spark, sf, "embeddings")
    demb = F.col("embedding").cast("array<double>")
    return em.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at(demb, 1), 6).alias("e1"),
        F.round(F.element_at(demb, 64), 6).alias("e64"),
        F.round(
            F.aggregate(demb, F.lit(0.0), lambda a, x: a + x), 4
        ).alias("esum"),
        F.round(
            F.aggregate(
                F.zip_with(demb, demb, lambda x, y: x * y),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            4,
        ).alias("enorm2"),
    )


def map_json_fns(spark, sf):
    e = _t(spark, sf, "events")
    return (
        e.select(F.get_json_object("props", "$.k").cast("long").alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n"))
    )


def cond_fns(spark, sf):
    o = _t(spark, sf, "orders")
    return (
        o.select(
            F.when(F.col("o_orderstatus") == "F", "finished")
            .when(F.col("o_orderstatus") == "O", "open")
            .otherwise("other")
            .alias("status_label"),
            F.coalesce(
                F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")),
                F.lit("DEFAULT"),
            ).alias("prio"),
        )
        .groupBy("status_label", "prio")
        .agg(F.count("*").alias("n"))
    )


def hash_fns(spark, sf):
    # engine-pinned hashes (xxhash64 partitioning etc.) — DuckDB's hash
    # functions differ, so rows-only here; golden values in pytest
    c = _t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.xxhash64("c_name").alias("xxh"),
        F.sha2(F.col("c_name"), 256).alias("sha"),
        F.crc32(F.col("c_name").cast("binary")).alias("crc"),
        F.pmod(F.xxhash64("c_name"), F.lit(64)).alias("shard"),
    )


# ------------------------------------------- streaming-taxonomy surface

def stream_tumbling_1h(spark, sf):
    e = _t(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_v"))
        .select(F.col("win.start").alias("window_start"), "n", "sum_v")
    )


def stream_sliding(spark, sf):
    e = _t(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("window_start"), "n")
    )


def stream_session(spark, sf):
    e = _t(spark, sf, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("win.start").alias("session_start"), "n_events")
    )


# --------------------------------------------- UDF/UDAF taxonomy forms

def udf_grouped_map(spark, sf):
    """SURVEY §2B ``udf_grouped_map``: grouped-map ``applyInPandas`` —
    the per-group Arrow-batch form (the engine's A18 bloom rebuild uses
    the sibling mapInPandas; this is the per-KEY-grouped variant).
    Ranks documents inside each source by (n_chars, doc_id): integer
    output, so the DuckDB window-function oracle matches exactly."""

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        out = pdf[["doc_id", "source"]].copy()
        out["rank_in_source"] = pd.RangeIndex(1, len(pdf) + 1).astype("int64")
        return out

    d = _t(spark, sf, "documents").select("doc_id", "source", "n_chars")
    return d.groupBy("source").applyInPandas(
        rank_group, "doc_id long, source string, rank_in_source long"
    )


def udaf_via_applyInPandas(spark, sf):
    """SURVEY §2B ``udaf_via_applyInPandas``: grouped-agg
    ``pandas_udf`` UDAFs (Series -> scalar per group) — the vectorized
    custom-aggregate form (the engine's counter reductions use
    built-ins; this demonstrates the custom path).  Integer reductions
    so the SQL oracle is exact."""

    @F.pandas_udf("long")
    def total_chars(v: pd.Series) -> int:
        return int(v.sum())

    @F.pandas_udf("long")
    def max_chars(v: pd.Series) -> int:
        return int(v.max())

    @F.pandas_udf("long")
    def n_docs(v: pd.Series) -> int:
        return len(v)

    d = _t(spark, sf, "documents")
    return d.groupBy("lang").agg(
        total_chars("n_chars").alias("total_chars"),
        max_chars("n_chars").alias("max_chars"),
        n_docs("n_chars").alias("n_docs"),
    )


def udtf_lateral_tokens(spark, sf):
    """SURVEY §2B ``udtf`` — Python UDTF (Spark 4 ``@udtf``), the
    one-row→many-rows taxonomy form, shaped like the A13 extraction
    fan-out (a token stream with document positions).  The ENGINE
    keeps ``posexplode`` for extraction — pure JVM, the §2B rationale
    for the hot path stands — this key demonstrates the UDTF form
    itself with an exact DuckDB oracle (``unnest`` zipped with
    ``generate_subscripts``).  ``useArrow=True`` keeps the JVM↔Python
    transfer Arrow-batched; the per-row ``eval`` is inherent to the
    UDTF protocol, which is why the engine does not use it.  Bounded
    to doc_id < 25 so the fan-out stays fixture-sized."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, pos: int, token: string",
          useArrow=True)
    class TokenStream:
        def eval(self, doc_id, text):
            for i, tok in enumerate(text.split(" ")):
                yield doc_id, i + 1, tok

    _t(spark, sf, "documents").where(F.col("doc_id") < 25).select(
        "doc_id", "text"
    ).createOrReplaceTempView("udtf_docs_src")
    spark.udtf.register("token_stream", TokenStream)
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.token FROM udtf_docs_src d, "
        "LATERAL token_stream(d.doc_id, d.text) t"
    )


def _stream_src_dir(sf: str, table: str = "events") -> str:
    """Stage a single-file fixture table into a per-source temp DIR —
    FileStreamSource requires a directory, the fixtures are single
    files.  Race-safe first-writer-wins rename (same discipline as the
    multimodal fixture writer); keyed by absolute source path PLUS
    mtime/size so concurrent/repeated callers share one staging and a
    regenerated fixture at the same path never serves a stale copy."""
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    src_file = os.path.abspath(f"{sf}/{table}.parquet")
    st = os.stat(src_file)
    key = hashlib.md5(
        f"{src_file}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"spider1_stream_{key}")
    if not os.path.isdir(path):
        staging = path + "." + uuid.uuid4().hex[:8]
        os.makedirs(staging)
        shutil.copy(src_file, os.path.join(staging, f"{table}.parquet"))
        try:
            os.rename(staging, path)
        except OSError:  # concurrent writer won the rename
            shutil.rmtree(staging, ignore_errors=True)
    return path


def _scratch_dir(key: str, sf: str) -> str:
    """Stable per-(key, source-dir, process) scratch path — reused
    across invocations instead of mkdtemp-per-call, so the reps
    harness and repeated driver rounds don't accumulate unbounded
    /tmp garbage (each sink/roundtrip key writes a table slice).
    Callers overwrite (or pre-clean) the returned path, which is safe
    under reuse; the pid suffix keeps concurrent processes from
    racing each other's writes."""
    import hashlib
    import os
    import tempfile

    h = hashlib.md5(os.path.abspath(sf).encode()).hexdigest()[:8]
    d = os.path.join(
        tempfile.gettempdir(), f"spider1_{key}_{h}_{os.getpid()}"
    )
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, "t")


def stream_watermark_late(spark, sf):
    """SURVEY §2B streaming taxonomy: WATERMARK + late-data discipline
    — a real ``readStream`` tumbling-window aggregation in APPEND
    output mode.  Append mode only emits a window after the watermark
    (max event time − 1 h delay) passes the window END, i.e. after the
    engine has decided no more late rows can join it; windows still
    open when the source drains are withheld.  This is the exact
    late-data mechanism SURVEY §2B documented as the upgrade path for
    a continuously-fed frontier, demonstrated end-to-end.

    Determinism + tz-independence: the staged source is one file →
    ``availableNow`` processes it as ONE data micro-batch (every
    window aggregates ALL its rows before any emission decision), then
    the trailing no-data batch advances the watermark to
    ``ms(max event time) − 3 600 000`` and flushes closed windows.
    Event time is built from the NTZ wall clock by pure arithmetic
    (micros since the NTZ epoch → ``timestamp_micros``), and the
    output is integer epoch-ms — no session-timezone round-trip on
    either side, verified under an adversarial session tz.  Emission
    boundary is ``window_end <= watermark`` (pinned by the exact-
    boundary fixture in tests/test_entry_contract.py), which the SQL
    oracle mirrors.  At scale: state is shuffled by window key, one
    row per open window, and the watermark bounds the state store —
    the standard production shape for late-data streaming aggs."""
    import uuid

    path = _stream_src_dir(sf)
    schema = spark.read.parquet(path).schema
    # NTZ wall time -> epoch micros (pure arithmetic, no tz) -> the
    # instant with that UTC wall time (watermarks require TIMESTAMP)
    ev = F.timestamp_micros(
        F.expr(
            "timestampdiff(MICROSECOND, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
    )
    name = "wm_late_" + uuid.uuid4().hex[:12]
    q = (
        spark.readStream.schema(schema)
        .parquet(path)
        .withColumn("ev", ev)
        .withWatermark("ev", "1 hour")
        .groupBy(F.window("ev", "1 hour").alias("win"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_v"),
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # Materialize, then drop the memory-sink table: otherwise every
    # invocation pins a full result copy in the driver for the session
    # lifetime (the reps harness calls each key 1+N times).  The drop
    # runs in finally so a failed materialization cannot leak the
    # sink either (ADVICE r3 discipline, r4 review finding).
    try:
        out = spark.table(name).select(
            F.unix_millis(F.col("win.start")).alias("window_ms"),
            "n", "sum_v",
        ).localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(name)
    return out


def stream_stateful_first_seen(spark, sf):
    """SURVEY §2B ``applyInPandasWithState``: a REAL Structured
    Streaming stateful operator — the crawl's seen-filter semantics as
    a stream.  readStream over the events parquet, keyed state per
    (user_id, event_type) tracking first-seen ts + count, memory sink,
    ``availableNow`` trigger (drains the source then stops, so the
    call is deterministic and returns a batch DataFrame).

    Per-key output is min(ts)/count — order-insensitive within a key,
    so the result is identical at any partitioning/batch split and the
    plain GROUP BY SQL oracle matches exactly.  At scale this is the
    standard streaming-dedup shape: state shuffled by key, one state
    row per live key, late rows folded by the same min/sum (a
    production deploy adds a watermark + state TTL to bound the
    store).  State stores epoch-micros (state schema longs only)."""
    import uuid

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    path = _stream_src_dir(sf)
    schema = spark.read.parquet(path).schema

    def first_seen(key, pdfs, state: GroupState):
        first_us, n = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            ts = pd.Series(pdf["ts"])
            if getattr(ts.dtype, "tz", None) is not None:
                # tz-aware arrow batch: normalize to the stored UTC
                # instant (same int64 micros DuckDB's epoch_us reads)
                ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
            us = ts.astype("datetime64[us]").astype("int64")
            lo = int(us.min())
            first_us = lo if first_us is None else min(first_us, lo)
            n += len(us)
        state.update((first_us, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_type": [key[1]],
                "first_us": pd.array([first_us], dtype="Int64"),
                "n_events": pd.array([n], dtype="Int64"),
            }
        )

    name = "first_seen_" + uuid.uuid4().hex[:12]
    q = (
        spark.readStream.schema(schema)
        .parquet(path)
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            first_seen,
            outputStructType=(
                "user_id long, event_type string, "
                "first_us long, n_events long"
            ),
            stateStructType="first_us long, n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode emits one row per key per micro-batch; availableNow
    # may split the drain into several batches, so keep the LAST (the
    # running min/count folds monotonically — max n_events is final)
    t = spark.table(name)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("n_events").desc()
    )
    # first_us stays integer epoch-micros end-to-end (state, output,
    # oracle epoch_us()) — no timestamp/session-tz round-trip anywhere
    try:
        out = (
            t.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("user_id", "event_type", "first_us", "n_events")
        ).localCheckpoint(eager=True)
    finally:
        # drop the memory sink even on failure (see
        # stream_watermark_late)
        spark.catalog.dropTempView(name)
    return out


# ------------------------------------------------------ sources / sinks

SEED_URLS = [
    "https://host0.example/",
    "https://host1.example/",
    "https://host2.example/",
    "https://host3.example/",
]


def source_inline(spark, sf):
    """A1 seed source: ordered in-memory list -> DataFrame with an
    EXPLICIT rank column (never monotonically_increasing_id — that is
    partition-order dependent and breaks SPEC-3 determinism)."""
    rows = [(i, u) for i, u in enumerate(SEED_URLS)]
    return spark.createDataFrame(rows, "seed_rank INT, url STRING")


def sink_append_parquet(spark, sf):
    """A16 sink path: two parquet appends then read-back — the same
    write discipline the images sink uses (append-only, no overwrite
    of committed data)."""
    import shutil

    out = _scratch_dir("sink", sf)
    shutil.rmtree(out, ignore_errors=True)  # exactly-two-appends count
    df = _t(spark, sf, "region")
    df.write.mode("append").parquet(out)
    df.write.mode("append").parquet(out)
    return spark.read.parquet(out).agg(
        F.count("*").cast("long").alias("n_after_two_appends")
    )


def sink_partitioned(spark, sf):
    """A16 bucketed/partitioned sink: hive-style partitionBy on write,
    then a partition-pruned read-back (only the o_orderstatus=F
    directory is scanned — PartitionFilters in explain())."""
    out = _scratch_dir("sinkp", sf)
    o = _t(spark, sf, "orders")
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.filter(F.col("o_orderstatus") == "F")
        .agg(F.count("*").cast("long").alias("n_f"),
             F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
    )


def _insert_overwrite_plan(spark, sf, probe=None):
    """Build the dynamic-overwrite table; returns (out_dir, read-back
    DataFrame).  Split out so pytest can assert on the FILESYSTEM —
    untouched partitions keep their exact file set — which no SQL
    oracle can see; ``probe(out_dir)`` runs between the base write
    and the dynamic overwrite so the test can snapshot the base
    partitions' file inventory."""
    import shutil

    out = _scratch_dir("iow", sf)
    shutil.rmtree(out, ignore_errors=True)  # idempotent re-invocation
    o = _t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    (
        o.write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("o_orderstatus")
        .parquet(out)
    )
    if probe is not None:
        probe(out)
    upd = o.filter(F.col("o_orderstatus") == "F").withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    (
        upd.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderstatus")
        .parquet(out)
    )
    return out, spark.read.parquet(out)


def sink_insert_overwrite_dynamic(spark, sf):
    """A16 sink family, 4th lakehouse write mode (alongside append /
    merge-upsert / compact): dynamic-partition-overwrite — Hive
    ``INSERT OVERWRITE ... PARTITION`` semantics, the idempotent
    backfill primitive.  Base table is partitioned by o_orderstatus;
    the update frame holds ONLY status-F rows (prices doubled) and is
    written with ``partitionOverwriteMode=dynamic``, so exactly the
    partitions PRESENT in the update are replaced and O/P survive
    untouched.  At 100 TB this is how a day's reprocess lands: the
    job rewrites its own date partitions atomically and cannot clobber
    the rest of the table (static mode would truncate it).  The
    oracle sees the semantics end-to-end: per-status counts/sums must
    equal base-with-F-doubled — a static overwrite would drop O/P
    rows and fail rows_match, an append would double-count F."""
    _, back = _insert_overwrite_plan(spark, sf)
    res = back.groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("sum_price"),
    )
    # materialize: the lineage reads the scratch dir the NEXT
    # invocation rmtree's — same hazard as stream_foreach_batch_upsert
    return res.localCheckpoint(eager=True)


COMPACT_FRAGMENT_N = 64
COMPACT_TARGET_N = 4


def sink_compact_files(spark, sf):
    """Small-file compaction — the operational chore every wave-append
    sink accumulates: a crawl writing P files per wave leaves
    thousands of KB-sized parquet files whose per-file open/footer
    cost eventually dominates scans.  Simulate the fragmented state
    (repartition(64) write), then compact by rewriting with
    repartition(4) — at 100 TB the target count comes from
    bytes/target_file_size and the rewrite goes partition-by-partition
    behind the same atomic-rename commit discipline as the engine's
    sinks.  Returns the compacted read-back's row count + DECIMAL-exact
    value checksum, which is exactly what the bloom-free SQL oracle
    computes from the source table: compaction must be value-invisible.
    File-count reduction itself is pinned in pytest (no SQL can see
    the filesystem)."""
    frag = _scratch_dir("frag", sf)
    compact = _scratch_dir("compact", sf)
    o = _t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    o.repartition(COMPACT_FRAGMENT_N).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).repartition(COMPACT_TARGET_N).write.mode(
        "overwrite"
    ).parquet(compact)
    back = spark.read.parquet(compact)
    return back.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


def source_csv_roundtrip(spark, sf):
    """CSV source/sink: write a dimension slice to headered CSV, read
    it back with an explicit schema (never inferSchema — a second scan
    and type drift), and return the rows.  CSV is the interchange
    format crawl seed lists and host allowlists actually arrive in;
    the text round-trip must be value-exact for ints/strings (nation
    has no quoting/escaping edge — those belong to the codec, not this
    key).  Oracle: the same rows straight off the parquet view."""
    out = _scratch_dir("csv", sf)
    _t(spark, sf, "nation").write.mode("overwrite").option(
        "header", True
    ).csv(out)
    return spark.read.schema(
        "n_nationkey int, n_name string, n_regionkey int"
    ).option("header", True).csv(out)


def source_json_roundtrip(spark, sf):
    """JSON-lines source/sink: write an orders slice to JSONL, read it
    back with an explicit schema.  JSONL is the landing format for
    fetched-page metadata on a real crawl; doubles round-trip exactly
    (Spark prints the shortest repr that parses back to the same
    IEEE value).  Oracle: the same slice off the parquet view."""
    out = _scratch_dir("json", sf)
    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") < 3000).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    o.write.mode("overwrite").json(out)
    return spark.read.schema(
        "o_orderkey long, o_orderstatus string, o_totalprice double"
    ).json(out)


# ------------------------------------- reshaping / wide-surface (round 3)

def source_orc_roundtrip(spark, sf):
    """ORC source/sink: the second columnar format Spark ships a
    native vectorized reader for (no extra jar).  Write the supplier
    dim to ORC, read it back with an explicit schema, return the rows
    — completing the source-format family (parquet / inline / CSV /
    JSONL / ORC).  Oracle: the same rows off the parquet view — the
    columnar re-encode must be value-exact including IEEE doubles."""
    out = _scratch_dir("orc", sf)
    s = _t(spark, sf, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    s.write.mode("overwrite").orc(out)
    return spark.read.schema(
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
    ).orc(out)


_SESSION_GAP_US = 30 * 60 * 1_000_000


def win_sessionize_gap(spark, sf):
    """BATCH sessionization — the lag → new-session flag → running-sum
    → group stack that assigns explicit session ids, complementing
    stream_session (same 30-minute-gap semantics via session_window).
    Emits per-session start, duration and event count.  Everything is
    integer epoch-micros end-to-end (unix_micros / epoch_us), so both
    engines agree bit-for-bit with no timestamp/session-tz round-trip.

    Scale shape: two stacked windows + one hash aggregate, all
    partitioned by user_id — ONE shuffle total (the windows and the
    aggregate reuse the same partitioning), O(events-per-user log n)
    per key and zero pair blowup.  Tiebreak on (ts, event_id) keeps
    the flag deterministic under duplicate timestamps."""
    e = _t(spark, sf, "events")
    # ts is TIMESTAMP_NTZ: epoch micros by pure wall-clock arithmetic
    # (unix_micros would inject the session tz — the join_asof trick)
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = e.select(
        "user_id", us.alias("ts_us"), "event_id"
    ).withColumn(
        "new_s",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) >= _SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "sid")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            (F.max("ts_us") - F.min("ts_us")).alias("dur_us"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start_us", "dur_us", "n_events")
    )


def win_funnel_steps(spark, sf):
    """Ordered-funnel conversion per user (view → click → purchase):
    the first view, the first click STRICTLY AFTER that view, the
    first purchase strictly after that click, and how many steps the
    user reached — the sequential-pattern query behind every
    conversion dashboard.

    Scale shape: three map-side-combined min-aggregates chained by
    equi-joins on user_id plus two left joins — every shuffle is on
    user_id, the state per user is three longs, and no window ever
    scans a user's full history (a hot user with 10^6 events costs
    three filtered min-folds, not 10^6 window rows; an event-pair
    formulation would cost 10^12).  The per-step frames v and c are
    tiny (one row per qualifying user) but feed MULTIPLE consumers
    (the next step AND the final join) — Spark shares no common
    subtrees without an explicit cache, and the .explain audit showed
    v recomputed three times (12 events scans) uncached; persisting
    both cuts the plan to one scan per step.  Integer epoch-micros
    end-to-end, so both engines agree bit-for-bit."""
    e = _t(spark, sf, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    ev = e.select("user_id", "event_type", us.alias("us"))
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("view_us"))
        .persist()
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("us") > F.col("view_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("click_us"))
        .persist()
    )
    try:
        p = (
            ev.filter(F.col("event_type") == "purchase")
            .join(c, "user_id")
            .filter(F.col("us") > F.col("click_us"))
            .groupBy("user_id")
            .agg(F.min("us").alias("purchase_us"))
        )
        out = (
            v.join(c, "user_id", "left")
            .join(p, "user_id", "left")
            .select(
                "user_id",
                "view_us",
                "click_us",
                "purchase_us",
                (
                    F.lit(1)
                    + F.col("click_us").isNotNull().cast("int")
                    + F.col("purchase_us").isNotNull().cast("int")
                )
                .cast("bigint")
                .alias("reached"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        # release even if materialization throws — a leaked cache
        # lives for the session (ADVICE r3)
        v.unpersist()
        c.unpersist()
    return out


def docs_tfidf(spark, sf):
    """TF-IDF term weighting over a bounded document slice — the
    classic sparse text-featurization step of a training pipeline.
    tf = term count within a doc, df = docs containing the term,
    idf = ln((1+N)/(1+df)) + 1 (the smoothed form, never log 0), all
    over whitespace tokens kept verbatim (no case folding — unicode
    case mapping is the one step the two engines could disagree on).

    Scale shape: the token fan-out stays in whole-stage codegen
    (split + filter + explode); tf and df are two map-side-combined
    hash aggregates; N arrives as a broadcast 1-row frame (never a
    driver-side collect in the plan); the tf⋈df join shuffles on term
    — at corpus scale the vocabulary side is Zipf-skewed, which is
    exactly what AQE skew-join + the salting pattern
    (join_skew_salted) are for.  Score is rounded to 6 dp on BOTH
    engines: ln is the one non-correctly-rounded libm call in the
    expression (≤ a few ulps cross-engine), everything else is IEEE
    exact."""
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 40).select(
        "doc_id", "text"
    )
    # explicit whitespace class == Java \s (incl. \x0B); RE2's bare \s
    # would exclude \x0B and the oracle would tokenize differently
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split("text", r"[ \t\n\r\f\x0B]+"), lambda x: x != ""
            )
        ).alias("term"),
    )
    # tf and df both consume the token fan-out — cache it so the
    # tokenization (the expensive stage at corpus scale) runs once,
    # then materialize the small result and release the cache (the
    # module's standard session-lifetime discipline)
    toks = toks.persist()
    try:
        tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
        df = toks.groupBy("term").agg(
            F.count_distinct("doc_id").alias("df")
        )
        nf = d.agg(F.count("*").alias("n"))
        out = (
            tf.join(df, "term")
            .crossJoin(F.broadcast(nf))
            .select(
                "doc_id",
                "term",
                "tf",
                "df",
                F.round(
                    F.col("tf")
                    * (F.log((1.0 + F.col("n")) / (1.0 + F.col("df"))) + 1.0),
                    6,
                ).alias("tfidf"),
            )
        ).localCheckpoint(eager=True)
    finally:
        # release even if materialization throws — a leaked cache
        # lives for the session (ADVICE r3)
        toks.unpersist()
    return out


def pivot_wide(spark, sf):
    """Wide pivot: per-priority order counts by status.  Pivot values
    are ENUMERATED explicitly — letting Spark infer them costs a
    separate distinct-scan job over the full table at 100 TB, and an
    unbounded status domain would make the row width data-dependent."""
    o = _t(spark, sf, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))  # count(*) is rejected inside Pivot
        .na.fill(0, ["F", "O", "P"])  # count semantics: absent cell = 0
    )


def unpivot_long(spark, sf):
    """Wide→long unpivot (melt): one metric row per (part, measure).
    Pure projection — no shuffle at any scale; both value columns are
    cast to the common type up front (unpivot requires it)."""
    p = _t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").cast("double").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "metric", "val")


def agg_grouping_sets(spark, sf):
    """Explicit GROUPING SETS — the general form rollup/cube are sugar
    for: per-region totals, per-nation totals, and a grand total in ONE
    pass over the join (each input row is expanded to its matching
    sets map-side; no re-scan per set)."""
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return j.groupingSets(
        [["r_name"], ["n_name"], []], "r_name", "n_name"
    ).agg(
        F.count("*").alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
    )


def win_ntile_cume(spark, sf):
    """Distribution windows: ntile / percent_rank / cume_dist per
    nation.  The ordering carries a unique tiebreak (c_custkey) so
    every engine assigns identical buckets — ties under ntile are
    otherwise implementation-defined."""
    c = _t(spark, sf, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), "c_custkey"
    )
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


def agg_string_collect(spark, sf):
    """Ordered collect: per-nation sorted key list as a single string.
    collect_list is UNORDERED under parallel aggregation — the sort
    must happen on the collected array (array_sort), never be assumed
    from input order; transform() keeps the int→string mapping inside
    whole-stage codegen.  Bounded by the filter: collecting unbounded
    groups is a driver-OOM shape at scale."""
    c = _t(spark, sf, "customer").filter(F.col("c_custkey") <= 600)
    return c.groupBy("c_nationkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("c_custkey")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("custkeys"),
        F.count("*").alias("n"),
    )


def str_similarity(spark, sf):
    """Edit-distance + substring-position functions (fuzzy matching
    building blocks for URL/brand canonicalization audits)."""
    p = _t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_brand", F.lit("Brand#33")).cast("long").alias("lev"),
        F.locate("BRASS", F.col("p_type")).cast("long").alias("brass_pos"),
    )


def subquery_decorrelated(spark, sf):
    """Correlated-subquery shape ("orders above 1.5x their customer's
    average"), hand-decorrelated the way it must run at scale: ONE
    aggregate over the table + ONE equi-join, instead of a per-row
    subquery execution.  The oracle states the same query in its
    correlated form — equivalence is the point."""
    o = _t(spark, sf, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(dec).alias("cust_sum"), F.count("*").alias("n_orders")
    )
    # "price > 1.5 * avg" stated as 2*price*n > 3*sum: decimal-exact on
    # both engines (double avg is summation-order-dependent — Spark's
    # partial aggregation and DuckDB's single pass round differently in
    # the last ulp, which flips round() and boundary comparisons)
    return (
        o.join(per_cust, "o_custkey")
        .filter(2 * dec * F.col("n_orders") > 3 * F.col("cust_sum"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.col("cust_sum").cast("double").alias("cust_sum"),
            "n_orders",
        )
    )


def explode_outer_null(spark, sf):
    """posexplode_outer: fan-out that PRESERVES parents with empty
    arrays as a NULL row — the join-back-safe explode (plain explode
    silently drops them, breaking left-side row accounting)."""
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 40)
    toks = F.when(
        F.col("lang") == "zh", F.array().cast("array<string>")
    ).otherwise(F.slice(F.split("text", " "), 1, 3))
    return d.select(
        "doc_id", F.posexplode_outer(toks).alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "token")


def sink_merge_upsert(spark, sf):
    """MERGE INTO (upsert) on the parquet snapshot store: a source of
    updated + brand-new customer rows merged into the target by key —
    matched rows take the source balance, unmatched targets are kept,
    unmatched sources are inserted.  Implemented as the scale shape a
    format without MERGE support needs: one full-outer join on the
    key (both sides shuffle-partitioned by it), coalesce per column,
    rewrite.  The merged table is round-tripped through the sink so
    the read-back rows are what the driver verifies."""
    out = _scratch_dir("merge", sf)
    tgt = _t(spark, sf, "customer").select("c_custkey", "c_acctbal")
    upd = tgt.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("k"),
        (F.col("c_acctbal") + 1000.0).alias("bal"),
    )
    ins = tgt.filter(F.col("c_custkey") % 11 == 0).select(
        (F.col("c_custkey") + 1000000).alias("k"),
        F.lit(0.0).alias("bal"),
    )
    src = upd.unionByName(ins)
    merged = (
        tgt.join(src, tgt.c_custkey == src.k, "full_outer")
        .select(
            F.coalesce("k", "c_custkey").alias("c_custkey"),
            F.round(F.coalesce("bal", "c_acctbal"), 2).alias("c_acctbal"),
            F.when(F.col("k").isNull(), "kept")
            .when(F.col("c_custkey").isNull(), "inserted")
            .otherwise("updated")
            .alias("op"),
        )
    )
    merged.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def join_bucketed_colocated(spark, sf):
    """Shuffle-free co-located join via bucketing: both sides are
    written bucketBy(8, key) + sortBy(key), so the join AND the
    following same-key aggregate read pre-partitioned, pre-sorted
    buckets — the physical plan has ZERO Exchange nodes (asserted on
    THIS code path in tests/test_static_guards.py).  This is the §2
    bucketing promise made concrete: at 100 TB you bucket the big
    fact table once and every subsequent key join/agg skips its
    shuffle."""
    joined, drop = _bucketed_join_plan(spark, sf)
    try:
        # materialize before dropping the catalog entries it reads from
        return joined.localCheckpoint(eager=True)
    finally:
        drop()


def _bucketed_join_plan(spark, sf, merge_hint: bool = False):
    """Build join_bucketed_colocated's plan; returns (joined_df, drop).

    Shared by the production key and the zero-Exchange static plan
    guard so the guard pins the REAL code path instead of a copy.
    ``merge_hint=True`` forces sort-merge for the guard — at sf0.001
    AQE would broadcast the tiny dim side (also shuffle-free, but it
    wouldn't exercise bucketing); production leaves the choice to AQE
    because at real scale both sides are large and SMJ is what runs.

    Table names and scratch paths are stable per (sf, pid): DROP TABLE
    on an external-path table never deletes its files, so a fresh
    uuid-tagged path per call would leak one orders+customer copy per
    invocation — path reuse plus mode("overwrite") keeps /tmp bounded,
    the same discipline as _scratch_dir's sink/roundtrip callers.
    Callers must materialize ``joined_df`` before calling ``drop()``
    (it reads from the catalog entries drop() removes)."""
    import os

    pid = os.getpid()
    t_o, t_c = f"spider1_bkt_o_{pid}", f"spider1_bkt_c_{pid}"
    o = _t(spark, sf, "orders").select("o_orderkey", "o_custkey",
                                       "o_totalprice")
    c = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    (o.write.format("parquet").bucketBy(8, "o_custkey")
     .sortBy("o_custkey").option("path", _scratch_dir("bkto", sf))
     .mode("overwrite").saveAsTable(t_o))
    (c.write.format("parquet").bucketBy(8, "c_custkey")
     .sortBy("c_custkey").option("path", _scratch_dir("bktc", sf))
     .mode("overwrite").saveAsTable(t_c))
    bo, bc = spark.table(t_o), spark.table(t_c)
    joined = (
        bo.join(bc.hint("merge") if merge_hint else bc,
                bo.o_custkey == bc.c_custkey)
        .groupBy("c_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )

    def drop() -> None:
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        spark.sql(f"DROP TABLE IF EXISTS {t_c}")

    return joined, drop


_SALT_N = 8


def salted_equi_join(
    fact: DataFrame, fact_key: str, salt_src: str,
    dim: DataFrame, dim_key: str, n_salts: int = _SALT_N,
) -> DataFrame:
    """Equi-join ``fact⋈dim`` with the fact side salted on
    ``pmod(xxhash64(salt_src), n_salts)`` and the dim side replicated
    ``n_salts`` ways, so a hot ``fact_key`` spreads across ``n_salts``
    shuffle tasks.  Each fact row matches exactly one dim replica —
    the result is value-identical to the plain join (pinned on an
    engineered hot key in tests/test_relational_ops.py)."""
    for side, df in (("fact", fact), ("dim", dim)):
        if "_salt" in df.columns:
            # withColumn would silently overwrite the caller's column
            # and the final drop would remove it from the output
            raise ValueError(f"{side} side already has a _salt column")
    salted = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).cast("int"),
    )
    replicated = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted.join(
        replicated.hint("shuffle_hash"),
        (salted[fact_key] == replicated[dim_key])
        & (salted["_salt"] == replicated["_salt"]),
    ).drop("_salt")


def join_skew_salted(spark, sf):
    """Skew-killing SALTED shuffle join — the §2/A5 salting promise as
    a standalone relational key.  A hot join key (one customer with
    10^8 orders at 100 TB) puts its entire row group in ONE shuffle
    partition of a plain equi-join; salting splits it: the fact side
    gets ``salt = pmod(xxhash64(o_orderkey), S)`` and the dim side is
    replicated S ways (explode over sequence(0, S-1)), so the join key
    ``(c_custkey, salt)`` spreads every hot key across S tasks.  Each
    fact row matches exactly ONE dim replica, so the result is
    value-identical to the unsalted join — which is exactly what the
    un-salted SQL oracle verifies.  shuffle_hash hint keeps AQE from
    broadcasting the (here small) dim side, so the salted exchange is
    the plan that actually runs.  Sums are exact DECIMAL(18,2) before
    the final double conversion: a salted join changes partial-agg
    grouping, and double summation order must not flip a rounded
    boundary value (the subquery_decorrelated lesson).
    """
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    joined = salted_equi_join(
        o, "o_custkey", "o_orderkey", c.select("c_custkey", "c_mktsegment"),
        "c_custkey",
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


_BLOOM_JOIN_M = 1 << 20  # bits (128 KiB bitmap)
_BLOOM_JOIN_K = 4  # probes per key


def _bloom_join_positions(df: DataFrame, key_col: str) -> DataFrame:
    """k bloom bit-positions per key, computed IN THE JVM (xxhash64
    with k seed columns inside whole-stage codegen) — both the build
    and the probe side derive positions from the same expression, so
    false negatives are structurally impossible (PROVIDED the two
    sides hash the same input type — bloom_prefilter enforces that)."""
    if "_pos" in df.columns:
        raise ValueError("input already has a _pos column")
    pos = [
        F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(_BLOOM_JOIN_M))
        for i in range(_BLOOM_JOIN_K)
    ]
    return df.withColumn("_pos", F.array(*pos))


def bloom_prefilter(
    spark: SparkSession, fact: DataFrame, fact_key: str,
    dim_keys: DataFrame, dim_key: str,
):
    """Prefilter ``fact`` to rows whose ``fact_key`` MAY appear in
    ``dim_keys[dim_key]`` — zero false negatives, bounded false
    positives (removed by the exact join the caller runs next).
    Returns ``(prefiltered_df, bitmap_broadcast)``: the caller owns
    the broadcast and should ``unpersist()`` it once the result is
    materialized — a long-lived session invoking this per query would
    otherwise accumulate one never-released broadcast per call.
    ``unpersist()``, NOT ``destroy()``: localCheckpoint is
    non-reliable, so on a real cluster a lost executor block forces
    recomputation of the probe, which would fail on a destroyed
    broadcast; unpersist frees executor copies but lets the driver
    re-ship the value if lineage re-runs (ADVICE r3).

    Build: the dim side's bit positions are OR-ed into ONE partial
    bitmap per partition (mapInPandas, numpy), and the driver ORs the
    partials — O(partitions × m/8) driver bytes, independent of dim
    row count (the reason this works when the dim is too big to
    broadcast as rows but its 128 KiB bloom is not).  Probe: the fact
    side's JVM-computed positions are tested against the broadcast
    bitmap in a vectorized pandas_udf (numpy bit indexing, no per-row
    Python)."""
    import numpy as np

    # xxhash64 is TYPE-sensitive: hash(1 as int) != hash(1 as bigint),
    # so differently-typed key columns would compute different bit
    # positions for equal values — silent false negatives.  Fail loudly
    # instead; the caller casts to a common type.
    fact_t = dict(fact.dtypes)[fact_key]
    dim_t = dict(dim_keys.dtypes)[dim_key]
    if fact_t != dim_t:
        raise ValueError(
            f"bloom_prefilter key type mismatch: fact.{fact_key} is "
            f"{fact_t} but dim.{dim_key} is {dim_t} — xxhash64 would "
            "hash equal values to different positions"
        )

    def build(batches):
        bits = np.zeros(_BLOOM_JOIN_M // 8, dtype=np.uint8)
        saw = False
        for pdf in batches:
            if not len(pdf):
                continue
            saw = True
            p = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in pdf["_pos"]]
            )
            np.bitwise_or.at(
                bits, p >> 3, (1 << (p & 7)).astype(np.uint8)
            )
        if saw:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    partials = (
        _bloom_join_positions(dim_keys, dim_key)
        .select("_pos")
        .mapInPandas(build, "bits binary")
        .collect()
    )
    bitmap = np.zeros(_BLOOM_JOIN_M // 8, dtype=np.uint8)
    for row in partials:
        bitmap |= np.frombuffer(row["bits"], dtype=np.uint8)
    bmp_bcast = spark.sparkContext.broadcast(bitmap.tobytes())

    @F.pandas_udf("boolean")
    def maybe_member(pos: pd.Series) -> pd.Series:
        bm = np.frombuffer(bmp_bcast.value, dtype=np.uint8)
        if not len(pos):
            return pd.Series([], dtype=bool)
        arr = np.stack([np.asarray(a, dtype=np.int64) for a in pos])
        hit = (bm[arr >> 3] >> (arr & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1))

    pre = (
        _bloom_join_positions(fact, fact_key)
        .filter(maybe_member("_pos"))
        .drop("_pos")
    )
    return pre, bmp_bcast


def join_bloom_prefilter(spark, sf):
    """Runtime bloom-filter join pruning — the semi-join-reduction
    pattern for a fact⋈selective-dim join at 100 TB: the fact table
    never shuffles rows that cannot match (see ``bloom_prefilter``
    for the build/probe shape).  The exact join afterwards removes
    bloom false positives, so the result is EXACTLY the plain join —
    verified by the bloom-free SQL oracle.  This is the engine's A6
    bloom-prefilter + A7 exact-join discipline re-expressed over
    relational tables; zero-FN and pruning properties are pinned on
    engineered keys in tests/test_relational_ops.py.
    """
    o = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 400000)
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_extendedprice")
    pre, bmp = bloom_prefilter(
        spark, li, "l_orderkey", o.select("o_orderkey"), "o_orderkey"
    )
    joined = pre.join(
        o.select("o_orderkey").hint("shuffle_hash"),
        pre.l_orderkey == F.col("o_orderkey"),
    )
    out = joined.groupBy("o_orderkey").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_ext"),
    )
    # materialize, then release the bitmap broadcast — one invocation
    # must not leave session-lifetime broadcast residue (the registry
    # resource discipline every dedup op already follows).  unpersist,
    # not destroy: see bloom_prefilter's docstring (ADVICE r3)
    try:
        out = out.localCheckpoint(eager=True)
    finally:
        bmp.unpersist()
    return out


def agg_hll_sketch(spark, sf):
    """Mergeable HLL sketches (Apache DataSketches built-ins) — the
    pre-aggregated sketch-table pattern: at 100 TB you store one
    serialized sketch per (partition, key), and distinct-count queries
    MERGE sketches instead of rescanning raw data.  Here: one
    user_id-sketch per event_type (hll_sketch_agg, partial-aggregable
    map-side like any hash agg), then the cross-type total is computed
    by hll_union_agg over the per-type sketches — never re-reading
    events.  rows-only for the driver (estimates are impl-specific,
    no DuckDB equivalent); pytest pins estimate-vs-exact error bounds
    and merge-vs-direct consistency (tests/test_relational_ops.py).
    """
    e = _t(spark, sf, "events")
    per = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    per.persist()
    try:
        per_est = per.select(
            "event_type",
            F.hll_sketch_estimate("sk").cast("long").alias("approx_users"),
        )
        union = (
            per.agg(F.hll_union_agg("sk").alias("u"))
            .select(
                F.lit("ALL").alias("event_type"),
                F.hll_sketch_estimate("u").cast("long").alias("approx_users"),
            )
        )
        out = per_est.unionByName(union).localCheckpoint(eager=True)
    finally:
        # release even if materialization throws — a leaked cache
        # lives for the session (ADVICE r3)
        per.unpersist()
    return out


def timeseries_gapfill(spark, sf):
    """Dense date-spine gap fill — the dashboard/feature-store staple:
    per-(event_type, day) counts re-joined onto a COMPLETE day spine
    so silent days emit explicit zeros instead of missing rows (a
    downstream moving average over a sparse frame is simply wrong).

    Scale shape: the heavy work is ONE map-side-combined hash agg over
    raw events, materialized once (persist + eager checkpoint,
    released in finally) — the day bounds, the type set, AND the fill
    all derive from that tiny O(types × days) aggregated frame, so raw
    events are scanned exactly once (the first cut scanned them three
    times; r4 review finding).  The spine is generated JVM-side with
    sequence()+explode (no driver collect, no Python) and the fill is
    a broadcast join with the hint on the BUILD (right) side — a hint
    on the left of a left-outer join is unsupported and Spark would
    silently shuffle both sides (r4 review finding; the static guard
    pins BroadcastHashJoin).  Days are integer epoch-days (floor of
    epoch-micros / 86.4e9) end-to-end, so both engines agree
    bit-for-bit with no date/tz round-trip."""
    filled, counts = _gapfill_plan(spark, sf)
    try:
        out = filled.localCheckpoint(eager=True)
    finally:
        counts.unpersist()
    return out


def _gapfill_plan(spark, sf):
    """timeseries_gapfill's lazy plan, pre-materialization — split out
    (the _bucketed_join_plan pattern) so the static guard can inspect
    the join strategy, which the eager checkpoint in the public
    function hides behind a Scan ExistingRDD.  Returns
    ``(filled_df, counts_df)``; the caller owns releasing counts."""
    e = _t(spark, sf, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    d = e.select(
        "event_type",
        F.floor(us / F.lit(86_400_000_000)).cast("long").alias("day"),
    )
    counts = d.groupBy("event_type", "day").agg(
        F.count("*").alias("n")
    ).persist()
    days = (
        counts.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    spine = counts.select("event_type").distinct().crossJoin(days)
    filled = (
        spine.join(F.broadcast(counts), ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
    )
    return filled, counts


def intervals_coverage(spark, sf):
    """Interval union (merge-overlaps) per key — the classic
    islands-and-gaps problem behind uptime/SLA coverage, ad-break
    stitching and visit-span analytics: each event opens an interval
    [start, start+dur); per user, overlapping intervals merge into
    islands and the answer is how many islands there are and how much
    time they cover (NOT sum(dur) — overlaps must not double-count).

    The interval length is a pure integer function of event_id
    ((event_id % 7200 + 60) seconds), so both engines derive identical
    intervals from the shared fixture with no RNG.  Scale shape: the
    standard two-window stack — running max(end) over preceding rows
    flags island starts, a running sum numbers them — plus one hash
    agg, ALL partitioned by user_id: one shuffle total, O(events per
    user · log) per key, no pair blowup (the naive overlap self-join
    is O(n²) per user).  Tiebreak on (start, event_id) keeps island
    numbering deterministic under duplicate starts; integer
    epoch-micros end-to-end."""
    e = _t(spark, sf, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    iv = e.select(
        "user_id",
        "event_id",
        us.alias("start_us"),
        (us + ((F.col("event_id") % 7200 + 60) * F.lit(1_000_000)))
        .alias("end_us"),
    )
    w = Window.partitionBy("user_id").orderBy("start_us", "event_id")
    prev_max = F.max("end_us").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_i",
        F.when(
            prev_max.isNull() | (F.col("start_us") > prev_max), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_i").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_island = islands.groupBy("user_id", "island").agg(
        F.count("*").alias("n_iv"),
        (F.max("end_us") - F.min("start_us")).alias("covered"),
    )
    return per_island.groupBy("user_id").agg(
        F.sum("n_iv").cast("bigint").alias("n_intervals"),
        F.count("*").alias("n_islands"),
        F.sum("covered").cast("bigint").alias("covered_us"),
    )


def cohort_retention(spark, sf):
    """Cohort retention triangle — the growth-analytics fixture: users
    bucketed by first-seen week (their cohort), activity counted per
    (cohort, weeks-since-first-seen) cell.  Week = integer epoch-week
    (epoch-micros / 604.8e9 floored), so both engines agree exactly.

    Scale shape: two map-side-combined hash aggs (per-user first week;
    the final cell rollup) bridged by ONE user_id-keyed join — the
    activity frame is already partitioned by user_id from the first
    agg, so the join reuses that exchange; per-cell distinct users is
    the only count_distinct and it runs on the post-join frame keyed
    by the (small) cell space.  No window over raw history, no pair
    blowup, state per user is one long."""
    e = _t(spark, sf, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    wk = e.select(
        "user_id",
        F.floor(us / F.lit(604_800_000_000)).cast("long").alias("week"),
    )
    first = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        wk.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


def agg_mode_per_group(spark, sf):
    """Per-group mode (most frequent value) with a deterministic
    tiebreak — the categorical summarizer GROUP BY can't express
    directly: each user's most common event_type, ties broken by the
    lexicographically smallest type so the result is unique.

    Scale shape: ONE map-side-combined hash agg collapses raw events
    to (user, type, cnt) — at most |types| rows per user — then the
    row_number window ranks only that tiny aggregated frame (never raw
    history) on the same user_id partitioning: one shuffle, reused.
    The (cnt DESC, type ASC) ordering is total, so rank 1 is unique —
    max_by would tie-break nondeterministically."""
    e = _t(spark, sf, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(
        F.desc("cnt"), F.asc("event_type")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_event_type"),
            F.col("cnt").alias("n_events"),
        )
    )


def _stream_dup_src_dir(sf: str, copies: int = 3) -> str:
    """Stage the events fixture N times into one source directory —
    the duplicate-injection fixture for streaming dedup (each copy is
    byte-identical, so every event_id arrives `copies` times).  Same
    race-safe first-writer-wins rename as _stream_src_dir."""
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    src_file = os.path.abspath(f"{sf}/events.parquet")
    st = os.stat(src_file)
    key = hashlib.md5(
        f"{src_file}:{st.st_mtime_ns}:{st.st_size}:dup{copies}".encode()
    ).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"spider1_sdup_{key}")
    if not os.path.isdir(path):
        staging = path + "." + uuid.uuid4().hex[:8]
        os.makedirs(staging)
        for i in range(copies):
            shutil.copy(src_file, os.path.join(staging, f"dup{i}.parquet"))
        try:
            os.rename(staging, path)
        except OSError:  # concurrent writer won the rename
            shutil.rmtree(staging, ignore_errors=True)
    return path


def stream_dedup_watermark(spark, sf):
    """SURVEY §2B streaming taxonomy: native streaming DEDUPLICATION —
    ``dropDuplicatesWithinWatermark`` over a source with every event
    injected three times (byte-identical copies), i.e. the at-least-
    once-delivery shape every real ingest pipeline has.  The watermark
    bounds the dedup state store (keys older than max-event-time − 1 h
    are evicted), which is what makes streaming dedup viable at all —
    unbounded dropDuplicates state grows forever on a 10^10-row feed.

    Duplicates here carry IDENTICAL event times, so they always fall
    within the watermark delay of each other and dedup is guaranteed
    regardless of micro-batch splits — the kept copy is arbitrary but
    byte-identical, so the post-dedup per-type aggregate (run in BATCH
    over the drained memory sink) is deterministic and equals the
    plain aggregate over the un-duplicated base table, which is the
    SQL oracle (event_id is unique in the fixture).  Event time is
    NTZ wall clock → pure-arithmetic micros (the module's standard
    tz-independence discipline)."""
    import uuid

    path = _stream_dup_src_dir(sf)
    schema = spark.read.parquet(path).schema
    ev = F.timestamp_micros(
        F.expr(
            "timestampdiff(MICROSECOND, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
    )
    name = "sdedup_" + uuid.uuid4().hex[:12]
    q = (
        spark.readStream.schema(schema)
        .parquet(path)
        .withColumn("ev", ev)
        .withWatermark("ev", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        out = (
            spark.table(name)
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.count_distinct("user_id").alias("n_users"),
                F.round(F.sum("value"), 4).alias("sum_v"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        # drop the memory sink even on failure (see
        # stream_watermark_late)
        spark.catalog.dropTempView(name)
    return out


def events_top_transitions(spark, sf):
    """Top-3 event-type transitions per source type — first-order
    Markov sequence mining (the "what do users do next" matrix behind
    next-action models and funnel discovery): consecutive event pairs
    per user via lag, globally counted, top-k per source with a total
    (count DESC, dst ASC) ordering so ranks are unique.

    Scale shape: ONE user_id-partitioned lag window over raw events
    (O(events per user · log) per key, no pair blowup), then a
    map-side-combined hash agg on the tiny (src, dst) key space, then
    the rank window over the aggregated frame only — the same
    aggregate-then-rank discipline as agg_mode_per_group.  Tiebreak on
    (ts_us, event_id) keeps the lag deterministic under duplicate
    timestamps; integer epoch-micros end-to-end."""
    e = _t(spark, sf, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = (
        e.select(
            "user_id", "event_id", "event_type", us.alias("ts_us")
        )
        .withColumn("src", F.lag("event_type").over(w))
        .filter(F.col("src").isNotNull())
    )
    counts = pairs.groupBy(
        "src", F.col("event_type").alias("dst")
    ).agg(F.count("*").alias("n"))
    rw = Window.partitionBy("src").orderBy(F.desc("n"), F.asc("dst"))
    return (
        counts.withColumn("rank", F.row_number().over(rw).cast("bigint"))
        .filter(F.col("rank") <= 3)
        .select("src", "dst", "n", "rank")
    )


def _stream_upsert_src_dir(sf: str) -> str:
    """Stage the events fixture as a 4-file CDC feed: three disjoint
    insert slices (event_id mod 3, seq=0) plus an updates file (the
    event_id mod 10 == 0 subset with value+1000, seq=1).  Built with
    pyarrow take/set_column so the staged schema is byte-identical to
    the fixture's (a pandas round-trip would retype the timestamp).
    Same race-safe first-writer-wins rename as _stream_src_dir."""
    import hashlib
    import os
    import shutil
    import tempfile
    import uuid

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src_file = os.path.abspath(f"{sf}/events.parquet")
    st = os.stat(src_file)
    key = hashlib.md5(
        f"{src_file}:{st.st_mtime_ns}:{st.st_size}:upsert".encode()
    ).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"spider1_cdc_{key}")
    if not os.path.isdir(path):
        staging = path + "." + uuid.uuid4().hex[:8]
        os.makedirs(staging)
        tbl = pq.read_table(src_file)
        eid = tbl.column("event_id").to_numpy()

        def with_seq(t: pa.Table, seq: int) -> pa.Table:
            return t.append_column(
                "seq", pa.array(np.full(len(t), seq, dtype=np.int32))
            )

        for i in range(3):
            part = tbl.take(np.nonzero(eid % 3 == i)[0])
            pq.write_table(
                with_seq(part, 0),
                os.path.join(staging, f"insert{i}.parquet"),
            )
        upd = tbl.take(np.nonzero(eid % 10 == 0)[0])
        vi = upd.schema.get_field_index("value")
        upd = upd.set_column(
            vi,
            upd.schema.field(vi),
            pa.array(upd.column("value").to_numpy() + 1000.0),
        )
        pq.write_table(
            with_seq(upd, 1), os.path.join(staging, "update0.parquet")
        )
        try:
            os.rename(staging, path)
        except OSError:  # concurrent writer won the rename
            shutil.rmtree(staging, ignore_errors=True)
    return path


def stream_foreach_batch_upsert(spark, sf):
    """SURVEY §2B streaming taxonomy: the ``foreachBatch`` SINK path —
    a streaming CDC upsert in the merge-on-read shape every lakehouse
    table format (Hudi/Iceberg/Delta MoR) uses: each micro-batch is
    APPENDED to a base+delta log (no read-modify-write race inside
    the sink), and readers apply the merge — latest ``seq`` wins per
    key — at query time; compaction (sink_compact_files) would fold
    the log back down offline.  ``maxFilesPerTrigger=1`` forces the
    4-file staged feed (3 disjoint insert slices + 1 updates slice,
    see _stream_upsert_src_dir) through FOUR distinct foreachBatch
    invocations, so the sink really runs multiple times.

    Deterministic under ANY batch order: the merge folds by max(seq)
    per event_id, a commutative pick (seq is unique per key), so the
    result equals CASE event_id % 10 = 0 THEN value+1000 over the
    base table — the full SQL oracle.  At scale: appends are
    partition-local, the merge is one max_by hash agg keyed by
    event_id, and state never lives in the sink function."""
    import shutil
    import tempfile
    import uuid

    path = _stream_upsert_src_dir(sf)
    schema = spark.read.parquet(path).schema
    log_dir = _scratch_dir("fbu_log", sf)
    shutil.rmtree(log_dir, ignore_errors=True)  # fresh log per call
    ckpt = tempfile.mkdtemp(prefix="spider1_fbu_ck_")

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(log_dir)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
        .writeStream.foreachBatch(upsert)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    log = spark.read.parquet(log_dir)
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    merged = log.select(
        "event_id",
        "seq",
        F.struct("event_type", "user_id", us.alias("us"), "value").alias(
            "row"
        ),
    ).groupBy("event_id").agg(F.max_by("row", "seq").alias("row"))
    res = merged.select(
        "event_id",
        F.col("row.event_type").alias("event_type"),
        F.col("row.user_id").alias("user_id"),
        F.col("row.us").alias("us"),
        F.col("row.value").alias("value"),
    )
    # materialize before returning: the frame's lineage reads log_dir,
    # which the NEXT invocation rmtree's — a caller holding the lazy
    # frame across invocations would read deleted files (ADVICE r4).
    # Only the two recycled-scratch-input keys (this one and
    # sink_insert_overwrite_dynamic) need this; the other sink keys'
    # scratch dirs are overwritten in place, never deleted first.
    return res.localCheckpoint(eager=True)


# ----------------------------------------------------------------- SQL

SQL: dict[str, str | None] = {
    "source_inline": (
        "SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{u}')" for i, u in enumerate(SEED_URLS)
        )
        + ") AS t(seed_rank, url)"
    ),
    "sink_append_parquet": (
        "SELECT 2 * count(*) AS n_after_two_appends FROM region"
    ),
    "sink_partitioned": (
        "SELECT count(*) AS n_f, round(sum(o_totalprice), 2) AS sum_price "
        "FROM orders WHERE o_orderstatus = 'F'"
    ),
    "source_csv_roundtrip": (
        "SELECT n_nationkey, n_name, n_regionkey FROM nation"
    ),
    "pivot_wide": (
        'SELECT o_orderpriority, '
        'count(*) FILTER (o_orderstatus = \'F\')::BIGINT AS "F", '
        'count(*) FILTER (o_orderstatus = \'O\')::BIGINT AS "O", '
        'count(*) FILTER (o_orderstatus = \'P\')::BIGINT AS "P" '
        "FROM orders GROUP BY o_orderpriority"
    ),
    "unpivot_long": (
        "SELECT p_partkey, 'size' AS metric, p_size::DOUBLE AS val "
        "FROM part UNION ALL "
        "SELECT p_partkey, 'retailprice', p_retailprice FROM part"
    ),
    "agg_grouping_sets": (
        "SELECT r_name, n_name, count(*)::BIGINT AS n_cust, "
        "round(sum(c_acctbal), 2) AS sum_bal "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY GROUPING SETS ((r_name), (n_name), ())"
    ),
    "win_ntile_cume": (
        "SELECT c_custkey, ntile(4) OVER w::BIGINT AS quartile, "
        "round(percent_rank() OVER w, 6) AS prank, "
        "round(cume_dist() OVER w, 6) AS cdist FROM customer "
        "WINDOW w AS (PARTITION BY c_nationkey "
        "ORDER BY c_acctbal DESC, c_custkey)"
    ),
    "agg_string_collect": (
        "SELECT c_nationkey, "
        "string_agg(c_custkey::VARCHAR, ',' ORDER BY c_custkey) "
        "AS custkeys, count(*)::BIGINT AS n FROM customer "
        "WHERE c_custkey <= 600 GROUP BY c_nationkey"
    ),
    "str_similarity": (
        "SELECT p_partkey, levenshtein(p_brand, 'Brand#33')::BIGINT "
        "AS lev, strpos(p_type, 'BRASS')::BIGINT AS brass_pos FROM part"
    ),
    "subquery_decorrelated": (
        "SELECT o_orderkey, o_custkey, o_totalprice, "
        "(SELECT sum(o2.o_totalprice::DECIMAL(18,2)) FROM orders o2 "
        "WHERE o2.o_custkey = o.o_custkey)::DOUBLE AS cust_sum, "
        "(SELECT count(*) FROM orders o2 "
        "WHERE o2.o_custkey = o.o_custkey)::BIGINT AS n_orders "
        "FROM orders o WHERE 2 * o_totalprice::DECIMAL(18,2) * ("
        "SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey"
        ") > 3 * (SELECT sum(o2.o_totalprice::DECIMAL(18,2)) "
        "FROM orders o2 WHERE o2.o_custkey = o.o_custkey)"
    ),
    "explode_outer_null": (
        "WITH t AS (SELECT doc_id, CASE WHEN lang = 'zh' THEN [] "
        "ELSE string_split(text, ' ')[1:3] END AS l "
        "FROM documents WHERE doc_id < 40) "
        "SELECT doc_id, CAST(generate_subscripts(l, 1) - 1 AS BIGINT) "
        "AS pos, unnest(l) AS token FROM t WHERE len(l) > 0 "
        # l IS NULL (NULL text -> string_split NULL): posexplode_outer
        # emits one null row for a NULL array too, so this branch must
        # not silently drop it (len(NULL) fails both comparisons)
        "UNION ALL SELECT doc_id, NULL, NULL FROM t "
        "WHERE len(l) = 0 OR l IS NULL"
    ),
    # final table = base with ONLY the F partition replaced by the
    # doubled-price update: a static overwrite would lose O/P
    # (rows_match fails), an append would double-count F.  Decimal
    # sum (exact, order-independent) mirrors the Spark side.
    "sink_insert_overwrite_dynamic": (
        "SELECT o_orderstatus, count(*)::BIGINT AS n, "
        "round(sum((CASE WHEN o_orderstatus = 'F' THEN 2 * o_totalprice "
        "ELSE o_totalprice END)::DECIMAL(18,2)), 2)::DOUBLE AS sum_price "
        "FROM orders GROUP BY o_orderstatus"
    ),
    "sink_merge_upsert": (
        "WITH src AS ("
        "SELECT c_custkey AS k, c_acctbal + 1000.0 AS bal "
        "FROM customer WHERE c_custkey % 7 = 0 "
        "UNION ALL SELECT c_custkey + 1000000, 0.0 "
        "FROM customer WHERE c_custkey % 11 = 0) "
        "SELECT coalesce(k, c_custkey)::BIGINT AS c_custkey, "
        "round(coalesce(bal, c_acctbal), 2) AS c_acctbal, "
        "CASE WHEN k IS NULL THEN 'kept' "
        "WHEN c_custkey IS NULL THEN 'inserted' "
        "ELSE 'updated' END AS op "
        "FROM customer FULL JOIN src ON c_custkey = k"
    ),
    "join_bucketed_colocated": (
        "SELECT c_custkey, count(*)::BIGINT AS n_orders, "
        "round(sum(o_totalprice), 2) AS sum_price "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "GROUP BY c_custkey"
    ),
    # the UNSALTED join: salting must be value-invisible
    "join_skew_salted": (
        "SELECT c_mktsegment, count(*)::BIGINT AS n_orders, "
        "sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS sum_price "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "GROUP BY c_mktsegment"
    ),
    # the bloom-free join: the prefilter must be value-invisible
    "join_bloom_prefilter": (
        "SELECT o_orderkey, count(*)::BIGINT AS n_items, "
        "sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_ext "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_totalprice > 400000 GROUP BY o_orderkey"
    ),
    "agg_hll_sketch": None,  # estimates are sketch-impl-specific
    "source_json_roundtrip": (
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders "
        "WHERE o_orderkey < 3000"
    ),
    "source_orc_roundtrip": (
        "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"
    ),
    # compaction must be value-invisible: the checksum off the source
    "sink_compact_files": (
        "SELECT count(*)::BIGINT AS n_rows, "
        "sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS sum_price, "
        "min(o_orderkey) AS min_key, max(o_orderkey) AS max_key "
        "FROM orders"
    ),
    # same lag-gap + cumsum formulation as stream_session's oracle,
    # integer epoch-micros end-to-end
    "win_sessionize_gap": (
        "WITH g AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, "
        "CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w "
        ">= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s "
        "FROM events WINDOW w AS ("
        "PARTITION BY user_id ORDER BY ts, event_id)), "
        "s AS (SELECT user_id, ts_us, sum(new_s) OVER ("
        "PARTITION BY user_id ORDER BY ts_us, event_id "
        "ROWS UNBOUNDED PRECEDING) AS sid FROM g) "
        "SELECT user_id, min(ts_us) AS session_start_us, "
        "max(ts_us) - min(ts_us) AS dur_us, "
        "count(*)::BIGINT AS n_events FROM s GROUP BY user_id, sid"
    ),
    "join_full_outer": (
        "SELECT c_custkey, o_orderkey, round(c_acctbal, 2) AS bal, "
        "round(o_totalprice, 2) AS price "
        "FROM (SELECT * FROM customer WHERE c_custkey % 3 = 0) c "
        "FULL JOIN (SELECT * FROM orders WHERE o_orderkey < 6000) o "
        "ON c_custkey = o_custkey"
    ),
    # per-step first-event funnel; integer epoch-micros throughout
    "win_funnel_steps": (
        "WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us "
        "FROM events), "
        "v AS (SELECT user_id, min(us) AS view_us FROM ev "
        "WHERE event_type = 'view' GROUP BY user_id), "
        "c AS (SELECT ev.user_id, min(ev.us) AS click_us FROM ev "
        "JOIN v ON ev.user_id = v.user_id "
        "WHERE event_type = 'click' AND ev.us > v.view_us "
        "GROUP BY ev.user_id), "
        "p AS (SELECT ev.user_id, min(ev.us) AS purchase_us FROM ev "
        "JOIN c ON ev.user_id = c.user_id "
        "WHERE event_type = 'purchase' AND ev.us > c.click_us "
        "GROUP BY ev.user_id) "
        "SELECT v.user_id, v.view_us, c.click_us, p.purchase_us, "
        "(1 + (c.click_us IS NOT NULL)::INT "
        "+ (p.purchase_us IS NOT NULL)::INT)::BIGINT AS reached "
        "FROM v LEFT JOIN c ON v.user_id = c.user_id "
        "LEFT JOIN p ON v.user_id = p.user_id"
    ),
    # smoothed idf; tokens verbatim (no case folding); rounded 6 dp on
    # both engines (ln is the one non-correctly-rounded libm call)
    "docs_tfidf": (
        "WITH slice AS (SELECT doc_id, text FROM documents "
        "WHERE doc_id < 40), "
        "tok AS (SELECT doc_id, unnest(list_filter("
        "string_split_regex(text, '[ \\t\\n\\r\\f\\x0B]+'), "
        "x -> x <> '')) AS term FROM slice), "
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok "
        "GROUP BY doc_id, term), "
        "df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df "
        "FROM tok GROUP BY term), "
        "n AS (SELECT count(*)::BIGINT AS n FROM slice) "
        "SELECT tf.doc_id, tf.term, tf.tf, df.df, "
        "round(tf.tf * (ln((1 + n.n) / (1.0 + df.df)) + 1), 6) AS tfidf "
        "FROM tf JOIN df USING (term) CROSS JOIN n"
    ),
    "scan_parquet": "SELECT count(*) AS n FROM lineitem",
    "scan_projection_pushdown": (
        "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem"
    ),
    "filter_pred": (
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "WHERE o_orderstatus = 'F' AND o_totalprice > 1000 "
        "AND o_orderpriority IN ('1-URGENT', '2-HIGH')"
    ),
    "filter_range_ts": (
        "SELECT count(*) AS n FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-20 00:00:00'"
    ),
    "project_expr": (
        "SELECT l_orderkey, l_linenumber, "
        "round(l_extendedprice * (1 - l_discount), 4) AS rev, "
        "CAST(l_quantity * 2 AS DOUBLE) AS qty2 FROM lineitem"
    ),
    "join_inner_equi": (
        "SELECT r_name, count(*)::BIGINT AS n_cust, "
        "round(sum(c_acctbal), 4) AS sum_bal "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
    ),
    "join_broadcast": (
        "SELECT n_name, count(*)::BIGINT AS n_cust FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
    ),
    "join_left_anti": (
        "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
    ),
    "join_left_semi": (
        "SELECT c_custkey, c_mktsegment FROM customer WHERE EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "AND o_totalprice > 50000)"
    ),
    "join_left_outer": (
        "SELECT o_orderkey, count(l_orderkey)::BIGINT AS n_items "
        "FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey "
        "GROUP BY o_orderkey"
    ),
    "join_nested_loop_theta": (
        "SELECT s_suppkey, n_nationkey FROM supplier, nation "
        "WHERE s_acctbal > n_nationkey * 100 "
        "AND s_nationkey <> n_nationkey"
    ),
    "join_range_interval": (
        "SELECT a.user_id AS u, count(*)::BIGINT AS n_pairs "
        "FROM events a JOIN events b ON a.user_id = b.user_id "
        "AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '1 hour' "
        "GROUP BY a.user_id"
    ),
    # right side deduped per (user, ts) on BOTH engines: ASOF under
    # timestamp ties is otherwise undefined
    "join_asof": (
        "WITH p AS (SELECT user_id, ts, max(event_id) AS purchase_id "
        "FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts), "
        "e AS (SELECT event_id, user_id, ts FROM events "
        "WHERE event_type = 'error') "
        "SELECT e.event_id, e.user_id, p.purchase_id, "
        "epoch_us(e.ts) - epoch_us(p.ts) AS gap_us "
        "FROM e ASOF LEFT JOIN p "
        "ON e.user_id = p.user_id AND p.ts <= e.ts"
    ),
    "agg_hash_counts": (
        "SELECT l_returnflag, l_linestatus, "
        "round(sum(l_quantity), 2) AS sum_qty, "
        "round(sum(l_extendedprice), 2) AS sum_base, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc, "
        "round(avg(l_discount), 6) AS avg_disc, count(*)::BIGINT AS n "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    "agg_count_distinct": (
        "SELECT count(DISTINCT o_custkey)::BIGINT AS n_cust FROM orders"
    ),
    "agg_approx_distinct": None,  # approximate -> rows-only
    "agg_rollup": (
        "SELECT r_name, n_name, count(*)::BIGINT AS n_cust "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY ROLLUP (r_name, n_name)"
    ),
    "agg_cube": (
        "SELECT o_orderstatus, o_orderpriority, count(*)::BIGINT AS n, "
        "round(sum(o_totalprice), 2) AS sum_price "
        "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"
    ),
    "agg_first_by_key": (
        "SELECT c_nationkey, top_cust FROM ("
        "SELECT c_nationkey, c_custkey AS top_cust, row_number() OVER ("
        "PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey DESC"
        ") AS rn FROM customer) WHERE rn = 1"
    ),
    "win_row_number": (
        "SELECT o_orderkey, o_custkey, row_number() OVER ("
        "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
        ")::BIGINT AS rn FROM orders"
    ),
    "win_rank_dense": (
        "SELECT c_custkey, "
        "rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)"
        "::BIGINT AS rnk, "
        "dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal "
        "DESC)::BIGINT AS drnk FROM customer"
    ),
    "win_lag_lead": (
        "SELECT event_id, date_diff('second', lag(ts) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id), ts)::BIGINT AS gap_s "
        "FROM events"
    ),
    "win_frame_agg": (
        "SELECT o_orderkey, round(sum(o_totalprice) OVER ("
        "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) "
        "AS run_total FROM orders"
    ),
    "sort_key": (
        "SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem "
        "ORDER BY l_shipdate, l_orderkey, l_linenumber LIMIT 100"
    ),
    "limit_global": (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_orderkey LIMIT 50"
    ),
    "topk_per_group": (
        "SELECT o_custkey, o_orderkey, rn::BIGINT AS rn FROM ("
        "SELECT o_custkey, o_orderkey, row_number() OVER ("
        "PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey"
        ") AS rn FROM orders) WHERE rn <= 3"
    ),
    "set_union_dedup": (
        "SELECT c_custkey FROM customer WHERE c_acctbal > 5000 "
        "UNION SELECT c_custkey FROM customer "
        "WHERE c_mktsegment = 'BUILDING'"
    ),
    "set_intersect": (
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' "
        "INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'"
    ),
    "set_except": (
        "SELECT o_custkey FROM orders EXCEPT SELECT o_custkey "
        "FROM orders WHERE o_orderstatus = 'F'"
    ),
    "str_fns": (
        "SELECT p_partkey, lower(p_name) AS lname, "
        "length(p_type)::BIGINT AS type_len, "
        "concat_ws('-', p_brand, p_type) AS brand_type, "
        "substring(p_name, 1, 5) AS name5, trim(p_name) AS tname, "
        "lpad(p_brand, 12, '*') AS padded, "
        "regexp_extract(p_type, '([A-Z]+)', 1) AS first_word, "
        "starts_with(p_name, 'a') AS starts_a FROM part"
    ),
    "date_fns": (
        "SELECT date_trunc('day', ts)::TIMESTAMP AS day, year(ts)::BIGINT AS y, "
        "month(ts)::BIGINT AS m, count(*)::BIGINT AS n "
        "FROM events GROUP BY 1, 2, 3"
    ),
    "math_fns": (
        "SELECT l_orderkey, l_linenumber, ceil(l_quantity)::BIGINT AS cq, "
        "floor(l_quantity)::BIGINT AS fq, "
        "CAST(abs(l_discount - 0.05) AS DOUBLE) AS adisc, "
        "round(log2(l_extendedprice + 1), 4) AS lg, "
        "greatest(l_tax, l_discount) AS gmax, "
        "least(l_tax, l_discount) AS gmin FROM lineitem"
    ),
    "array_fns": (
        "SELECT vec_id, len(embedding)::BIGINT AS dim, "
        "round((embedding::DOUBLE[])[1], 6) AS e1, "
        "round((embedding::DOUBLE[])[64], 6) AS e64, "
        "round(list_sum(embedding::DOUBLE[]), 4) AS esum, "
        "round(list_dot_product(embedding::DOUBLE[], "
        "embedding::DOUBLE[]), 4) AS enorm2 FROM embeddings"
    ),
    "map_json_fns": (
        "SELECT json_extract(props, '$.k')::BIGINT AS k, "
        "count(*)::BIGINT AS n FROM events GROUP BY 1"
    ),
    "cond_fns": (
        "SELECT CASE WHEN o_orderstatus = 'F' THEN 'finished' "
        "WHEN o_orderstatus = 'O' THEN 'open' ELSE 'other' END "
        "AS status_label, "
        "coalesce(nullif(o_orderpriority, '3-MEDIUM'), 'DEFAULT') AS prio, "
        "count(*)::BIGINT AS n FROM orders GROUP BY 1, 2"
    ),
    "hash_fns": None,  # Spark-pinned hashes; golden values in pytest
    "udf_grouped_map": (
        "SELECT doc_id, source, row_number() OVER ("
        "PARTITION BY source ORDER BY n_chars, doc_id)::BIGINT "
        "AS rank_in_source FROM documents"
    ),
    "udaf_via_applyInPandas": (
        "SELECT lang, sum(n_chars)::BIGINT AS total_chars, "
        "max(n_chars)::BIGINT AS max_chars, count(*)::BIGINT AS n_docs "
        "FROM documents GROUP BY lang"
    ),
    "udtf_lateral_tokens": (
        "SELECT doc_id, CAST(generate_subscripts(l, 1) AS INT) AS pos, "
        "unnest(l) AS token FROM (SELECT doc_id, "
        "string_split(text, ' ') AS l FROM documents WHERE doc_id < 25)"
    ),
    "stream_stateful_first_seen": (
        "SELECT user_id, event_type, epoch_us(min(ts))::BIGINT "
        "AS first_us, count(*)::BIGINT AS n_events "
        "FROM events GROUP BY user_id, event_type"
    ),
    "stream_tumbling_1h": (
        "SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, "
        "count(*)::BIGINT AS n, round(sum(value), 4) AS sum_v "
        "FROM events GROUP BY 1"
    ),
    # watermark = ms-truncated max event time - 1h (Spark's event-time
    # stats are ms-truncated); append mode emits iff window_end <= wm
    "stream_watermark_late": (
        "WITH w AS (SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) "
        "AS window_ms, count(*)::BIGINT AS n, round(sum(value), 4) AS "
        "sum_v FROM events GROUP BY 1), "
        "m AS (SELECT epoch_ms(max(ts)) - 3600000 AS wm FROM events) "
        "SELECT window_ms, n, sum_v FROM w, m "
        "WHERE window_ms + 3600000 <= wm"
    ),
    "stream_sliding": (
        "SELECT ws AS window_start, count(*)::BIGINT AS n FROM ("
        "SELECT time_bucket(INTERVAL '15 minutes', ts) "
        "- (k * INTERVAL '15 minutes') AS ws "
        "FROM events, (SELECT unnest(range(4)) AS k)) GROUP BY ws"
    ),
    "stream_session": (
        "WITH g AS (SELECT user_id, ts, event_id, CASE WHEN "
        "lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w "
        ">= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s "
        "FROM events WINDOW w AS ("
        "PARTITION BY user_id ORDER BY ts, event_id)), "
        "s AS (SELECT user_id, ts, sum(new_s) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS sid FROM g) "
        "SELECT user_id, min(ts) AS session_start, "
        "count(*)::BIGINT AS n_events FROM s GROUP BY user_id, sid"
    ),
    # integer epoch-days on both sides; generate_series is inclusive
    # of both bounds, matching Spark's sequence()
    "timeseries_gapfill": (
        "WITH d AS (SELECT event_type, "
        "epoch_us(ts) // 86400000000 AS day FROM events), "
        "b AS (SELECT min(day) AS d0, max(day) AS d1 FROM d), "
        "spine AS (SELECT t.event_type, g.day FROM "
        "(SELECT DISTINCT event_type FROM d) t CROSS JOIN "
        "(SELECT unnest(generate_series((SELECT d0 FROM b), "
        "(SELECT d1 FROM b))) AS day) g), "
        "c AS (SELECT event_type, day, count(*) AS n FROM d "
        "GROUP BY event_type, day) "
        "SELECT s.event_type, s.day, coalesce(c.n, 0)::BIGINT AS n "
        "FROM spine s LEFT JOIN c "
        "ON s.event_type = c.event_type AND s.day = c.day"
    ),
    # interval length is a pure function of event_id (no RNG); merge
    # condition start > max(end) over preceding rows, ties on
    # (start_us, event_id) — identical window stack to the Spark plan
    "intervals_coverage": (
        "WITH iv AS (SELECT user_id, event_id, "
        "epoch_us(ts) AS start_us, "
        "epoch_us(ts) + (event_id % 7200 + 60) * 1000000 AS end_us "
        "FROM events), "
        "g AS (SELECT user_id, event_id, start_us, end_us, CASE WHEN "
        "max(end_us) OVER w IS NULL OR start_us > max(end_us) OVER w "
        "THEN 1 ELSE 0 END AS new_i FROM iv WINDOW w AS ("
        "PARTITION BY user_id ORDER BY start_us, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), "
        "s AS (SELECT user_id, start_us, end_us, sum(new_i) OVER ("
        "PARTITION BY user_id ORDER BY start_us, event_id "
        "ROWS UNBOUNDED PRECEDING) AS island FROM g), "
        "p AS (SELECT user_id, island, count(*) AS n_iv, "
        "max(end_us) - min(start_us) AS covered FROM s "
        "GROUP BY user_id, island) "
        "SELECT user_id, sum(n_iv)::BIGINT AS n_intervals, "
        "count(*)::BIGINT AS n_islands, "
        "sum(covered)::BIGINT AS covered_us FROM p GROUP BY user_id"
    ),
    "cohort_retention": (
        "WITH wk AS (SELECT user_id, "
        "epoch_us(ts) // 604800000000 AS week FROM events), "
        "f AS (SELECT user_id, min(week) AS cohort_week FROM wk "
        "GROUP BY user_id) "
        "SELECT f.cohort_week, wk.week - f.cohort_week AS week_offset, "
        "count(DISTINCT wk.user_id)::BIGINT AS n_users, "
        "count(*)::BIGINT AS n_events "
        "FROM wk JOIN f ON wk.user_id = f.user_id "
        "GROUP BY f.cohort_week, week_offset"
    ),
    "events_top_transitions": (
        "WITH p AS (SELECT user_id, event_type AS dst, "
        "lag(event_type) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS src FROM events), "
        "c AS (SELECT src, dst, count(*)::BIGINT AS n FROM p "
        "WHERE src IS NOT NULL GROUP BY src, dst), "
        "r AS (SELECT src, dst, n, row_number() OVER ("
        "PARTITION BY src ORDER BY n DESC, dst ASC)::BIGINT AS rank "
        "FROM c) "
        "SELECT src, dst, n, rank FROM r WHERE rank <= 3"
    ),
    "agg_mode_per_group": (
        "WITH c AS (SELECT user_id, event_type, count(*) AS cnt "
        "FROM events GROUP BY user_id, event_type), "
        "r AS (SELECT user_id, event_type, cnt, row_number() OVER ("
        "PARTITION BY user_id ORDER BY cnt DESC, event_type ASC) AS rn "
        "FROM c) "
        "SELECT user_id, event_type AS mode_event_type, "
        "cnt::BIGINT AS n_events FROM r WHERE rn = 1"
    ),
    # the Spark side replays a 4-batch CDC feed through foreachBatch
    # and merges latest-seq-wins; the oracle applies the same update
    # directly to the base table (value+1000 is one IEEE add on both)
    "stream_foreach_batch_upsert": (
        "SELECT event_id, event_type, user_id, epoch_us(ts) AS us, "
        "CASE WHEN event_id % 10 = 0 THEN value + 1000 ELSE value END "
        "AS value FROM events"
    ),
    # the Spark side deduplicates 3 injected byte-identical copies per
    # event_id; the oracle aggregates the un-duplicated base table
    # (event_id is unique in the fixture)
    "stream_dedup_watermark": (
        "SELECT event_type, count(*)::BIGINT AS n, "
        "count(DISTINCT user_id)::BIGINT AS n_users, "
        "round(sum(value), 4) AS sum_v FROM events GROUP BY event_type"
    ),
}

# Keys whose core behavior lives in a dedicated private helper declare
# it for the oracle-manifest hash (scripts/gen_oracle_manifest.key_hash):
# a helper edit then changes the frozen hash, so the key cannot sit
# outside the driver window on stale evidence.
sink_insert_overwrite_dynamic._hash_extra = (_insert_overwrite_plan,)
join_bucketed_colocated._hash_extra = (_bucketed_join_plan,)
timeseries_gapfill._hash_extra = (_gapfill_plan,)
stream_foreach_batch_upsert._hash_extra = (_stream_upsert_src_dir,)
stream_dedup_watermark._hash_extra = (_stream_dup_src_dir,)

FNS: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "source_inline": source_inline,
    "source_csv_roundtrip": source_csv_roundtrip,
    "source_json_roundtrip": source_json_roundtrip,
    "source_orc_roundtrip": source_orc_roundtrip,
    "sink_compact_files": sink_compact_files,
    "win_sessionize_gap": win_sessionize_gap,
    "win_funnel_steps": win_funnel_steps,
    "docs_tfidf": docs_tfidf,
    "sink_append_parquet": sink_append_parquet,
    "sink_partitioned": sink_partitioned,
    "sink_insert_overwrite_dynamic": sink_insert_overwrite_dynamic,
    "sink_merge_upsert": sink_merge_upsert,
    "pivot_wide": pivot_wide,
    "unpivot_long": unpivot_long,
    "agg_grouping_sets": agg_grouping_sets,
    "win_ntile_cume": win_ntile_cume,
    "agg_string_collect": agg_string_collect,
    "str_similarity": str_similarity,
    "subquery_decorrelated": subquery_decorrelated,
    "explode_outer_null": explode_outer_null,
    "join_bucketed_colocated": join_bucketed_colocated,
    "join_skew_salted": join_skew_salted,
    "join_bloom_prefilter": join_bloom_prefilter,
    "agg_hll_sketch": agg_hll_sketch,
    "scan_parquet": scan_parquet,
    "scan_projection_pushdown": scan_projection_pushdown,
    "filter_pred": filter_pred,
    "filter_range_ts": filter_range_ts,
    "project_expr": project_expr,
    "join_inner_equi": join_inner_equi,
    "join_broadcast": join_broadcast,
    "join_left_anti": join_left_anti,
    "join_left_semi": join_left_semi,
    "join_left_outer": join_left_outer,
    "join_nested_loop_theta": join_nested_loop_theta,
    "join_full_outer": join_full_outer,
    "join_range_interval": join_range_interval,
    "join_asof": join_asof,
    "agg_hash_counts": agg_hash_counts,
    "agg_count_distinct": agg_count_distinct,
    "agg_approx_distinct": agg_approx_distinct,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "agg_first_by_key": agg_first_by_key,
    "win_row_number": win_row_number,
    "win_rank_dense": win_rank_dense,
    "win_lag_lead": win_lag_lead,
    "win_frame_agg": win_frame_agg,
    "sort_key": sort_key,
    "limit_global": limit_global,
    "topk_per_group": topk_per_group,
    "set_union_dedup": set_union_dedup,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "str_fns": str_fns,
    "date_fns": date_fns,
    "math_fns": math_fns,
    "array_fns": array_fns,
    "map_json_fns": map_json_fns,
    "cond_fns": cond_fns,
    "hash_fns": hash_fns,
    "udf_grouped_map": udf_grouped_map,
    "udaf_via_applyInPandas": udaf_via_applyInPandas,
    "udtf_lateral_tokens": udtf_lateral_tokens,
    "stream_stateful_first_seen": stream_stateful_first_seen,
    "stream_dedup_watermark": stream_dedup_watermark,
    "stream_foreach_batch_upsert": stream_foreach_batch_upsert,
    "timeseries_gapfill": timeseries_gapfill,
    "intervals_coverage": intervals_coverage,
    "cohort_retention": cohort_retention,
    "agg_mode_per_group": agg_mode_per_group,
    "events_top_transitions": events_top_transitions,
    "stream_tumbling_1h": stream_tumbling_1h,
    "stream_watermark_late": stream_watermark_late,
    "stream_sliding": stream_sliding,
    "stream_session": stream_session,
}
