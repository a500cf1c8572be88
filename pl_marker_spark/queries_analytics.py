"""Analytics extension set (round 4, session 4): graph analytics over the
extracted KG, deterministic cardinality/frequency sketches, OLAP rollup /
exact-percentile / running-window operators, and a scale-safe binned range
join. Every operator is a driver-gated catalog entry with a DuckDB twin.

Families and their 100-TB shapes:
- **Graph**: PageRank over the KG entity graph (per-iteration plan = one
  src-keyed join + one dst-keyed partial agg; degrees attached once before
  the loop), triangle counting and degree distribution over the near-dup
  document graph (canonical id-ordered edges, two equi-self-joins — the
  standard enumeration; at production scale orient edges low→high degree
  to bound the join fan-out).
- **Sketches**: HyperLogLog registers/estimate and a count-min sketch,
  both built from md5 (identical hex on both engines) with *integer-only*
  bucket/width math (`h % m`, `h DIV m`, bit-length via base-2 digit
  count) so the register tables gate integer-exact; the estimates are the
  only float outputs, rounded to 6dp. One pass + map-side-combinable
  groupBy; sketch tables are O(m), not O(n).
- **OLAP**: ROLLUP with GROUPING() flags, exact ("disc") group
  percentiles via rank arithmetic, per-user running windows. All window
  accumulations run in the same ORDER BY sequence on both engines, so
  float results are bit-identical before rounding.
- **Range join**: time-window join without an equi key, rewritten as a
  1-minute-bin equi-join with ±1-bin explosion — the standard trick that
  keeps Catalyst on a hash join instead of the per-key cartesian a raw
  interval predicate plans (same discipline as the jaccard ±1 band).

Cross-engine conventions follow queries_dataops.py: doubles rounded to
6dp, null-free outputs (sentinels documented per query), ties broken on
numeric columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F


def _doc(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Graph: PageRank over the extracted KG entity graph
# ---------------------------------------------------------------------------

PAGERANK_ITERS = 5
PAGERANK_DAMP = 0.85


def q_kg_entity_pagerank(spark, sf_dir):
    """Entity salience: fixed-iteration PageRank over the KG entity graph
    the pipeline extracts (the classic non-normalized formulation,
    r'(v) = 0.15 + 0.85·Σ r(u)/deg(u) over the symmetrized simple graph;
    isolated entities settle at 0.15). Plan shape per iteration: ranks
    join the degree-annotated adjacency on src (one shuffle) and partial-
    aggregate into dst (map-side combine), so an iteration costs exactly
    one |E|-scale shuffle; degrees are attached ONCE before the loop. At
    production scale the adjacency would be bucketed by src so the
    per-iteration join reuses scan partitioning (the turns_tok pattern),
    and ranks checkpointed every few iterations to cut lineage. The twin
    re-derives the same 5 iterations as chained CTEs over the pinned
    VALUES edge list (independently gated by kg_graph_edges)."""
    from .graphops import pagerank, symmetrize
    from .queries_catalog import _pipeline_outputs

    out = _pipeline_outputs(spark, sf_dir)
    nodes = out["nodes"].select(F.col("entity_id").alias("node"))
    und = symmetrize(out["edges"])
    ranks = pagerank(nodes, und, PAGERANK_ITERS, PAGERANK_DAMP)
    return ranks.select(F.col("node").alias("entity_id"),
                        F.round("pr", 6).alias("pr"))


def sql_kg_entity_pagerank() -> str:
    """Chained-CTE twin: r0..r5 unrolled (fixed iteration count needs no
    recursion, and chained CTEs sidestep recursive-CTE aggregate limits)."""
    from .oracle_values import kg_oracle_sqls

    kg = kg_oracle_sqls()
    steps = []
    prev = "r0"
    for i in range(1, PAGERANK_ITERS + 1):
        steps.append(f"""
r{i} AS (
  SELECT {prev}.node, {1 - PAGERANK_DAMP} + {PAGERANK_DAMP} * coalesce(c.s, 0) AS pr
  FROM {prev} LEFT JOIN (
    SELECT a.dst AS node, sum(rp.pr / d.deg) AS s
    FROM {prev} rp JOIN adj a ON rp.node = a.src JOIN deg d ON d.src = a.src
    GROUP BY a.dst) c USING (node))""")
        prev = f"r{i}"
    return f"""
WITH edges AS ({kg["kg_graph_edges"]}),
nodes AS ({kg["kg_graph_nodes"]}),
und AS (SELECT DISTINCT least(src_id, dst_id) AS a, greatest(src_id, dst_id) AS b
        FROM edges WHERE src_id <> dst_id),
adj AS (SELECT a AS src, b AS dst FROM und UNION ALL SELECT b, a FROM und),
deg AS (SELECT src, count(*)::DOUBLE AS deg FROM adj GROUP BY src),
r0 AS (SELECT entity_id AS node, 1.0::DOUBLE AS pr FROM nodes),
{",".join(steps)}
SELECT node AS entity_id, round(pr, 6) AS pr FROM {prev}
"""


# ---------------------------------------------------------------------------
# Graph: degree distribution + triangles over the near-dup document graph
# ---------------------------------------------------------------------------


def _neardup_edges(spark, sf_dir):
    from .queries_catalog import q_jaccard_neardup

    return q_jaccard_neardup(spark, sf_dir).select("doc_a", "doc_b")


def _sql_neardup_edges() -> str:
    from .queries_catalog import SQL_JACCARD

    return f"(SELECT doc_a, doc_b FROM ({SQL_JACCARD}) jp)"


def q_graph_degree_dist(spark, sf_dir):
    """Degree distribution of the near-dup graph (jaccard ≥ 0.5 pairs):
    two-level aggregation — per-doc degree, then the histogram. Both
    shuffles are map-side combinable; the output is O(max degree)."""
    e = _neardup_edges(spark, sf_dir)
    pts = e.select(F.col("doc_a").alias("doc")).unionAll(
        e.select(F.col("doc_b").alias("doc")))
    return (
        pts.groupBy("doc").agg(F.count("*").alias("degree"))
        .groupBy("degree").agg(F.count("*").cast("long").alias("n_docs"))
        .select(F.col("degree").cast("long").alias("degree"), "n_docs")
    )


def sql_graph_degree_dist() -> str:
    return f"""
WITH e AS (SELECT * FROM {_sql_neardup_edges()}),
pts AS (SELECT doc_a AS doc FROM e UNION ALL SELECT doc_b FROM e),
deg AS (SELECT doc, count(*) AS degree FROM pts GROUP BY doc)
SELECT degree::BIGINT AS degree, count(*)::BIGINT AS n_docs
FROM deg GROUP BY degree
"""


def q_graph_triangles(spark, sf_dir):
    """Per-document triangle participation counts in the near-dup graph.
    Canonical enumeration: edges are id-ordered (a<b), so the wedge join
    e1(a,b)⋈e2(b,c) plus the closing check e3(a,c) finds each triangle
    exactly once; per-node counts union the three corners. Near-dup
    clusters are cliques, so triangle density here is a cluster-quality
    signal. At 100 TB, orient edges by degree instead of id to bound the
    wedge fan-out at hub nodes (standard optimization; same plan)."""
    from .graphops import triangle_counts

    e = _neardup_edges(spark, sf_dir)
    return triangle_counts(e).select(F.col("node").alias("doc_id"), "n_tri")


def sql_graph_triangles() -> str:
    return f"""
WITH e AS (SELECT * FROM {_sql_neardup_edges()}),
tri AS (
  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
  FROM e e1
  JOIN e e2 ON e1.doc_b = e2.doc_a
  JOIN e e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
corners AS (SELECT a AS doc FROM tri UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri)
SELECT doc AS doc_id, count(*)::BIGINT AS n_tri FROM corners GROUP BY doc
"""


# ---------------------------------------------------------------------------
# Sketches: HyperLogLog over document 3-gram shingles
# ---------------------------------------------------------------------------

HLL_P = 8                      # 2^8 = 256 registers
HLL_M = 1 << HLL_P
_HLL_W = 60 - HLL_P            # md5-derived hash width beyond the bucket bits


def _shingles(spark, sf_dir):
    """Distinct-countable key stream: 3-word shingles (the dedup unit)."""
    d = _doc(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sh = F.expr(
        "transform(sequence(0, size(split(text, ' ')) - 3),"
        " i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))")
    return (
        d.filter(F.size(toks) >= 3)
        .select(F.explode(sh).alias("shingle"))
    )


_SQL_SHINGLES = """
SELECT ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
FROM (SELECT string_split(text, ' ') AS ws FROM documents) d,
     LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) g
WHERE len(ws) >= 3
"""

# 60-bit md5-derived hash (identical hex on both engines), split into an
# 8-bit bucket and a 52-bit width by INTEGER ops only — `h DIV 256` /
# `h // 256`, never float division (2^60 exceeds double precision).


def _hll_registers_df(spark, sf_dir):
    return hll_registers_from_shingles(_shingles(spark, sf_dir))


def hll_registers_from_shingles(sh):
    """(shingle) rows -> (bucket, rho) register table — the reusable form
    consumed by the batch queries AND streaming.stream_hll_distinct (whose
    cross-batch max-merge is exactly the law hll_merge gates)."""
    h = F.conv(F.substring(F.md5(F.col("shingle").cast("binary")), 1, 15),
               16, 10).cast("long")
    # h named behind a projection boundary so md5 runs once (the CSE trap)
    t = sh.select(h.alias("h")).select(
        (F.col("h") % HLL_M).alias("bucket"), "h")
    w = F.expr(f"h DIV {HLL_M}")
    # exact integer bit-length: digits of the base-2 representation
    rho = F.when(w == 0, F.lit(_HLL_W + 1)).otherwise(
        F.lit(_HLL_W + 1) - F.length(F.conv(w.cast("string"), 10, 2)))
    return (
        t.select("bucket", rho.cast("long").alias("rho"))
        .groupBy("bucket").agg(F.max("rho").alias("rho"))
    )


def q_hll_registers(spark, sf_dir):
    """HyperLogLog register table (p=8, m=256) over 3-gram shingles: one
    pass, map-side-combined max per bucket, O(m) output — the sketch a
    100-TB distinct-count runs instead of countDistinct's full shuffle.
    Integer-exact gate: bucket = h % 256, width = h DIV 256 (integer
    division — the hash exceeds double precision), rho = 53 − bitlen(w)
    via base-2 digit count (Spark conv(w,10,2) length == DuckDB bin(w)
    length; floats never touch the register math)."""
    r = _hll_registers_df(spark, sf_dir)
    return r.select(F.col("bucket").cast("long").alias("bucket"),
                    F.col("rho").cast("long").alias("rho"))


def _sql_hll_registers_core() -> str:
    return f"""
sh AS ({_SQL_SHINGLES}),
hh AS (SELECT ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h FROM sh),
reg AS (
  SELECT h % {HLL_M} AS bucket,
         max(CASE WHEN h // {HLL_M} = 0 THEN {_HLL_W + 1}
             ELSE {_HLL_W + 1} - length(bin(h // {HLL_M})) END) AS rho
  FROM hh GROUP BY h % {HLL_M})"""


def sql_hll_registers() -> str:
    return f"""
WITH {_sql_hll_registers_core()}
SELECT bucket::BIGINT AS bucket, rho::BIGINT AS rho FROM reg
"""


HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def q_hll_estimate(spark, sf_dir):
    """Raw HLL estimate vs the exact distinct count (one row). The 256
    registers join a generated bucket spine (empty registers contribute
    2^0); the estimate is the only float, rounded to 6dp. Corrections
    (linear counting below 2.5m, 64-bit high-range) are deliberately
    omitted — this gates the raw estimator; the register table is the
    mergeable artifact a production rollup would store."""
    r = _hll_registers_df(spark, sf_dir)
    spine = spark.range(HLL_M).select(F.col("id").alias("bucket"))
    z = (
        spine.join(r, "bucket", "left")
        .select(F.pow(F.lit(2.0), -F.coalesce("rho", F.lit(0)).cast("double"))
                .alias("t"))
        .agg(F.sum("t").alias("z"))
    )
    exact = _shingles(spark, sf_dir).agg(
        F.countDistinct("shingle").alias("exact_distinct"))
    est = F.lit(HLL_ALPHA * HLL_M * HLL_M) / F.col("z")
    return z.crossJoin(exact).select(
        F.round(est, 6).alias("est_distinct"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        F.round((est - F.col("exact_distinct")) / F.col("exact_distinct"), 6)
        .alias("rel_err"),
    )


def sql_hll_estimate() -> str:
    return f"""
WITH {_sql_hll_registers_core()},
spine AS (SELECT range AS bucket FROM range({HLL_M})),
z AS (SELECT sum(power(2.0, -coalesce(reg.rho, 0))) AS z
      FROM spine LEFT JOIN reg USING (bucket)),
exact AS (SELECT count(DISTINCT shingle) AS exact_distinct FROM sh)
SELECT round({HLL_ALPHA * HLL_M * HLL_M!r}::DOUBLE / z, 6) AS est_distinct,
       exact_distinct::BIGINT AS exact_distinct,
       round(({HLL_ALPHA * HLL_M * HLL_M!r}::DOUBLE / z - exact_distinct)
             / exact_distinct, 6) AS rel_err
FROM z, exact
"""


# ---------------------------------------------------------------------------
# Sketches: count-min frequency estimation over document tokens
# ---------------------------------------------------------------------------

CMS_D = 4                      # hash rows
CMS_W = 64                     # columns per row
# probe terms fixed independent of the corpus (absent terms are valid
# probes: exact = 0, estimate = the collision mass in their cells)
CMS_PROBES = ("the", "data", "join", "merge", "zzz_absent")


def _cms_cell(tok_col, r):
    """Salted md5 cell index for hash row ``r`` — identical hex math in
    the DuckDB twins."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"r{r}:"), tok_col)
                                    .cast("binary")), 1, 15),
                  16, 10).cast("long") % CMS_W


def cms_cells_from_tokens(toks):
    """Sparse (r, c, cnt) CMS cells over a ``token`` column: one explode +
    one map-side-combined sum. Counts add across any partitioning — the
    + algebra the cms_merge twin gates and stream_cms_freq composes."""
    rows = F.explode(F.array(*[
        F.struct(F.lit(r).alias("r"), _cms_cell(F.col("token"), r).alias("c"))
        for r in range(CMS_D)])).alias("rc")
    return (
        toks.select(rows)
        .groupBy(F.col("rc.r").cast("long").alias("r"),
                 F.col("rc.c").cast("long").alias("c"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def q_cms_freq(spark, sf_dir):
    """Count-min sketch (d=4 × w=64): build the cell table in one pass
    (each token lands in 4 salted md5 cells; map-side-combined sum), then
    answer point queries as the min over the probe's 4 cells, compared
    with the exact count. The sketch is O(d·w) regardless of corpus size
    and mergeable across partitions — the frequency oracle a 100-TB
    pipeline keeps when exact per-token counts don't fit. Integer-exact
    gate (counts only); overestimation (est ≥ exact) is property-tested."""
    toks = _doc(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("token"))
    cells = cms_cells_from_tokens(toks)
    probes = spark.createDataFrame([(t,) for t in CMS_PROBES], ["token"])
    probe_cells = probes.select(
        "token", F.explode(F.array(*[
            F.struct(F.lit(r).alias("r"),
                     _cms_cell(F.col("token"), r).alias("c"))
            for r in range(CMS_D)])).alias("rc"))
    est = (
        probe_cells.join(
            cells,
            (F.col("rc.r") == F.col("r")) & (F.col("rc.c") == F.col("c")),
            "left")
        .groupBy("token")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
    exact = toks.groupBy("token").agg(F.count("*").alias("exact"))
    return (
        est.join(exact, "token", "left")
        .select("token", F.col("est").cast("long").alias("est"),
                F.coalesce("exact", F.lit(0)).cast("long").alias("exact"))
    )


def sql_cms_freq() -> str:
    probes = ", ".join(f"('{t}')" for t in CMS_PROBES)
    salted = " UNION ALL ".join(
        f"SELECT {r} AS r, ('0x' || substr(md5('r{r}:' || token), 1, 15))::BIGINT"
        f" % {CMS_W} AS c, token FROM toks" for r in range(CMS_D))
    probe_cells = " UNION ALL ".join(
        f"SELECT token, {r} AS r,"
        f" ('0x' || substr(md5('r{r}:' || token), 1, 15))::BIGINT % {CMS_W} AS c"
        f" FROM probes" for r in range(CMS_D))
    return f"""
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
salted AS ({salted}),
cells AS (SELECT r, c, count(*) AS cnt FROM salted GROUP BY r, c),
probes(token) AS (VALUES {probes}),
pc AS ({probe_cells}),
est AS (SELECT pc.token, min(coalesce(cells.cnt, 0)) AS est
        FROM pc LEFT JOIN cells ON pc.r = cells.r AND pc.c = cells.c
        GROUP BY pc.token),
exact AS (SELECT token, count(*) AS exact FROM toks GROUP BY token)
SELECT est.token, est.est::BIGINT AS est,
       coalesce(exact.exact, 0)::BIGINT AS exact
FROM est LEFT JOIN exact ON est.token = exact.token
"""


def q_heavy_hitters(spark, sf_dir):
    """Exact top-20 tokens (count DESC, token ASC tie-break): the
    ground-truth companion to the CMS — one map-side-combined count, a
    vocabulary-sized rank. At 100 TB the vocabulary agg is the only
    shuffle and its cardinality is bounded by the vocabulary, not the
    corpus. The top-k itself is orderBy+limit, which Catalyst compiles to
    TakeOrderedAndProject (per-partition heaps, no global sort, no
    single-partition window); only the 20 survivors see a rank window."""
    toks = _doc(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("token"))
    cnt = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    top = cnt.orderBy(F.desc("cnt"), "token").limit(20)
    w = Window.orderBy(F.desc("cnt"), "token")
    return (
        top.withColumn("rk", F.row_number().over(w))
        .select("token", F.col("cnt").cast("long").alias("cnt"),
                F.col("rk").cast("long").alias("rk"))
    )


SQL_HEAVY_HITTERS = """
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
cnt AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token)
SELECT token, cnt::BIGINT AS cnt, rk::BIGINT AS rk
FROM (SELECT token, cnt,
             row_number() OVER (ORDER BY cnt DESC, token) AS rk FROM cnt)
WHERE rk <= 20
"""


# ---------------------------------------------------------------------------
# OLAP: rollup, exact percentiles, running windows
# ---------------------------------------------------------------------------


def q_rollup_revenue(spark, sf_dir):
    """Hierarchical totals via ROLLUP(event_type, k-bucket): Catalyst
    expands grouping sets in ONE aggregation pass (map-side combine at
    the finest level; subtotal rows re-aggregate the combined partials) —
    never the 3-scan UNION a naive implementation runs. GROUPING() flags
    disambiguate subtotal rows from real null keys; the second dimension
    is the numeric `k` prop decile, regex-extracted so neither engine
    needs a JSON extension. Output keys are null-free ('ALL' / -1
    sentinels, flags carry the truth)."""
    e = _doc(spark, sf_dir, "events")
    kb = F.expr("CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) DIV 10")
    base = e.select("event_type", kb.alias("kb"), "value")
    g = base.rollup("event_type", "kb").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("value"), 6).alias("total"),
        F.grouping("event_type").cast("long").alias("g_et"),
        F.grouping("kb").cast("long").alias("g_kb"),
    )
    return g.select(
        F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
        F.coalesce("kb", F.lit(-1)).cast("long").alias("kb"),
        "n", "total", "g_et", "g_kb")


SQL_ROLLUP_REVENUE = """
WITH base AS (
  SELECT event_type,
         (regexp_extract(props, '([0-9]+)', 1)::BIGINT // 10) AS kb, value
  FROM events)
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(kb, -1)::BIGINT AS kb,
       count(*)::BIGINT AS n, round(sum(value), 6) AS total,
       grouping(event_type)::BIGINT AS g_et, grouping(kb)::BIGINT AS g_kb
FROM base GROUP BY ROLLUP(event_type, kb)
"""

_PCTS = (0.5, 0.9, 0.99)


def q_percentile_groups(spark, sf_dir):
    """Exact discrete percentiles (p50/p90/p99) per event type: the value
    at row ceil(p·n) under a total (value, event_id) order — rank
    arithmetic, not approx_percentile, so the result is engine-exact and
    gateable. One shuffle (the per-group sort); each row then emits the
    percentile labels it satisfies. At 100 TB you'd swap in a t-digest or
    the same rank arithmetic over pre-sorted buckets; this is the exact
    definition those approximations are audited against."""
    e = _doc(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    cw = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type", "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(cw).alias("n"))
    p = F.explode(F.array(*[F.lit(x) for x in _PCTS])).alias("p")
    return (
        ranked.select("event_type", "value", "rn", "n", p)
        .filter(F.col("rn") == F.ceil(F.col("p") * F.col("n")))
        .select("event_type", F.col("p").cast("double").alias("p"),
                F.round("value", 6).alias("val"))
    )


SQL_PERCENTILE_GROUPS = f"""
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events),
ps AS (SELECT unnest([{", ".join(str(x) for x in _PCTS)}]) AS p)
SELECT event_type, p::DOUBLE AS p, round(value, 6) AS val
FROM ranked, ps
WHERE rn = ceil(p * n)
"""


def q_window_running(spark, sf_dir):
    """Per-user running analytics in one window pass: cumulative sum,
    5-row moving average, and the step delta vs the previous event. Both
    engines accumulate in the identical (ts, event_id) sequence, so the
    float outputs are bit-identical before rounding. First-row delta is
    coalesced to 0 (null-free outputs; `rn` disambiguates). One shuffle
    on user_id serves all three functions — Catalyst shares the window
    frame sort."""
    e = _doc(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wavg = w.rowsBetween(-4, Window.currentRow)
    return e.select(
        "event_id", "user_id",
        F.row_number().over(w).cast("long").alias("rn"),
        F.round(F.sum("value").over(wsum), 6).alias("run_sum"),
        F.round(F.avg("value").over(wavg), 6).alias("mov5"),
        F.round(F.coalesce(F.col("value") - F.lag("value", 1).over(w),
                           F.lit(0.0)), 6).alias("delta"),
    )


SQL_WINDOW_RUNNING = """
SELECT event_id, user_id,
       row_number() OVER w::BIGINT AS rn,
       round(sum(value) OVER (w ROWS UNBOUNDED PRECEDING), 6) AS run_sum,
       round(avg(value) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
           AS mov5,
       round(coalesce(value - lag(value) OVER w, 0.0), 6) AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---------------------------------------------------------------------------
# Range join: time-window join via 1-minute bin explosion
# ---------------------------------------------------------------------------

_RJ_BIN_US = 60_000_000  # 60 s


def q_range_join_counts(spark, sf_dir):
    """For every purchase, how many clicks (any user) landed within ±60 s
    — a join on a pure range predicate, which Catalyst would otherwise
    plan as a nested-loop per key. Scale-safe rewrite: both sides bin to
    60 s, purchases explode to {b−1, b, b+1}, the join is an EQUI-join on
    the bin, and the exact ±60 s predicate filters after the match (each
    candidate matches exactly one exploded key, so no dedup is needed).
    Shuffle volume = 3× purchases + clicks, never |P|×|C|. The twin runs
    the naive inequality join, so the gate proves the bin rewrite loses
    nothing. Outputs are tz-invariant counts."""
    e = _doc(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    clicks = e.filter(F.col("event_type") == "click").select(
        us.alias("c_us"), F.expr(f"unix_micros(cast(ts as timestamp_ltz))"
                                 f" DIV {_RJ_BIN_US}").alias("bin"))
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), us.alias("p_us"))
    pb = purchases.select(
        "purchase_id", "p_us",
        F.explode(F.array(*[
            F.expr(f"p_us DIV {_RJ_BIN_US}") + d for d in (-1, 0, 1)]))
        .alias("bin"))
    matched = (
        pb.join(clicks, "bin")
        .filter(F.abs(F.col("c_us") - F.col("p_us")) <= _RJ_BIN_US)
        .groupBy("purchase_id").agg(F.count("*").alias("n_clicks"))
    )
    return (
        purchases.select("purchase_id")
        .join(matched, "purchase_id", "left")
        .select("purchase_id",
                F.coalesce("n_clicks", F.lit(0)).cast("long")
                .alias("n_clicks"))
    )


SQL_RANGE_JOIN_COUNTS = f"""
WITH c AS (SELECT epoch_us(ts) AS c_us FROM events WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, epoch_us(ts) AS p_us FROM events
      WHERE event_type = 'purchase'),
m AS (SELECT p.purchase_id, count(*) AS n_clicks
      FROM p JOIN c ON abs(c.c_us - p.p_us) <= {_RJ_BIN_US}
      GROUP BY p.purchase_id)
SELECT p.purchase_id, coalesce(m.n_clicks, 0)::BIGINT AS n_clicks
FROM p LEFT JOIN m USING (purchase_id)
"""


def q_hll_merge(spark, sf_dir):
    """HLL register MERGEABILITY — the property that makes the sketch a
    100-TB operator at all: registers built independently per partition
    (here: documents split by doc_id parity) max-merge to exactly the
    whole-corpus registers (max is associative/commutative, so partial
    aggregation distributes). The gate computes BOTH plan shapes — the
    two-phase per-part → merge rollup and the one-shot register table —
    and emits a per-bucket ``mergeable`` flag; the DuckDB twin re-derives
    both independently, so the distributive law is verified end to end in
    two engines, not assumed. Same integer-only register math as
    ``hll_registers`` (-1 sentinels for parts with no value in a bucket —
    never nulls, which break the driver's canonical sort)."""
    d = _doc(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sh = F.expr(
        "transform(sequence(0, size(split(text, ' ')) - 3),"
        " i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))")
    psh = (
        d.filter(F.size(toks) >= 3)
        .select((F.col("doc_id") % 2).cast("long").alias("part"),
                F.explode(sh).alias("shingle"))
    )
    h = F.conv(F.substring(F.md5(F.col("shingle").cast("binary")), 1, 15),
               16, 10).cast("long")
    t = psh.select("part", h.alias("h")).select(
        "part", (F.col("h") % HLL_M).alias("bucket"), "h")
    w = F.expr(f"h DIV {HLL_M}")
    rho = F.when(w == 0, F.lit(_HLL_W + 1)).otherwise(
        F.lit(_HLL_W + 1) - F.length(F.conv(w.cast("string"), 10, 2)))
    parts = (
        t.select("part", "bucket", rho.cast("long").alias("rho"))
        .groupBy("part", "bucket").agg(F.max("rho").alias("rho"))
    )
    merged = parts.groupBy("bucket").agg(F.max("rho").alias("rho_merged"))
    even = parts.filter(F.col("part") == 0).select(
        "bucket", F.col("rho").alias("rho_even"))
    odd = parts.filter(F.col("part") == 1).select(
        "bucket", F.col("rho").alias("rho_odd"))
    whole = _hll_registers_df(spark, sf_dir).select(
        "bucket", F.col("rho").alias("rho_whole"))
    return (
        merged.join(even, "bucket", "left").join(odd, "bucket", "left")
        .join(whole, "bucket")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.coalesce("rho_even", F.lit(-1)).cast("long").alias("rho_even"),
            F.coalesce("rho_odd", F.lit(-1)).cast("long").alias("rho_odd"),
            F.col("rho_merged").cast("long").alias("rho_merged"),
            F.col("rho_whole").cast("long").alias("rho_whole"),
            (F.col("rho_merged") == F.col("rho_whole"))
            .cast("long").alias("mergeable"),
        )
    )


def sql_hll_merge() -> str:
    return f"""
WITH psh AS (
  SELECT (doc_id % 2)::BIGINT AS part,
         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d,
       LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) g
  WHERE len(ws) >= 3),
hh AS (SELECT part, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
       FROM psh),
parts AS (
  SELECT part, h % {HLL_M} AS bucket,
         max(CASE WHEN h // {HLL_M} = 0 THEN {_HLL_W + 1}
             ELSE {_HLL_W + 1} - length(bin(h // {HLL_M})) END) AS rho
  FROM hh GROUP BY part, h % {HLL_M}),
merged AS (SELECT bucket, max(rho) AS rho_merged FROM parts GROUP BY bucket),
whole AS (
  SELECT h % {HLL_M} AS bucket,
         max(CASE WHEN h // {HLL_M} = 0 THEN {_HLL_W + 1}
             ELSE {_HLL_W + 1} - length(bin(h // {HLL_M})) END) AS rho_whole
  FROM hh GROUP BY h % {HLL_M})
SELECT m.bucket::BIGINT AS bucket,
       coalesce(e.rho, -1)::BIGINT AS rho_even,
       coalesce(o.rho, -1)::BIGINT AS rho_odd,
       m.rho_merged::BIGINT AS rho_merged,
       w.rho_whole::BIGINT AS rho_whole,
       (m.rho_merged = w.rho_whole)::BIGINT AS mergeable
FROM merged m
LEFT JOIN (SELECT bucket, rho FROM parts WHERE part = 0) e USING (bucket)
LEFT JOIN (SELECT bucket, rho FROM parts WHERE part = 1) o USING (bucket)
JOIN whole w USING (bucket)
"""


def q_cms_merge(spark, sf_dir):
    """Count-min sketch MERGEABILITY — the companion law to ``hll_merge``
    under the other sketch algebra: CMS cells built independently per
    doc_id-parity partition SUM-merge (cellwise addition, not max) to
    exactly the one-shot whole-corpus cells. Emits one row per non-empty
    (r, c) cell with part counts, the summed merge, the whole-corpus
    count, and a ``mergeable`` flag; the twin re-derives every column
    independently. Together the two gates cover the two distributive
    aggregation algebras (max for HLL, + for CMS) a 100-TB rollup
    pipeline relies on."""
    d = _doc(spark, sf_dir, "documents")
    toks = d.select((F.col("doc_id") % 2).cast("long").alias("part"),
                    F.explode(F.split("text", " ")).alias("token"))

    def cell(tok_col, r):
        return F.conv(F.substring(F.md5(F.concat(F.lit(f"r{r}:"), tok_col)
                                        .cast("binary")), 1, 15),
                      16, 10).cast("long") % CMS_W

    rows = F.explode(F.array(*[
        F.struct(F.lit(r).alias("r"), cell(F.col("token"), r).alias("c"))
        for r in range(CMS_D)])).alias("rc")
    base = toks.select("part", rows).select(
        "part", F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    parts = base.groupBy("part", "r", "c").agg(F.count("*").alias("cnt"))
    merged = parts.groupBy("r", "c").agg(F.sum("cnt").alias("cnt_merged"))
    even = parts.filter(F.col("part") == 0).select(
        "r", "c", F.col("cnt").alias("cnt_even"))
    odd = parts.filter(F.col("part") == 1).select(
        "r", "c", F.col("cnt").alias("cnt_odd"))
    whole = base.groupBy("r", "c").agg(F.count("*").alias("cnt_whole"))
    return (
        merged.join(even, ["r", "c"], "left").join(odd, ["r", "c"], "left")
        .join(whole, ["r", "c"])
        .select(
            F.col("r").cast("long").alias("r"),
            F.col("c").cast("long").alias("c"),
            F.coalesce("cnt_even", F.lit(0)).cast("long").alias("cnt_even"),
            F.coalesce("cnt_odd", F.lit(0)).cast("long").alias("cnt_odd"),
            F.col("cnt_merged").cast("long").alias("cnt_merged"),
            F.col("cnt_whole").cast("long").alias("cnt_whole"),
            (F.col("cnt_merged") == F.col("cnt_whole"))
            .cast("long").alias("mergeable"),
        )
    )


def sql_cms_merge() -> str:
    salted = " UNION ALL ".join(
        f"SELECT part, {r} AS r,"
        f" ('0x' || substr(md5('r{r}:' || token), 1, 15))::BIGINT"
        f" % {CMS_W} AS c FROM toks" for r in range(CMS_D))
    return f"""
WITH toks AS (SELECT (doc_id % 2)::BIGINT AS part,
                     unnest(string_split(text, ' ')) AS token
              FROM documents),
salted AS ({salted}),
parts AS (SELECT part, r, c, count(*)::BIGINT AS cnt
          FROM salted GROUP BY part, r, c),
merged AS (SELECT r, c, sum(cnt)::BIGINT AS cnt_merged
           FROM parts GROUP BY r, c),
whole AS (SELECT r, c, count(*)::BIGINT AS cnt_whole
          FROM salted GROUP BY r, c)
SELECT m.r::BIGINT AS r, m.c::BIGINT AS c,
       coalesce(e.cnt, 0)::BIGINT AS cnt_even,
       coalesce(o.cnt, 0)::BIGINT AS cnt_odd,
       m.cnt_merged, w.cnt_whole,
       (m.cnt_merged = w.cnt_whole)::BIGINT AS mergeable
FROM merged m
LEFT JOIN (SELECT r, c, cnt FROM parts WHERE part = 0) e
  ON e.r = m.r AND e.c = m.c
LEFT JOIN (SELECT r, c, cnt FROM parts WHERE part = 1) o
  ON o.r = m.r AND o.c = m.c
JOIN whole w ON w.r = m.r AND w.c = m.c
"""


# ---------------------------------------------------------------------------
# k-core decomposition of the near-dup graph (fixed-round peeling)
# ---------------------------------------------------------------------------

KCORE_K = 2
KCORE_ROUNDS = 4


def q_graph_kcore(spark, sf_dir):
    """k-core of the near-dup graph (k=2) by fixed-round peeling: each
    round recomputes degrees over the surviving subgraph and drops nodes
    with degree < k; output is the surviving nodes with their core-
    subgraph degree. Like the pagerank twin, the iteration count is
    pinned (R=4) so the DuckDB chained-CTE twin is mechanical;
    test_analytics asserts the corpus reaches the peeling fixed point
    inside R rounds, so the pinned-R result IS the k-core.

    Scale shape: the edge list is materialized once before the loop (the
    triangle-join lesson — the jaccard lineage must not re-execute per
    round) and re-checkpointed each round so the plan stays one degree
    aggregation + one semi-join per round. The alive set is node-sized
    (<< edges); AQE broadcasts it here, and at a real |V| the same plan
    degrades gracefully to a shuffle join on the doc key. Near-dup
    clusters are cliques, so the 2-core isolates genuine duplicate
    clusters from incidental single-pair bridges."""
    e = _neardup_edges(spark, sf_dir).localCheckpoint()
    for _ in range(KCORE_ROUNDS):
        deg = (
            e.select(F.col("doc_a").alias("doc"))
            .unionAll(e.select(F.col("doc_b").alias("doc")))
            .groupBy("doc")
            .agg(F.count("*").alias("degree"))
        )
        alive = deg.filter(F.col("degree") >= KCORE_K).select("doc")
        e = (
            e.join(alive.withColumnRenamed("doc", "doc_a"), "doc_a")
            .join(alive.withColumnRenamed("doc", "doc_b"), "doc_b")
            .select("doc_a", "doc_b")
            .localCheckpoint()
        )
    return (
        e.select(F.col("doc_a").alias("doc_id"))
        .unionAll(e.select(F.col("doc_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("core_degree"))
    )


def sql_graph_kcore() -> str:
    sql = f"WITH e0 AS (SELECT * FROM {_sql_neardup_edges()})"
    prev = "e0"
    for r in range(1, KCORE_ROUNDS + 1):
        sql += f""",
d{r} AS (SELECT doc, count(*) AS degree FROM
         (SELECT doc_a AS doc FROM {prev} UNION ALL SELECT doc_b FROM {prev}) p
         GROUP BY doc),
a{r} AS (SELECT doc FROM d{r} WHERE degree >= {KCORE_K}),
e{r} AS (SELECT doc_a, doc_b FROM {prev}
         WHERE doc_a IN (SELECT doc FROM a{r})
           AND doc_b IN (SELECT doc FROM a{r}))"""
        prev = f"e{r}"
    sql += f"""
SELECT doc_id, count(*)::BIGINT AS core_degree FROM
  (SELECT doc_a AS doc_id FROM {prev} UNION ALL SELECT doc_b FROM {prev}) c
GROUP BY doc_id"""
    return sql


# ---------------------------------------------------------------------------
# Label-propagation communities (fixed-round, deterministic)
# ---------------------------------------------------------------------------

LPA_ROUNDS = 3


def q_graph_labelprop(spark, sf_dir):
    """Community detection on the near-dup graph by synchronous label
    propagation (Raghavan et al. 2007), made deterministic: labels start
    as node ids; each round every node adopts the most frequent label
    among its neighbors PLUS its own current label (the self-vote damps
    the bipartite flip-flop synchronous LPA is known for), ties broken
    by smallest label. Rounds pinned at R=3 so the DuckDB twin is a
    mechanical chained-CTE unroll — the same fixed-round discipline as
    kcore/pagerank.

    Scale shape: the edge list is materialized once (ids only); each
    round is one dst-keyed join to pull neighbor labels + one
    map-side-combinable (node, label) count + one hash-aggregated
    max(struct(cnt, -label)) winner pick — per-round state is
    node-sized, re-checkpointed so the plan depth stays constant across
    rounds. Unlike connected components
    (dedup_cluster), LPA splits weakly-bridged clusters instead of
    flooding through single spurious edges — the property you want when
    one bad near-dup pair would otherwise glue two big dup families."""
    from .graphops import label_propagation

    labels = label_propagation(_neardup_edges(spark, sf_dir),
                               rounds=LPA_ROUNDS)
    return labels.select(F.col("node").cast("long").alias("doc_id"),
                         F.col("label").cast("long").alias("community"))


def sql_graph_labelprop() -> str:
    sql = f"""WITH e0 AS (SELECT * FROM {_sql_neardup_edges()}),
und AS (SELECT doc_a AS s, doc_b AS d FROM e0
        UNION ALL SELECT doc_b, doc_a FROM e0),
l0 AS (SELECT DISTINCT s AS doc, s AS label FROM und)"""
    prev = "l0"
    for r in range(1, LPA_ROUNDS + 1):
        sql += f""",
c{r} AS (SELECT doc, label, count(*) AS cnt FROM (
           SELECT u.s AS doc, l.label FROM und u
           JOIN {prev} l ON l.doc = u.d
           UNION ALL SELECT doc, label FROM {prev}) v
         GROUP BY doc, label),
l{r} AS (SELECT doc, label FROM (
           SELECT doc, label, row_number() OVER (
             PARTITION BY doc ORDER BY cnt DESC, label) AS rn FROM c{r}) x
         WHERE rn = 1)"""
        prev = f"l{r}"
    sql += f"""
SELECT doc::BIGINT AS doc_id, label::BIGINT AS community FROM {prev}"""
    return sql


# ---------------------------------------------------------------------------
# Bloom filter: build / merge law / membership probe
# ---------------------------------------------------------------------------
# The third sketch algebra after HLL (max) and CMS (+): Bloom filters merge
# under bitwise OR. At 100 TB this is the set-membership primitive behind
# broadcast decontamination / blocklist joins: each partition builds its
# local filter in one map-side-combinable pass, the OR-merge is a 32-row
# reduce, and the merged filter broadcasts to probe any stream without
# shuffling the underlying set.

BLOOM_M = 1024          # filter bits
BLOOM_K = 4             # hash functions (4 disjoint md5 hex slices)
BLOOM_WORD = 32         # bits per stored word -> 32 BIGINT-safe words


def _bloom_positions(col):
    """BLOOM_K bit positions for a token: disjoint 4-hex-char (16-bit)
    slices of one md5, each mod BLOOM_M — the same integer-only hex math
    as the HLL/CMS twins (identical md5 hex on both engines)."""
    md5 = F.md5(col.cast("binary"))
    return F.array(*[
        (F.conv(F.substring(md5, 1 + 4 * j, 4), 16, 10).cast("long")
         % BLOOM_M)
        for j in range(BLOOM_K)])


def _bloom_words(df_tokens):
    """Sparse (word_idx, word) Bloom words over a `token` column. One
    explode + one bit_or aggregate (map-side combinable: OR is
    associative/commutative/idempotent); output is O(BLOOM_M/BLOOM_WORD)
    rows regardless of corpus size. 32-bit words inside BIGINTs keep the
    shift unsigned-safe in both engines."""
    pos = df_tokens.select(F.explode(_bloom_positions(F.col("token")))
                           .alias("p"))
    return (
        pos.select(F.expr(f"p DIV {BLOOM_WORD}").alias("word_idx"),
                   F.expr(f"shiftleft(1L, int(p % {BLOOM_WORD}))")
                   .alias("bit"))
        .groupBy("word_idx").agg(F.bit_or("bit").alias("word"))
    )


def _corpus_tokens(spark, sf_dir):
    return (
        _doc(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .distinct()
    )


def q_bloom_build(spark, sf_dir):
    """Bloom filter over the distinct corpus vocabulary, materialized as
    the full 32-row word spine (left join onto spark.range — absent words
    are explicit 0 rows, never missing: the hll_merge -1-sentinel lesson
    applied to the materialized shape)."""
    words = _bloom_words(_corpus_tokens(spark, sf_dir))
    spine = spark.range(BLOOM_M // BLOOM_WORD).select(
        F.col("id").alias("word_idx"))
    return (
        spine.join(words, "word_idx", "left")
        .select(F.col("word_idx").cast("long").alias("word_idx"),
                F.coalesce("word", F.lit(0)).cast("long").alias("word"))
    )


def q_bloom_merge(spark, sf_dir):
    """Bloom MERGEABILITY — the OR law: filters built independently per
    doc_id-parity partition bitwise-OR-merge to exactly the whole-corpus
    filter. Completes the distributive-algebra trio (HLL max, CMS +,
    Bloom OR) that licenses partial aggregation at 100 TB; both plan
    shapes are computed here and re-derived by the DuckDB twin. -1
    sentinels mark parts with no bit in a word (a present part word is
    always >= 1, so the sentinel is unambiguous)."""
    toks = (
        _doc(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 2).cast("long").alias("part"),
                F.explode(F.split("text", " ")).alias("token"))
        .distinct()
    )
    pos = toks.select(
        "part", F.explode(_bloom_positions(F.col("token"))).alias("p"))
    parts = (
        pos.select("part",
                   F.expr(f"p DIV {BLOOM_WORD}").alias("word_idx"),
                   F.expr(f"shiftleft(1L, int(p % {BLOOM_WORD}))")
                   .alias("bit"))
        .groupBy("part", "word_idx").agg(F.bit_or("bit").alias("word"))
    )
    merged = parts.groupBy("word_idx").agg(
        F.bit_or("word").alias("word_merged"))
    even = parts.filter(F.col("part") == 0).select(
        "word_idx", F.col("word").alias("word_even"))
    odd = parts.filter(F.col("part") == 1).select(
        "word_idx", F.col("word").alias("word_odd"))
    whole = _bloom_words(_corpus_tokens(spark, sf_dir)).select(
        "word_idx", F.col("word").alias("word_whole"))
    return (
        merged.join(even, "word_idx", "left").join(odd, "word_idx", "left")
        .join(whole, "word_idx")
        .select(
            F.col("word_idx").cast("long").alias("word_idx"),
            F.coalesce("word_even", F.lit(-1)).cast("long")
            .alias("word_even"),
            F.coalesce("word_odd", F.lit(-1)).cast("long").alias("word_odd"),
            F.col("word_merged").cast("long").alias("word_merged"),
            F.col("word_whole").cast("long").alias("word_whole"),
            (F.col("word_merged") == F.col("word_whole"))
            .cast("long").alias("mergeable"),
        )
    )


def q_bloom_member(spark, sf_dir):
    """Membership probe against the corpus Bloom filter — the broadcast
    shape the filter exists for: the 32-row word table joins (AQE
    broadcasts it) against the probes' exploded (word_idx, bit) demands;
    a probe hits iff ALL BLOOM_K bits are set (min over bit tests).
    Probes are every vocabulary token of the doc_id % 11 == 0 slice
    (guaranteed present) plus the same tokens with an '-oov' suffix
    (absent — any hit is a true false positive, identical in both engines
    because the filter and hashes are deterministic). At scale the probe
    side is the 100-TB stream and the filter side stays 32 rows — no
    shuffle of the underlying set ever happens."""
    base = (
        _doc(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 11 == 0)
        .select(F.explode(F.split("text", " ")).alias("token"))
        .distinct()
    )
    probes = base.select(F.col("token").alias("probe")).unionAll(
        base.select(F.concat("token", F.lit("-oov")).alias("probe")))
    words = _bloom_words(_corpus_tokens(spark, sf_dir))
    demand = (
        probes.select("probe",
                      F.explode(_bloom_positions(F.col("probe")))
                      .alias("p"))
        .select("probe",
                F.expr(f"p DIV {BLOOM_WORD}").alias("word_idx"),
                F.expr(f"int(p % {BLOOM_WORD})").alias("bit"))
    )
    hit = (F.coalesce(
        F.expr(f"(word DIV shiftleft(1L, bit)) % 2"), F.lit(0)) == 1)
    return (
        demand.join(words, "word_idx", "left")
        .select("probe", hit.cast("long").alias("bit_set"))
        .groupBy("probe").agg(F.min("bit_set").cast("long").alias("hit"))
    )


def _sql_bloom_pos(src: str, token: str = "token") -> str:
    """Position CTE body: one row per (…, p) for the BLOOM_K hash slices."""
    return (f"SELECT *, (('0x' || substr(md5({token}), 1 + 4*j, 4))::BIGINT"
            f" % {BLOOM_M}) AS p FROM {src},"
            f" LATERAL (SELECT unnest([0,1,2,3]) AS j) g")


def sql_bloom_build() -> str:
    return f"""
WITH toks AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS token
              FROM documents),
pos AS ({_sql_bloom_pos('toks')}),
words AS (SELECT p // {BLOOM_WORD} AS word_idx,
                 bit_or(1::BIGINT << (p % {BLOOM_WORD})::INT) AS word
          FROM pos GROUP BY p // {BLOOM_WORD})
SELECT s.word_idx::BIGINT AS word_idx, coalesce(w.word, 0)::BIGINT AS word
FROM (SELECT unnest(generate_series(0, {BLOOM_M // BLOOM_WORD - 1}))
      AS word_idx) s
LEFT JOIN words w USING (word_idx)
"""


def sql_bloom_merge() -> str:
    return f"""
WITH toks AS (SELECT DISTINCT (doc_id % 2)::BIGINT AS part,
                     unnest(string_split(text, ' ')) AS token
              FROM documents),
pos AS ({_sql_bloom_pos('toks')}),
parts AS (SELECT part, p // {BLOOM_WORD} AS word_idx,
                 bit_or(1::BIGINT << (p % {BLOOM_WORD})::INT) AS word
          FROM pos GROUP BY part, p // {BLOOM_WORD}),
merged AS (SELECT word_idx, bit_or(word) AS word_merged
           FROM parts GROUP BY word_idx),
whole AS (SELECT p // {BLOOM_WORD} AS word_idx,
                 bit_or(1::BIGINT << (p % {BLOOM_WORD})::INT) AS word_whole
          FROM (SELECT DISTINCT p FROM pos) q GROUP BY p // {BLOOM_WORD})
SELECT m.word_idx::BIGINT AS word_idx,
       coalesce(e.word, -1)::BIGINT AS word_even,
       coalesce(o.word, -1)::BIGINT AS word_odd,
       m.word_merged::BIGINT AS word_merged,
       w.word_whole::BIGINT AS word_whole,
       (m.word_merged = w.word_whole)::BIGINT AS mergeable
FROM merged m
LEFT JOIN (SELECT word_idx, word FROM parts WHERE part = 0) e
  USING (word_idx)
LEFT JOIN (SELECT word_idx, word FROM parts WHERE part = 1) o
  USING (word_idx)
JOIN whole w USING (word_idx)
"""


def sql_bloom_member() -> str:
    return f"""
WITH toks AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS token
              FROM documents),
pos AS ({_sql_bloom_pos('toks')}),
words AS (SELECT p // {BLOOM_WORD} AS word_idx,
                 bit_or(1::BIGINT << (p % {BLOOM_WORD})::INT) AS word
          FROM pos GROUP BY p // {BLOOM_WORD}),
base AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS token
         FROM documents WHERE doc_id % 11 = 0),
probes AS (SELECT token AS probe FROM base
           UNION ALL SELECT token || '-oov' FROM base),
demand AS (SELECT probe, p // {BLOOM_WORD} AS word_idx,
                  (p % {BLOOM_WORD})::INT AS bit
           FROM ({_sql_bloom_pos('probes', 'probe')}) d)
SELECT probe,
       min(CASE WHEN coalesce((w.word // (1::BIGINT << bit)) % 2, 0) = 1
           THEN 1 ELSE 0 END)::BIGINT AS hit
FROM demand d LEFT JOIN words w USING (word_idx)
GROUP BY probe
"""


# ---------------------------------------------------------------------------
# HDR-style histogram: the mergeable QUANTILE sketch (build + merge law +
# quantile estimates with an in-row error bound)
# ---------------------------------------------------------------------------

HIST_PREC_BITS = 3   # sub-bucket resolution: bucket width / lo <= 2^-3


def _hist_values(spark, sf_dir):
    """Sketch input: floor(l_extendedprice) as BIGINT (floor on doubles is
    exact in both engines — never round(), whose half-way ties differ),
    plus the l_orderkey-parity partition id used by the merge-law gate."""
    return _doc(spark, sf_dir, "lineitem").select(
        F.floor("l_extendedprice").cast("long").alias("v"),
        (F.col("l_orderkey") % 2).cast("long").alias("part"),
    )


def _hist_buckets(df):
    """HDR bucketing, integer-only: a value of bit-length L keeps its top
    HIST_PREC_BITS+1 bits (shift = max(L-4, 0)), so every bucket's width
    is <= lo/2^3 = 12.5% relative error — the bound hist_quantile reports
    per row. Same base-2 digit-count idiom as the HLL rho math (identical
    in DuckDB as length(bin(v)))."""
    return (
        df.withColumn(
            "_s",
            F.greatest(
                F.length(F.conv(F.col("v").cast("string"), 10, 2))
                - (HIST_PREC_BITS + 1),
                F.lit(0)).cast("int"))
        .withColumn("_w", F.expr("shiftleft(1L, _s)"))
        .withColumn("bucket_lo", F.expr("(v DIV _w) * _w").cast("long"))
        .withColumn("bucket_hi",
                    F.expr("(v DIV _w) * _w + _w - 1").cast("long"))
        .drop("_s", "_w")
    )


_SQL_HIST_BUCKETS = f"""
v AS (SELECT floor(l_extendedprice)::BIGINT AS v,
             (l_orderkey % 2)::BIGINT AS part FROM lineitem),
s AS (SELECT *, greatest(length(bin(v)) - {HIST_PREC_BITS + 1}, 0)::INT AS sh
      FROM v),
b AS (SELECT v, part,
             ((v // (1::BIGINT << sh)) * (1::BIGINT << sh))::BIGINT
               AS bucket_lo,
             ((v // (1::BIGINT << sh)) * (1::BIGINT << sh)
              + (1::BIGINT << sh) - 1)::BIGINT AS bucket_hi
      FROM s)"""


def q_hist_build(spark, sf_dir):
    """HDR histogram over lineitem prices: one map-side-combinable groupBy
    produces an O(#buckets) table (tens of rows for any corpus size — the
    bucket count grows with the VALUE RANGE, never with row count). This
    is the quantile sketch a 100-TB pipeline keeps instead of sorting:
    counts add across partitions (see hist_merge), and any quantile is
    answered from the cumulative counts with a <=2^-3 relative error
    bound (see hist_quantile)."""
    return (
        _hist_buckets(_hist_values(spark, sf_dir))
        .groupBy("bucket_lo", "bucket_hi")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def sql_hist_build() -> str:
    return f"""
WITH {_SQL_HIST_BUCKETS}
SELECT bucket_lo, bucket_hi, count(*)::BIGINT AS cnt
FROM b GROUP BY 1, 2
"""


def q_hist_merge(spark, sf_dir):
    """Histogram MERGEABILITY — the + law on bucket counts: histograms
    built independently per l_orderkey-parity partition sum-merge to
    exactly the whole-corpus histogram. Completes the distributive sketch
    algebra the engine gates (HLL max / CMS + / Bloom OR / histogram +),
    i.e. every sketch family the pipeline would roll up via partial
    aggregation at 100 TB has its merge law verified in two engines. -1
    sentinels for parts with no value in a bucket (a present count is
    >= 1, so the sentinel is unambiguous; never null — the driver's
    canonical sort chokes on nulls)."""
    parts = (
        _hist_buckets(_hist_values(spark, sf_dir))
        .groupBy("part", "bucket_lo")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    merged = parts.groupBy("bucket_lo").agg(
        F.sum("cnt").alias("cnt_merged"))
    even = parts.filter(F.col("part") == 0).select(
        "bucket_lo", F.col("cnt").alias("cnt_even"))
    odd = parts.filter(F.col("part") == 1).select(
        "bucket_lo", F.col("cnt").alias("cnt_odd"))
    whole = q_hist_build(spark, sf_dir).select(
        "bucket_lo", F.col("cnt").alias("cnt_whole"))
    return (
        merged.join(even, "bucket_lo", "left")
        .join(odd, "bucket_lo", "left").join(whole, "bucket_lo")
        .select(
            F.col("bucket_lo").cast("long").alias("bucket_lo"),
            F.coalesce("cnt_even", F.lit(-1)).cast("long")
            .alias("cnt_even"),
            F.coalesce("cnt_odd", F.lit(-1)).cast("long").alias("cnt_odd"),
            F.col("cnt_merged").cast("long").alias("cnt_merged"),
            F.col("cnt_whole").cast("long").alias("cnt_whole"),
            (F.col("cnt_merged") == F.col("cnt_whole"))
            .cast("long").alias("mergeable"),
        )
    )


def sql_hist_merge() -> str:
    return f"""
WITH {_SQL_HIST_BUCKETS},
parts AS (SELECT part, bucket_lo, count(*)::BIGINT AS cnt
          FROM b GROUP BY 1, 2),
merged AS (SELECT bucket_lo, sum(cnt)::BIGINT AS cnt_merged
           FROM parts GROUP BY 1),
whole AS (SELECT bucket_lo, count(*)::BIGINT AS cnt_whole
          FROM b GROUP BY 1)
SELECT m.bucket_lo::BIGINT AS bucket_lo,
       coalesce(e.cnt, -1)::BIGINT AS cnt_even,
       coalesce(o.cnt, -1)::BIGINT AS cnt_odd,
       m.cnt_merged::BIGINT AS cnt_merged,
       w.cnt_whole::BIGINT AS cnt_whole,
       (m.cnt_merged = w.cnt_whole)::BIGINT AS mergeable
FROM merged m
LEFT JOIN (SELECT bucket_lo, cnt FROM parts WHERE part = 0) e
  USING (bucket_lo)
LEFT JOIN (SELECT bucket_lo, cnt FROM parts WHERE part = 1) o
  USING (bucket_lo)
JOIN whole w USING (bucket_lo)
"""


# quantile targets as EXACT rationals — target rank = ceil(num·N/den) in
# pure integer math, so no engine ever multiplies N by an inexact double
HIST_QS = (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))


def q_hist_quantile(spark, sf_dir):
    """Quantiles FROM the histogram, verified against the exact answer:
    for each target rank (integer rational math — never ceil(q·N) on a
    double) the estimate is the first bucket whose cumulative count
    reaches the rank; the row also carries the exact rank-statistic value
    and a ``within`` flag proving the bucket contains it (cumulative-
    count order == value order, so within must be 1 — gated in both
    engines, which is precisely the sketch's error-bound contract).

    Scale shape: the histogram side is O(#buckets) after one map-side-
    combined pass — the cumulative window and the 3-row quantile join run
    on tens of rows. The exact companion does a global rank (one sort) —
    at 100 TB you keep ONLY the sketch path; the exact path exists here
    because this gate's whole point is to certify the sketch against it."""
    hist = q_hist_build(spark, sf_dir)
    n = hist.agg(F.sum("cnt").alias("n"))
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("bucket_lo")
            .rowsBetween(Window.unboundedPreceding, 0)))
    qs = spark.createDataFrame(list(HIST_QS), ["qname", "num", "den"])
    targets = qs.crossJoin(F.broadcast(n)).select(
        "qname",
        F.expr("(num * n + den - 1) DIV den").cast("long").alias("target"))
    est = (
        targets.join(F.broadcast(cum), F.col("cum") >= F.col("target"))
        .groupBy("qname", "target")
        .agg(F.min("bucket_lo").alias("est_lo"))
        .join(hist.select("bucket_lo", "bucket_hi"),
              F.col("est_lo") == F.col("bucket_lo"))
        .drop("bucket_lo")
    )
    vals = _hist_values(spark, sf_dir).select("v")
    ranked = vals.withColumn(
        "rk", F.row_number().over(Window.orderBy("v")))
    return (
        est.join(ranked, F.col("rk") == F.col("target"))
        .select(
            "qname", F.col("target").cast("long").alias("target"),
            F.col("est_lo").cast("long").alias("est_lo"),
            F.col("bucket_hi").cast("long").alias("est_hi"),
            F.col("v").cast("long").alias("exact_val"),
            ((F.col("v") >= F.col("est_lo"))
             & (F.col("v") <= F.col("bucket_hi")))
            .cast("long").alias("within"),
        )
    )


def sql_hist_quantile() -> str:
    qs = ", ".join(f"('{nm}', {num}, {den})" for nm, num, den in HIST_QS)
    return f"""
WITH {_SQL_HIST_BUCKETS},
hist AS (SELECT bucket_lo, bucket_hi, count(*)::BIGINT AS cnt
         FROM b GROUP BY 1, 2),
n AS (SELECT sum(cnt)::BIGINT AS n FROM hist),
cum AS (SELECT *, sum(cnt) OVER (ORDER BY bucket_lo
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum FROM hist),
qs(qname, num, den) AS (VALUES {qs}),
targets AS (SELECT qname, ((num * n.n + den - 1) // den)::BIGINT AS target
            FROM qs, n),
est AS (SELECT t.qname, t.target, min(c.bucket_lo) AS est_lo
        FROM targets t JOIN cum c ON c.cum >= t.target
        GROUP BY 1, 2),
ranked AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM b)
SELECT e.qname, e.target::BIGINT AS target,
       e.est_lo::BIGINT AS est_lo, h.bucket_hi::BIGINT AS est_hi,
       r.v::BIGINT AS exact_val,
       (r.v >= e.est_lo AND r.v <= h.bucket_hi)::BIGINT AS within
FROM est e
JOIN hist h ON h.bucket_lo = e.est_lo
JOIN ranked r ON r.rk = e.target
"""


ANALYTICS_QUERIES = {
    "kg_entity_pagerank": q_kg_entity_pagerank,
    "graph_degree_dist": q_graph_degree_dist,
    "graph_triangles": q_graph_triangles,
    "graph_kcore": q_graph_kcore,
    "graph_labelprop": q_graph_labelprop,
    "hll_registers": q_hll_registers,
    "hll_estimate": q_hll_estimate,
    "hll_merge": q_hll_merge,
    "cms_merge": q_cms_merge,
    "cms_freq": q_cms_freq,
    "bloom_build": q_bloom_build,
    "bloom_merge": q_bloom_merge,
    "bloom_member": q_bloom_member,
    "hist_build": q_hist_build,
    "hist_merge": q_hist_merge,
    "hist_quantile": q_hist_quantile,
    "heavy_hitters": q_heavy_hitters,
    "rollup_revenue": q_rollup_revenue,
    "percentile_groups": q_percentile_groups,
    "window_running": q_window_running,
    "range_join_counts": q_range_join_counts,
}


def analytics_sqls() -> dict[str, str]:
    return {
        "kg_entity_pagerank": sql_kg_entity_pagerank(),
        "graph_degree_dist": sql_graph_degree_dist(),
        "graph_triangles": sql_graph_triangles(),
        "graph_kcore": sql_graph_kcore(),
        "graph_labelprop": sql_graph_labelprop(),
        "hll_registers": sql_hll_registers(),
        "hll_estimate": sql_hll_estimate(),
        "hll_merge": sql_hll_merge(),
        "cms_merge": sql_cms_merge(),
        "cms_freq": sql_cms_freq(),
        "bloom_build": sql_bloom_build(),
        "bloom_merge": sql_bloom_merge(),
        "bloom_member": sql_bloom_member(),
        "hist_build": sql_hist_build(),
        "hist_merge": sql_hist_merge(),
        "hist_quantile": sql_hist_quantile(),
        "heavy_hitters": SQL_HEAVY_HITTERS,
        "rollup_revenue": SQL_ROLLUP_REVENUE,
        "percentile_groups": SQL_PERCENTILE_GROUPS,
        "window_running": SQL_WINDOW_RUNNING,
        "range_join_counts": SQL_RANGE_JOIN_COUNTS,
    }
