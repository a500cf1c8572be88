"""Round-6 optimization pins: the vectorized Arrow kernels that replaced
the Catalyst crossjoin+window ANN plans must be EXACTLY result-identical.

Three claims are pinned, each against the original Catalyst formulation
built inline (the pre-round-6 plan shape):

1. `_cell_cand` + `_argmax_cell` == crossJoin(broadcast(cent)) +
   round(·,6) + row_number window argmax — including sub-1e-6 near-ties
   where the margin logic and the rounded tie-break actually decide.
2. `_pq_cand` + `_argmin_code` == subspace explode + broadcast join +
   round(·,6) + row_number window argmin.
3. `_unit_py` / `_unit_df` == the JVM `_unit` higher-order fold,
   bit-for-bit (collected doubles compared with ==, no tolerance).

The cross-engine (Spark vs DuckDB) equality of the full queries is
test_queries_oracle's job; these tests isolate the kernel refactor."""

import duckdb
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pl_marker_spark.ann_ivf import (_argmax_cell, _cell_cand, _dot, _unit,
                                     _unit_df, _unit_py)

SF = "/root/testdata/sf0.001"


def _crafted_e(spark):
    """dim-4 unit vectors with engineered near-ties: pairs of centroids
    whose raw sims agree to <1e-6 (round ties -> smaller cell wins) and
    to ~3e-7 (rounding may or may not merge them)."""
    import math

    rows = []
    # vector exactly between cells 0 and 1 -> exact tie
    rows.append((0, [math.sqrt(0.5), math.sqrt(0.5), 0.0, 0.0]))
    # near-tie: angle offsets of a few 1e-7 around the bisector
    for i, eps in enumerate((1e-7, 3e-7, 7e-7, 2.5e-6, -3e-7)):
        a = math.pi / 4 + eps
        rows.append((i + 1, [math.cos(a), math.sin(a), 0.0, 0.0]))
    # plain vectors
    rows.append((6, [1.0, 0.0, 0.0, 0.0]))
    rows.append((7, [0.0, 0.0, 1.0, 0.0]))
    rows.append((8, [0.6, 0.8, 0.0, 0.0]))
    return spark.createDataFrame(rows, "vec_id long, uv array<double>")


def _crafted_cent():
    return ([0, 1, 2],
            [[1.0, 0.0, 0.0, 0.0],
             [0.0, 1.0, 0.0, 0.0],
             [0.0, 0.0, 1.0, 0.0]],
            None)


def _old_argmax(e, cells, cent, cn, spark):
    """The pre-round-6 plan: crossJoin(broadcast(cent)) + rounded sim +
    row_number window, verbatim."""
    rows = [(c, v, 1.0 if cn is None else cn[i])
            for i, (c, v) in enumerate(zip(cells, cent))]
    cent_df = spark.createDataFrame(
        rows, "cell long, c array<double>, cn double")
    sim = _dot(F.col("uv"), F.col("c"))
    if cn is not None:
        sim = sim / F.col("cn")
    sims = e.crossJoin(F.broadcast(cent_df)).select(
        "vec_id", "cell", F.round(sim, 6).alias("csim"))
    wv = Window.partitionBy("vec_id").orderBy(F.desc("csim"), "cell")
    return (sims.withColumn("crk", F.row_number().over(wv))
            .filter(F.col("crk") == 1).select("vec_id", "cell"))


def test_cell_cand_argmax_matches_old_window(spark):
    e = _crafted_e(spark)
    cells, cent, cn = _crafted_cent()
    old = {r.vec_id: r.cell
           for r in _old_argmax(e, cells, cent, cn, spark).collect()}
    new = {r.vec_id: r.cell
           for r in _argmax_cell(_cell_cand(e, cells, cent, cn)).collect()}
    assert old == new and len(old) == 9
    # the exact-tie vector must have resolved to the smaller cell id
    assert new[0] == 0


def test_cell_cand_argmax_matches_old_window_real_corpus(spark):
    rows = (spark.read.parquet(f"{SF}/embeddings.parquet")
            .filter(F.col("vec_id") < 16)
            .select("vec_id", "embedding").collect())
    rows.sort(key=lambda r: r["vec_id"])
    cells = [r["vec_id"] for r in rows]
    cent = [_unit_py(r["embedding"]) for r in rows]
    e = _unit_df(spark, SF)
    old = {r.vec_id: r.cell
           for r in _old_argmax(e, cells, cent, None, spark).collect()}
    new = {r.vec_id: r.cell
           for r in _argmax_cell(_cell_cand(e, cells, cent, None)).collect()}
    assert old == new and len(old) == 500


def test_unit_kernel_bit_identical_to_jvm_fold(spark):
    jvm = (spark.read.parquet(f"{SF}/embeddings.parquet")
           .select("vec_id", _unit(
               F.transform("embedding", lambda x: x.cast("double")))
               .alias("uv")))
    a = {r.vec_id: r.uv for r in jvm.collect()}
    b = {r.vec_id: r.uv for r in _unit_df(spark, SF).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k], k          # exact doubles, no tolerance
    # driver-side _unit_py agrees too
    raw = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' "
        "WHERE vec_id < 8").fetchall()
    for vid, emb in raw:
        assert _unit_py(list(emb)) == list(a[vid]), vid


def test_pq_cand_argmin_matches_old_window(spark):
    from pl_marker_spark.pq import (_argmin_code, _pq_cand, _subvectors)

    m_pq, sub_d = 2, 2
    e = _crafted_e(spark)
    cb_rows = [
        {"m": 0, "code": 0, "cv": [1.0, 0.0]},
        {"m": 0, "code": 1, "cv": [0.70710678, 0.70710678]},
        {"m": 1, "code": 0, "cv": [0.0, 0.0]},
        {"m": 1, "code": 1, "cv": [0.5, 0.5]},
    ]
    new = {(r.vec_id, r.m): (r.code, r.d2) for r in _argmin_code(
        _pq_cand(e, cb_rows, m_pq, sub_d, with_sv=False)).collect()}
    # old plan: explode subvectors, broadcast-join the codebook, rank by
    # rounded squared L2 with the code-id tie-break
    cb_df = spark.createDataFrame(
        [(r["m"], r["code"], r["cv"]) for r in cb_rows],
        "m long, code long, cv array<double>")
    sub = _subvectors(e, m_pq, sub_d)
    d2 = F.aggregate(
        F.zip_with("sv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)
    ranked = sub.join(F.broadcast(cb_df), "m").select(
        "vec_id", "m", "code", F.round(d2, 6).alias("d2"))
    wv = Window.partitionBy("vec_id", "m").orderBy("d2", "code")
    old = {(r.vec_id, r.m): (r.code, r.d2)
           for r in ranked.withColumn("rk", F.row_number().over(wv))
           .filter(F.col("rk") == 1).collect()}
    assert old == new and len(old) == 18


@pytest.mark.parametrize("tau_probe", [0.4])
def test_semdedup_pair_kernel_matches_old_join(spark, tau_probe):
    """End-to-end: the applyInPandas pair kernel + JVM round filter must
    reproduce the old cell-keyed self-join + HOF dot pair set, with tau
    set to an ACTUAL rounded sim present in the corpus so the >= boundary
    is exercised exactly."""
    from pl_marker_spark.ann_ivf import rank_cells, semdedup

    _, cand = rank_cells(spark, SF, k_cells=16, lloyd_rounds=1)
    v = _argmax_cell(cand, with_uv=True).localCheckpoint()
    left = v.select(F.col("vec_id").alias("a_id"), "cell",
                    F.col("uv").alias("auv"))
    right = v.select(F.col("vec_id").alias("b_id"),
                     F.col("cell").alias("b_cell"), F.col("uv").alias("buv"))
    sims = (left.join(right, (F.col("cell") == F.col("b_cell"))
                      & (F.col("a_id") < F.col("b_id")))
            .select("a_id", "b_id",
                    F.round(_dot(F.col("auv"), F.col("buv")), 6)
                    .alias("sim")))
    # pick a boundary tau that is an actual rounded pair sim
    tau = sims.filter(F.col("sim") >= tau_probe).agg(
        F.max("sim")).collect()[0][0]
    old_pairs = {(r.a_id, r.b_id)
                 for r in sims.filter(F.col("sim") >= tau).collect()}
    assert old_pairs, "degenerate probe: no boundary pairs"
    out = semdedup(spark, SF, tau=tau)
    got_dupped = {r.vec_id for r in out.collect() if r.n_dups > 0}
    want_dupped = {a for a, _ in old_pairs} | {b for _, b in old_pairs}
    assert got_dupped == want_dupped
