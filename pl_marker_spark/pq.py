"""Product quantization (PQ) ANN — the third storage-compression point
on the quantization curve beside int8 scalar quantization (`ann_ivf.
q_sq_encode`, 8 bits/dim) and IVF×SQ (`ann_ivf.ivf_sq_topk`): each unit
vector is split into M subspaces, each subspace gets its own K-centroid
k-means codebook, and a vector is stored as M small integer codes —
M·log2(K) bits total (the pinned profile: 4 subspaces × 16 centroids =
16 bits for a 64-dim vector, a 128× compression over float64).

Shape (the one that survives 100 TB):
  1. codebook train: the M×K codebook is VOCAB-sized (64 rows × 16
     floats here) and broadcast everywhere — the PQ contract mirrors
     the IVF one: the quantizer fits in memory, the coded corpus does
     not. Training is the same distributed pattern as
     ``ann_ivf.rank_cells``: seed init from the first K vectors'
     subvectors, then per-(subspace, code, dim) component means via
     posexplode + groupBy — a map-side-combinable aggregation, never a
     driver-side kmeans.
  2. encode: one narrow pass — each (vector, subspace) row ranks the
     broadcast codebook by rounded L2 distance (tie-broken on code id)
     and keeps the argmin. No shuffle on the corpus side beyond the
     subspace explode (M rows per vector, ids + 16 floats each).
  3. ADC search (asymmetric distance): the classic PQ trick — the
     query precomputes a LUT of (subspace, code) partial dot products
     (N_q × M × K rows, broadcast), and scanning the coded corpus is a
     broadcast equi-join on (m, code) + a 4-term groupBy sum. The
     corpus-scale side touches ONLY integer codes; no float vector
     ever enters the scan — this is why PQ is the billion-vector
     format (FAISS IVF,PQ): bytes scanned per candidate = M codes.
     Subspaces are orthogonal coordinate blocks, so |reconstruction|²
     = Σ_m |c_{m,code_m}|², giving exact cosine against the
     reconstruction from the same LUT (cn2 column).

Floating-point twin discipline (same as ann_ivf): every cross-engine
ranking key is rounded to 6 decimals before ranking (subspace L2
distances, centroid components, final sims) with deterministic
tie-breaks (code id, vec_id).

Recall at the pinned 16-bit profile is intentionally coarse (it is a
compression twin, not a quality profile); the quality knobs (m_pq=8 →
32 bits, lloyd_rounds≥2) are recall-floor-tested in tests/test_pq.py.

No reference-file counterpart: the reference (thunlp/PL-Marker) has no
ANN component; this belongs to the training-data-pipeline family the
graft adds (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from .ann_ivf import N_QUERIES, TOP_K, _dot, _unit

M_PQ = 4      # subspaces (pinned twin profile: 4 × 16-dim)
K_PQ = 16     # centroids per subspace -> 4-bit codes, 16 bits/vector
DIM = 64      # embedding dim of the synthetic corpus (asserted on read)


def _subvectors(e: DataFrame, m_pq: int, sub: int) -> DataFrame:
    """(vec_id, uv) -> (vec_id, m, sv): explode each unit vector into
    its M coordinate-block subvectors. Literal slice bounds keep the
    whole thing one generator projection (zero shuffle)."""
    blocks = F.array(*[
        F.struct(F.lit(m).cast("long").alias("m"),
                 F.slice("uv", m * sub + 1, sub).alias("sv"))
        for m in range(m_pq)
    ])
    return e.select("vec_id", F.explode(blocks).alias("b")).select(
        "vec_id", "b.m", "b.sv")


def _pq_cand(e: DataFrame, cb_rows, m_pq: int, sub_d: int, *,
             with_sv: bool) -> DataFrame:
    """One encode pass of the corpus against the DRIVER-RESIDENT
    codebook — the PQ twin of ``ann_ivf._cell_cand`` (round-6, guide
    §2.3/§2.4/§4.2). Replaces the former subspace-explode →
    join(broadcast(cb)) → per-(vec_id, m) row_number window, which
    materialized N·M·K rows and shuffled the sv payload through the
    ranking sort. The N·M·K·sub_d squared-L2 terms run as a vectorized
    Arrow kernel with SEQUENTIAL per-dimension accumulation
    (acc += (a_d − b_d)·(a_d − b_d) in dimension order — bit-equal to
    the Catalyst ``aggregate(zip_with(...))`` fold), and only codes
    within CAND_MARGIN of each (vector, subspace)'s raw minimum are
    emitted (~1 per (vec_id, m)); the JVM round(·,6) + min(struct)
    winner pick then reproduces the original window bit-for-bit
    (round is monotone). ``cb_rows``: collected (m, code, cv) rows —
    bounded at M·K (the PQ contract: the codebook fits in memory).
    Missing (m, code) entries (an empty Lloyd cell) get +inf distance,
    matching the old inner join's exclusion. Emits
    (vec_id, m, code, raw[, sv])."""
    import numpy as np
    import pyarrow as pa

    from .ann_ivf import CAND_MARGIN, _unit_batch

    k_max = max(r["code"] for r in cb_rows) + 1
    cbm = np.full((m_pq, k_max, sub_d), np.inf)
    for r in cb_rows:
        cbm[r["m"], r["code"]] = r["cv"]
    margin = CAND_MARGIN

    fields = [pa.field("vec_id", pa.int64()), pa.field("m", pa.int64()),
              pa.field("code", pa.int64()), pa.field("raw", pa.float64())]
    if with_sv:
        fields.append(pa.field("sv", pa.list_(pa.float64())))
    out_schema = pa.schema(fields)

    def gen(batches):
        for batch in batches:
            vid, u = _unit_batch(batch)
            n = len(vid)
            if n == 0:
                continue
            for m in range(m_pq):
                sv = np.ascontiguousarray(u[:, m * sub_d:(m + 1) * sub_d])
                acc = np.zeros((n, k_max))
                # sequential per-dim accumulation == the Catalyst fold
                for d in range(sub_d):
                    t = sv[:, d:d + 1] - cbm[m, :, d][None, :]
                    acc += t * t
                mask = acc <= (acc.min(axis=1)[:, None] + margin)
                ri, ci = np.nonzero(mask)
                arrs = [pa.array(vid[ri]),
                        pa.array(np.full(len(ri), m, dtype=np.int64)),
                        pa.array(ci.astype(np.int64)),
                        pa.array(acc[ri, ci])]
                if with_sv:
                    vals = sv[ri].ravel()
                    offs = np.arange(len(ri) + 1, dtype=np.int32) * sub_d
                    arrs.append(pa.ListArray.from_arrays(
                        pa.array(offs), pa.array(vals)))
                yield pa.RecordBatch.from_arrays(arrs, schema=out_schema)

    spark_schema = "vec_id long, m long, code long, raw double" + (
        ", sv array<double>" if with_sv else "")
    return e.mapInArrow(gen, spark_schema)


def _argmin_code(cand: DataFrame, *, with_sv: bool = False) -> DataFrame:
    """Exact argmin code pick over kernel candidates: JVM round(·,6) +
    min(struct(d2, code)) — lexicographic struct order IS (d2 asc, code
    asc), the original window's order, as a hash aggregation instead of
    a partitioned sort (the ann_ivf._argmax_cell discipline)."""
    fields = [F.round("raw", 6).alias("d2"), F.col("code")]
    if with_sv:
        fields.append(F.col("sv"))
    w = cand.groupBy("vec_id", "m").agg(F.min(F.struct(*fields)).alias("w"))
    cols = ["vec_id", "m", F.col("w.code").alias("code"),
            F.col("w.d2").alias("d2")]
    if with_sv:
        cols.append(F.col("w.sv").alias("sv"))
    return w.select(*cols)


def pq_codebook_codes(
    spark: SparkSession, sf_dir: str, *, m_pq: int = M_PQ,
    k_pq: int = K_PQ, lloyd_rounds: int = 1, n_dim: int = DIM,
):
    """Train the per-subspace codebooks and encode the corpus. Returns
    ``(codes, cb)``: codes = (vec_id, m, code, d2) with d2 the rounded
    squared L2 of the kept assignment; cb = (m, code, cv) broadcast-
    sized. Seed init (subvectors of the first k_pq vectors) + a
    distributed Lloyd round per subspace, with the assignment passes run
    as margin-candidate Arrow kernels against the driver-resident
    codebook (see _pq_cand — bit-equal to the former explode + broadcast
    join + window plan, minus the N·M·K-row ranking shuffle) and the
    re-centering as the same per-(m, code, pos) posexplode + avg
    map-side-combinable aggregation as before."""
    if n_dim % m_pq:
        raise ValueError(f"pq: dim {n_dim} not divisible by m_pq {m_pq}")
    sub_d = n_dim // m_pq
    from .ann_ivf import _raw_embeddings, _unit_py

    e = _raw_embeddings(spark, sf_dir)
    # seed codebook: subvectors of the first k_pq vectors — bounded
    # collect from the RAW parquet (pushed-down filter) + driver-side
    # exact unit normalization; identical values to the old sub.filter
    # path (see ann_ivf._unit_py)
    seed = (e.filter(F.col("vec_id") < k_pq)
            .select("vec_id", "embedding").collect())
    cb_rows = []
    for r in seed:
        uv = _unit_py(r["embedding"])
        cb_rows.extend(
            {"m": m, "code": r["vec_id"],
             "cv": uv[m * sub_d:(m + 1) * sub_d]} for m in range(m_pq))

    for _ in range(lloyd_rounds):
        a_r = _argmin_code(_pq_cand(e, cb_rows, m_pq, sub_d, with_sv=True),
                           with_sv=True).select("m", "code", "sv")
        cb_df = (
            a_r.select("m", "code", F.posexplode("sv").alias("pos", "x"))
            .groupBy("m", "code", "pos").agg(F.avg("x").alias("cx"))
            .groupBy("m", "code").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                    lambda s: F.round(s["cx"], 6),
                ).alias("cv"))
        )
        cb_rows = [r.asDict() for r in cb_df.collect()]  # bounded: M·K

    # the trained codebook is M·K rows and already driver-resident; the
    # DataFrame form consumers join against is rebuilt from the collected
    # rows, so the training subtree never re-evaluates (the semdedup
    # lesson, ann_ivf.py:305) and no corpus-wide lineage rides it
    cb = spark.createDataFrame(
        [(r["m"], r["code"], list(r["cv"])) for r in cb_rows],
        "m long, code long, cv array<double>")
    codes = _argmin_code(
        _pq_cand(e, cb_rows, m_pq, sub_d, with_sv=False)).select(
        "vec_id", "m", "code", "d2")
    return codes, cb


def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ encode law at the pinned profile: one (vec_id, subspace)
    row per code — exact-integer code assignments plus the rounded
    per-subspace quantization distortion."""
    codes, _ = pq_codebook_codes(spark, sf_dir)
    return codes.select(
        "vec_id", F.col("m").cast("long").alias("m"),
        F.col("code").cast("long").alias("code"), "d2")


def _adc_luts(spark, sf_dir, cb, m_pq, sub_d, n_queries):
    """Driver-built ADC lookup tables — bounded at n_queries · M · K.
    pdot/cn2 use the SAME sequential fold order as the former JVM
    `_dot` expressions, so every LUT entry is bit-identical. Returns
    (qids int64 ndarray, pd_lut (Nq, M, K), cn_lut (M, K))."""
    import numpy as np

    from .ann_ivf import _collect_queries

    qid_list, qvecs = _collect_queries(spark, sf_dir, n_queries)
    cbr = cb.collect()
    k_max = max(r["code"] for r in cbr) + 1
    cn_lut = np.zeros((m_pq, k_max))
    for r in cbr:
        cv = r["cv"]
        s = 0.0
        for x in cv:
            s = s + x * x          # sequential fold == _dot(cv, cv)
        cn_lut[r["m"], r["code"]] = s
    qids = np.asarray(qid_list, dtype=np.int64)
    pdm = np.zeros((len(qid_list), m_pq, k_max))
    for qi, uv in enumerate(qvecs):
        for r in cbr:
            m = r["m"]
            cv = r["cv"]
            s = 0.0
            for d in range(sub_d):
                s = s + uv[m * sub_d + d] * cv[d]  # == _dot(qsv, cv)
            pdm[qi, m, r["code"]] = s
    return qids, pdm, cn_lut


def _codes_array(codes: DataFrame) -> DataFrame:
    """(vec_id, m, code) rows -> (vec_id, codes array ordered by m): the
    M-small-int payload the ADC gather kernels scan."""
    return (codes.groupBy("vec_id").agg(
        F.array_sort(F.collect_list(F.struct("m", "code"))).alias("mc"))
        .select("vec_id",
                F.transform("mc", lambda s: s["code"]).alias("codes")))


def pq_ann_topk(
    spark: SparkSession, sf_dir: str, *, m_pq: int = M_PQ,
    k_pq: int = K_PQ, lloyd_rounds: int = 1, top_k: int = TOP_K,
    n_queries: int = N_QUERIES, n_dim: int = DIM,
) -> DataFrame:
    """ADC top-k over PQ codes: full-precision query subvectors build a
    broadcast LUT of partial dots against the codebook; the coded corpus
    is scanned via an (m, code) broadcast equi-join + a groupBy sum —
    the corpus side never touches a float vector."""
    codes, cb = pq_codebook_codes(
        spark, sf_dir, m_pq=m_pq, k_pq=k_pq,
        lloyd_rounds=lloyd_rounds, n_dim=n_dim)
    sub_d = n_dim // m_pq
    # The query-side LUT is (n_queries · M · K) partial dots — bounded by
    # construction, so it is built driver-side from the bounded query
    # collect + the already-driver-resident codebook, with the SAME
    # sequential fold order as the old JVM _dot expressions (round-6: the
    # former plan joined the corpus-scale code rows against the broadcast
    # LUT and hash-aggregated N·n_queries·M rows; the Arrow kernel below
    # does the same M-term gather-sum per (query, vector) vectorized,
    # summing m ascending, and emits one row per pair).
    qids, pd_lut, cn_lut = _adc_luts(spark, sf_dir, cb, m_pq, sub_d,
                                     n_queries)
    codes_arr = _codes_array(codes)

    import numpy as np
    import pyarrow as pa

    n_q = len(qids)

    def scan(batches):
        for batch in batches:
            vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
            n = len(vid)
            if n == 0:
                continue
            cd = np.asarray(batch.column("codes").flatten().to_numpy(
                zero_copy_only=False)).reshape(n, m_pq).astype(np.int64)
            num = np.zeros((n_q, n))
            rn2 = np.zeros(n)
            for m in range(m_pq):        # m ascending — deterministic sum
                num += pd_lut[:, m, cd[:, m]]
                rn2 += cn_lut[m, cd[:, m]]
            keep = qids[:, None] != vid[None, :]
            ri, ci = np.nonzero(keep)
            yield pa.RecordBatch.from_arrays(
                [pa.array(qids[ri]), pa.array(vid[ci]),
                 pa.array(num[ri, ci]), pa.array(rn2[ci])],
                ["q_id", "vec_id", "num", "rn2"])

    scored = (codes_arr.mapInArrow(
        scan, "q_id long, vec_id long, num double, rn2 double")
        .select("q_id", "vec_id",
                F.round(F.col("num") / F.sqrt(F.col("rn2")), 6).alias("sim"))
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("sim"), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= top_k)
        .select("q_id", "vec_id", "sim", F.col("rk").cast("long").alias("rk"))
    )


def q_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ADC top-k at the pinned twin profile (M=4, K=16, one Lloyd
    round, LUT scan)."""
    return pq_ann_topk(spark, sf_dir)


_SUB = DIM // M_PQ

# PQ CTE chain (assumes `u(vec_id, uv)` is already defined): subspace
# explode -> seed codebook -> one Lloyd round per subspace -> final
# argmin codes. The SQL twin of pq_codebook_codes(); SQL_PQ_ENCODE /
# SQL_PQ_ANN prepend the plain unit-vector CTEs, SQL_IVF_PQ prepends
# ann_ivf._SQL_QUANTIZER (which defines the same `u`) — internal CTE
# names are pq_-prefixed to avoid collisions with the quantizer chain.
_SQL_PQ_CHAIN = f"""\
ms AS (SELECT UNNEST(range({M_PQ})) AS m),
sub AS (SELECT vec_id, m,
               uv[(m*{_SUB}+1):(m*{_SUB}+{_SUB})] AS sv
        FROM u, ms),
pq_cb0 AS (SELECT m, vec_id AS code, sv AS cv
           FROM sub WHERE vec_id < {K_PQ}),
pq_d0 AS (SELECT s.vec_id, s.m, c.code,
              round(list_sum(list_transform(range(1, {_SUB}+1),
                    i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))), 6) AS d2
       FROM sub s JOIN pq_cb0 c ON c.m = s.m),
pq_a0 AS (SELECT vec_id, m, code
       FROM (SELECT vec_id, m, code,
                    row_number() OVER (PARTITION BY vec_id, m
                                       ORDER BY d2, code) AS rk
             FROM pq_d0)
       WHERE rk = 1),
pq_ux AS (SELECT a.m, a.code, UNNEST(s.sv) AS x,
              UNNEST(range(1, {_SUB}+1)) AS pos
       FROM pq_a0 a JOIN sub s ON s.vec_id = a.vec_id AND s.m = a.m),
pq_cx AS (SELECT m, code, pos, avg(x) AS c FROM pq_ux GROUP BY m, code, pos),
cb AS (SELECT m, code, list(round(c, 6) ORDER BY pos) AS cv
       FROM pq_cx GROUP BY m, code),
pq_d1 AS (SELECT s.vec_id, s.m, c.code,
              round(list_sum(list_transform(range(1, {_SUB}+1),
                    i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))), 6) AS d2
       FROM sub s JOIN cb c ON c.m = s.m),
codes AS (SELECT vec_id, m, code, d2
          FROM (SELECT vec_id, m, code, d2,
                       row_number() OVER (PARTITION BY vec_id, m
                                          ORDER BY d2, code) AS rk
                FROM pq_d1)
          WHERE rk = 1)"""

_SQL_PQ = f"""\
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
u AS (SELECT vec_id,
             list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS uv
      FROM e),
{_SQL_PQ_CHAIN}"""

SQL_PQ_ENCODE = _SQL_PQ + """
SELECT vec_id, m::BIGINT AS m, code::BIGINT AS code, d2 FROM codes
"""

SQL_PQ_ANN = _SQL_PQ + f""",
qsub AS (SELECT vec_id AS q_id, m, sv AS qsv
         FROM sub WHERE vec_id < {N_QUERIES}),
lut AS (SELECT q.q_id, c.m, c.code,
               list_dot_product(q.qsv, c.cv) AS pdot,
               list_dot_product(c.cv, c.cv) AS cn2
        FROM qsub q JOIN cb c ON c.m = q.m),
scored AS (SELECT l.q_id, k.vec_id,
                  round(sum(l.pdot) / sqrt(sum(l.cn2)), 6) AS sim
           FROM codes k JOIN lut l ON l.m = k.m AND l.code = k.code
           WHERE l.q_id != k.vec_id
           GROUP BY l.q_id, k.vec_id),
fin AS (SELECT q_id, vec_id, sim,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY sim DESC, vec_id) AS rk
        FROM scored)
SELECT q_id, vec_id, sim, rk::BIGINT AS rk FROM fin WHERE rk <= {TOP_K}
"""


def ivf_pq_topk(
    spark: SparkSession, sf_dir: str, *, k_cells: int | None = None,
    nprobe: int | None = None, m_pq: int = M_PQ, k_pq: int = K_PQ,
    lloyd_rounds: int = 1, top_k: int = TOP_K,
    n_queries: int = N_QUERIES, n_dim: int = DIM,
) -> DataFrame:
    """IVF x PQ composed — the FAISS IVF,PQ billion-vector shape (the
    `by_residual=False` variant: one GLOBAL PQ codebook, not per-cell
    residual codebooks, so the coarse and fine quantizers compose as
    independent, independently-tested stages): the coarse quantizer
    prunes WHICH inverted lists a query scans, and the lists hold M
    integer PQ codes per vector — the probed scan is an (q, m, code)
    broadcast LUT join + groupBy sum over ids+codes only. Per candidate
    the scan reads M small ints; no float vector ever enters the
    probe-scan side. Any recall delta vs pq_ann_topk (same codes, full
    scan) is pure probe pruning; any delta vs ivf_topk (same probes,
    float payload) is pure quantization."""
    from .ann_ivf import K_CELLS, NPROBE, _argmax_cell, rank_cells

    k_cells = K_CELLS if k_cells is None else k_cells
    nprobe = NPROBE if nprobe is None else nprobe
    _, cand = rank_cells(spark, sf_dir, k_cells=k_cells,
                         rank_all_below=n_queries)
    asn = _argmax_cell(cand)
    qr = cand.filter(F.col("vec_id") < n_queries).select(
        "vec_id", "cell", F.round("raw", 6).alias("csim"))
    wq0 = Window.partitionBy("vec_id").orderBy(F.desc("csim"), "cell")
    probes = qr.withColumn("crk", F.row_number().over(wq0)).filter(
        F.col("crk") <= nprobe
    ).select(F.col("vec_id").alias("q_id"), "cell")
    codes, cb = pq_codebook_codes(
        spark, sf_dir, m_pq=m_pq, k_pq=k_pq,
        lloyd_rounds=lloyd_rounds, n_dim=n_dim)
    sub_d = n_dim // m_pq
    # ADC over the probed lists (round-6): the former plan joined the
    # corpus-scale code ROWS (N·M) against the candidate set and a
    # broadcast LUT, then hash-aggregated |cand|·M rows; now the M codes
    # ride as one small array per vector (_codes_array) and a gather-sum
    # kernel emits one row per candidate pair — same driver-built LUT
    # values (see _adc_luts), same m-ascending summation as the full-scan
    # kernel, and the unchanged JVM round(·,6) + top-k window on top.
    qids, pd_lut, cn_lut = _adc_luts(spark, sf_dir, cb, m_pq, sub_d,
                                     n_queries)
    cand = probes.join(asn, "cell").filter(F.col("q_id") != F.col("vec_id"))
    pairs = cand.join(_codes_array(codes), "vec_id")

    import numpy as np
    import pyarrow as pa

    qidx = {int(q): i for i, q in enumerate(qids)}

    def gather(batches):
        for batch in batches:
            qid = batch.column("q_id").to_numpy(zero_copy_only=False)
            vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
            n = len(qid)
            if n == 0:
                continue
            cd = np.asarray(batch.column("codes").flatten().to_numpy(
                zero_copy_only=False)).reshape(n, m_pq).astype(np.int64)
            qi = np.fromiter((qidx[int(q)] for q in qid), dtype=np.int64,
                             count=n)
            num = np.zeros(n)
            rn2 = np.zeros(n)
            for m in range(m_pq):        # m ascending — deterministic sum
                num += pd_lut[qi, m, cd[:, m]]
                rn2 += cn_lut[m, cd[:, m]]
            yield pa.RecordBatch.from_arrays(
                [pa.array(qid), pa.array(vid), pa.array(num),
                 pa.array(rn2)], ["q_id", "vec_id", "num", "rn2"])

    scored = (pairs.select("q_id", "vec_id", "codes").mapInArrow(
        gather, "q_id long, vec_id long, num double, rn2 double")
        .select("q_id", "vec_id",
                F.round(F.col("num") / F.sqrt(F.col("rn2")), 6).alias("sim"))
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("sim"), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= top_k)
        .select("q_id", "vec_id", "sim", F.col("rk").cast("long").alias("rk"))
    )


def q_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ at the pinned twin profile (coarse: seed init + one Lloyd
    round, nprobe=2; fine: global M=4 x K=16 PQ codebook, LUT scan)."""
    return ivf_pq_topk(spark, sf_dir)


def _sql_ivf_pq() -> str:
    from .ann_ivf import _SQL_QUANTIZER, NPROBE

    return _SQL_QUANTIZER + f""",
{_SQL_PQ_CHAIN},
probes AS (SELECT vec_id AS q_id, cell
           FROM rk WHERE crk <= {NPROBE} AND vec_id < {N_QUERIES}),
qsub AS (SELECT vec_id AS q_id, m, sv AS qsv
         FROM sub WHERE vec_id < {N_QUERIES}),
lut AS (SELECT q.q_id, c.m, c.code,
               list_dot_product(q.qsv, c.cv) AS pdot,
               list_dot_product(c.cv, c.cv) AS cn2
        FROM qsub q JOIN cb c ON c.m = q.m),
cand AS (SELECT p.q_id, a.vec_id
         FROM probes p JOIN asn a ON a.cell = p.cell AND a.vec_id != p.q_id),
scored AS (SELECT l.q_id, k.vec_id,
                  round(sum(l.pdot) / sqrt(sum(l.cn2)), 6) AS sim
           FROM cand n JOIN codes k ON k.vec_id = n.vec_id
                JOIN lut l ON l.q_id = n.q_id AND l.m = k.m
                          AND l.code = k.code
           GROUP BY l.q_id, k.vec_id),
fin AS (SELECT q_id, vec_id, sim,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY sim DESC, vec_id) AS rk
        FROM scored)
SELECT q_id, vec_id, sim, rk::BIGINT AS rk FROM fin WHERE rk <= {TOP_K}
"""
