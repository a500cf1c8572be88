"""O17 — coref CoNLL writer + native coreference metrics.

Re-expresses the reference's dormant coref surface (conll.py:17-70,
``output_conll``: per-document clusters → the CoNLL-2012 bracket-notation
coref column, with the start/end bracket ordering quirks) as relational
Spark, and replaces the ``scorer.pl`` shell-out (conll.py:72-98,
``official_conll_eval`` muc/bcub/ceafe) with native metric math — the perl
scorer binary isn't in this container, so MUC (Vilain et al. 1995),
B-cubed (Bagga & Baldwin 1998) and CEAF-e (Luo 2005, phi4) are re-derived
from the published definitions as relational aggregations plus one
per-document optimal-assignment kernel.

Coref chains come from the pipeline's own entity clusters (the link → CC
stage assigns every mention an ``entity_id``) — in the reference these
would be the coref model's predicted clusters keyed by doc_key; here the
conversation IS the document and mention spans are already document-level
word indices, so the reference's ``subtoken_map`` remap (conll.py:25) is
the identity (the P5 subword→word alignment already happened upstream).

Bracket semantics (conll.py:38-70): per word index the coref column is
``|``-joined from (a) closing brackets ``id)`` for multi-word mentions
ending here, ordered by mention start DESC; (b) whole-span ``(id)`` for
single-word mentions, in cluster enumeration order; (c) opening brackets
``(id`` for multi-word mentions starting here, ordered by mention end
DESC; ``-`` when empty. Cluster enumeration order (the reference's
``enumerate(clusters)`` over the model's output dict) is made
deterministic here: clusters are numbered per document by earliest
mention ``(start, end)``, ties by entity_id.

100 TB story: everything is per-document relational (one shuffle by
conv_id for the window/groupBys — and those reads are bucket-aligned when
fed from the checkpointed stages); the only Python is the per-document
CEAF assignment kernel, whose input is the *cluster-intersection* table
(|clusters|² per doc at worst, not mentions), Arrow-batched.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Document word table + cluster tables
# --------------------------------------------------------------------------


def doc_words(turns_tok: DataFrame) -> DataFrame:
    """turns_tok -> (conv_id, word_idx, word) with document-level word
    indices (the reference's CoNLL word_index, conll.py:39/70: a running
    counter over non-comment lines of the document)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # NB: the window must be computed in its own projection — a generator
    # in the same select is pulled *below* the window by the analyzer, so
    # the running sum would count each turn once per exploded word
    offs = turns_tok.select("conv_id", "turn_idx", "words").withColumn(
        "word_off", F.sum(F.size("words")).over(w) - F.size("words")
    )
    return offs.select(
        "conv_id", "word_off", F.posexplode("words").alias("i", "word")
    ).select(
        "conv_id",
        (F.col("word_off") + F.col("i")).alias("word_idx"),
        "word",
    )


def coref_clusters(mention_entity: DataFrame) -> DataFrame:
    """mention_entity (conv_id, start, end, entity_id, ...) -> per-document
    coref chains (conv_id, cluster_id, start, end) where cluster_id is the
    deterministic twin of the reference's ``enumerate(clusters)``
    (conll.py:23): 0-based rank of the entity by its earliest mention
    ``(start, end)`` in the document, ties by entity_id."""
    m = mention_entity.select("conv_id", "start", "end", "entity_id").distinct()
    firsts = m.groupBy("conv_id", "entity_id").agg(
        F.min(F.struct("start", "end")).alias("fm")
    )
    w = Window.partitionBy("conv_id").orderBy("fm.start", "fm.end", "entity_id")
    ranked = firsts.select(
        "conv_id", "entity_id", (F.row_number().over(w) - 1).alias("cluster_id")
    )
    return m.join(ranked, ["conv_id", "entity_id"]).select(
        "conv_id", "cluster_id", "start", "end"
    )


# --------------------------------------------------------------------------
# The bracket column (conll.py:17-70)
# --------------------------------------------------------------------------


def coref_column(clusters: DataFrame) -> DataFrame:
    """clusters (conv_id, cluster_id, start, end) -> one row per word that
    carries brackets: (conv_id, word_idx, coref).

    Three melted event kinds ordered exactly as the reference appends them
    (conll.py:52-62): phase 0 = closing ``id)`` at the end word of
    multi-word mentions (end_map order: start DESC — conll.py:33-34's
    sort), phase 1 = ``(id)`` singles (word_map insertion order ==
    ascending cluster id), phase 2 = opening ``(id`` at the start word
    (start_map order: end DESC — conll.py:31-32). Stable ties resolve by
    cluster_id, matching the reference's stable sort over its
    insertion-ordered lists."""
    multi = clusters.filter(F.col("start") != F.col("end"))
    single = clusters.filter(F.col("start") == F.col("end"))
    cid = F.col("cluster_id").cast("string")

    ends = multi.select(
        "conv_id",
        F.col("end").alias("word_idx"),
        F.lit(0).alias("phase"),
        (-F.col("start")).alias("okey"),
        "cluster_id",
        F.concat(cid, F.lit(")")).alias("text"),
    )
    singles = single.select(
        "conv_id",
        F.col("start").alias("word_idx"),
        F.lit(1).alias("phase"),
        F.lit(0).alias("okey"),
        "cluster_id",
        F.concat(F.lit("("), cid, F.lit(")")).alias("text"),
    )
    starts = multi.select(
        "conv_id",
        F.col("start").alias("word_idx"),
        F.lit(2).alias("phase"),
        (-F.col("end")).alias("okey"),
        "cluster_id",
        F.concat(F.lit("("), cid).alias("text"),
    )
    events = ends.unionByName(singles).unionByName(starts)
    return events.groupBy("conv_id", "word_idx").agg(
        F.concat_ws(
            "|",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("phase", "okey", "cluster_id", "text"))
                ),
                lambda s: s["text"],
            ),
        ).alias("coref")
    )


def coref_conll(turns_tok: DataFrame, mention_entity: DataFrame,
                marked_only: bool = True) -> DataFrame:
    """The writer's data content: (conv_id, word_idx, word, coref).

    ``marked_only=True`` keeps only bracket-bearing words (the driver-gated
    shape); ``False`` emits every word with ``-`` fill, the full CoNLL
    column (conll.py:63-64)."""
    words = doc_words(turns_tok)
    col = coref_column(coref_clusters(mention_entity))
    if marked_only:
        return words.join(col, ["conv_id", "word_idx"])
    return words.join(col, ["conv_id", "word_idx"], "left").select(
        "conv_id", "word_idx", "word", F.coalesce("coref", F.lit("-")).alias("coref")
    )


def render_conll_lines(turns_tok: DataFrame, mention_entity: DataFrame,
                       part: int = 0) -> DataFrame:
    """Full CoNLL document rendering as (conv_id, line_no, line) rows:
    ``#begin document (<doc>); part <p>`` header (conll.py:11/44-48),
    one ``doc part word_idx word coref`` row per word (the reference
    rewrites only the last column of an existing skeleton, conll.py:63-69;
    our table-native skeleton is the minimal column set), ``#end document``
    trailer. line_no orders: -1 header, word_idx body, max+1 trailer."""
    body = coref_conll(turns_tok, mention_entity, marked_only=False).select(
        "conv_id",
        F.col("word_idx").alias("line_no"),
        F.concat_ws(
            "   ",
            "conv_id", F.lit(str(part)), F.col("word_idx").cast("string"),
            "word", "coref",
        ).alias("line"),
    )
    docs = body.groupBy("conv_id").agg(F.max("line_no").alias("mx"))
    header = docs.select(
        "conv_id", F.lit(-1).alias("line_no"),
        F.concat(F.lit("#begin document ("), "conv_id",
                 F.lit(f"); part {part}")).alias("line"),
    )
    trailer = docs.select(
        "conv_id", (F.col("mx") + 1).alias("line_no"),
        F.lit("#end document").alias("line"),
    )
    return header.unionByName(body).unionByName(trailer)


# --------------------------------------------------------------------------
# Native metrics: MUC / B-cubed / CEAF-e (replaces conll.py:72-98)
# --------------------------------------------------------------------------


def _assign_max(W: np.ndarray) -> list[tuple[int, int]]:
    """Maximum-weight assignment on a dense n×m weight matrix (W >= 0):
    returns matched (row, col) pairs. Kuhn-Munkres with potentials
    (numpy-vectorized delta scan, O(n²m) with n = min side). The oracle
    twin (oracle_coref._assign_max_py) is an independently written
    pure-python solver; both are anchored by the brute-force permutation
    property test (tests/test_coref.py)."""
    transposed = False
    if W.shape[0] > W.shape[1]:
        W = W.T
        transposed = True
    n, m = W.shape
    C = np.zeros((n + 1, m + 1))
    C[1:, 1:] = -W.astype(np.float64)  # min-cost form
    INF = np.inf
    u = np.zeros(n + 1)
    v = np.zeros(m + 1)
    p = np.zeros(m + 1, dtype=np.int64)  # p[j] = row matched to col j
    way = np.zeros(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(m + 1, INF)
        used = np.zeros(m + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            free = np.nonzero(~used)[0]
            cur = C[i0, free] - u[i0] - v[free]
            upd = cur < minv[free]
            minv[free] = np.where(upd, cur, minv[free])
            way[free[upd]] = j0
            k = int(np.argmin(minv[free]))
            delta = minv[free][k]
            j1 = int(free[k])
            usedj = np.nonzero(used)[0]
            u[p[usedj]] += delta
            v[usedj] -= delta
            minv[free] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = int(way[j0])
            p[j0] = p[j1]
            j0 = j1
    pairs = [(int(p[j]) - 1, j - 1) for j in range(1, m + 1) if p[j]]
    if transposed:
        pairs = [(c, r) for r, c in pairs]
    return pairs


def _ceafe_doc(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-document CEAF-e numerator: optimal 1-1 cluster alignment
    maximizing phi4(k, r) = 2|k∩r| / (|k|+|r|) (Luo 2005 eq. 6). The
    matrix is built over *intersecting* cluster pairs only (phi4 = 0
    otherwise, and zero-weight pairs never change the optimum). The chosen
    alignment's value is re-summed exactly (Fraction) so the result is
    independent of float summation order."""
    conv = pdf["conv_id"].iloc[0]
    gks = {k: i for i, k in enumerate(pdf["gk"].unique())}
    pks = {k: i for i, k in enumerate(pdf["pk"].unique())}
    W = np.zeros((len(gks), len(pks)))
    cell: dict[tuple[int, int], tuple[int, int, int]] = {}
    for r in pdf.itertuples(index=False):
        gi, pi = gks[r.gk], pks[r.pk]
        W[gi, pi] = 2.0 * r.i / (r.gsz + r.psz)
        cell[(gi, pi)] = (int(r.i), int(r.gsz), int(r.psz))
    total = Fraction(0)
    for gi, pi in _assign_max(W):
        if (gi, pi) in cell:
            i, gsz, psz = cell[(gi, pi)]
            total += Fraction(2 * i, gsz + psz)
    return pd.DataFrame({"conv_id": [conv], "phi_sum": [float(total)]})


def coref_metrics(gold_clusters: DataFrame, pred_clusters: DataFrame) -> DataFrame:
    """Corpus-level coreference scores, one row per metric:
    (metric, recall, precision, f1), metric ∈ {muc, bcub, ceafe} — the
    native replacement for conll.py:72-98's scorer.pl shell-out. Cluster
    tables: (conv_id, cluster_id, start, end); ids are engine-local
    (all three metrics are invariant to cluster relabeling).

    MUC (Vilain 95): R = Σ_k (|k| - |p(k)|) / Σ_k (|k| - 1) with p(k) the
    partition of gold cluster k by the predicted clustering (unaligned
    mentions are singleton parts); P symmetric. B-cubed (Bagga & Baldwin
    98): R = Σ_{k,r} |k∩r|²/|k| / Σ_k |k| over gold mention mass, P
    symmetric (twinless mentions contribute 0 to the numerator). CEAF-e
    (Luo 05): Σ phi4 over the optimal alignment, / |K| for R, / |R| for P.
    """
    g = gold_clusters.select(
        "conv_id", F.col("cluster_id").alias("gk"),
        "start", "end",
    )
    p = pred_clusters.select(
        "conv_id", F.col("cluster_id").alias("pk"),
        "start", "end",
    )
    inter = (
        g.join(p, ["conv_id", "start", "end"])
        .groupBy("conv_id", "gk", "pk")
        .agg(F.count("*").alias("i"))
    )
    gsz = g.groupBy("conv_id", "gk").agg(F.count("*").alias("gsz"))
    psz = p.groupBy("conv_id", "pk").agg(F.count("*").alias("psz"))

    # --- MUC ---------------------------------------------------------------
    per_gk = inter.groupBy("conv_id", "gk").agg(
        F.sum("i").alias("matched"), F.countDistinct("pk").alias("d")
    )
    muc_r_num = per_gk.agg(
        F.sum(F.col("matched") - F.col("d")).alias("v")
    )
    muc_r_den = gsz.agg(F.sum(F.col("gsz") - 1).alias("v"))
    per_pk = inter.groupBy("conv_id", "pk").agg(
        F.sum("i").alias("matched"), F.countDistinct("gk").alias("d")
    )
    muc_p_num = per_pk.agg(F.sum(F.col("matched") - F.col("d")).alias("v"))
    muc_p_den = psz.agg(F.sum(F.col("psz") - 1).alias("v"))

    # --- B-cubed -----------------------------------------------------------
    iwg = inter.join(gsz, ["conv_id", "gk"]).join(psz, ["conv_id", "pk"])
    b3 = iwg.agg(
        F.sum(F.col("i") * F.col("i") / F.col("gsz")).alias("r_num"),
        F.sum(F.col("i") * F.col("i") / F.col("psz")).alias("p_num"),
    )
    b3_r_den = gsz.agg(F.sum("gsz").alias("v"))
    b3_p_den = psz.agg(F.sum("psz").alias("v"))

    # --- CEAF-e ------------------------------------------------------------
    phi = iwg.groupBy("conv_id").applyInPandas(
        _ceafe_doc, "conv_id string, phi_sum double"
    )
    ceafe_num = phi.agg(F.sum("phi_sum").alias("v"))
    ceafe_r_den = gsz.agg(F.count("*").alias("v"))
    ceafe_p_den = psz.agg(F.count("*").alias("v"))

    # assemble: cross-join the 1-row aggregates, stack into 3 metric rows
    scal = (
        muc_r_num.select(F.col("v").alias("muc_rn"))
        .crossJoin(muc_r_den.select(F.col("v").alias("muc_rd")))
        .crossJoin(muc_p_num.select(F.col("v").alias("muc_pn")))
        .crossJoin(muc_p_den.select(F.col("v").alias("muc_pd")))
        .crossJoin(b3.select(F.col("r_num").alias("b3_rn"),
                             F.col("p_num").alias("b3_pn")))
        .crossJoin(b3_r_den.select(F.col("v").alias("b3_rd")))
        .crossJoin(b3_p_den.select(F.col("v").alias("b3_pd")))
        .crossJoin(ceafe_num.select(F.col("v").alias("ce_n")))
        .crossJoin(ceafe_r_den.select(F.col("v").alias("ce_rd")))
        .crossJoin(ceafe_p_den.select(F.col("v").alias("ce_pd")))
    )

    def safe_div(a, b):
        return F.when(F.col(b) > 0, F.col(a) / F.col(b)).otherwise(F.lit(0.0))

    rows = scal.select(
        F.explode(
            F.array(
                F.struct(F.lit("muc").alias("metric"),
                         safe_div("muc_rn", "muc_rd").alias("recall"),
                         safe_div("muc_pn", "muc_pd").alias("precision")),
                F.struct(F.lit("bcub").alias("metric"),
                         safe_div("b3_rn", "b3_rd").alias("recall"),
                         safe_div("b3_pn", "b3_pd").alias("precision")),
                F.struct(F.lit("ceafe").alias("metric"),
                         safe_div("ce_n", "ce_rd").alias("recall"),
                         safe_div("ce_n", "ce_pd").alias("precision")),
            )
        ).alias("x")
    ).select("x.metric", "x.recall", "x.precision")
    return rows.select(
        "metric",
        F.round("recall", 6).alias("recall"),
        F.round("precision", 6).alias("precision"),
        F.round(
            F.when(
                (F.col("recall") + F.col("precision")) > 0,
                2 * F.col("recall") * F.col("precision")
                / (F.col("recall") + F.col("precision")),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("f1"),
    )


def gold_coref_clusters(gold_mentions: DataFrame, turns_tok: DataFrame) -> DataFrame:
    """Gold coref chains from the gold mention table: cluster identity =
    (label, normalized surface) — the planted-world entity definition —
    numbered per document with the same first-appearance rank as
    coref_clusters."""
    from .link import mention_surfaces, normalize_surface

    surf = mention_surfaces(
        gold_mentions.withColumn("score", F.lit(0.0)), turns_tok
    ).withColumn("norm", normalize_surface(F.col("surface")))
    firsts = surf.groupBy("conv_id", "label", "norm").agg(
        F.min(F.struct("start", "end")).alias("fm")
    )
    w = Window.partitionBy("conv_id").orderBy("fm.start", "fm.end", "label", "norm")
    ranked = firsts.select(
        "conv_id", "label", "norm", (F.row_number().over(w) - 1).alias("cluster_id")
    )
    return (
        surf.join(ranked, ["conv_id", "label", "norm"])
        .select("conv_id", "cluster_id", "start", "end")
        .distinct()
    )
