"""Stage — evaluation: gold expansion + set-membership scoring + micro P/R/F1.

Relational re-expression of the reference's counter loops:
- O8/O9 symmetric gold expansion & recall doubling (run_re.py:204-209,
  267-271): union of reversed symmetric gold rows; symmetric predictions
  count twice in tot_pred/cor.
- O10 set-membership scoring (run_acener.py:694-757, run_re.py:856-881):
  left joins pred→gold + conditional weights.
- O11 micro P/R/F1 (run_acener.py:751-757, run_re.py:998-1010): single-row
  aggregates with the reference's zero guards (f1 = 0 unless cor > 0).

Gold tables are broadcast-sized relative to predictions at eval time, but we
join on exact keys so Catalyst picks sort-merge/broadcast as stats dictate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..world import SYM_LABELS

_SYM = [l for l in SYM_LABELS if l != "NIL"]


def _prf(cor: float, tot_pred: float, tot_recall: float) -> dict[str, float]:
    p = cor / tot_pred if tot_pred > 0 else 0.0
    r = cor / tot_recall if tot_recall > 0 else 0.0
    f1 = 2 * p * r / (p + r) if cor > 0 else 0.0
    return {"precision": p, "recall": r, "f1": f1}


def ner_metrics(mentions: DataFrame, span_scores: DataFrame,
                gold_mentions: DataFrame) -> dict[str, float]:
    """NER micro P/R/F1 + the pre-suppression f1_overlap variant."""
    keys = ["conv_id", "turn_idx", "start", "end", "label"]
    gold = gold_mentions.select(*keys).distinct()
    tot_recall = gold.count()

    def score(preds: DataFrame) -> tuple[int, int]:
        tot = preds.count()
        cor = preds.join(gold, keys, "left_semi").count()
        return cor, tot

    cor, tot_pred = score(mentions.select(*keys))
    cor_tot, tot_pred_tot = score(span_scores.select(*keys))
    out = {f"ner_{k}": v for k, v in _prf(cor, tot_pred, tot_recall).items()}
    out["ner_f1_overlap"] = _prf(cor_tot, tot_pred_tot, tot_recall)["f1"]
    out["ner_tot_recall"] = float(tot_recall)
    return out


def expand_gold_relations(gold_relations: DataFrame,
                          gold_mentions: DataFrame) -> tuple[DataFrame, DataFrame]:
    """O8/O9: build (golden, golden_withner) including reversed symmetric
    rows; endpoint types looked up from gold mentions."""
    gm = gold_mentions.select(
        "conv_id", "turn_idx",
        F.col("start").alias("gs"), F.col("end").alias("ge"),
        F.col("label").alias("gtype"),
    )
    g = (
        gold_relations.alias("g")
        .join(
            gm.alias("a"),
            (F.col("g.conv_id") == F.col("a.conv_id"))
            & (F.col("g.turn_idx") == F.col("a.turn_idx"))
            & (F.col("g.s1") == F.col("a.gs")) & (F.col("g.e1") == F.col("a.ge")),
        )
        .join(
            gm.alias("b"),
            (F.col("g.conv_id") == F.col("b.conv_id"))
            & (F.col("g.turn_idx") == F.col("b.turn_idx"))
            & (F.col("g.s2") == F.col("b.gs")) & (F.col("g.e2") == F.col("b.ge")),
        )
        .select(
            "g.conv_id", "g.turn_idx", "g.s1", "g.e1", "g.s2", "g.e2", "g.label",
            F.col("a.gtype").alias("t1"), F.col("b.gtype").alias("t2"),
        )
    )
    sym = F.col("label").isin(_SYM)
    reversed_rows = g.filter(sym).select(
        "conv_id", "turn_idx",
        F.col("s2").alias("s1"), F.col("e2").alias("e1"),
        F.col("s1").alias("s2"), F.col("e1").alias("e2"),
        "label", F.col("t2").alias("t1"), F.col("t1").alias("t2"),
    )
    golden = g.unionByName(reversed_rows).distinct()
    return g, golden


def re_metrics(triples: DataFrame, gold_relations: DataFrame,
               gold_mentions: DataFrame) -> dict[str, float]:
    g, golden = expand_gold_relations(gold_relations, gold_mentions)
    sym = F.col("label").isin(_SYM)
    # tot_recall: symmetric gold counts twice (run_re.py:204-209);
    # consistency with |golden| is asserted in tests (run_re.py:1005)
    tot_recall = g.select(
        F.sum(F.when(sym, 2).otherwise(1)).alias("n")
    ).collect()[0]["n"] or 0

    pred = triples.withColumnRenamed("pred", "label")
    keys = ["conv_id", "turn_idx", "s1", "e1", "s2", "e2", "label"]
    gk = golden.select(*keys).distinct()
    gkn = golden.select(
        *keys, F.col("t1").alias("subj_type"), F.col("t2").alias("obj_type")
    ).distinct()
    def rev(df: DataFrame) -> DataFrame:
        extra = []
        if "subj_type" in df.columns:
            extra = [F.col("obj_type").alias("subj_type"),
                     F.col("subj_type").alias("obj_type")]
        return df.select(
            "conv_id", "turn_idx",
            F.col("s2").alias("s1"), F.col("e2").alias("e1"),
            F.col("s1").alias("s2"), F.col("e1").alias("e2"), "label", *extra,
        )

    hit_fwd = pred.join(gk, keys, "left_semi").select(*keys, F.lit(1).alias("h"))
    scored = (
        pred.alias("p")
        .join(hit_fwd.alias("hf").withColumnRenamed("h", "hit_fwd"), keys, "left")
        .join(
            rev(gk).withColumn("hit_rev", F.lit(1)).distinct(),
            keys, "left",
        )
    )
    symp = F.col("label").isin(_SYM)
    hit = F.coalesce(F.col("hit_fwd"), F.lit(0))
    hit_either = F.greatest(hit, F.coalesce(F.col("hit_rev"), F.lit(0)))
    agg = scored.select(
        F.sum(F.when(symp, 2).otherwise(1)).alias("tot_pred"),
        F.sum(F.when(symp, 2 * hit_either).otherwise(hit)).alias("cor"),
    ).collect()[0]
    tot_pred = agg["tot_pred"] or 0
    cor = agg["cor"] or 0

    # with-NER variant: endpoint types must match too
    keysn = keys + ["subj_type", "obj_type"]
    hfn = pred.join(gkn, keysn, "left_semi").select(*keysn, F.lit(1).alias("hit_fwd"))
    scoredn = (
        pred.alias("p")
        .join(hfn, keysn, "left")
        .join(rev(gkn).withColumn("hit_rev", F.lit(1)).distinct(), keysn, "left")
    )
    aggn = scoredn.select(
        F.sum(
            F.when(symp, 2 * F.greatest(
                F.coalesce(F.col("hit_fwd"), F.lit(0)),
                F.coalesce(F.col("hit_rev"), F.lit(0)),
            )).otherwise(F.coalesce(F.col("hit_fwd"), F.lit(0)))
        ).alias("cor")
    ).collect()[0]
    cor_n = aggn["cor"] or 0

    out = {f"re_{k}": v for k, v in _prf(cor, tot_pred, tot_recall).items()}
    out["re_f1_with_ner"] = _prf(cor_n, tot_pred, tot_recall)["f1"]
    out["re_tot_recall"] = float(tot_recall)
    out["re_tot_pred"] = float(tot_pred)
    out["re_cor"] = float(cor)
    out["golden_size"] = float(gk.count())
    return out


def metrics_table(spark: SparkSession, rows: dict[str, float], stage: str) -> DataFrame:
    return spark.createDataFrame(
        [(stage, k, float(v)) for k, v in rows.items()],
        schema="stage string, key string, value double",
    )
