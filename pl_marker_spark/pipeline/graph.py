"""Stages 6-8 — entity link → canonicalize → graph materialization.

North-rule extension (no reference equivalent). Orchestrated so each
intermediate (surfaces, vocab, sim_edges, assignment) is checkpointed once
and every downstream consumer reads the materialized table — the link/CC
DAG is never recomputed per output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cc import connected_components
from .link import build_vocab, link_entities, mention_surfaces


def build_graph(mentions_refined: DataFrame, triples: DataFrame,
                turns_tok: DataFrame, ck=None) -> dict[str, DataFrame]:
    """Returns the graph-side tables. ``ck(name, build)`` materializes a
    stage (checkpoint or persist); default = cache in cluster memory."""
    if ck is None:
        def ck(name, build):
            return build().localCheckpoint()

    surfaces = ck("mention_surfaces",
                  lambda: mention_surfaces(mentions_refined, turns_tok))
    return graph_from_surfaces(surfaces, triples, ck)


def graph_from_surfaces(surfaces: DataFrame, triples: DataFrame,
                        ck=None) -> dict[str, DataFrame]:
    """The vocab-scale canonicalization half of build_graph, factored so
    the incremental path (streaming.stream_kg_graph) can re-canonicalize
    from CUMULATIVE persisted surfaces: link/CC must see all evidence —
    a new surface can merge two existing entities — while extraction
    stays a once-per-conversation batch job. Everything downstream of the
    surfaces table is vocab-sized except the mention_entity join and the
    triple-endpoint resolution, which scan the evidence tables once."""
    if ck is None:
        def ck(name, build):
            return build().localCheckpoint()

    vocab = ck("entity_vocab_raw", lambda: build_vocab(surfaces))
    sim_edges = ck("sim_edges", lambda: link_entities(vocab))
    assign = ck("entity_assign", lambda: connected_components(sim_edges))

    ventity = (
        vocab.join(assign, "sid", "left")
        .withColumn("entity_id", F.coalesce("component", F.col("sid")))
        .select("sid", "label", "surface", "norm", "n_mentions", "entity_id")
    )
    ventity = ck("entity_vocab", lambda: ventity)

    w = Window.partitionBy("entity_id").orderBy(F.desc("n_mentions"), F.asc("surface"))
    canon = (
        ventity.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("entity_id", F.col("surface").alias("canonical_name"),
                F.col("label").alias("type"))
    )
    nodes = ck(
        "nodes",
        lambda: ventity.groupBy("entity_id")
        .agg(F.sum("n_mentions").alias("n_mentions"),
             F.count("*").alias("n_surfaces"))
        .join(canon, "entity_id")
        .select("entity_id", "canonical_name", "type", "n_mentions", "n_surfaces"),
    )

    mention_entity = ck(
        "mention_entity",
        lambda: surfaces.join(
            ventity.select("label", "surface", "entity_id"), ["label", "surface"]
        ).select("conv_id", "turn_idx", "start", "end", "label", "surface",
                 "entity_id"),
    )

    me = mention_entity.select("conv_id", "turn_idx", "start", "end", "entity_id")

    def build_edges():
        # melt each triple to (slot, endpoint-span), join the mention→entity
        # map exactly once, pivot back (single-instance join — see
        # rel.refine_types note on the double-join self-join trap)
        melted = triples.select(
            "conv_id", "turn_idx", "s1", "e1", "s2", "e2", "pred", "score",
            F.explode(
                F.array(
                    F.struct(F.lit(0).alias("slot"), F.col("s1").alias("start"),
                             F.col("e1").alias("end")),
                    F.struct(F.lit(1).alias("slot"), F.col("s2").alias("start"),
                             F.col("e2").alias("end")),
                )
            ).alias("x"),
        ).select("conv_id", "turn_idx", "s1", "e1", "s2", "e2", "pred",
                 "score", "x.slot", "x.start", "x.end")
        resolved = (
            melted.join(me, ["conv_id", "turn_idx", "start", "end"], "inner")
            .groupBy("conv_id", "turn_idx", "s1", "e1", "s2", "e2", "pred", "score")
            .agg(
                F.max(F.when(F.col("slot") == 0, F.col("entity_id"))).alias("src_id"),
                F.max(F.when(F.col("slot") == 1, F.col("entity_id"))).alias("dst_id"),
            )
            .filter(F.col("src_id").isNotNull() & F.col("dst_id").isNotNull())
        )
        return resolved.groupBy("src_id", "dst_id", "pred").agg(
            F.count("*").alias("weight"), F.round(F.sum("score"), 9).alias("score_sum")
        )

    edges = ck("edges", build_edges)
    return {
        "surfaces": surfaces,
        "entity_vocab": ventity,
        "sim_edges": sim_edges,
        "entity_assign": assign,
        "mention_entity": mention_entity,
        "nodes": nodes,
        "edges": edges,
    }
