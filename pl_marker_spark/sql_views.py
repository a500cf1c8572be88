"""SQL-facing surface: register pipeline outputs as temp views plus the
label dimension tables, so the whole KG is queryable with ``spark.sql``.

Example analyses (see tests/test_sql_views.py):
    SELECT type, count(*) FROM kg_nodes GROUP BY type
    SELECT pred, sum(weight) FROM kg_edges GROUP BY pred
    SELECT n.canonical_name, d.degree FROM kg_nodes n JOIN (
        SELECT src_id AS id, sum(weight) AS degree FROM kg_edges GROUP BY src_id
    ) d ON n.entity_id = d.id ORDER BY d.degree DESC
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .world import NER_LABELS, REL_LABELS, SYM_LABELS

VIEW_NAMES = {
    "mentions": "kg_mentions",
    "mentions_refined": "kg_mentions_refined",
    "triples": "kg_triples",
    "nodes": "kg_nodes",
    "edges": "kg_edges",
    "entity_vocab": "kg_entities",
    "mention_entity": "kg_mention_entity",
}


def register_views(spark: SparkSession, outputs: dict) -> list[str]:
    """Register available pipeline outputs + label dims as temp views;
    returns the view names created."""
    created = []
    for key, view in VIEW_NAMES.items():
        if key in outputs:
            outputs[key].createOrReplaceTempView(view)
            created.append(view)
    spark.createDataFrame(
        [(i, l) for i, l in enumerate(NER_LABELS)], "id int, label string"
    ).createOrReplaceTempView("kg_ner_labels")
    spark.createDataFrame(
        [(i, l, l in SYM_LABELS[1:]) for i, l in enumerate(REL_LABELS)],
        "id int, label string, symmetric boolean",
    ).createOrReplaceTempView("kg_rel_labels")
    created += ["kg_ner_labels", "kg_rel_labels"]
    return created
