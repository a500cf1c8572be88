"""pl_marker_spark — a from-scratch PySpark-native knowledge-graph
construction pipeline with the query semantics of thunlp/PL-Marker
(ACL 2022, packed levitated markers for entity & relation extraction).

Reference semantics are documented operator-by-operator in SURVEY.md with
citations into /root/reference; no reference code is reused. Execution is
pure DataFrame/SQL + Arrow-batched pandas UDFs (no per-row Python).
"""

__version__ = "0.1.0"
