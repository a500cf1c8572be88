"""N-Triples reader (sources.read_ntriples) — the import half of the
kg_export_ntriples round-trip. The load-bearing invariant is
parse(export(G)) == G up to what the RDF data model can carry: labels
byte-exact through the ECHAR escape/unescape pair (including the
pathological escaped-backslash-then-n cases a sequential-replace
unescape gets wrong), edges as a SET (weights are not in the model),
types only where the exporter's IRI-safety gate admitted the token."""
import pytest
from pyspark.sql import functions as F

from pl_marker_spark.queries_catalog import ntriples_from
from pl_marker_spark.sources import graph_from_ntriples, read_ntriples

#: Strings chosen to break a naive sequential-replace unescape:
#: backslash-then-n (must NOT become LF), escaped backslash before a real
#: newline, trailing backslash, every ECHAR char, quotes, unicode.
NASTY = [
    "plain",
    "",
    "a\\nb",          # backslash, 'n' — stays a backslash and an 'n'
    "a\nb",           # real LF
    "a\\\nb",         # backslash then real LF
    "back\\\\slash",  # two backslashes
    "trailing\\",
    'quo"te',
    '\\"',            # backslash, quote
    "tab\there",
    "cr\rhere",
    "mix\\t\t\\n\n\\\\",
    "ünïcodé ↦ 字",
]


def _nodes_edges(spark, names):
    nodes = spark.createDataFrame(
        [(i, nm, "PER" if i % 2 else "bad type!") for i, nm in enumerate(names)],
        "entity_id long, canonical_name string, type string")
    edges = spark.createDataFrame(
        [(0, "works_for", 1), (1, "lives_in", 2), (0, "bad pred!", 2)],
        "src_id long, pred string, dst_id long")
    return nodes, edges


def test_label_unescape_roundtrip(spark):
    nodes, edges = _nodes_edges(spark, NASTY)
    lines = (ntriples_from(nodes, edges)
             .filter(F.col("kind") != "rejected_token").select("line"))
    stmts = read_ntriples(spark, lines)
    assert stmts.filter(F.col("kind") == "parse_reject").count() == 0
    got = {r["subj_id"]: r["literal"]
           for r in stmts.filter(F.col("kind") == "label").collect()}
    assert got == {i: nm for i, nm in enumerate(NASTY)}


def test_graph_set_roundtrip(spark):
    nodes, edges = _nodes_edges(spark, ["alice", "bob", "carol"])
    lines = ntriples_from(nodes, edges).select("line")
    rn, re_ = graph_from_ntriples(read_ntriples(spark, lines))
    # Edges: the IRI-unsafe predicate was rejected at export, the other
    # two round-trip exactly (as a set).
    assert sorted(tuple(r) for r in re_.collect()) == [
        (0, "works_for", 1), (1, "lives_in", 2)]
    # Nodes: every label survives byte-exact; even-id nodes carried the
    # rejected "bad type!" token so they reconstruct with NULL type.
    got = {r["entity_id"]: (r["canonical_name"], r["type"])
           for r in rn.collect()}
    assert got == {0: ("alice", None), 1: ("bob", "PER"),
                   2: ("carol", None)}


def test_blank_comment_and_reject_lines(spark):
    lines = spark.createDataFrame(
        [("",), ("   ",), ("# a comment",), ("  # indented comment",),
         ('<urn:kg:e:7> <urn:kg:p:label> "ok" .',),
         ("<urn:kg:e:7> <urn:kg:p:knows> <urn:kg:e:8> .",),
         ("not a triple at all",),
         ('<urn:kg:e:9> <urn:kg:p:label> "unterminated .',)],
        "line string")
    stmts = read_ntriples(spark, lines)
    kinds = sorted(r["kind"] for r in stmts.collect())
    # blanks/comments dropped silently; both malformed lines surface
    assert kinds == ["edge", "label", "parse_reject", "parse_reject"]
    rejects = {r["line"] for r in
               stmts.filter(F.col("kind") == "parse_reject").collect()}
    assert rejects == {"not a triple at all",
                       '<urn:kg:e:9> <urn:kg:p:label> "unterminated .'}


def test_spec_whitespace_tolerance(spark):
    # The reader accepts spec-legal whitespace the exporter never emits.
    lines = spark.createDataFrame(
        [('  <urn:kg:e:1>\t<urn:kg:p:label>   "x\\ty"  . ',),
         ("<urn:kg:e:1>  <urn:kg:p:r>\t<urn:kg:e:2> .",)],
        "line string")
    rows = {r["kind"]: r for r in read_ntriples(spark, lines).collect()}
    assert rows["label"]["literal"] == "x\ty"
    assert (rows["edge"]["subj_id"], rows["edge"]["pred"],
            rows["edge"]["obj_id"]) == (1, "r", 2)
