"""S1 — reference-format JSONL document source.

The reference consumes jsonline docs shaped
``{"doc_key": str, "sentences": [[token, ...], ...],
   "ner": [[[s, e, label], ...] per sentence],
   "relations": [[[s1, e1, s2, e2, label], ...] per sentence]}``
(SciERC/ACE prep; read loop run_acener.py:171-199, run_re.py:210-260).
This module maps that shape straight into the engine's transcript table —
a user of the reference can point ``run_pipeline.py --input x.jsonl`` at
their existing eval files.

Fidelity notes:
- Tokens are joined with single spaces; the engine's word split recovers
  them exactly, and P1 PTB unescape then applies per word — the same
  unescape the reference applies per token at read time
  (``get_original_token``, run_acener.py:181-183), in the same order.
- The reference's ``ner``/``relations`` spans are DOCUMENT-level token
  indices; the engine's mention/triple coordinates are conversation-level
  word indices over the concatenated turns — the identical coordinate
  system, so gold converts by locating the sentence (turn) via cumulative
  sentence lengths and keeping the indices unchanged.
- Everything below is JVM-side (``spark.read.json`` + explode/array
  expressions); no Python touches row content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Mixed-type JSON cells (ints + strings in one array) are read as strings
# and cast back — Spark's JSON reader coerces scalars to the declared type.
_REF_DOC_SCHEMA = (
    "doc_key string, sentences array<array<string>>, "
    "ner array<array<array<string>>>, "
    "relations array<array<array<string>>>"
)

_EPOCH = "2020-01-01 00:00:00"


def read_reference_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """jsonline docs -> transcript table (conv_id, turn_idx, role, text,
    tool, ts). One row per sentence; ``ts`` is a deterministic synthetic
    clock (turn_idx minutes past a fixed epoch) — the reference format
    carries no timestamps and no engine operator derives semantics from
    transcript ``ts``."""
    raw = spark.read.schema(_REF_DOC_SCHEMA).json(path)
    return (
        raw.select(
            F.col("doc_key").alias("conv_id"),
            F.posexplode("sentences").alias("turn_idx", "tokens"),
        )
        .select(
            "conv_id",
            F.col("turn_idx").cast("int"),
            F.lit("doc").alias("role"),
            F.array_join("tokens", " ").alias("text"),
            F.lit(None).cast("string").alias("tool"),
            (F.to_timestamp(F.lit(_EPOCH))
             + F.make_interval(mins=F.col("turn_idx"))).alias("ts"),
        )
    )


def read_reference_jsonl_gold(spark: SparkSession, path: str):
    """jsonline docs -> (gold_mentions, gold_relations) tables in the
    engine's gold schemas. Spans stay in document-level token coordinates
    (== conversation-level word coordinates here); the owning sentence is
    recovered positionally — ``ner[i]`` / ``relations[i]`` belong to
    sentence i (run_acener.py:196-199)."""
    raw = spark.read.schema(_REF_DOC_SCHEMA).json(path)
    mentions = (
        raw.select(
            F.col("doc_key").alias("conv_id"),
            F.posexplode("ner").alias("turn_idx", "spans"),
        )
        .select(
            "conv_id", F.col("turn_idx").cast("int"),
            F.explode("spans").alias("sp"),
        )
        .select(
            "conv_id", "turn_idx",
            F.element_at("sp", 1).cast("int").alias("start"),
            F.element_at("sp", 2).cast("int").alias("end"),
            F.element_at("sp", 3).alias("label"),
        )
    )
    relations = (
        raw.select(
            F.col("doc_key").alias("conv_id"),
            F.posexplode("relations").alias("turn_idx", "rels"),
        )
        .select(
            "conv_id", F.col("turn_idx").cast("int"),
            F.explode("rels").alias("r"),
        )
        .select(
            "conv_id", "turn_idx",
            F.element_at("r", 1).cast("int").alias("s1"),
            F.element_at("r", 2).cast("int").alias("e1"),
            F.element_at("r", 3).cast("int").alias("s2"),
            F.element_at("r", 4).cast("int").alias("e2"),
            F.element_at("r", 5).alias("label"),
        )
    )
    return mentions, relations


def read_conll03(spark: SparkSession, path: str, variant: str = "conll03"):
    """S2 — CoNLL03 token-per-line source (reference reader
    run_ner_BIO.py:106-139): space-separated columns with the word first
    and the BIO tag last, blank line = sentence boundary, ``-DOCSTART`` =
    document boundary. Returns ``(transcripts, gold_mentions)``:
    transcripts rows per (document, sentence) in the engine shape, and
    gold spans from the BIO runs (P8 scan, pipeline/bio.bio_to_spans) in
    document-level token coordinates — the same coordinate contract as
    ``read_reference_jsonl_gold``.

    ``variant="fewnerd"`` selects the Few-NERD fine-grained layout
    (reference reader run_ner.py:464-497): TAB-separated columns, no
    ``-DOCSTART`` markers, each blank-line-delimited sentence is its own
    document, and labels carry no B/I prefix — a non-``O`` label maps to
    ``I-<label with '-' → '_'>`` (``person-actor`` → ``I-person_actor``),
    so adjacent same-type tokens merge into one span under the same P8
    scan (Few-NERD does not distinguish adjacent entities).

    Parallelism unit = FILE (``spark.read.text(wholetext=True)``; CoNLL
    corpora ship as per-split files, exactly how the reference consumes
    them) — the stateful line scan is document-local and runs inside one
    Arrow batch per file. ``conv_id`` is ``<file stem>#<doc ordinal>``."""
    import os
    from collections.abc import Iterator

    import pandas as pd

    if variant not in ("conll03", "fewnerd"):
        raise ValueError(f"read_conll03: unknown variant {variant!r}")
    fewnerd = variant == "fewnerd"

    raw = spark.read.text(path, wholetext=True).withColumn(
        "file", F.element_at(F.split(F.input_file_name(), "/"), -1))

    # two outputs from one parse would need a union like extract_fused;
    # CoNLL inputs are small enough that two passes are the simpler call
    def parse_kind(kind: str):
        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from .pipeline.bio import bio_to_spans

            for pdf in batches:
                t_rows, g_rows = [], []
                for file, blob in zip(pdf["file"], pdf["value"]):
                    stem = os.path.splitext(str(file))[0]
                    doc_i = 0
                    words, tags, bounds = [], [], [0]

                    def flush():
                        if not words:
                            return
                        cid = f"{stem}#{doc_i}"
                        if bounds[-1] != len(words):
                            bounds.append(len(words))
                        for s_i in range(len(bounds) - 1):
                            t_rows.append(
                                (cid, s_i,
                                 " ".join(words[bounds[s_i]:bounds[s_i + 1]])))
                        for s, e, lab in bio_to_spans(tags):
                            s_i = 0
                            while bounds[s_i + 1] <= s:
                                s_i += 1
                            g_rows.append((cid, s_i, s, e, lab))

                    for line in str(blob).splitlines():
                        line = line.rstrip()
                        if not fewnerd and line.startswith("-DOCSTART"):
                            flush()
                            if words:
                                doc_i += 1
                            words, tags, bounds = [], [], [0]
                            continue
                        if not line:
                            if fewnerd:
                                # each sentence is its own document
                                flush()
                                if words:
                                    doc_i += 1
                                words, tags, bounds = [], [], [0]
                            elif words and bounds[-1] != len(words):
                                bounds.append(len(words))
                            continue
                        parts = line.split("\t" if fewnerd else " ")
                        words.append(parts[0])
                        lab = parts[-1]
                        if fewnerd and lab != "O":
                            lab = "I-" + lab.replace("-", "_")
                        tags.append(lab)
                    flush()
                if kind == "transcripts":
                    yield pd.DataFrame({
                        "conv_id": pd.Series([r[0] for r in t_rows], dtype="object"),
                        "turn_idx": pd.Series([r[1] for r in t_rows], dtype="int32"),
                        "text": pd.Series([r[2] for r in t_rows], dtype="object"),
                    })
                else:
                    yield pd.DataFrame({
                        "conv_id": pd.Series([r[0] for r in g_rows], dtype="object"),
                        "turn_idx": pd.Series([r[1] for r in g_rows], dtype="int32"),
                        "start": pd.Series([r[2] for r in g_rows], dtype="int32"),
                        "end": pd.Series([r[3] for r in g_rows], dtype="int32"),
                        "label": pd.Series([r[4] for r in g_rows], dtype="object"),
                    })
        return run

    transcripts = raw.mapInPandas(
        parse_kind("transcripts"),
        "conv_id string, turn_idx int, text string",
    ).select(
        "conv_id", "turn_idx", F.lit("doc").alias("role"), "text",
        F.lit(None).cast("string").alias("tool"),
        (F.to_timestamp(F.lit(_EPOCH))
         + F.make_interval(mins=F.col("turn_idx"))).alias("ts"),
    )
    gold = raw.mapInPandas(
        parse_kind("gold"),
        "conv_id string, turn_idx int, start int, end int, label string",
    )
    return transcripts, gold


def read_ontonotes_conll(spark: SparkSession, path: str):
    """S3 — OntoNotes ``*.v4_gold_conll`` converter as a table source
    (reference preprocess_ontonotes.py:27-105): ``#begin document (id);
    part N`` blocks, whitespace-split token lines with the word in column
    3 and the bracketed NER column in column 10 (``(TYPE*`` opens, ``*)``
    closes, ``(TYPE)`` is a singleton), blank line = sentence boundary.
    Returns ``(transcripts, gold_mentions)`` under the same coordinate
    contract as the other sources (NER spans use the document-level word
    index the reference's converter emits — ``word_idx`` never resets at
    sentence boundaries). Reference quirks preserved: ``doc_key =
    f"{id}_{int(part)}"`` (conll.py:14-15), PTB bracket unescape +
    ``/.``→``.`` normalization at read (:6-25), and ``pt/`` (Bible)
    documents skipped (:86-92). Per-file parallelism like read_conll03."""
    import os
    from collections.abc import Iterator

    import pandas as pd

    raw = spark.read.text(path, wholetext=True)
    _ESC = {"-LRB-": "(", "-RRB-": ")", "-LSB-": "[", "-RSB-": "]",
            "-LCB-": "{", "-RCB-": "}"}

    def parse_kind(kind: str):
        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                t_rows, g_rows = [], []
                for blob in pdf["value"]:
                    doc_key = None
                    sent_i = 0
                    sent: list[str] = []
                    word_idx = 0
                    open_start, open_type = -1, None
                    skip = False
                    for line in str(blob).splitlines():
                        m = line.strip()
                        if m.startswith("#begin document"):
                            import re

                            g = re.match(
                                r"#begin document \((.*)\); part (\d+)", m)
                            doc_key = f"{g.group(1)}_{int(g.group(2))}"
                            skip = doc_key.startswith("pt/")
                            sent_i = 0
                            sent = []
                            word_idx = 0
                            open_start, open_type = -1, None
                            continue
                        if m.startswith("#end document") or doc_key is None:
                            continue
                        cols = m.split()
                        if not cols:
                            if sent and not skip:
                                t_rows.append((doc_key, sent_i,
                                               " ".join(sent)))
                                sent_i += 1
                            sent = []
                            continue
                        word = _ESC.get(cols[3], cols[3])
                        if word in ("/.", "/?"):      # normalize_word
                            word = word[1:]
                        label = cols[10]
                        if label != "*" and not skip:
                            if label.startswith("("):
                                open_type = label.strip("()*")
                                if label.endswith(")"):
                                    g_rows.append((doc_key, sent_i, word_idx,
                                                   word_idx, open_type))
                                else:
                                    open_start = word_idx
                            elif label == "*)":
                                g_rows.append((doc_key, sent_i, open_start,
                                               word_idx, open_type))
                                open_start = -1
                        sent.append(word)
                        word_idx += 1
                if kind == "transcripts":
                    yield pd.DataFrame({
                        "conv_id": pd.Series([r[0] for r in t_rows], dtype="object"),
                        "turn_idx": pd.Series([r[1] for r in t_rows], dtype="int32"),
                        "text": pd.Series([r[2] for r in t_rows], dtype="object"),
                    })
                else:
                    yield pd.DataFrame({
                        "conv_id": pd.Series([r[0] for r in g_rows], dtype="object"),
                        "turn_idx": pd.Series([r[1] for r in g_rows], dtype="int32"),
                        "start": pd.Series([r[2] for r in g_rows], dtype="int32"),
                        "end": pd.Series([r[3] for r in g_rows], dtype="int32"),
                        "label": pd.Series([r[4] for r in g_rows], dtype="object"),
                    })
        return run

    transcripts = raw.mapInPandas(
        parse_kind("transcripts"), "conv_id string, turn_idx int, text string",
    ).select(
        "conv_id", "turn_idx", F.lit("doc").alias("role"), "text",
        F.lit(None).cast("string").alias("tool"),
        (F.to_timestamp(F.lit(_EPOCH))
         + F.make_interval(mins=F.col("turn_idx"))).alias("ts"),
    )
    gold = raw.mapInPandas(
        parse_kind("gold"),
        "conv_id string, turn_idx int, start int, end int, label string",
    )
    return transcripts, gold


# ---------------------------------------------------------------------------
# N-Triples reader — the import half of the kg_export_ntriples round-trip.
# A triple store (or this engine, re-ingesting a prior export) reads the
# RDF 1.1 N-Triples serialization back into (nodes, edges) tables. The
# grammar is the exporter's (queries_catalog.ntriples_from): subjects /
# edge objects are `<urn:kg:e:ID>` IRIs, predicates `<urn:kg:p:TOK>`,
# types `<urn:kg:t:TOK>` behind the rdf:type IRI, labels are
# STRING_LITERAL_QUOTE with the 5-char ECHAR set (\\ \" \n \r \t).
# Statement kind is decided by OBJECT FORM (IRI vs literal vs rdf:type
# predicate), never by predicate name, so a relation predicate literally
# named "label" cannot shadow the label statements.
#
# Scale shape: classification + extraction are regexp projections inside
# whole-stage codegen — a map-only pass over text partitions (no Python,
# no shuffle); at 100 TB this reads like any other scan. Reconstruction
# (graph_from_ntriples) adds one distinct on edges and one entity_id
# equi-join of two node-sized sides — both AQE-planned shuffles keyed on
# the same column.

#: STRING_LITERAL_QUOTE body: any run of non-quote/non-backslash chars or
#: ECHAR pairs. Java and RE2 read `(?:[^"\\]|\\.)*` identically.
_NT_LIT_BODY = r'((?:[^"\\]|\\.)*)'
_NT_LABEL_LINE = (r'^\s*<urn:kg:e:([0-9]+)>\s+<urn:kg:p:label>\s+"'
                  + _NT_LIT_BODY + r'"\s+\.\s*$')
_NT_TYPE_LINE = (r'^\s*<urn:kg:e:([0-9]+)>\s+'
                 r'<http://www\.w3\.org/1999/02/22-rdf-syntax-ns#type>\s+'
                 r'<urn:kg:t:([A-Za-z0-9_-]+)>\s+\.\s*$')
_NT_EDGE_LINE = (r'^\s*<urn:kg:e:([0-9]+)>\s+<urn:kg:p:([A-Za-z0-9_-]+)>'
                 r'\s+<urn:kg:e:([0-9]+)>\s+\.\s*$')
_NT_BLANK_LINE = r'^\s*(#.*)?$'


def nt_unescape(col):
    """Invert the exporter's ECHAR chain on a string column, JVM-side.

    Sequential ``replace`` CANNOT unescape correctly: in ``a\\\\nb`` (an
    escaped backslash followed by a literal ``n``) a naive ``\\n``->LF
    replace would eat the second backslash and fabricate a newline. The
    order-free formulation: split on the two-char escaped-backslash pair
    (so no segment contains ``\\\\``), unescape the four simple escapes
    inside each segment with ``transform`` (they can no longer overlap),
    and re-join with a single backslash. ``limit=-1`` keeps trailing
    empty segments, so a trailing escaped backslash survives. All three
    steps are Catalyst higher-order/string expressions — no UDF."""
    segs = F.split(col, r"\\\\", -1)
    segs = F.transform(
        segs,
        lambda s: F.replace(
            F.replace(
                F.replace(
                    F.replace(s, F.lit('\\"'), F.lit('"')),
                    F.lit("\\n"), F.lit("\n")),
                F.lit("\\r"), F.lit("\r")),
            F.lit("\\t"), F.lit("\t")),
    )
    return F.array_join(segs, "\\")


def read_ntriples(spark: SparkSession, lines: DataFrame) -> DataFrame:
    """Parse a `line: string` DataFrame of N-Triples statements into one
    row per statement: (kind, subj_id, pred, obj_id, obj_token, literal,
    line). kinds: `label` (subj_id + unescaped literal), `type` (subj_id
    + obj_token), `edge` (subj_id + pred + obj_id). Blank / `#`-comment
    lines (legal N-Triples) drop silently; anything else surfaces as a
    `parse_reject` row carrying the offending line — same
    nothing-silently-drops discipline as the exporter's rejected_token.

    Use ``spark.read.text(path).withColumnRenamed("value", "line")`` to
    feed an .nt file; parsing is then a map-only codegen pass."""
    c = F.col("line")
    return (
        lines
        .filter(~c.rlike(_NT_BLANK_LINE))
        .select(
            F.when(c.rlike(_NT_LABEL_LINE), F.lit("label"))
             .when(c.rlike(_NT_TYPE_LINE), F.lit("type"))
             .when(c.rlike(_NT_EDGE_LINE), F.lit("edge"))
             .otherwise(F.lit("parse_reject")).alias("kind"),
            c.alias("line"),
        )
        .select(
            "kind",
            F.when(F.col("kind") == "label",
                   F.regexp_extract("line", _NT_LABEL_LINE, 1))
             .when(F.col("kind") == "type",
                   F.regexp_extract("line", _NT_TYPE_LINE, 1))
             .when(F.col("kind") == "edge",
                   F.regexp_extract("line", _NT_EDGE_LINE, 1))
             .cast("long").alias("subj_id"),
            F.when(F.col("kind") == "edge",
                   F.regexp_extract("line", _NT_EDGE_LINE, 2)).alias("pred"),
            F.when(F.col("kind") == "edge",
                   F.regexp_extract("line", _NT_EDGE_LINE, 3))
             .cast("long").alias("obj_id"),
            F.when(F.col("kind") == "type",
                   F.regexp_extract("line", _NT_TYPE_LINE, 2))
             .alias("obj_token"),
            F.when(F.col("kind") == "label",
                   nt_unescape(F.regexp_extract("line", _NT_LABEL_LINE, 2)))
             .alias("literal"),
            "line",
        )
    )


def graph_from_ntriples(stmts: DataFrame):
    """(nodes, edges) reconstruction from a parsed statement table.

    RDF graphs are SETS of triples, so reconstruction is distinct-based:
    edge multiplicity (the exporter's `weight`/`score_sum` aggregates)
    is not representable in N-Triples and does not round-trip — by the
    data model, not by accident. Nodes keep a NULL type when the export
    rejected a non-IRI-safe type token. Shuffle budget: one distinct on
    (src, pred, dst) + one entity_id equi-join; both key on entity ids,
    so AQE coalesces them against the same distribution."""
    labels = (stmts.filter(F.col("kind") == "label")
              .select(F.col("subj_id").alias("entity_id"),
                      F.col("literal").alias("canonical_name"))
              .distinct())
    types = (stmts.filter(F.col("kind") == "type")
             .select(F.col("subj_id").alias("entity_id"),
                     F.col("obj_token").alias("type"))
             .distinct())
    nodes = labels.join(types, "entity_id", "left")
    edges = (stmts.filter(F.col("kind") == "edge")
             .select(F.col("subj_id").alias("src_id"), "pred",
                     F.col("obj_id").alias("dst_id"))
             .distinct())
    return nodes, edges
