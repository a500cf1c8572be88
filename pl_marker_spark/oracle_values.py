"""Driver-side oracles for the model-dependent kg_* queries.

The packed-marker pipeline is not expressible in ANSI SQL (it *is* the
engine under test), so its DuckDB twin is the single-process oracle
(oracle_ref.py + oracle_graph.py) **materialized as a VALUES literal**: the
oracle runs over the same deterministic synthetic corpus the Spark query
uses (synth.local_corpus == synth.transcripts_df row-for-row), and DuckDB
evaluates a plain SELECT over its rows. This converts the round-1
`no_oracle` rows into full rows+schema+hash checks (VERDICT item #1) —
the independent computation is the Python oracle; DuckDB is the transport.

Floats are rounded to 6 decimals on BOTH sides with the same HALF_UP
shortest-repr semantics (oracle_graph.round_half_up twins Spark's F.round).
"""

from __future__ import annotations

from collections import defaultdict

from .config import DEFAULT_CONFIG
from .oracle_graph import graph_oracle, round_half_up
from .oracle_ref import oracle_two_stage, run_oracle
from .tokenizer import split_words

# Fixed corpus size for the kg_* driver queries: the catalog synthesizes its
# own transcripts (the driver's parquet tables have no transcript shape), so
# the size is pinned — one static oracle SQL is then valid at every sf.
N_KG_CONVS = 30

_CACHE: dict[str, object] = {}


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _values_sql(rows, cols: list[str], types: list[str]) -> str:
    names = [f"c{i}" for i in range(len(cols))]
    sel = ", ".join(
        f'{n}::{t} AS "{c}"' for n, c, t in zip(names, cols, types)
    )
    body = ",\n".join("(" + ", ".join(_sql_lit(v) for v in r) + ")" for r in rows)
    return f"SELECT {sel} FROM (VALUES\n{body}\n) t({', '.join(names)})"


def _oracle_outputs() -> dict:
    if "out" in _CACHE:
        return _CACHE["out"]
    from . import synth

    turns, _gm, gold_rel = synth.local_corpus(N_KG_CONVS)
    o = run_oracle(turns, DEFAULT_CONFIG)
    turn_words = {(r[0], r[1]): split_words(r[3]) for r in turns}
    g = graph_oracle(o["refined"], o["triples"], turn_words)

    # two-stage mentions (ordinal -> original turn id mapping as run_oracle)
    conv_turns: dict[str, list[tuple[int, str]]] = defaultdict(list)
    for row in turns:
        conv_turns[row[0]].append((row[1], row[3]))
    ordered = {c: [t for _, t in sorted(p)] for c, p in sorted(conv_turns.items())}
    tids = {c: [i for i, _ in sorted(p)] for c, p in conv_turns.items()}
    ts = sorted(
        (r[0], tids[r[0]][r[1]], *r[2:])
        for r in oracle_two_stage(ordered, DEFAULT_CONFIG)
    )
    _CACHE["out"] = {"oracle": o, "graph": g, "two_stage": ts,
                     "gold_rel": gold_rel}
    return _CACHE["out"]


_M_COLS = ["conv_id", "turn_idx", "start", "end", "label", "score"]
_M_TYPES = ["VARCHAR", "INTEGER", "INTEGER", "INTEGER", "VARCHAR", "DOUBLE"]
_T_COLS = ["conv_id", "turn_idx", "s1", "e1", "s2", "e2", "pred", "score",
           "subj_type", "obj_type"]
_T_TYPES = ["VARCHAR", "INTEGER", "INTEGER", "INTEGER", "INTEGER", "INTEGER",
            "VARCHAR", "DOUBLE", "VARCHAR", "VARCHAR"]


def variant_configs():
    """The variant pipeline profiles under the driver gate (VERDICT round-2
    item #4): C4 levitated pairs (run_levitatedpair.py:282-322), the roberta
    tokenizer family (run_acener.py:155-162), and the unidirectional-eval
    ablation (run_re.py:899-918). Shared by the Spark catalog entries and
    the oracle renders below so both sides bind identical configs."""
    from dataclasses import replace

    from .models import ensure_reference_checkpoint

    return {
        "levpair": replace(DEFAULT_CONFIG, levitated_pairs=True),
        "roberta": replace(DEFAULT_CONFIG, tokenizer_family="roberta"),
        "unidirect": replace(DEFAULT_CONFIG, eval_unidirect=True),
        # real checkpoint weights through the torch-free loader: both sides
        # (Spark pipeline and this oracle) load byte-identical safetensors
        # from the idempotently-generated reference checkpoint and run the
        # full NumpyBertEncoder forward (round-3 VERDICT item #1)
        "hf": replace(DEFAULT_CONFIG, model="hf",
                      checkpoint_dir=ensure_reference_checkpoint()),
        # K6 + use_full_layer under the hard driver gate: att_left extends
        # the packed mask (run_re.py:420-424) and the encoder switches to
        # the 1-D full mask at layer 1 of 2 (modeling_bert.py:397-412)
        "hf_attleft": replace(DEFAULT_CONFIG, model="hf",
                              checkpoint_dir=ensure_reference_checkpoint(),
                              att_left=True, use_full_layer=1),
    }


def variant_oracle_sqls() -> dict[str, str]:
    """VALUES-materialized oracles for the variant kg_* queries — same
    transport as kg_oracle_sqls, each over run_oracle with the variant
    config."""
    if "variants" not in _CACHE:
        from . import synth

        turns, _gm, _gr = synth.local_corpus(N_KG_CONVS)
        cfgs = variant_configs()
        sqls = {}
        o_lev = run_oracle(turns, cfgs["levpair"])
        sqls["kg_triples_levpair"] = _values_sql(
            [(c, t, s1, e1, s2, e2, p, round_half_up(sc, 6), n1, n2)
             for c, t, s1, e1, s2, e2, p, sc, n1, n2 in o_lev["triples"]],
            _T_COLS, _T_TYPES)
        o_rob = run_oracle(turns, cfgs["roberta"])
        sqls["kg_mentions_roberta"] = _values_sql(
            [(c, t, s, e, l, round_half_up(p, 6))
             for c, t, s, e, l, p in o_rob["mentions"]],
            _M_COLS, _M_TYPES)
        o_uni = run_oracle(turns, cfgs["unidirect"])
        sqls["kg_triples_unidirect"] = _values_sql(
            [(c, t, s1, e1, s2, e2, p, round_half_up(sc, 6), n1, n2)
             for c, t, s1, e1, s2, e2, p, sc, n1, n2 in o_uni["triples"]],
            _T_COLS, _T_TYPES)
        o_hf = run_oracle(turns, cfgs["hf"])
        sqls["kg_mentions_hf"] = _values_sql(
            [(c, t, s, e, l, round_half_up(p, 6))
             for c, t, s, e, l, p in o_hf["mentions"]],
            _M_COLS, _M_TYPES)
        sqls["kg_triples_hf"] = _values_sql(
            [(c, t, s1, e1, s2, e2, p, round_half_up(sc, 6), n1, n2)
             for c, t, s1, e1, s2, e2, p, sc, n1, n2 in o_hf["triples"]],
            _T_COLS, _T_TYPES)
        o_att = run_oracle(turns, cfgs["hf_attleft"])
        sqls["kg_triples_hf_attleft"] = _values_sql(
            [(c, t, s1, e1, s2, e2, p, round_half_up(sc, 6), n1, n2)
             for c, t, s1, e1, s2, e2, p, sc, n1, n2 in o_att["triples"]],
            _T_COLS, _T_TYPES)
        _CACHE["variants"] = sqls
    return _CACHE["variants"]


N_MEDIA = 60


def _phash_from_gray(gray, hash_size: int = 8) -> int:
    """Pure-python block-mean average-hash over a row-major grayscale
    grid (no numpy, no shared code with multimodal.image_phash)."""
    h, w = len(gray), len(gray[0])
    bh, bw = h // hash_size, w // hash_size
    blocks = []
    for by in range(hash_size):
        for bx in range(hash_size):
            s = 0.0
            for y in range(by * bh, (by + 1) * bh):
                for x in range(bx * bw, (bx + 1) * bw):
                    s += gray[y][x]
            blocks.append(s / (bh * bw))
    mean = sum(blocks) / len(blocks)
    v = 0
    for b in blocks:
        v = (v << 1) | (1 if b > mean else 0)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def _bmp_phash_py(payload: bytes, hash_size: int = 8):
    """Independent stdlib-only BMP decode + average-hash (no numpy, no
    shared code with multimodal.decode_bmp/image_phash) — the oracle twin
    of the multimodal_phash kernel. Returns (width, height, signed phash)."""
    import struct

    assert payload[:2] == b"BM"
    data_off = struct.unpack_from("<I", payload, 10)[0]
    _hdr, w, h_raw = struct.unpack_from("<Iii", payload, 14)
    h = abs(h_raw)
    row_size = (3 * w + 3) // 4 * 4
    gray = []
    for y in range(h):                       # image rows, top-down
        srow = (h - 1 - y) if h_raw > 0 else y
        base = data_off + srow * row_size
        row = []
        for x in range(w):
            b = payload[base + 3 * x]
            g = payload[base + 3 * x + 1]
            r = payload[base + 3 * x + 2]
            row.append(0.299 * r + 0.587 * g + 0.114 * b)
        gray.append(row)
    return w, h, _phash_from_gray(gray, hash_size)


def _pixels_phash_py(i: int, hash_size: int = 8):
    """Average-hash computed straight from the shared *pixel definition*
    (multimodal.synthetic_pixels) in pure python — no decoder at all. Used
    as the oracle for PNG rows: the Spark side must invert
    encode_png(synthetic_pixels(i)) exactly to hash-match, so the driver
    gate verifies the zlib-compressed roundtrip end to end."""
    from .multimodal import IMG_SIZE, synthetic_pixels

    px = synthetic_pixels(i)
    gray = [
        [0.299 * int(px[y, x, 0]) + 0.587 * int(px[y, x, 1])
         + 0.114 * int(px[y, x, 2]) for x in range(IMG_SIZE)]
        for y in range(IMG_SIZE)
    ]
    return IMG_SIZE, IMG_SIZE, _phash_from_gray(gray, hash_size)


def _wav_fp_py(payload: bytes, n_bits: int = 64):
    """Independent WAV decode + energy fingerprint: the stdlib ``wave``
    module (its own RIFF parser — no shared code with
    multimodal.decode_wav) and pure-python exact-integer frame energies.
    Returns (rate, n_samples, signed fingerprint)."""
    import io
    import struct
    import wave

    wf = wave.open(io.BytesIO(payload))
    assert wf.getnchannels() == 1 and wf.getsampwidth() == 2
    rate = wf.getframerate()
    raw = wf.readframes(wf.getnframes())
    samples = struct.unpack(f"<{len(raw) // 2}h", raw)
    n = len(samples) // n_bits
    energies = []
    for j in range(n_bits):
        s = 0
        for x in samples[j * n : (j + 1) * n]:
            s += x * x
        energies.append(s)
    tot = sum(energies)
    v = 0
    for ej in energies:
        v = (v << 1) | (1 if ej * n_bits > tot else 0)
    if v >= 1 << 63:
        v -= 1 << 64
    return rate, len(samples), v


def _box_resize_digest_py(rgb, out: int = 8) -> int:
    """Pure-python exact integer box-mean resize + 60-bit md5 digest of
    the resized RGB bytes (row-major, RGB order) — no numpy, no shared
    code with multimodal.resize_media."""
    import hashlib

    h, w = len(rgb), len(rgb[0])
    bh, bw = h // out, w // out
    buf = bytearray()
    for by in range(out):
        for bx in range(out):
            for c in range(3):
                t = 0
                for y in range(by * bh, (by + 1) * bh):
                    for x in range(bx * bw, (bx + 1) * bw):
                        t += rgb[y][x][c]
                buf.append(t // (bh * bw))
    return int(hashlib.md5(bytes(buf)).hexdigest()[:15], 16)


def _bmp_rgb_py(payload: bytes):
    """Independent stdlib-only BMP decode to a row-major RGB grid (no
    numpy, no shared code with multimodal.decode_bmp)."""
    import struct

    assert payload[:2] == b"BM"
    data_off = struct.unpack_from("<I", payload, 10)[0]
    _hdr, w, h_raw = struct.unpack_from("<Iii", payload, 14)
    h = abs(h_raw)
    row_size = (3 * w + 3) // 4 * 4
    rgb = []
    for y in range(h):
        srow = (h - 1 - y) if h_raw > 0 else y
        base = data_off + srow * row_size
        rgb.append([
            (payload[base + 3 * x + 2], payload[base + 3 * x + 1],
             payload[base + 3 * x])
            for x in range(w)
        ])
    return w, h, rgb


def _pixels_rgb_py(i: int):
    """RGB grid straight from the shared pixel definition (the PNG-row
    oracle: the Spark side must invert encode_png exactly to match)."""
    from .multimodal import IMG_SIZE, synthetic_pixels

    px = synthetic_pixels(i)
    rgb = [[(int(px[y, x, 0]), int(px[y, x, 1]), int(px[y, x, 2]))
            for x in range(IMG_SIZE)] for y in range(IMG_SIZE)]
    return IMG_SIZE, IMG_SIZE, rgb


def multimodal_oracle_sqls() -> dict[str, str]:
    """VALUES oracles for the multimodal queries: the pinned synthetic
    media corpus's image/audio payloads re-decoded and re-hashed by the
    independent stdlib implementations above."""
    if "multimodal" not in _CACHE:
        from .multimodal import (
            encode_bmp,
            encode_wav,
            synthetic_pixels,
            synthetic_samples,
        )

        img_rows, wav_rows, rsz_rows = [], [], []
        for i in range(N_MEDIA):
            if i % 3 == 0:           # synthetic_media kind cycle: image at 0
                if i % 6 == 0:       # BMP rows: independent payload decoder
                    w, h, v = _bmp_phash_py(encode_bmp(synthetic_pixels(i)))
                    _, _, rgb = _bmp_rgb_py(encode_bmp(synthetic_pixels(i)))
                else:                # PNG rows: hash from the pixel
                    w, h, v = _pixels_phash_py(i)  # definition (roundtrip
                    _, _, rgb = _pixels_rgb_py(i)  # verified end-to-end)
                img_rows.append((i, w, h, v))
                rsz_rows.append((i, w, h, 8, _box_resize_digest_py(rgb)))
            elif i % 3 == 1:         # audio at 1
                r, ns, v = _wav_fp_py(encode_wav(synthetic_samples(i)))
                wav_rows.append((i, r, ns, v))
        _CACHE["multimodal"] = {
            "multimodal_phash": _values_sql(
                img_rows, ["media_id", "width", "height", "phash"],
                ["BIGINT", "INTEGER", "INTEGER", "BIGINT"]),
            "multimodal_audiofp": _values_sql(
                wav_rows, ["media_id", "sample_rate", "n_samples", "afp"],
                ["BIGINT", "INTEGER", "BIGINT", "BIGINT"]),
            "multimodal_resize": _values_sql(
                rsz_rows,
                ["media_id", "width", "height", "out_size", "px_digest"],
                ["BIGINT", "INTEGER", "INTEGER", "INTEGER", "BIGINT"]),
        }
    return _CACHE["multimodal"]


def kg_oracle_sqls() -> dict[str, str]:
    out = _oracle_outputs()
    o, g, ts = out["oracle"], out["graph"], out["two_stage"]
    mention_rows = [
        (c, t, s, e, l, round_half_up(p, 6)) for c, t, s, e, l, p in o["mentions"]
    ]
    two_stage_rows = [
        (c, t, s, e, l, round_half_up(p, 6)) for c, t, s, e, l, p in ts
    ]
    triple_rows = [
        (c, t, s1, e1, s2, e2, pred, round_half_up(sc, 6), n1, n2)
        for c, t, s1, e1, s2, e2, pred, sc, n1, n2 in o["triples"]
    ]
    node_rows = g["nodes"]
    edge_rows = [
        (src, dst, pred, w, round_half_up(ss, 6))
        for src, dst, pred, w, ss in g["edges"]
    ]
    m_cols = ["conv_id", "turn_idx", "start", "end", "label", "score"]
    m_types = ["VARCHAR", "INTEGER", "INTEGER", "INTEGER", "VARCHAR", "DOUBLE"]
    return {
        "kg_mentions": _values_sql(mention_rows, m_cols, m_types),
        "kg_two_stage_mentions": _values_sql(two_stage_rows, m_cols, m_types),
        "kg_triples": _values_sql(
            triple_rows,
            ["conv_id", "turn_idx", "s1", "e1", "s2", "e2", "pred", "score",
             "subj_type", "obj_type"],
            ["VARCHAR", "INTEGER", "INTEGER", "INTEGER", "INTEGER", "INTEGER",
             "VARCHAR", "DOUBLE", "VARCHAR", "VARCHAR"],
        ),
        "kg_graph_nodes": _values_sql(
            node_rows,
            ["entity_id", "canonical_name", "type", "n_mentions", "n_surfaces"],
            ["BIGINT", "VARCHAR", "VARCHAR", "BIGINT", "BIGINT"],
        ),
        "kg_graph_edges": _values_sql(
            edge_rows,
            ["src_id", "dst_id", "pred", "weight", "score_sum"],
            ["BIGINT", "BIGINT", "VARCHAR", "BIGINT", "DOUBLE"],
        ),
        "kg_mention_entity": _values_sql(
            g["mention_entity"],
            ["conv_id", "turn_idx", "start", "end", "label", "surface",
             "entity_id"],
            ["VARCHAR", "INTEGER", "INTEGER", "INTEGER", "VARCHAR",
             "VARCHAR", "BIGINT"],
        ),
        # planted gold relations straight from the synthetic generator —
        # NOT a pipeline output; the calibration twin joins predictions
        # against these (synth.gold_relations_df is the Spark-side twin)
        "kg_gold_relations": _values_sql(
            out["gold_rel"],
            ["conv_id", "turn_idx", "s1", "e1", "s2", "e2", "label"],
            ["VARCHAR", "INTEGER", "INTEGER", "INTEGER", "INTEGER",
             "INTEGER", "VARCHAR"],
        ),
    }


def coref_oracle_sqls() -> dict[str, str]:
    """VALUES oracles for the O17 coref surface: the bracket column from
    the reference-shaped single-process writer (oracle_coref.coref_column_py
    over the oracle pipeline's entity clusters) and the native
    muc/bcub/ceafe metrics from the Fraction-exact loop implementation
    (oracle_coref.coref_metrics_py, pure-python assignment solver)."""
    if "coref" not in _CACHE:
        from . import synth
        from .oracle_coref import (
            clusters_from_mentions,
            coref_column_py,
            coref_metrics_py,
        )
        from .oracle_graph import _normalize, mention_surfaces_py

        out = _oracle_outputs()
        o, g = out["oracle"], out["graph"]
        turns, gm, _gr = synth.local_corpus(N_KG_CONVS)
        turn_words = {(r[0], r[1]): split_words(r[3]) for r in turns}

        # predicted clusters: oracle mentions -> entity ids via the graph
        # oracle's (label, surface) assignment
        surfaces = mention_surfaces_py(o["refined"], turn_words)
        ent_of = {(v["label"], v["surface"]): v["entity_id"] for v in g["vocab"]}
        pred_rows = [
            (c, s, e, ent_of[(label, surface)])
            for c, _t, s, e, label, surface in surfaces
        ]
        pred_by_doc = clusters_from_mentions(pred_rows)

        # document word text for the writer rows
        doc_words: dict[str, list[str]] = {}
        by_conv = defaultdict(list)
        for (c, t), ws in turn_words.items():
            by_conv[c].append((t, ws))
        for c, pairs in by_conv.items():
            doc_words[c] = [w for _t, ws in sorted(pairs) for w in ws]

        conll_rows = [
            (doc, w, doc_words[doc][w], coref)
            for doc, w, coref in coref_column_py(pred_by_doc)
        ]

        # gold clusters: (label, normalized surface) entity identity
        gold_surf = mention_surfaces_py(
            [(c, t, s, e, label) for c, t, s, e, label in gm], turn_words
        )
        gold_rows = [
            (c, s, e, (label, _normalize(surface)))
            for c, _t, s, e, label, surface in gold_surf
        ]
        gold_by_doc = clusters_from_mentions(gold_rows)
        metric_rows = coref_metrics_py(gold_by_doc, pred_by_doc)

        _CACHE["coref"] = {
            "o17_coref_conll": _values_sql(
                conll_rows,
                ["conv_id", "word_idx", "word", "coref"],
                ["VARCHAR", "INTEGER", "VARCHAR", "VARCHAR"],
            ),
            "o17_coref_metrics": _values_sql(
                metric_rows,
                ["metric", "recall", "precision", "f1"],
                ["VARCHAR", "DOUBLE", "DOUBLE", "DOUBLE"],
            ),
        }
    return _CACHE["coref"]


def o8_oracle_sqls() -> dict[str, str]:
    """O8 inverse-label gold augmentation (run_re.py:265-281) as a twin
    that RE-DERIVES the rule relationally in DuckDB over the gold VALUES
    (the dedup_cluster discipline — independent SQL derivation, not a
    Python-precomputed literal): forward pairs keep their label id,
    reversed pairs get the same id when the label is symmetric (the
    reference's annotated `# bug` branch) or id + NUM_REL - NUM_SYM when
    not, and a reversed pair already present as a forward gold pair is
    dropped (the `if w not in pos2label` guard). Ordered-key duplicates
    take max(lab_id) on BOTH sides — the synthetic gold has none, so the
    tie rule never fires; it exists to keep the twin deterministic."""
    if "o8" not in _CACHE:
        from . import synth
        from .world import NUM_REL, NUM_SYM, REL_LABELS, SYM_LABELS

        _turns, _gm, gr = synth.local_corpus(N_KG_CONVS)
        gold_values = ",\n".join(
            f"('{c}', {t}, {s1}, {e1}, {s2}, {e2}, '{lab}')"
            for c, t, s1, e1, s2, e2, lab in gr
        )
        lab_values = ", ".join(
            f"({i}, '{l}', {str(l in SYM_LABELS[1:]).upper()})"
            for i, l in enumerate(REL_LABELS)
        )
        _CACHE["o8"] = {"o8_inverse_gold": f"""
WITH gold(conv_id, turn_idx, s1, e1, s2, e2, label) AS (VALUES
{gold_values}
),
lab(lab_id, label, is_sym) AS (VALUES {lab_values}),
g AS (SELECT conv_id, turn_idx, s1, e1, s2, e2, lab_id, is_sym
      FROM gold JOIN lab USING (label)),
fwd AS (SELECT conv_id, turn_idx, s1, e1, s2, e2, max(lab_id) AS lab_id
        FROM g GROUP BY conv_id, turn_idx, s1, e1, s2, e2),
inv0 AS (SELECT conv_id, turn_idx, s2 AS s1, e2 AS e1, s1 AS s2, e1 AS e2,
                CASE WHEN is_sym THEN lab_id
                     ELSE lab_id + {NUM_REL} - {NUM_SYM} END AS lab_id
         FROM g),
invd AS (SELECT conv_id, turn_idx, s1, e1, s2, e2, max(lab_id) AS lab_id
         FROM inv0 GROUP BY conv_id, turn_idx, s1, e1, s2, e2),
inv AS (SELECT i.* FROM invd i
        LEFT JOIN fwd f USING (conv_id, turn_idx, s1, e1, s2, e2)
        WHERE f.lab_id IS NULL)
SELECT conv_id, turn_idx::BIGINT AS turn_idx, s1::BIGINT AS s1,
       e1::BIGINT AS e1, s2::BIGINT AS s2, e2::BIGINT AS e2,
       lab_id::BIGINT AS lab_id, 'fwd' AS src FROM fwd
UNION ALL
SELECT conv_id, turn_idx::BIGINT AS turn_idx, s1::BIGINT AS s1,
       e1::BIGINT AS e1, s2::BIGINT AS s2, e2::BIGINT AS e2,
       lab_id::BIGINT AS lab_id, 'inv' AS src FROM inv
"""}
    return _CACHE["o8"]
