#!/usr/bin/env python
"""Per-stage wall-time decomposition of the bench flagship pipeline.

Times each coarse-granularity stage materialization separately so
optimization effort goes where the seconds are. Not part of the driver
contract; a dev tool (bench.py stays the official harness).
"""
from __future__ import annotations

import os
import shutil
import tempfile
import time
from dataclasses import replace

from pl_marker_spark import synth
from pl_marker_spark.checkpoint import CheckpointStore
from pl_marker_spark.config import DEFAULT_CONFIG
from pl_marker_spark.session import get_spark


def main():
    n_convs = int(os.environ.get("SPARK_GRAFT_CONVS", "20000"))
    spark = get_spark(app="plm-profile")
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="plm_prof_")
    timings = {}
    try:
        tdir = f"{workdir}/transcripts"
        synth.transcripts_df(spark, n_convs).write.parquet(tdir)
        transcripts = spark.read.parquet(tdir)
        cfg = replace(DEFAULT_CONFIG, re_decode="grouped")
        store = CheckpointStore(spark, f"{workdir}/ck", run_id="prof")

        from pl_marker_spark.pipeline.assemble import assemble
        from pl_marker_spark.pipeline.graph import build_graph
        from pl_marker_spark.pipeline.ner import infer_ner, suppress_mentions
        from pl_marker_spark.pipeline.rel import refine_types
        from pl_marker_spark.pipeline.repack import repack_decode_re
        from pl_marker_spark.pipeline.spanpack import spanpack_ner

        def tstage(name, build, **kw):
            t0 = time.time()
            df = store.stage(name, build, **kw)
            timings[name] = round(time.time() - t0, 2)
            print(f"  {name}: {timings[name]}s", flush=True)
            return df

        t_all = time.time()
        turns_tok = tstage("turns_tok",
                           lambda: assemble(transcripts, cfg.tokenizer_family),
                           bucket_by=["conv_id"])
        if os.environ.get("SPARK_GRAFT_NER_STAGED"):
            packed_ner = tstage("packed_ner", lambda: spanpack_ner(turns_tok, cfg))
            span_scores = infer_ner(packed_ner, cfg)
            mentions = tstage("mentions", lambda: suppress_mentions(span_scores, cfg))
        else:
            from pl_marker_spark.pipeline.ner import spanpack_decode_ner

            mentions = tstage("mentions_fused",
                              lambda: spanpack_decode_ner(turns_tok, cfg),
                              bucket_by=["conv_id"])
        t0 = time.time()
        triples_raw = repack_decode_re(turns_tok, mentions, cfg).localCheckpoint()
        timings["triples_raw(grouped RE)"] = round(time.time() - t0, 2)
        print(f"  triples_raw: {timings['triples_raw(grouped RE)']}s", flush=True)
        triples_df, refined_df = refine_types(
            triples_raw, mentions, materialize=lambda df: df.localCheckpoint(eager=False))
        triples = tstage("triples", lambda: triples_df)
        t0 = time.time()
        mentions_refined = refined_df.localCheckpoint()
        timings["mentions_refined"] = round(time.time() - t0, 2)

        coarse_names = {"sim_edges", "entity_assign", "nodes", "edges"}

        def ck(name, build):
            t0 = time.time()
            if name in coarse_names:
                df = store.stage(name, build)
            else:
                df = build().localCheckpoint()
            timings[f"graph:{name}"] = round(time.time() - t0, 2)
            print(f"  graph:{name}: {timings[f'graph:{name}']}s", flush=True)
            return df

        g = build_graph(mentions_refined, triples, turns_tok, ck=ck)
        n_tr = triples.count()
        n_ed = g["edges"].count()
        total = round(time.time() - t_all, 2)
        print(f"TOTAL {total}s  triples={n_tr} edges={n_ed}")
        print({k: v for k, v in sorted(timings.items(), key=lambda kv: -kv[1])})
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
