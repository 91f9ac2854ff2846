#!/usr/bin/env python
"""Auxiliary measurement harness for the optimization round (bench.py is
FROZEN for the driver's measurement; this file exists so extra numbers —
per-query construction-vs-execution split, explain('formatted') capture,
noop-sink isolation — can be produced without touching it).

Usage:
  python bench_extra.py [--plans DIR] [--reps N] [query ...]

For each named query (default: the bench.py set) it reports one JSON line
per query:
  {"query": name, "build_s": median plan-construction sec,
   "exec_s": [per-rep noop-sink execution sec...]}
and, with --plans, writes DIR/<query>.txt with explain("formatted").
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "extract_markup_transcripts",
    "extract_markup_main_content",
    "extract_pdf_transcripts",
    "extract_rtf_transcripts",
    "extract_docx_transcripts",
    "extract_odt_transcripts",
    "extract_epub_transcripts",
    "extract_eml_transcripts",
    "extract_text_transcripts",
    "bpe_encode_roundtrip",
    "assemble_conversations",
    "turn_context_windows",
    "media_image_dhash_grid",
    "dedup_minhash_lsh",
    "dedup_exact",
    "dedup_embedding_lsh",
    "dedup_simhash_pairs",
    "text_quality_score",
    "similarity_topk_bruteforce",
    "similarity_topk_lsh",
    "lineitem_pricing_summary",
    "revenue_by_region",
    "latest_event_per_user",
    "corpus_filter_pipeline",
    "chunk_documents",
]


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plans_dir = None
    reps = 3
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir = Path(args[i + 1])
        plans_dir.mkdir(parents=True, exist_ok=True)
        del args[i : i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    names = args or BENCH_QUERIES

    from b2xtranslator_spark.plans.session import build_session

    spark = build_session(app_name="b2x-bench-extra", master=f"local[{CPUS}]")

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entrymod", Path(__file__).resolve().parent / "__spark_entry__.py"
    )
    em = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(em)
    qs = em.queries()

    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(name)
        # warm-up (codegen + file listing), not timed
        df = fn(spark, SF_DIR)
        if plans_dir is not None:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (plans_dir / f"{name}.txt").write_text(plan)
        df.write.format("noop").mode("overwrite").save()
        builds = []
        execs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(round(t1 - t0, 3))
            execs.append(round(t2 - t1, 3))
        print(
            json.dumps(
                {"query": name, "build_s": builds, "exec_s": execs}
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
