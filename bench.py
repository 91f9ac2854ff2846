#!/usr/bin/env python
"""Benchmark harness.

Runs the headline extraction job plus representative operator queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extras carried in the same line: turns/sec and docs/sec for the extraction
stage (the BASELINE.json target metric).

--scaling: runs the identical extraction job at local[8] and local[32] on the
same cached input and reports throughput at both plus efficiency
(T32/T8)/4 — the sandbox evidence protocol for the >=0.8 scaling-efficiency
rule (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE = Path(os.environ.get("B2X_BENCH_CACHE", "/tmp/b2x_bench_cache"))

# bench corpus size by scale factor (turns; ~50% carry a ~75KB document)
N_TURNS = {"0.001": 1000, "0.01": 4000, "0.1": 16000}
# the scaling evidence run uses a larger corpus so per-document compute
# dominates fixed per-job overhead (scheduler, worker spin-up, scan setup) —
# the regime a real multi-hour cluster job lives in
SCALE_TURNS = {"0.001": 4000, "0.01": 16000, "0.1": 64000}


def _sf_of(sf_dir: str) -> str:
    for k in N_TURNS:
        if sf_dir.rstrip("/").endswith(f"sf{k}"):
            return k
    return "0.1"


def _ensure_transcripts(spark, sf: str, n_turns: int, tag: str = "") -> str:
    """Materialize the synthetic transcript corpus once per (sf, size); the
    bench then measures extraction from parquet (scan + decode + extract),
    which is the shape of the real job."""
    path = CACHE / f"transcripts_sf{sf}{tag}"
    marker = path / "_SUCCESS"
    if not marker.exists():
        from b2xtranslator_spark.sources.transcripts import synthesize_transcripts

        shutil.rmtree(path, ignore_errors=True)
        transcripts, _ = synthesize_transcripts(
            spark, n_turns=n_turns, doc_fraction=0.5
        )
        transcripts.write.mode("overwrite").parquet(str(path))
    return str(path)


def _run_extraction(spark, transcripts_path: str) -> tuple[float, int, int]:
    from pyspark.sql import functions as F

    from b2xtranslator_spark.pipeline import run_extraction

    transcripts = spark.read.parquet(transcripts_path)
    t0 = time.perf_counter()
    extracted = run_extraction(transcripts)
    row = extracted.agg(
        F.count("*").alias("turns"),
        F.sum("metrics.docs_parsed").alias("docs"),
        F.sum(F.length("text")).alias("chars"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    return dt, int(row["turns"]), int(row["docs"] or 0)


def _timed(fn, reps: int = 3) -> float:
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def _scale_worker(cores: int, big_path: str, warm_path: str) -> None:
    """One pinned scaling measurement: warm up on the small corpus, then
    MEDIAN-OF-3 measured runs on the large one (single-shot stages carried
    ±20% run-to-run noise that dominated the efficiency ratio), emit a
    JSON line with the median and the raw samples."""
    import json as _json

    from pyspark.sql import functions as F

    from b2xtranslator_spark.pipeline import run_extraction
    from b2xtranslator_spark.plans.session import build_session

    s = build_session(app_name=f"b2x-scale-{cores}", master=f"local[{cores}]")
    run_extraction(s.read.parquet(warm_path)).agg(F.count("*")).collect()
    runs = sorted(_run_extraction(s, big_path) for _ in range(3))
    sec, turns, _docs = runs[1]
    s.stop()
    print(
        _json.dumps(
            {
                "sec": round(sec, 3),
                "turns_per_sec": round(turns / sec, 1),
                "samples_sec": [round(r[0], 3) for r in runs],
            }
        )
    )


def main() -> None:
    if "--scale-worker" in sys.argv:
        i = sys.argv.index("--scale-worker")
        _scale_worker(int(sys.argv[i + 1]), sys.argv[i + 2], sys.argv[i + 3])
        return
    scaling = "--scaling" in sys.argv
    sf = _sf_of(SF_DIR)

    from b2xtranslator_spark.plans.session import build_session

    result: dict = {"unit": "sec", "sf": float(sf)}
    queries: dict[str, float] = {}

    spark = build_session(app_name="b2x-bench", master=f"local[{CPUS}]")
    transcripts_path = _ensure_transcripts(spark, sf, N_TURNS[sf])
    if scaling:
        scale_path = _ensure_transcripts(spark, sf, SCALE_TURNS[sf], "_scale")

    # headline: extraction throughput (one warm-up run amortizes Python
    # worker startup + page cache, as a long-running job would; median of 3
    # measured runs guards against host noise)
    _run_extraction(spark, transcripts_path)
    runs = [_run_extraction(spark, transcripts_path) for _ in range(3)]
    runs.sort(key=lambda r: r[0])
    ext_sec, turns, docs = runs[1]
    queries["extract_transcripts"] = round(ext_sec, 3)
    result["turns_per_sec"] = round(turns / ext_sec, 1)
    result["docs_per_sec"] = round(docs / ext_sec, 1)

    # operator queries on the provided testdata tables
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entrymod", Path(__file__).resolve().parent / "__spark_entry__.py"
    )
    em = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(em)
    qs = em.queries()
    for name in (
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
    ):
        fn = qs[name]
        queries[name] = round(
            _timed(lambda: fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()),
            3,
        )
    spark.stop()

    if scaling:
        # each "cluster size" runs in a fresh process PINNED to exactly N
        # CPUs (taskset): in plain local[N] mode the JVM's scan/codec threads
        # would borrow idle cores beyond N, flattering small-N runs and
        # understating true scaling. Pinning makes local[N] an honest N-core
        # proxy for an N-executor cluster.
        import json as _json
        import shutil as _shutil
        import subprocess

        scale_res = {}
        for cores in (2, 8, 32):
            cmd = [
                sys.executable,
                __file__,
                "--scale-worker",
                str(cores),
                scale_path,
                transcripts_path,
            ]
            if _shutil.which("taskset"):
                cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
            out = subprocess.run(
                cmd, capture_output=True, text=True, timeout=1800
            ).stdout.strip().splitlines()
            scale_res[cores] = _json.loads(out[-1])
        result["scaling"] = {f"cpus{c}": scale_res[c] for c in scale_res}
        result["scaling"]["efficiency_2_to_8"] = round(
            (scale_res[2]["sec"] / scale_res[8]["sec"]) / 4.0, 3
        )
        result["scaling"]["efficiency_8_to_32"] = round(
            (scale_res[8]["sec"] / scale_res[32]["sec"]) / 4.0, 3
        )

    result["queries"] = queries
    result["value"] = round(sum(queries.values()), 3)
    result["metric"] = "total wall sec (headline extraction + operator queries)"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
