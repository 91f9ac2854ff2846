"""Streaming ingestion: new transcript files are drained exactly once and
resuming from the checkpoint does not re-process old files."""

from __future__ import annotations

import pytest

from b2xtranslator_spark.sources.transcripts import (
    load_sample_corpus,
    synthesize_transcripts,
)
from b2xtranslator_spark.streaming.ingest import start_extraction_stream


@pytest.fixture(scope="module")
def corpus():
    df = load_sample_corpus()
    if df.empty:
        pytest.skip("reference sample corpus unavailable")
    return df


def test_stream_drains_and_resumes_exactly_once(spark, corpus, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")

    t1, _ = synthesize_transcripts(spark, n_turns=120, doc_fraction=0.3, corpus=corpus)
    t1.write.mode("append").parquet(in_dir)

    q = start_extraction_stream(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(300)
    first = spark.read.parquet(out_dir).count()
    assert first == 120

    # new files arrive; restart drains ONLY the new ones
    t2, _ = synthesize_transcripts(spark, n_turns=80, doc_fraction=0.3, seed=43, corpus=corpus)
    t2.write.mode("append").parquet(in_dir)
    q = start_extraction_stream(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(300)
    total = spark.read.parquet(out_dir)
    assert total.count() == 200
    # no duplicates: (conv_id, turn_idx) keys unique per generation batch
    assert (
        total.groupBy("conv_id", "turn_idx").count().where("count > 2").count() == 0
    )
