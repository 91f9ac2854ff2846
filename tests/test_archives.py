"""mbox / WARC archive sources: split cores, Spark readers, hostile inputs."""

from __future__ import annotations

import gzip

from b2xtranslator_spark.sources.archives import (
    read_mbox,
    read_warc,
    split_mbox,
    split_warc,
)

MBOX = (
    b"From alice@example.com Mon Feb  2 10:00:00 2026\n"
    b"From: alice@example.com\n"
    b"Subject: one\n"
    b"\n"
    b"body one\n"
    b">From a quoted separator line\n"
    b"\n"
    b"From bob@example.com Mon Feb  2 11:00:00 2026\n"
    b"From: bob@example.com\n"
    b"Subject: two\n"
    b"\n"
    b"body two\n"
)


def _warc_record(uri: bytes, body: bytes, wtype: bytes = b"response") -> bytes:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    payload = http if wtype == b"response" else body
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + wtype + b"\r\n"
        b"WARC-Target-URI: " + uri + b"\r\n"
        b"WARC-Date: 2026-02-02T10:00:00Z\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
    )
    return head + payload + b"\r\n\r\n"


def test_split_mbox_unstuffs_and_separates():
    msgs = split_mbox(MBOX)
    assert len(msgs) == 2
    assert b"Subject: one" in msgs[0] and b"Subject: two" in msgs[1]
    assert b"From a quoted separator line" in msgs[0]
    assert b">From a quoted" not in msgs[0]
    # a non-mbox buffer is one message
    assert len(split_mbox(b"From: x@example.com\n\nbody\n")) == 1
    assert split_mbox(b"") == []


def test_split_warc_plain_and_gzip():
    raw = _warc_record(b"http://a.example/", b"<p>alpha page</p>") + _warc_record(
        b"http://b.example/", b"<p>beta page</p>"
    )
    for data in (raw, gzip.compress(raw)):
        recs = split_warc(data)
        assert [r["target_uri"] for r in recs] == [
            "http://a.example/",
            "http://b.example/",
        ]
        # HTTP headers stripped from response payloads
        assert recs[0]["payload"] == b"<p>alpha page</p>"


def test_split_warc_multimember_gzip_common_crawl_layout():
    raw = b"".join(
        gzip.compress(_warc_record(u, b))
        for u, b in (
            (b"http://one.example/", b"<p>one</p>"),
            (b"http://two.example/", b"<p>two</p>"),
        )
    )
    recs = split_warc(raw)
    assert len(recs) == 2 and recs[1]["payload"] == b"<p>two</p>"


def test_split_warc_skips_non_response_types_by_caller_filter():
    raw = _warc_record(b"urn:info", b"crawler metadata", wtype=b"warcinfo") + _warc_record(
        b"http://c.example/", b"<p>real</p>"
    )
    recs = split_warc(raw)
    assert {r["warc_type"] for r in recs} == {"warcinfo", "response"}


def test_split_warc_hostile_lengths_and_truncations():
    good = _warc_record(b"http://d.example/", b"<p>ok</p>")
    lies = good.replace(b"Content-Length: ", b"Content-Length: x", 1)
    for data in (lies, good[: len(good) // 2], b"WARC/1.0\r\nbroken", b""):
        recs = split_warc(data)  # must not raise
        assert isinstance(recs, list)


def test_read_mbox_rows(spark, tmp_path):
    p = tmp_path / "a.mbox"
    p.write_bytes(MBOX)
    rows = read_mbox(spark, str(tmp_path / "*.mbox")).collect()
    assert len(rows) == 2
    assert sorted(r["msg_idx"] for r in rows) == [0, 1]


def test_read_warc_to_extraction(spark, tmp_path):
    """The full crawl shape: WARC -> response rows -> markup fold via the
    extraction kernel."""
    import base64

    from pyspark.sql import functions as F

    from b2xtranslator_spark.pipeline import PAYLOAD_PREFIX, run_extraction

    raw = _warc_record(
        b"http://e.example/", b"<html><body><p>crawled text</p></body></html>"
    )
    p = tmp_path / "crawl.warc.gz"
    p.write_bytes(gzip.compress(raw))
    recs = read_warc(spark, str(tmp_path / "*.warc.gz"))
    transcripts = recs.select(
        F.col("target_uri").alias("conv_id"),
        F.col("rec_idx").cast("long").alias("turn_idx"),
        F.lit("tool").alias("role"),
        F.lit(None).cast("string").alias("text"),
        F.concat(F.lit(PAYLOAD_PREFIX), F.base64("payload")).alias("tool"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    out = run_extraction(transcripts).collect()
    assert len(out) == 1
    assert out[0]["status"] == "ok" and out[0]["text"] == "crawled text"


def test_mbox_rows_feed_eml_leg(spark, tmp_path):
    import base64

    from pyspark.sql import functions as F

    from b2xtranslator_spark.pipeline import PAYLOAD_PREFIX, run_extraction

    p = tmp_path / "mail.mbox"
    p.write_bytes(MBOX)
    msgs = read_mbox(spark, str(tmp_path / "*.mbox"))
    transcripts = msgs.select(
        F.col("archive").alias("conv_id"),
        F.col("msg_idx").cast("long").alias("turn_idx"),
        F.lit("tool").alias("role"),
        F.lit(None).cast("string").alias("text"),
        F.concat(F.lit(PAYLOAD_PREFIX), F.base64("payload")).alias("tool"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    out = {r["turn_idx"]: r for r in run_extraction(transcripts).collect()}
    assert out[0]["status"] == "ok" and "Subject: one" in out[0]["text"]
    assert out[1]["status"] == "ok" and "body two" in out[1]["text"]


def test_split_cores_mutation_soak():
    """Seeded byte flips + truncations over mbox and gzip'd WARC buffers:
    the split cores must never raise and never stall (they run inside
    executor tasks at archive granularity — one hostile archive must cost
    one row of salvage, not a task)."""
    import time

    import numpy as np

    raw_warc = gzip.compress(
        b"".join(
            _warc_record(b"http://s%d.example/" % i, b"<p>soak</p>") for i in range(5)
        )
    )
    rng = np.random.default_rng(9090)
    for base, splitter in ((bytearray(MBOX * 10), split_mbox), (bytearray(raw_warc), split_warc)):
        for k in range(150):
            m = bytearray(base)
            if k % 5 == 4:
                m = m[: int(rng.integers(1, len(m)))]
            else:
                idx = rng.integers(0, len(m), size=int(rng.integers(1, 10)))
                vals = rng.integers(0, 256, size=len(idx))
                for i, v in zip(idx, vals):
                    m[int(i)] = int(v)
            t0 = time.perf_counter()
            out = splitter(bytes(m))
            assert time.perf_counter() - t0 < 10
            assert isinstance(out, list)


def test_read_tar_bundle_to_extraction(spark, tmp_path):
    """A .tar.gz dump of mixed documents -> rows -> the payload kernel."""
    import base64
    import tarfile

    from pyspark.sql import functions as F

    from b2xtranslator_spark.pipeline import PAYLOAD_PREFIX, run_extraction
    from b2xtranslator_spark.sources.archives import read_tar

    p = tmp_path / "dump.tar.gz"
    with tarfile.open(p, "w:gz") as tf:
        for name, data in (
            ("docs/a.md", b"# tar doc one\n"),
            ("docs/b.html", b"<html><body><p>tar doc two</p></body></html>"),
        ):
            import io as _io

            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, _io.BytesIO(data))
    rows = read_tar(spark, str(tmp_path / "*.tar.gz")).collect()
    assert sorted(r["member"] for r in rows) == ["docs/a.md", "docs/b.html"]
    df = read_tar(spark, str(tmp_path / "*.tar.gz")).select(
        F.col("member").alias("conv_id"),
        F.lit(0).cast("long").alias("turn_idx"),
        F.lit("tool").alias("role"),
        F.lit(None).cast("string").alias("text"),
        F.concat(F.lit(PAYLOAD_PREFIX), F.base64("payload")).alias("tool"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    out = {r["conv_id"]: r for r in run_extraction(df).collect()}
    assert out["docs/a.md"]["text"] == "# tar doc one"
    assert out["docs/b.html"]["text"] == "tar doc two"


def test_read_zip_bundle_skips_corrupt_member(spark, tmp_path):
    import io
    import zipfile

    from b2xtranslator_spark.sources.archives import read_zip

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("good.txt", "fine text")
        zf.writestr(
            zipfile.ZipInfo("bad.txt"), "WILL-CORRUPT-ME", zipfile.ZIP_STORED
        )
    raw = bytearray(buf.getvalue())
    # flip the stored member's content so its CRC check fails, leaving
    # the central directory (and good.txt) intact
    idx = raw.find(b"WILL-CORRUPT-ME")
    raw[idx : idx + 4] = b"\x00\x00\x00\x00"
    p = tmp_path / "b.zip"
    p.write_bytes(bytes(raw))
    rows = read_zip(spark, str(tmp_path / "*.zip")).collect()
    names = {r["member"] for r in rows}
    assert "good.txt" in names  # the archive survives its corrupt member


def test_split_tar_corrupt_and_truncated_never_raise(tmp_path):
    import tarfile

    from b2xtranslator_spark.sources.archives import _split_tar

    p = tmp_path / "t.tar"
    with tarfile.open(p, "w") as tf:
        import io as _io

        info = tarfile.TarInfo("x.txt")
        data = b"tar content " * 50
        info.size = len(data)
        tf.addfile(info, _io.BytesIO(data))
    raw = p.read_bytes()
    for variant in (raw[: len(raw) // 3], b"not a tar at all", b""):
        q = tmp_path / "v.tar"
        q.write_bytes(variant)
        assert isinstance(list(_split_tar(str(q))), list)  # no raise


def test_warc_gzip_bomb_is_capped():
    """ADVICE r05: _gunzip_members streams with a running total capped at
    _MAX_ARCHIVE_BYTES instead of one unbounded gzip.decompress."""
    import gzip as _gzip

    from b2xtranslator_spark.sources import archives

    old = archives._MAX_ARCHIVE_BYTES
    archives._MAX_ARCHIVE_BYTES = 1 << 20
    try:
        bomb = _gzip.compress(b"\x00" * (8 << 20))
        out = archives._gunzip_members(bomb)
        assert len(out) <= 1 << 20
    finally:
        archives._MAX_ARCHIVE_BYTES = old
