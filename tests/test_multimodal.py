"""Multimodal plumbing tests: the URL-fetch stage (Daft
`.url.download()` parity) against deterministic local fixtures, plus
scheme-error surfacing. The decode/resize/frame stages are exercised
by q43/q48/q49 (rows-only corpus) — fetch gets direct tests because
its failure modes (missing file, bad scheme) never appear there.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from archetype_spark.operators import multimodal


@pytest.fixture()
def fixture_files(tmp_path):
    blobs = {}
    for i in range(4):
        data = f"payload-{i}".encode() * (i + 1)
        p = tmp_path / f"blob_{i}.bin"
        p.write_bytes(data)
        blobs[str(p)] = data
    return blobs


def test_fetch_file_uris(spark, fixture_files):
    media = spark.createDataFrame(
        [(i, f"file://{path}") for i, path in enumerate(sorted(fixture_files))],
        "media_id long, uri string",
    )
    rows = multimodal.fetch_payloads(media).orderBy("media_id").collect()
    for row, path in zip(rows, sorted(fixture_files)):
        want = fixture_files[path]
        assert bytes(row["payload"]) == want
        assert row["fetch_error"] is None


def test_fetch_digest_matches_local(spark, fixture_files):
    path = sorted(fixture_files)[0]
    media = spark.createDataFrame([(1, f"file://{path}")], "media_id long, uri string")
    out = multimodal.fetch_payloads(media).select(
        F.sha2("payload", 256).alias("digest")
    ).collect()[0]
    assert out["digest"] == hashlib.sha256(fixture_files[path]).hexdigest()


def test_fetch_error_modes(spark, tmp_path):
    media = spark.createDataFrame(
        [
            (1, f"file://{tmp_path}/does_not_exist.bin"),
            (2, "synthetic://doc/42"),
            (3, None),
        ],
        "media_id long, uri string",
    )
    rows = {r["media_id"]: r for r in multimodal.fetch_payloads(media).collect()}
    assert rows[1]["payload"] is None and "file error" in rows[1]["fetch_error"]
    assert rows[2]["payload"] is None and "unsupported scheme" in rows[2]["fetch_error"]
    assert rows[3]["payload"] is None and rows[3]["fetch_error"] == "null uri"

    with pytest.raises(Exception, match="fetch_payloads"):
        multimodal.fetch_payloads(media, on_error="error").collect()


def test_fetch_rebinds_existing_payload_column(spark, fixture_files):
    """A media frame that already has a (stale/empty) payload column
    gets it replaced, not duplicated — the lazy-materialization shape:
    schema carries uri, payload appears when fetched."""
    path = sorted(fixture_files)[0]
    media = spark.createDataFrame(
        [(1, f"file://{path}", bytearray(b""))],
        "media_id long, uri string, payload binary",
    )
    out = multimodal.fetch_payloads(media)
    assert out.columns.count("payload") == 1
    row = out.collect()[0]
    assert bytes(row["payload"]) == fixture_files[path]
