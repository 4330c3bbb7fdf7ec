"""Multimodal column plumbing ([N]): opaque binary payloads + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched `mapInPandas` stages.

Design for 100 TB:
- media live as `binary` columns (or storage URLs at petabyte scale —
  the schema carries `uri` for that) with a `kind` discriminator and
  a typed `meta` struct; Spark shuffles only the columns a stage
  reads, so feature extraction that ignores `payload` never moves it.
- decode runs inside `mapInPandas` so each Python worker processes an
  Arrow batch (vectorized transfer), never a row at a time.
- the actual codec calls (PIL/librosa/av) are NOT in this container,
  so `decode_media` dispatches to a clearly-marked deterministic fake
  decoder (`_fake_decode`) unless a real decoder import succeeds; the
  Spark-side plumbing (schema, batching, partitioning) is real and
  tested either way.
"""

from __future__ import annotations

import hashlib
import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("uri", StringType(), True),  # at PB scale: store refs
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", IntegerType(), True),  # image/video
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),  # audio/video
        StructField("n_frames", IntegerType(), True),  # video
        StructField("content_digest", StringType(), False),
    ]
)

_KINDS = ["image", "audio", "video"]

# The mapInPandas closures below reference this module's globals
# (_fake_decode, DECODED_SCHEMA). By default cloudpickle serializes
# those by reference, which requires every Spark Python worker to be
# able to `import archetype_spark` — not guaranteed when the driver
# process runs outside the repo root. Registering the module for
# by-value pickling ships the function bodies inside the task binary
# instead, so workers need only stdlib + pandas.
try:  # pyspark vendors cloudpickle; plain cloudpickle as fallback
    from pyspark.cloudpickle import register_pickle_by_value
except ImportError:  # pragma: no cover
    from cloudpickle import register_pickle_by_value

register_pickle_by_value(sys.modules[__name__])


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from `documents`: the
    payload is the utf-8 text bytes (stand-in for an encoded blob),
    kind cycles by doc_id. Exists so the multimodal plumbing has a
    reproducible input in this container."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("synthetic://doc/"), F.col("doc_id")).alias("uri"),
        payload.alias("payload"),
        F.length(F.col("text")).cast("bigint").alias("n_bytes"),
    )


def fetch_payloads(
    media: DataFrame,
    uri_col: str = "uri",
    payload_col: str = "payload",
    on_error: str = "null",
) -> DataFrame:
    """Resolve storage refs to bytes — the Daft `.url.download()` row
    of the [D] surface (reference pyproject.toml:7-8): at PB scale
    media tables carry URIs, and this stage materializes the payload
    column right before a decode stage needs it.

    Runs as Arrow-batched mapInPandas: each Python worker fetches its
    batch's URIs (file:// reads locally; http(s):// via stdlib urllib,
    which this container can't exercise — guarded, surfaced per-row).
    Output = input columns with `payload_col` (re)bound to the fetched
    bytes plus a `fetch_error` string column (NULL on success).
    `on_error='error'` raises on the first failed row instead.

    Scale notes: fetch is I/O-bound, so repartition the URI frame to
    the cluster's concurrent-connection budget before this stage; only
    the uri column shuffles (payload is born executor-side, exactly
    like Daft's lazy download)."""
    if on_error not in ("null", "error"):
        raise ValueError(f"on_error must be 'null' or 'error', got {on_error!r}")
    keep = [f for f in media.schema.fields if f.name != payload_col]
    out_schema = StructType(
        list(keep)
        + [
            StructField(payload_col, BinaryType(), True),
            StructField("fetch_error", StringType(), True),
        ]
    )
    keep_names = [f.name for f in keep]

    def _fetch_one(uri):
        if uri is None:
            return None, "null uri"
        if uri.startswith("file://"):
            try:
                with open(uri[len("file://"):], "rb") as fh:
                    return fh.read(), None
            except OSError as exc:
                return None, f"file error: {exc}"
        if uri.startswith(("http://", "https://")):
            try:
                import urllib.request

                with urllib.request.urlopen(uri, timeout=30) as resp:
                    return resp.read(), None
            except Exception as exc:  # no network in this container
                return None, f"http error: {exc}"
        return None, f"unsupported scheme: {uri.split(':', 1)[0]}"

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, errors = [], []
            for uri in pdf[uri_col]:
                data, err = _fetch_one(uri)
                if err is not None and on_error == "error":
                    raise IOError(f"fetch_payloads: {uri!r}: {err}")
                payloads.append(data)
                errors.append(err)
            out = pdf[keep_names].copy()
            out[payload_col] = payloads
            out["fetch_error"] = errors
            yield out

    return media.select(*keep_names).mapInPandas(process, schema=out_schema)


def _fake_decode(kind: str, payload: bytes) -> dict:
    """Deterministic stand-in decoder: derives plausible media
    properties from a sha256 of the payload. Replace with PIL/librosa/
    av in a full container — the signature is the contract."""
    digest = hashlib.sha256(payload or b"").hexdigest()
    h = int(digest[:8], 16)
    out = {
        "width": None,
        "height": None,
        "duration_ms": None,
        "n_frames": None,
        "content_digest": digest,
    }
    if kind == "image":
        out["width"] = 64 + h % 1920
        out["height"] = 64 + (h >> 8) % 1080
    elif kind == "audio":
        out["duration_ms"] = 500 + h % 600_000
    elif kind == "video":
        out["width"] = 64 + h % 1920
        out["height"] = 64 + (h >> 8) % 1080
        out["duration_ms"] = 1000 + h % 3_600_000
        out["n_frames"] = 1 + (h >> 4) % 10_000
    return out


def _real_decode(kind: str, payload: bytes) -> dict:
    """Real decoder hook — requires codec libs absent from this
    container."""
    raise NotImplementedError(
        "real media decode requires PIL/librosa/av; not installed in this "
        "container — _fake_decode is the deterministic stand-in"
    )


def decode_media(media: DataFrame, use_real_decoders: bool = False) -> DataFrame:
    """Decode/probe media payloads via Arrow-batched mapInPandas.

    Input must contain (media_id, kind, payload); output follows
    DECODED_SCHEMA. Each Arrow batch is processed vectorized in the
    Python worker; batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch.
    """
    decode = _real_decode if use_real_decoders else _fake_decode

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(k, p) for k, p in zip(pdf["kind"], pdf["payload"])]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            yield out[[f.name for f in DECODED_SCHEMA.fields]]

    return media.select("media_id", "kind", "payload").mapInPandas(
        process, schema=DECODED_SCHEMA
    )


def resize_images(
    media: DataFrame, width: int, height: int, use_real_decoders: bool = False
) -> DataFrame:
    """Resize stage: images pass through the Python worker batch-wise;
    the fake path re-emits a digest-stamped payload of the target
    size's metadata (the real path would emit re-encoded bytes)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("payload", BinaryType(), True),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
        ]
    )
    if use_real_decoders:
        raise NotImplementedError("real image resize requires PIL; not installed")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = [
                hashlib.sha256(p or b"").hexdigest().encode() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": digests,
                    "width": width,
                    "height": height,
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(process, schema=out_schema)
    )


def sample_frames(
    media: DataFrame, every_n: int = 100, use_real_decoders: bool = False
) -> DataFrame:
    """Frame-sampling stage for videos: emits (media_id, frame_idx,
    frame_digest) rows — one row per sampled frame, demonstrating the
    1-to-N mapInPandas expansion shape."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_digest", StringType(), False),
        ]
    )
    if use_real_decoders:
        raise NotImplementedError("real frame sampling requires av; not installed")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                meta = _fake_decode("video", payload)
                for idx in range(0, meta["n_frames"], every_n):
                    rows.append(
                        (
                            mid,
                            idx,
                            hashlib.sha256(
                                (meta["content_digest"] + str(idx)).encode()
                            ).hexdigest()[:16],
                        )
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_digest"])

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(process, schema=out_schema)
    )
