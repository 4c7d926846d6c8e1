"""Multimodal columns (SURVEY.md §2.9): image/audio/video as opaque
`binary` payloads + typed metadata structs, with decode / feature-
extract / resize / frame-sample as Arrow-batched Pandas functions over
`mapInPandas`.

The Spark-side plumbing — schemas, batch iteration, partitioning —
is real and tested. The actual media decode is STUBBED
(`NotImplementedError` behind `decoder=`): the image/audio libraries
are not in this container. `fake_image_decoder` provides a
deterministic stand-in (payload-hash-derived dimensions/pixels) so the
full pipeline shape can run end-to-end in tests.

Scale notes: payloads stay columnar (Arrow) end-to-end; batch size is
governed by `spark.sql.execution.arrow.maxRecordsPerBatch`; heavy
decode work should follow a `repartition` sized to cores so every
executor pulls equal media bytes — metadata-only transforms should NOT
pass through the Python path at all (use the expression helpers below).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "payload_meta",
    "attach_payload_meta",
    "media_header",
    "decode_images",
    "fake_image_decoder",
    "extract_features",
    "resize_images",
    "sample_frames",
]

# ---- expression-level (JVM) metadata helpers ------------------------------


def payload_meta(payload: Column) -> Column:
    """Typed metadata struct for a binary payload — byte length, magic
    header (first 4 bytes hex), sha256 — all JVM-side."""
    return F.struct(
        F.length(payload).alias("n_bytes"),
        F.upper(F.hex(F.substring(payload, 1, 4))).alias("magic"),
        F.sha2(payload, 256).alias("sha256"),
    )


def attach_payload_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    return df.withColumn("payload_meta", payload_meta(F.col(payload_col)))


def media_header(payload: Column) -> Column:
    """Parse real container headers — PNG (IHDR dims), GIF (logical
    screen LE dims), WAV (fmt-chunk channels + sample rate) — into
    `struct(kind, width, height, sample_rate, n_channels)`.

    Entirely JVM-side (`substring`/`hex`/`conv` on the binary column;
    no decode library, no Python): header fields at fixed offsets don't
    need a codec, so metadata extraction at 100 TB stays in codegen and
    only FULL decode (pixels/samples) pays the Arrow→Pandas path.
    Unknown/truncated payloads yield kind='unknown' / null fields.
    """

    def be(off: int, n: int) -> Column:  # big-endian uint at byte offset
        return F.conv(F.hex(F.substring(payload, off, n)), 16, 10).cast("long")

    def byte(off: int) -> Column:
        return be(off, 1)

    is_png = F.substring(payload, 1, 8) == F.unhex(F.lit("89504E470D0A1A0A"))
    is_gif = F.substring(payload, 1, 4) == F.unhex(F.lit("47494638"))
    is_wav = (F.substring(payload, 1, 4) == F.unhex(F.lit("52494646"))) & (
        F.substring(payload, 9, 4) == F.unhex(F.lit("57415645"))
    )
    long_null = F.lit(None).cast("long")
    width = (
        F.when(is_png, be(17, 4))
        .when(is_gif, byte(7) + F.lit(256) * byte(8))
        .otherwise(long_null)
    )
    height = (
        F.when(is_png, be(21, 4))
        .when(is_gif, byte(9) + F.lit(256) * byte(10))
        .otherwise(long_null)
    )
    sample_rate = F.when(
        is_wav,
        byte(25)
        + F.lit(256) * byte(26)
        + F.lit(65536) * byte(27)
        + F.lit(16777216) * byte(28),
    ).otherwise(long_null)
    n_channels = F.when(is_wav, byte(23) + F.lit(256) * byte(24)).otherwise(
        long_null
    )
    kind = (
        F.when(is_png, F.lit("png"))
        .when(is_gif, F.lit("gif"))
        .when(is_wav, F.lit("wav"))
        .otherwise(F.lit("unknown"))
    )
    return F.struct(
        kind.alias("kind"),
        width.alias("width"),
        height.alias("height"),
        sample_rate.alias("sample_rate"),
        n_channels.alias("n_channels"),
    )


# ---- Pandas-batched decode plumbing ---------------------------------------


def fake_image_decoder(payload: bytes) -> dict:
    """Deterministic decode stand-in: derives (width, height, n_pixels,
    mean_intensity) from the payload hash. Replace with a real decoder
    (PIL/opencv) in production — same signature."""
    h = hashlib.sha256(payload or b"").digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    return {
        "width": width,
        "height": height,
        "n_pixels": width * height,
        "mean_intensity": float(h[2]) / 255.0,
    }


def _unimplemented_decoder(payload: bytes) -> dict:
    raise NotImplementedError(
        "media decode requires an image/audio library not present in this "
        "environment; pass decoder=fake_image_decoder for the deterministic "
        "stand-in or supply a real decoder"
    )


DECODE_SCHEMA = (
    "width int, height int, n_pixels long, mean_intensity double"
)


def decode_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decoder: Optional[Callable[[bytes], dict]] = None,
) -> DataFrame:
    """Decode binary payloads to image metadata via mapInPandas (Arrow
    batches; decoder runs once per payload inside the batch loop)."""
    import pandas as pd

    decoder = decoder or _unimplemented_decoder
    out_schema = f"{id_col} long, {DECODE_SCHEMA}"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            decoded = [decoder(p) for p in pdf[payload_col]]
            out = pd.DataFrame(decoded)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 16,
    extractor: Optional[Callable[[bytes], list]] = None,
) -> DataFrame:
    """Feature extraction → array<float> embedding column. Default
    extractor is the deterministic hash-derived fake (stub for a real
    vision/audio model); plumbing (schema, Arrow batching) is real."""
    import numpy as np
    import pandas as pd

    def fake_extractor(payload: bytes) -> list:
        h = hashlib.sha256(payload or b"").digest()
        rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
        return [float(x) for x in rng.randn(dim).round(6)]

    extractor = extractor or fake_extractor
    out_schema = f"{id_col} long, features array<float>"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "features": [extractor(p) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    target: tuple[int, int] = (224, 224),
    resizer: Optional[Callable[[bytes, int, int], bytes]] = None,
) -> DataFrame:
    """Resize binary image payloads → new binary column + target dims
    (mapInPandas; binary in, binary out, Arrow both ways). Default
    resizer is the deterministic stub (hash-stretched payload standing
    in for PIL's `Image.resize` → re-encode); plumbing — binary schema,
    batch shape, id passthrough — is real."""
    import pandas as pd

    def fake_resizer(payload: bytes, w: int, h: int) -> bytes:
        # deterministic stand-in: header tag + content hash + dims
        digest = hashlib.sha256(payload or b"").digest()
        return b"RSZ1" + digest + w.to_bytes(2, "big") + h.to_bytes(2, "big")

    resizer = resizer or fake_resizer
    w, h = target
    out_schema = f"{id_col} long, payload binary, width int, height int"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "payload": [resizer(p, w, h) for p in pdf[payload_col]],
                    "width": w,
                    "height": h,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n: int = 10,
    sampler: Optional[Callable[[bytes, int], list]] = None,
) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled
    frame (explode-shaped fan-out through mapInPandas). Default sampler
    is the deterministic stub (frame index + payload-hash id)."""
    import pandas as pd

    def fake_sampler(payload: bytes, every: int) -> list:
        h = hashlib.sha256(payload or b"").digest()
        n_frames = 1 + h[3] % 100
        return [
            {"frame_idx": i, "frame_id": hashlib.sha256(h + bytes([i % 256])).hexdigest()[:16]}
            for i in range(0, n_frames, every)
        ]

    sampler = sampler or fake_sampler
    out_schema = f"{id_col} long, frame_idx int, frame_id string"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col].values, pdf[payload_col]):
                for fr in sampler(payload, every_n):
                    rows.append({id_col: i, **fr})
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame_id"])

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)
