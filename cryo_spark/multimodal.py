"""Multimodal (image/audio/video) column plumbing.

Treats media payloads as opaque ``binary`` columns with typed metadata,
processed by Arrow-batched kernels over ``mapInArrow`` — the same
batch shape and partitioning discipline as the token codecs. The actual
media decoding (JPEG/PNG decode, audio PCM decode, video frame
sampling) requires libraries not present in this container, so the
decode step is STUBBED behind ``CRYO_SPARK_FAKE_MEDIA``:

- default: raises ``NotImplementedError`` naming the missing capability;
- with the env var set (tests): a deterministic fake that derives
  "pixels"/"samples" from the payload bytes, so the Spark-side plumbing
  — schema, batch iteration, UDF signatures, partition behavior — is
  real and tested end-to-end.

Reference parity note: the reference has no media path; its closest
analog is the opaque external-UDF surface (--js-tracer,
/root/reference/crates/cli/src/args.rs:272-273) where bytes go in and a
typed column comes out.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame

MEDIA_META_DDL = (
    "media_id string, n_bytes long, magic string, width int, height int, "
    "n_channels int, feature array<float>"
)

_FAKE_ENV = "CRYO_SPARK_FAKE_MEDIA"


def _decode_image_batch(payloads: list[bytes]) -> list[tuple[int, int, int, np.ndarray]]:
    """Decode image payloads -> (width, height, channels, feature vector).

    STUB: real decoding needs Pillow/libjpeg, absent from this
    container. The deterministic fake derives dimensions and an 8-dim
    byte-histogram feature from the payload so downstream plumbing is
    exercised with stable values.
    """
    if not os.environ.get(_FAKE_ENV):
        raise NotImplementedError(
            "image decode requires Pillow/libjpeg (not in this container); "
            f"set {_FAKE_ENV}=1 for the deterministic test fake"
        )
    out = []
    for p in payloads:
        n = len(p)
        w = 1 + (n % 640)
        h = 1 + ((n // 7) % 480)
        arr = np.frombuffer(p, dtype=np.uint8)
        hist = np.bincount(arr >> 5, minlength=8).astype(np.float32)
        feat = hist / max(1.0, float(hist.sum()))
        out.append((w, h, 3, feat))
    return out


def extract_media_meta(df: DataFrame, payload_col: str = "payload",
                       id_col: str = "media_id") -> DataFrame:
    """binary payload column -> typed metadata + feature vector.

    Arrow-batched; the only per-item Python is the stubbed decoder call
    (real decoders are C libraries batch-called the same way).
    """

    out_schema = pa.schema(
        [
            ("media_id", pa.string()),
            ("n_bytes", pa.int64()),
            ("magic", pa.string()),
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("n_channels", pa.int32()),
            ("feature", pa.list_(pa.float32())),
        ]
    )

    def run(batches):
        for b in batches:
            t = pa.Table.from_batches([b])
            ids = t.column(id_col).to_pylist()
            payloads = t.column(payload_col).to_pylist()
            metas = _decode_image_batch(payloads)
            magic = [(p[:4].hex() if p else "") for p in payloads]
            yield pa.RecordBatch.from_pydict(
                {
                    "media_id": ids,
                    "n_bytes": [len(p) for p in payloads],
                    "magic": magic,
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "n_channels": [m[2] for m in metas],
                    "feature": [m[3].tolist() for m in metas],
                },
                schema=out_schema,
            )

    return df.select(id_col, payload_col).mapInArrow(run, MEDIA_META_DDL)


def frame_sample_plan(n_frames: int, every_nth: int) -> list[int]:
    """Deterministic frame-sampling indices (video path planning).

    Pure function (cryo chunk-alignment analog): frames at multiples of
    ``every_nth``, always including the final frame.
    """
    if n_frames <= 0:
        return []
    idx = list(range(0, n_frames, max(1, every_nth)))
    if idx[-1] != n_frames - 1:
        idx.append(n_frames - 1)
    return idx
