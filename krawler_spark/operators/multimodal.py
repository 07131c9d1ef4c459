"""Multimodal column plumbing — image/audio/video as opaque binary.

The Spark-side mechanics (schema, partition-friendly batch shapes,
Arrow-batched UDF signatures) are real and tested; the actual codec
work is stubbed because the decode libraries are not in this container:
``decode_image`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case it produces a seeded fake
decode so the downstream plumbing (feature vectors, resize metadata,
frame sampling) can be exercised end-to-end.

At 100 TB these operators run over ``mapInPandas`` with
``spark.sql.files.maxPartitionBytes`` sized so one Arrow batch of
binary payloads fits executor memory; feature outputs are fixed-width
arrays, so downstream joins/aggregations stay columnar.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"GIF8": "image/gif",
    b"RIFF": "audio/wav",
    b"ID3": "audio/mp3",
    b"\x00\x00\x00\x18ftyp": "video/mp4",
}


def sniff_media_type(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Magic-prefix media-type sniffing — pure JVM column ops."""
    b = F.col(bin_col)
    expr = F.lit("application/octet-stream")
    for magic, mtype in reversed(list(MAGIC.items())):
        hexpref = magic.hex()
        expr = F.when(
            F.hex(F.substring(b, 1, len(magic))) == F.lit(hexpref.upper()), F.lit(mtype)
        ).otherwise(expr)
    return df.withColumn("media_type", expr).withColumn(
        "n_bytes", F.octet_length(b).cast("long")
    )


def decode_image(payload: bytes, deterministic_fake: bool = False):
    """Decode stub. Real implementation needs PIL/libvips (absent here).

    The deterministic fake is an md5 chain over the payload: pixels =
    unhex(md5(p) || md5(md5(p)) || md5(md5(md5(p)))) — 48 bytes = a fake
    4×4 RGB image. Chosen because the identical bytes are derivable in
    ANSI SQL, giving the feature extractor an exact DuckDB oracle."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires PIL/libvips — not available in this "
            "environment; pass deterministic_fake=True for plumbing tests"
        )
    import hashlib

    import numpy as np

    m1 = hashlib.md5(bytes(payload or b"")).hexdigest()
    m2 = hashlib.md5(m1.encode()).hexdigest()
    m3 = hashlib.md5(m2.encode()).hexdigest()
    return np.frombuffer(bytes.fromhex(m1 + m2 + m3), dtype=np.uint8).reshape(4, 4, 3)


def extract_features(
    df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id",
    deterministic_fake: bool = True,
) -> DataFrame:
    """Batch feature extraction over mapInPandas: decode (stubbed) →
    fixed-width feature vector. The batch shape, schema, and Arrow
    transfer are the real production plumbing."""
    import numpy as np
    import pandas as pd

    schema = (
        f"{id_col} long, features array<double>, hist array<int>, decode_ok boolean"
    )

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, hists, oks = [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[bin_col]):
                ids.append(int(i))
                try:
                    img = decode_image(payload, deterministic_fake=deterministic_fake)
                    hist = np.histogram(img, bins=FEATURE_DIM, range=(0, 256))[0]
                    hists.append([int(x) for x in hist])
                    feats.append((hist / max(hist.sum(), 1)).astype(float).tolist())
                    oks.append(True)
                except NotImplementedError:
                    hists.append([0] * FEATURE_DIM)
                    feats.append([0.0] * FEATURE_DIM)
                    oks.append(False)
            yield pd.DataFrame(
                {id_col: ids, "features": feats, "hist": hists, "decode_ok": oks}
            )

    return df.select(id_col, bin_col).mapInPandas(_feat, schema=schema)


def sample_frames(
    df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id",
    every_n: int = 2, max_frames: int = 4,
) -> DataFrame:
    """Frame-sampling plumbing: emit (id, frame_idx, frame_payload) rows
    — the explode shape a video pipeline needs. Frames are byte slices
    here (stub); a real codec slots into the same generator."""
    import pandas as pd

    schema = f"{id_col} long, frame_idx int, frame binary"

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[bin_col]):
                payload = bytes(payload or b"")
                step = max(len(payload) // max(max_frames, 1), 1) * every_n
                for fi in range(min(max_frames, max(len(payload) // max(step, 1), 1))):
                    rows.append((int(i), fi, payload[fi * step : fi * step + 16]))
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame"])

    return df.select(id_col, bin_col).mapInPandas(_frames, schema=schema)
