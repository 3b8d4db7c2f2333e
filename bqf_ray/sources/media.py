"""Deterministic synthetic media table — multimodal plumbing fixture.

Real crawl pipelines carry images/audio/video as opaque ``binary`` columns
with typed metadata.  The container has no image/audio codecs (PIL/ffmpeg
absent — see pipelines/multimodal.py for the stub boundary), so this
source emits a deterministic fake container format "RAWM":

    RAWM | kind(1B: 0=img,1=audio,2=video) | w(u16) | h(u16) | frames(u16)
         | payload bytes (seeded, w*h per frame / 2*w samples for audio)

The payload statistics are deterministic per media_id, so feature
extraction is reproducible and testable.  Schema:
    media_id: int64, kind: string, payload: binary, mime: string
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"RAWM"
KINDS = ["image", "audio", "video"]
_MIMES = {"image": "image/x-raw", "audio": "audio/x-raw", "video": "video/x-raw"}


def encode_media(kind: int, w: int, h: int, frames: int, payload: bytes) -> bytes:
    return MAGIC + struct.pack("<BHHH", kind, w, h, frames) + payload


def decode_header(blob: bytes) -> tuple[int, int, int, int, int]:
    """→ (kind, w, h, frames, payload_offset); raises on foreign formats."""
    if blob[:4] != MAGIC:
        raise NotImplementedError(
            "real image/audio codecs are not available in this environment; "
            "only the RAWM fake container is decodable (stub boundary — "
            "swap in PIL/ffmpeg decoders here in production)")
    kind, w, h, frames = struct.unpack("<BHHH", blob[4:11])
    return kind, w, h, frames, 11


def generate_media(n_rows: int, seed: int = 42):
    """Deterministic media table → pyarrow.Table."""
    import pyarrow as pa

    rng = np.random.RandomState(seed)
    ids, kinds, blobs, mimes = [], [], [], []
    for i in range(n_rows):
        kind = int(rng.randint(0, 3))
        if kind == 0:          # image
            w, h, frames = int(rng.randint(16, 64)), int(rng.randint(16, 64)), 1
            payload = rng.randint(0, 256, w * h, dtype=np.int64).astype(np.uint8)
        elif kind == 1:        # audio: 2*w samples, h=1
            w, h, frames = int(rng.randint(128, 1024)), 1, 1
            payload = rng.randint(0, 256, 2 * w, dtype=np.int64).astype(np.uint8)
        else:                  # video: frames of w*h
            w, h = int(rng.randint(8, 32)), int(rng.randint(8, 32))
            frames = int(rng.randint(2, 12))
            payload = rng.randint(0, 256, w * h * frames,
                                  dtype=np.int64).astype(np.uint8)
        ids.append(i)
        kinds.append(KINDS[kind])
        blobs.append(encode_media(kind, w, h, frames, payload.tobytes()))
        mimes.append(_MIMES[KINDS[kind]])
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(blobs, pa.binary()),
        "mime": pa.array(mimes, pa.string()),
    })


def media_dataset(n_rows: int, seed: int = 42, parallelism: int = 4):
    import ray
    import pyarrow as pa

    shard = max(64, n_rows // max(parallelism, 1))
    specs = [(min(shard, n_rows - s0), seed + 17 * (s0 // shard))
             for s0 in range(0, n_rows, shard)]
    spec_tbl = pa.table({"n": [n for n, _ in specs],
                         "seed": [sd for _, sd in specs]})

    def make(batch):
        out = [generate_media(int(n), int(sd))
               for n, sd in zip(batch["n"].to_pylist(), batch["seed"].to_pylist())]
        return pa.concat_tables(out)

    return (ray.data.from_arrow(spec_tbl).repartition(len(specs))
            .map_batches(make, batch_format="pyarrow", batch_size=1))
