"""Deterministic synthetic media table — multimodal plumbing fixture.

Real crawl pipelines carry images/audio/video as opaque ``binary`` columns
with typed metadata.  Images and audio decode as REAL formats — PNG and
WAV PCM via the pure-stdlib codecs in :mod:`bqf_ray.sources.codecs`,
and JPEG (baseline + full progressive) via
:mod:`bqf_ray.sources.jpeg` (Huffman + DCT, pure stdlib); the remaining entropy-coded formats (MP3/video) stay
behind the ``NotImplementedError`` boundary in :func:`decode_header`
(ffmpeg absent).  The default
fixture format is the deterministic fake container "RAWM":

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
            "not a RAWM container — PNG/WAV/JPEG go through "
            "decode_payload (pure-stdlib codecs in sources/codecs.py "
            "and sources/jpeg.py); MP3/video codecs are not available "
            "in this environment (stub boundary — swap in ffmpeg "
            "decoders here in production)")
    kind, w, h, frames = struct.unpack("<BHHH", blob[4:11])
    return kind, w, h, frames, 11


def decode_payload(blob: bytes):
    """Universal decode: → ``(kind, w, h, frames, data)`` with ``data``
    a numpy array of decoded pixels/samples.

    Dispatches on magic bytes: RAWM (synthetic container), PNG
    (:func:`bqf_ray.sources.codecs.png_decode` — real zlib+filter
    decode), baseline JPEG (:func:`bqf_ray.sources.jpeg.jpeg_decode`
    — real Huffman+DCT decode), WAV PCM
    (:func:`bqf_ray.sources.codecs.wav_decode`).  Anything else
    raises ``NotImplementedError`` (the documented real-codec
    boundary for the remaining entropy-coded formats).

    Shapes: image → (h, w) or (h, w, ch) uint8; audio → (n,) or
    (n, ch) int; video (RAWM only) → (frames, h, w) uint8."""
    from bqf_ray.sources.codecs import PNG_MAGIC, png_decode, wav_decode

    if blob[:8] == PNG_MAGIC:
        img = png_decode(blob)
        h, w = img.shape[:2]
        return 0, w, h, 1, img
    if blob[:3] == b"\xff\xd8\xff":
        from bqf_ray.sources.jpeg import jpeg_decode
        img = jpeg_decode(blob)
        h, w = img.shape[:2]
        return 0, w, h, 1, img
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        samples, _rate = wav_decode(blob)
        n = samples.shape[0]
        ch = samples.shape[1] if samples.ndim > 1 else 1
        return 1, n, ch, 1, samples
    kind, w, h, frames, off = decode_header(blob)   # RAWM or raise
    data = np.frombuffer(blob, dtype=np.uint8, offset=off)
    if kind == 0:
        data = data[:w * h].reshape(h, w)
    elif kind == 2:
        data = data[:w * h * frames].reshape(frames, h, w)
    return kind, w, h, frames, data


def generate_media(n_rows: int, seed: int = 42,
                   real_formats: bool = False):
    """Deterministic media table → pyarrow.Table.

    ``real_formats=True`` emits images as REAL PNG and audio as REAL
    WAV PCM (pure-stdlib codecs, sources/codecs.py) built from the
    same deterministic pixel/sample generators — video stays RAWM
    (no public-stdlib video codec)."""
    import pyarrow as pa

    from bqf_ray.sources.codecs import png_encode, wav_encode

    rng = np.random.RandomState(seed)
    ids, kinds, blobs, mimes = [], [], [], []
    for i in range(n_rows):
        kind = int(rng.randint(0, 3))
        mime = _MIMES[KINDS[kind]]
        if kind == 0:          # image
            w, h, frames = int(rng.randint(16, 64)), int(rng.randint(16, 64)), 1
            payload = rng.randint(0, 256, w * h, dtype=np.int64).astype(np.uint8)
            if real_formats:
                blob = png_encode(payload.reshape(h, w))
                mime = "image/png"
            else:
                blob = encode_media(kind, w, h, frames, payload.tobytes())
        elif kind == 1:        # audio: 2*w samples, h=1
            w, h, frames = int(rng.randint(128, 1024)), 1, 1
            payload = rng.randint(0, 256, 2 * w, dtype=np.int64).astype(np.uint8)
            if real_formats:
                samples = (payload.astype(np.int64) * 257 - 32768
                           ).astype(np.int16)
                blob = wav_encode(samples, rate=16_000, bits=16)
                mime = "audio/wav"
                w = len(samples)        # decoded n_samples
            else:
                blob = encode_media(kind, w, h, frames, payload.tobytes())
        else:                  # video: frames of w*h
            w, h = int(rng.randint(8, 32)), int(rng.randint(8, 32))
            frames = int(rng.randint(2, 12))
            payload = rng.randint(0, 256, w * h * frames,
                                  dtype=np.int64).astype(np.uint8)
            blob = encode_media(kind, w, h, frames, payload.tobytes())
        ids.append(i)
        kinds.append(KINDS[kind])
        blobs.append(blob)
        mimes.append(mime)
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(blobs, pa.binary()),
        "mime": pa.array(mimes, pa.string()),
    })


def media_dataset(n_rows: int, seed: int = 42, parallelism: int = 4,
                  real_formats: bool = False):
    import ray
    import pyarrow as pa

    shard = max(64, n_rows // max(parallelism, 1))
    specs = [(min(shard, n_rows - s0), seed + 17 * (s0 // shard))
             for s0 in range(0, n_rows, shard)]
    spec_tbl = pa.table({"n": [n for n, _ in specs],
                         "seed": [sd for _, sd in specs]})

    def make(batch):
        out = [generate_media(int(n), int(sd), real_formats=real_formats)
               for n, sd in zip(batch["n"].to_pylist(), batch["seed"].to_pylist())]
        return pa.concat_tables(out)

    return (ray.data.from_arrow(spec_tbl).repartition(len(specs))
            .map_batches(make, batch_format="pyarrow", batch_size=1))
