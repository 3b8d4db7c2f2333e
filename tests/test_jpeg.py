"""Pure-stdlib baseline JPEG codec (sources/jpeg.py): exact roundtrip
on the block-constant class, bounded error on arbitrary images,
restart markers, color, scope rejections, and the decode_payload
dispatch."""
import numpy as np
import pytest

from bqf_ray.sources.jpeg import (jpeg_decode, jpeg_encode,
                                  quality_scale, QUANT_LUMA)


def _const_blocks(rng, nby, nbx):
    v = (rng.integers(0, 128, (nby, nbx)) * 2).astype(np.uint8)
    return np.repeat(np.repeat(v, 8, axis=0), 8, axis=1)


def test_block_constant_even_q50_is_lossless():
    # DC quant at q50 = Annex K verbatim = 16; constant block v has
    # DC = 8*(v-128), divisible by 16 for even v -> exact roundtrip
    assert quality_scale(QUANT_LUMA, 50)[0] == 16
    rng = np.random.default_rng(3)
    for _ in range(10):
        img = _const_blocks(rng, int(rng.integers(1, 7)),
                            int(rng.integers(1, 7)))
        assert (jpeg_decode(jpeg_encode(img, quality=50)) == img).all()


def test_block_constant_cropped_dims():
    # non-multiple-of-8 dims: encoder edge-pads, decoder crops back
    rng = np.random.default_rng(5)
    img = _const_blocks(rng, 4, 5)[:25, :33]
    out = jpeg_decode(jpeg_encode(img, quality=50))
    assert out.shape == (25, 33)
    assert (out == img).all()


def test_restart_markers_do_not_change_output():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (40, 48)).astype(np.uint8)
    base = jpeg_decode(jpeg_encode(img, quality=75))
    for ri in (1, 3, 7):
        blob = jpeg_encode(img, quality=75, restart_interval=ri)
        assert b"\xff\xd0" in blob or b"\xff\xd1" in blob
        assert (jpeg_decode(blob) == base).all()


def test_random_gray_bounded_error_and_deterministic():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (56, 72)).astype(np.uint8)
    blob = jpeg_encode(img, quality=90)
    out = jpeg_decode(blob)
    assert out.shape == img.shape
    # worst-case q90 error on white noise (every AC band active)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 48
    assert (jpeg_decode(blob) == out).all()      # decode deterministic


def test_smooth_gradients_small_error():
    x = np.linspace(0, 1, 96)
    img = (np.outer(x, x) * 255).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=85))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


def test_color_roundtrip_shapes_and_error():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (33, 41, 3)).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=95))
    assert out.shape == img.shape
    x = np.linspace(0, 1, 64)
    smooth = (np.outer(x, x)[..., None]
              * np.array([200.0, 120.0, 80.0])).astype(np.uint8)
    sout = jpeg_decode(jpeg_encode(smooth, quality=90))
    assert np.abs(sout.astype(int) - smooth.astype(int)).max() <= 16


def test_high_frequency_content_exercises_ac_paths():
    # sparse spikes -> long zero runs (ZRL) + many (run,size) symbols
    img = np.zeros((32, 32), dtype=np.uint8)
    img[::7, ::5] = 255
    out = jpeg_decode(jpeg_encode(img, quality=95))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 120


def test_quality_extremes():
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    for q in (1, 25, 100):
        out = jpeg_decode(jpeg_encode(img, quality=q))
        assert out.shape == img.shape
    # q100 quant tables are all ones -> tight roundtrip
    q100 = jpeg_decode(jpeg_encode(img, quality=100))
    assert np.abs(q100.astype(int) - img.astype(int)).max() <= 2


def test_scope_rejections():
    rng = np.random.default_rng(19)
    blob = jpeg_encode(rng.integers(0, 256, (16, 16)).astype(np.uint8))
    with pytest.raises(ValueError):
        jpeg_decode(b"\x00\x01not a jpeg")
    with pytest.raises(ValueError):
        jpeg_decode(blob[:len(blob) // 2])       # truncated stream
    # SOF2 is supported now: a baseline stream relabeled progressive
    # is a legal one-full-band-scan progressive file — same pixels
    prog = blob.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert (jpeg_decode(prog) == jpeg_decode(blob)).all()
    # arithmetic coding (SOF9) stays out of scope
    arith = blob.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(ValueError, match="arithmetic"):
        jpeg_decode(arith)
    with pytest.raises(ValueError):
        jpeg_encode(np.zeros((4, 4), dtype=np.float64))  # wrong dtype


def test_decode_payload_dispatch():
    from bqf_ray.sources.media import decode_payload
    rng = np.random.default_rng(23)
    img = _const_blocks(rng, 3, 4)
    kind, w, h, f, data = decode_payload(jpeg_encode(img, quality=50))
    assert (kind, w, h, f) == (0, 32, 24, 1)
    assert (data == img).all()


def test_decode_media_stage_handles_jpeg(ray_session):
    import pyarrow as pa
    import ray

    from bqf_ray.pipelines.multimodal import DecodeMedia
    rng = np.random.default_rng(29)
    blobs = [jpeg_encode(_const_blocks(rng, 2, 2), quality=50)
             for _ in range(10)] + [b"\xff\xd8\xffgarbage"]
    tbl = pa.table({"media_id": pa.array(range(11), pa.int64()),
                    "payload": pa.array(blobs, pa.binary())})
    out = (ray.data.from_arrow(tbl)
           .map_batches(DecodeMedia(), batch_format="pyarrow")
           .to_pandas().sort_values("media_id"))
    assert list(out["ok"]) == [True] * 10 + [False]
    assert (out["width"][:10] == 16).all()


import struct

from bqf_ray.sources.jpeg import (_BitWriter, _canonical_codes, _dht_segment,
                                  DC_LUMA_BITS, DC_LUMA_VALS, AC_LUMA_BITS,
                                  AC_LUMA_VALS, DC_CHROMA_BITS, DC_CHROMA_VALS,
                                  AC_CHROMA_BITS, AC_CHROMA_VALS, ZIGZAG,
                                  QUANT_LUMA, QUANT_CHROMA, _category,
                                  jpeg_decode)

def _build_420(y_val=160, cb_val=145, cr_val=128, w=16, h=16):
    ql, qc = QUANT_LUMA, QUANT_CHROMA
    out = bytearray(b"\xff\xd8")
    for tid, qt in enumerate([ql, qc]):
        out += (b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
                + bytes(qt[ZIGZAG].astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    sof += bytes([1, 0x22, 0])   # Y 2x2
    sof += bytes([2, 0x11, 1])   # Cb 1x1
    sof += bytes([3, 0x11, 1])   # Cr 1x1
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
    out += _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    wbits = _BitWriter()
    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    def dc_block(dcc, acc, diff):
        size = _category(diff)
        code, ln = dcc[size]; wbits.write(code, ln)
        if size:
            wbits.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
        code, ln = acc[0x00]; wbits.write(code, ln)      # EOB
    qy = round(8 * (y_val - 128) / ql[0])
    qcb = round(8 * (cb_val - 128) / qc[0])
    qcr = round(8 * (cr_val - 128) / qc[0])
    # one MCU: 4 Y blocks (DC pred within component), then Cb, Cr
    dc_block(dc_l, ac_l, qy)
    for _ in range(3):
        dc_block(dc_l, ac_l, 0)
    dc_block(dc_c, ac_c, qcb)
    dc_block(dc_c, ac_c, qcr)
    wbits.flush()
    out += wbits.out + b"\xff\xd9"
    # expected decoded YCbCr values (exact integer path)
    ey = qy * ql[0] / 8 + 128
    ecb = qcb * qc[0] / 8 + 128
    ecr = qcr * qc[0] / 8 + 128
    return bytes(out), ey, ecb, ecr



def test_420_subsampled_chroma_decode_exact():
    """Hand-built 4:2:0 color JPEG (one 16x16 MCU: 2x2 Y blocks +
    subsampled Cb/Cr) — constant DC-only blocks with quant-divisible
    values make the decode exactly computable, exercising the
    sampling-factor MCU loop and the replication upsample that the
    4:4:4-only encoder never produces."""
    blob, ey, ecb, ecr = _build_420()
    img = jpeg_decode(blob)
    r = ey + 1.402 * (ecr - 128)
    g = ey - 0.344136 * (ecb - 128) - 0.714136 * (ecr - 128)
    b = ey + 1.772 * (ecb - 128)
    exp = np.clip(np.rint([r, g, b]), 0, 255).astype(np.uint8)
    assert img.shape == (16, 16, 3)
    assert (img == exp).all()


def test_progressive_equals_baseline_decode():
    """Spectral-selection progressive carries the SAME quantized
    coefficients as the baseline stream — the two independent
    bitstream paths must decode bit-identically."""
    rng = np.random.default_rng(31)
    for shape in [(16, 16), (40, 56), (25, 33), (24, 33, 3)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        base = jpeg_decode(jpeg_encode(img, quality=80))
        prog = jpeg_decode(jpeg_encode(img, quality=80,
                                       progressive=True))
        assert (base == prog).all(), shape


def test_progressive_block_constant_lossless():
    rng = np.random.default_rng(37)
    img = _const_blocks(rng, 3, 5)
    out = jpeg_decode(jpeg_encode(img, quality=50, progressive=True))
    assert (out == img).all()


def test_progressive_restart_unsupported():
    with pytest.raises(ValueError, match="restart"):
        jpeg_encode(np.zeros((8, 8), dtype=np.uint8),
                    progressive=True, restart_interval=2)


def _hand_progressive(ahal=0):
    """Minimal hand-built progressive gray JPEG: 4 blocks, DC scan +
    one AC band scan whose tail is an EOBn run of 3 (r=1 + 1 extra
    bit) — the progressive-only Huffman path the encoder (which
    flushes per-block EOBs) never emits."""
    from bqf_ray.sources.jpeg import (_BitWriter, _canonical_codes,
                                      _dht_segment, DC_LUMA_BITS,
                                      DC_LUMA_VALS, ZIGZAG, QUANT_LUMA,
                                      _category)
    w, h = 32, 8
    ql = QUANT_LUMA
    out = bytearray(b"\xff\xd8")
    out += (b"\xff\xdb" + struct.pack(">H", 67) + bytes([0])
            + bytes(ql[ZIGZAG].astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    AC_BITS = [0, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    AC_VALS = [0x00, 0x10, 0x01]
    out += _dht_segment(1, 0, AC_BITS, AC_VALS)
    dc_codes = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    wb = _BitWriter()
    pred = 0
    for qdc in (4, 4, 4, 4):
        diff = qdc - pred
        size = _category(diff)
        c, ln = dc_codes[size]
        wb.write(c, ln)
        if size:
            wb.write(diff if diff >= 0 else diff + (1 << size) - 1,
                     size)
        pred = qdc
    wb.flush()
    sos = bytes([1, 1, 0x00, 0, 0, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos + wb.out
    wb = _BitWriter()
    c, ln = ac_codes[0x01]
    wb.write(c, ln)
    wb.write(1, 1)                       # block0: zz[1] = +1
    c, ln = ac_codes[0x00]
    wb.write(c, ln)                      # EOB block0
    c, ln = ac_codes[0x10]
    wb.write(c, ln)
    wb.write(1, 1)                       # EOBRUN = 3 (blocks 1-3)
    wb.flush()
    sos = bytes([1, 1, 0x00, 1, 63, ahal])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos + wb.out
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_eobrun_hand_built_exact():
    from bqf_ray.sources.jpeg import _idct_blocks, ZIGZAG, QUANT_LUMA
    img = jpeg_decode(_hand_progressive())
    assert img.shape == (8, 32)
    deq = np.zeros((2, 8, 8))
    deq[0].flat[0] = 4 * 16              # flat block (DC only)
    deq[1].flat[0] = 4 * 16
    deq[1].flat[ZIGZAG[1]] = QUANT_LUMA[1]   # block0's AC ripple
    exp = np.clip(np.rint(_idct_blocks(deq)), 0, 255).astype(np.uint8)
    assert (img[:, 0:8] == exp[1]).all()
    for x0 in (8, 16, 24):               # EOBRUN-skipped: flat
        assert (img[:, x0:x0 + 8] == exp[0]).all()


def test_first_pass_point_transform_shifts():
    """An AC first pass at Al=1 (ahal=0x01) stores values << 1 — the
    successive-approximation point transform the decoder now honors."""
    from bqf_ray.sources.jpeg import _idct_blocks, ZIGZAG, QUANT_LUMA
    img = jpeg_decode(_hand_progressive(ahal=0x01))
    deq = np.zeros((2, 8, 8))
    deq[0].flat[0] = 4 * 16
    deq[1].flat[0] = 4 * 16
    deq[1].flat[ZIGZAG[1]] = 2 * QUANT_LUMA[1]   # +1 shifted by Al=1
    exp = np.clip(np.rint(_idct_blocks(deq)), 0, 255).astype(np.uint8)
    assert (img[:, 0:8] == exp[1]).all()
    assert (img[:, 8:16] == exp[0]).all()


def test_successive_approximation_equals_baseline():
    """Successive-approximation progressive (first passes at Al=N +
    refinement chains down to Al=0) carries the same final quantized
    coefficients as the baseline stream — bit-identical decodes, over
    1-3 refinement levels, gray + color + pathological content."""
    rng = np.random.default_rng(43)
    imgs = [rng.integers(0, 256, (40, 56)).astype(np.uint8),
            rng.integers(0, 256, (25, 34, 3)).astype(np.uint8),
            _const_blocks(rng, 3, 4)]
    spikes = np.zeros((32, 32), dtype=np.uint8)
    spikes[::7, ::5] = 255                    # long runs + ZRL refines
    imgs.append(spikes)
    for img in imgs:
        base = jpeg_decode(jpeg_encode(img, quality=85))
        for levels in (1, 2, 3):
            sa = jpeg_decode(jpeg_encode(img, quality=85,
                                         successive=levels))
            assert (base == sa).all(), (img.shape, levels)


def test_successive_block_constant_q50_lossless():
    rng = np.random.default_rng(47)
    img = _const_blocks(rng, 4, 4)
    out = jpeg_decode(jpeg_encode(img, quality=50, successive=2))
    assert (out == img).all()


def test_corrupt_streams_always_raise_valueerror():
    """Crawl-data hardening: ANY structural corruption must surface as
    ValueError — a bare IndexError/KeyError escaping the parser would
    kill a whole decode job instead of one row (DecodeMedia catches
    only the enumerated decode errors).  Seeded byte flips + splices
    over all bitstream modes."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    blobs = [jpeg_encode(img, 80),
             jpeg_encode(img, 80, progressive=True),
             jpeg_encode(img, 80, successive=2)]
    for blob in blobs:
        b = bytearray(blob)
        for t in range(600):
            if t % 5 == 0 and len(b) > 20:
                i = int(rng.integers(2, len(b) - 8))
                repl = bytes(rng.integers(0, 256,
                                          int(rng.integers(1, 8))))
                test = bytes(b[:i]) + repl + bytes(b[i + len(repl):])
            else:
                i = int(rng.integers(2, len(b)))
                test = (bytes(b[:i])
                        + bytes([int(rng.integers(0, 256))])
                        + bytes(b[i + 1:]))
            try:
                out = jpeg_decode(test)
                assert out.dtype == np.uint8      # or a valid image
            except ValueError:
                pass


def test_implausible_dimensions_raise_not_allocate():
    # corrupt 65535x65535 dims must raise before allocating GBs
    blob = bytearray(jpeg_encode(np.zeros((8, 8), dtype=np.uint8)))
    i = blob.index(b"\xff\xc0") + 5
    blob[i:i + 4] = (65535).to_bytes(2, "big") * 2
    with pytest.raises(ValueError, match="implausible"):
        jpeg_decode(bytes(blob))


def test_property_roundtrip_arbitrary_shapes():
    """Hypothesis-style property sweep (seeded, bounded for CI): any
    uint8 image shape/quality/mode roundtrips to the right shape with
    decode error bounded by the quality's quantization envelope."""
    try:
        from hypothesis import given, settings, strategies as st
    except ImportError:
        pytest.skip("hypothesis unavailable")

    @settings(max_examples=40, deadline=None)
    @given(h=st.integers(1, 40), w=st.integers(1, 40),
           color=st.booleans(), q=st.integers(30, 95),
           mode=st.sampled_from(["base", "prog", "sa1", "sa2"]),
           seed=st.integers(0, 2**31 - 1))
    def check(h, w, color, q, mode, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w, 3) if color else (h, w)
        img = rng.integers(0, 256, shape).astype(np.uint8)
        kw = {"base": {}, "prog": {"progressive": True},
              "sa1": {"successive": 1}, "sa2": {"successive": 2}}[mode]
        out = jpeg_decode(jpeg_encode(img, quality=q, **kw))
        assert out.shape == img.shape
        assert out.dtype == np.uint8
        # all four modes carry identical coefficients
        base = jpeg_decode(jpeg_encode(img, quality=q))
        assert (out == base).all()

    check()
