"""Multimodal column plumbing: BinaryType payloads, mapInPandas
decode/featurize batch shapes, resize/frame-sample stages, and the
strict-mode codec gate (SURVEY.md §2 extensions / BASELINE.json
north star)."""

import pytest

from pyspark.sql import functions as F

from rakam_api_spark.llm.multimodal import (
    FEATURE_SCHEMA,
    decode_and_featurize,
    frame_sample_stub,
    resize_stub,
    synthesize_media,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, SF).cache()


def test_media_schema_and_types(media):
    dt = dict(media.dtypes)
    assert dt["payload"] == "binary"
    assert dt["meta"] == "map<string,string>"
    assert set(
        r["media_type"] for r in media.select("media_type").distinct().collect()
    ) == {"image", "audio", "video"}


def test_decode_featurize_deterministic(media):
    out = decode_and_featurize(media, dim=8)
    assert out.schema == FEATURE_SCHEMA
    rows = {r["asset_id"]: r for r in out.collect()}
    again = {r["asset_id"]: r for r in decode_and_featurize(media, dim=8).collect()}
    assert rows.keys() == again.keys()
    some = next(iter(rows))
    assert rows[some]["feature"] == again[some]["feature"]  # deterministic stub
    assert len(rows[some]["feature"]) == 8
    assert all(0.0 <= x <= 1.0 for x in rows[some]["feature"])
    # byte_len matches the source payload length
    src = {r["asset_id"]: len(r["payload"]) for r in media.collect()}
    assert all(rows[a]["byte_len"] == n for a, n in src.items())


def test_decode_strict_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|codecs unavailable"):
        decode_and_featurize(media, strict=True).collect()


def test_resize_records_dims(media):
    out = resize_stub(media, width=64, height=48)
    r = out.select("meta").first()["meta"]
    assert r["resize"] == "64x48"
    # payload untouched
    assert out.select(F.sum(F.octet_length("payload"))).first()[0] == media.select(
        F.sum(F.octet_length("payload"))
    ).first()[0]


def test_frame_sample_video_only(media):
    frames = frame_sample_stub(media, every_n=30)
    vids = {r["asset_id"] for r in media.where("media_type = 'video'").collect()}
    got = frames.collect()
    assert {r["asset_id"] for r in got} <= vids
    assert all(r["frame_no"] % 30 == 0 for r in got)
    # payload column is pruned from the exploded rows
    assert "payload" not in frames.columns


def _bmp_bytes(w=4, h=2, rgb=(255, 128, 0)):
    """Minimal uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB)."""
    import struct

    stride = ((w * 3 + 3) // 4) * 4
    row = (bytes(rgb[::-1]) * w).ljust(stride, b"\0")  # BGR + pad
    px = row * h
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(px), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 2835, 2835, 0, 0)
    return header + px


def _ppm_bytes(w=3, h=2, rgb=(10, 20, 30)):
    return (f"P6\n# comment\n{w} {h}\n255\n").encode() + bytes(rgb) * (w * h)


def _wav_bytes(rate=8000, n=64):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(
            b"".join(
                struct.pack("<h", int(16384 * math.sin(2 * math.pi * 440 * i / rate)))
                for i in range(n)
            )
        )
    return buf.getvalue()


def test_real_stdlib_decoders():
    """No external codecs needed: BMP/PPM via struct+numpy, WAV via
    the stdlib wave module — real width/height/channel means and
    sample-rate/RMS, not stubs."""
    from rakam_api_spark.llm.multimodal import decode_audio_bytes, decode_image_bytes

    w, h, nch, rgb = decode_image_bytes(_bmp_bytes(w=5, h=3, rgb=(200, 100, 50)))
    assert (w, h, nch) == (5, 3, 3)
    assert rgb == [200.0, 100.0, 50.0]

    w, h, nch, rgb = decode_image_bytes(_ppm_bytes(w=3, h=2, rgb=(10, 20, 30)))
    assert (w, h, nch) == (3, 2, 3)
    assert rgb == [10.0, 20.0, 30.0]

    rate, nch, nframes, rms, peak = decode_audio_bytes(_wav_bytes(rate=8000, n=64))
    assert (rate, nch, nframes) == (8000, 1, 64)
    assert 0.0 < rms < peak <= 0.5001

    assert decode_image_bytes(b"not an image at all") is None
    assert decode_audio_bytes(b"not audio") is None


def test_decode_kernel_real_payloads_end_to_end(spark):
    """Planted real payloads flow through the same mapInPandas kernel
    as the corpus: decoded rows carry the decoded flag (feature[0]
    == 1.0) and real properties; undecodable rows fall back."""
    from rakam_api_spark.llm.multimodal import MEDIA_SCHEMA, decode_and_featurize

    rows = [
        (1, "image", bytearray(_bmp_bytes(w=4, h=2)), {}),
        (2, "image", bytearray(_ppm_bytes()), {}),
        (3, "audio", bytearray(_wav_bytes()), {}),
        (4, "video", bytearray(b"\x00\x01\x02opaque-container"), {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["asset_id"]: r for r in decode_and_featurize(media, dim=8).collect()}
    assert out[1]["feature"][0] == 1.0 and abs(out[1]["feature"][1] - 4 / 65535) < 1e-6
    assert out[2]["feature"][0] == 1.0
    assert out[3]["feature"][0] == 1.0 and abs(out[3]["feature"][1] - 8000 / 192000) < 1e-6
    assert out[4]["feature"][0] < 1.0  # fallback pseudo-feature
    # strict mode: decodable rows pass, the video row raises
    import pytest as _pytest

    with _pytest.raises(Exception, match="no decoder|codecs unavailable"):
        decode_and_featurize(media, strict=True).collect()
    decodable = media.where("media_type <> 'video'")
    strict_ok = decode_and_featurize(decodable, strict=True).collect()
    assert len(strict_ok) == 3 and all(r["feature"][0] == 1.0 for r in strict_ok)


def _png_bytes(pixels, ctype, filters, palette=None, depth=8):
    """Minimal PNG encoder for tests: ``pixels`` is an (h, w, nch)
    array (uint8 for depth 8, uint16 for depth 16; nch per color
    type), one filter type per row from ``filters`` applied per the
    spec's forward direction — so the decoder's reconstruction of
    every filter type is exercised.  Filters run on BYTES with the
    spec's bpp offset, which is what makes the same loop serve both
    depths."""
    import struct
    import zlib

    import numpy as np

    if depth == 16:
        px = np.asarray(pixels, dtype=np.uint16)
        h, w, nch = px.shape
        byts = np.empty((h, w, nch, 2), np.uint8)
        byts[..., 0] = (px >> 8).astype(np.uint8)
        byts[..., 1] = (px & 0xFF).astype(np.uint8)
        flat = byts.reshape(h, w * nch * 2).astype(np.int32)
        bpp = nch * 2
    else:
        px = np.asarray(pixels, dtype=np.uint8)
        h, w, nch = px.shape
        flat = px.reshape(h, w * nch).astype(np.int32)
        bpp = nch
    stride = flat.shape[1]
    raw = bytearray()
    for y, ftype in zip(range(h), filters):
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, np.int32)
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]]) if stride > bpp else np.zeros(stride, np.int32)
        ul = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]]) if stride > bpp else np.zeros(stride, np.int32)
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            enc = (cur - left) % 256
        elif ftype == 2:
            enc = (cur - prev) % 256
        elif ftype == 3:
            enc = (cur - ((left + prev) >> 1)) % 256
        else:  # 4: Paeth
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            enc = (cur - pred) % 256
        raw.append(ftype)
        raw.extend(enc.astype(np.uint8).tobytes())

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(palette))
    out += chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    return out


def test_png_stdlib_decode_all_filters():
    """Every PNG filter type reconstructs exactly: a 5-row RGB image
    with one row per filter type round-trips to the exact channel
    means."""
    import numpy as np

    from rakam_api_spark.llm.multimodal import decode_image_bytes, decode_png_bytes

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    b = _png_bytes(px, ctype=2, filters=[0, 1, 2, 3, 4])
    got = decode_png_bytes(b)
    assert got is not None
    w, h, nch, rgb = got
    assert (w, h, nch) == (6, 5, 3)
    want = px.reshape(-1, 3).mean(axis=0)
    assert all(abs(a - e) < 1e-9 for a, e in zip(rgb, want))
    assert decode_image_bytes(b) == got  # dispatch reaches the PNG path


def test_png_stdlib_decode_color_types():
    import numpy as np

    from rakam_api_spark.llm.multimodal import decode_png_bytes

    # grayscale (ctype 0): luma replicated to RGB
    g = np.full((3, 4, 1), 77, dtype=np.uint8)
    assert decode_png_bytes(_png_bytes(g, 0, [0, 1, 2])) == (4, 3, 1, [77.0, 77.0, 77.0])
    # RGBA (ctype 6): alpha excluded from means
    rgba = np.zeros((2, 2, 4), dtype=np.uint8)
    rgba[..., 0], rgba[..., 3] = 200, 9
    w, h, nch, rgb = decode_png_bytes(_png_bytes(rgba, 6, [0, 4]))
    assert (w, h, nch) == (2, 2, 4) and rgb == [200.0, 0.0, 0.0]
    # palette (ctype 3): indices resolved through PLTE
    idx = np.array([[[0], [1]], [[1], [0]]], dtype=np.uint8)
    pal = bytes([10, 20, 30, 50, 60, 70])
    w, h, nch, rgb = decode_png_bytes(_png_bytes(idx, 3, [0, 0], palette=pal))
    assert (w, h, nch) == (2, 2, 3) and rgb == [30.0, 40.0, 50.0]
    # a LYING header (depth byte flipped to 16 over 8-bit data) fails
    # the stride check → None, never garbage
    bad = bytearray(_png_bytes(g, 0, [0, 0, 0]))
    bad[24] = 16  # IHDR bit-depth byte
    assert decode_png_bytes(bytes(bad)) is None


def _png_adam7_bytes(pixels, ctype):
    """Adam7-interlaced PNG encoder for tests: 8-bit only; each pass
    encodes as its own filtered sub-image (filter types rotate per
    row so pass-local reconstruction is exercised)."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, nch = px.shape
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = px[y0::dy, x0::dx, :]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        stride = pw * nch
        flat = sub.reshape(ph, stride).astype(np.int32)
        for y in range(ph):
            ftype = (y + x0) % 5
            cur = flat[y]
            prev = flat[y - 1] if y > 0 else np.zeros(stride, np.int32)
            left = np.concatenate([np.zeros(nch, np.int32), cur[:-nch]]) if stride > nch else np.zeros(stride, np.int32)
            ul = np.concatenate([np.zeros(nch, np.int32), prev[:-nch]]) if stride > nch else np.zeros(stride, np.int32)
            if ftype == 0:
                enc = cur
            elif ftype == 1:
                enc = (cur - left) % 256
            elif ftype == 2:
                enc = (cur - prev) % 256
            elif ftype == 3:
                enc = (cur - ((left + prev) >> 1)) % 256
            else:
                p = left + prev - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
                pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
                enc = (cur - pred) % 256
            raw.append(ftype)
            raw.extend(enc.astype(np.uint8).tobytes())

    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + struct.pack(">I", zlib.crc32(typ + data))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1)  # interlace=1
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_stdlib_decode_adam7():
    """Adam7-interlaced PNGs decode exactly: every pixel reaches its
    final grid position through the 7 scattered passes, including
    images small enough that some passes are empty."""
    import numpy as np

    from rakam_api_spark.llm.multimodal import decode_png_bytes

    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, size=(9, 10, 3), dtype=np.uint8)
    got = decode_png_bytes(_png_adam7_bytes(px, ctype=2))
    assert got is not None
    w, h, nch, rgb = got
    assert (w, h, nch) == (10, 9, 3)
    want = px.reshape(-1, 3).mean(axis=0)
    assert all(abs(a - e) < 1e-9 for a, e in zip(rgb, want))
    # tiny image: passes 1-2 cover it, later passes partially empty
    tiny = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    w, h, nch, rgb = decode_png_bytes(_png_adam7_bytes(tiny, ctype=2))
    assert (w, h, nch) == (3, 2, 3)
    want = tiny.reshape(-1, 3).mean(axis=0)
    assert all(abs(a - e) < 1e-9 for a, e in zip(rgb, want))


def test_png_stdlib_decode_16bit():
    """REAL 16-bit PNGs decode in-repo (formerly the PIL-gated path):
    filters operate on bytes with the doubled bpp offset, samples
    combine big-endian, and means land on the 0-255 scale every
    decoder reports (x/257 maps 0xFFFF -> 255 exactly)."""
    import numpy as np

    from rakam_api_spark.llm.multimodal import decode_image_bytes, decode_png_bytes

    # grayscale 16-bit: constant 0x8080 -> 128.0 exactly (0x8080/257)
    g16 = np.full((3, 4, 1), 0x8080, dtype=np.uint16)
    got = decode_png_bytes(_png_bytes(g16, 0, [0, 1, 2], depth=16))
    assert got == (4, 3, 1, [128.0, 128.0, 128.0])
    # RGB 16-bit through every filter type, random data: exact means
    rng = np.random.default_rng(11)
    px = rng.integers(0, 65536, size=(5, 6, 3), dtype=np.uint16)
    b = _png_bytes(px, 2, [0, 1, 2, 3, 4], depth=16)
    w, h, nch, rgb = decode_png_bytes(b)
    assert (w, h, nch) == (6, 5, 3)
    want = (px.reshape(-1, 3).astype(np.float64) / 257.0).mean(axis=0)
    assert all(abs(a - e) < 1e-9 for a, e in zip(rgb, want))
    assert decode_image_bytes(b) == (w, h, nch, rgb)  # dispatch reaches it
    # RGBA 16-bit: alpha excluded from the means
    rgba = np.zeros((2, 2, 4), dtype=np.uint16)
    rgba[..., 0], rgba[..., 3] = 0xFFFF, 7
    w, h, nch, rgb = decode_png_bytes(_png_bytes(rgba, 6, [0, 4], depth=16))
    assert (w, h, nch) == (2, 2, 4) and rgb == [255.0, 0.0, 0.0]


def test_png_decodes_in_strict_pipeline(spark):
    """The round-4 PIL-gated skip is closed: a planted PNG payload
    decodes for real (feature[0] == 1.0) and survives strict mode
    without PIL."""
    import numpy as np

    from rakam_api_spark.llm.multimodal import MEDIA_SCHEMA

    px = np.full((4, 6, 3), 128, dtype=np.uint8)
    rows = [(1, "image", bytearray(_png_bytes(px, 2, [0, 1, 2, 4])), {})]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = decode_and_featurize(media, strict=True, dim=8).collect()
    assert len(out) == 1
    f = out[0]["feature"]
    assert f[0] == 1.0
    assert abs(f[1] - 6 / 65535) < 1e-6 and abs(f[2] - 4 / 65535) < 1e-6
    assert abs(f[4] - 128 / 255) < 1e-6


def test_pil_compressed_decode_where_available():
    """PIL path (optional dependency): skips in containers without
    it; where PIL exists, compressed formats decode for real."""
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    from rakam_api_spark.llm.multimodal import decode_image_bytes

    buf = io.BytesIO()
    Image.new("RGB", (6, 4), (1, 2, 3)).save(buf, format="PNG")
    w, h, nch, rgb = decode_image_bytes(buf.getvalue())
    assert (w, h) == (6, 4)
    assert rgb == [1.0, 2.0, 3.0]


# --- baseline JPEG (pure numpy decoder; fixtures hand-assembled) ---------
#
# No JPEG encoder exists in this container, so the fixtures are
# assembled marker-by-marker with DC-only blocks.  That makes the
# expected pixel values ANALYTIC (independent of the decoder's own
# IDCT): a DC-only block with dequantized coefficient D decodes to a
# constant plane D/8 + 128 (T.81 §A.3.3 with the orthonormal DCT).


class _BitPacker:
    def __init__(self):
        self.bits = []

    def put(self, value, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def put_code(self, s):
        for c in s:
            self.bits.append(int(c))

    def tobytes(self):
        bits = self.bits + [1] * (-len(self.bits) % 8)  # pad with 1s
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for bit in bits[i : i + 8]:
                byte = (byte << 1) | bit
            out.append(byte)
        # entropy-coded FF bytes must be stuffed with 00
        return bytes(out).replace(b"\xff", b"\xff\x00")


def _seg(marker, payload):
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dqt_unit():
    return _seg(0xDB, bytes([0x00]) + bytes([1] * 64))


def _dht(cls, tid, counts, symbols):
    c = [0] * 16
    for length, n in counts.items():
        c[length - 1] = n
    return _seg(0xC4, bytes([cls << 4 | tid]) + bytes(c) + bytes(symbols))


def _jpeg_gray_fixture(dc=32, dri=None, width=8):
    """width//8 MCUs of a DC-only grayscale block; every pixel is
    dc/8 + 128.  DC symbols {cat,0} at len 2 (codes 00, 01), AC table
    is a single EOB symbol at len 1 (code 0)."""
    cat = dc.bit_length()
    out = b"\xff\xd8" + _dqt_unit()
    out += _seg(0xC0, bytes([8]) + (8).to_bytes(2, "big") + width.to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    out += _dht(0, 0, {2: 2}, [cat, 0])
    out += _dht(1, 0, {1: 1}, [0x00])
    if dri is not None:
        out += _seg(0xDD, dri.to_bytes(2, "big"))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    n_mcu = width // 8
    pk = _BitPacker()
    pk.put_code("00")  # DC cat symbol
    pk.put(dc, cat)    # positive diff: magnitude bits as-is
    pk.put_code("0")   # EOB
    data = pk.tobytes()
    for i in range(1, n_mcu):
        if dri:
            # restart: byte-aligned RSTn, DC predictor resets, so the
            # next MCU re-encodes the same absolute DC as a fresh diff
            data += bytes([0xFF, 0xD0 + (i - 1) % 8])
            pk2 = _BitPacker()
            pk2.put_code("00")
            pk2.put(dc, cat)
            pk2.put_code("0")
            data += pk2.tobytes()
        else:
            pk3 = _BitPacker()
            pk3.put_code("01")  # DC cat 0 (diff 0)
            pk3.put_code("0")   # EOB
            data += pk3.tobytes()
    return out + data + b"\xff\xd9"


def _jpeg_color_420_fixture(dc_y=16, dc_cb=-64, dc_cr=80):
    """One 16x16 4:2:0 MCU, DC-only: Y/Cb/Cr are constant planes
    dc/8 + 128.  DC symbols at len 2: codes 00->cat(y), 01->0,
    10->7 (chroma cats); AC EOB at len 1."""
    cat_y = dc_y.bit_length()
    out = b"\xff\xd8" + _dqt_unit()
    out += _seg(
        0xC0,
        bytes([8]) + (16).to_bytes(2, "big") + (16).to_bytes(2, "big")
        + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    out += _dht(0, 0, {2: 3}, [cat_y, 0, 7])
    out += _dht(1, 0, {1: 1}, [0x00])
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    pk = _BitPacker()
    pk.put_code("00")
    pk.put(dc_y, cat_y)
    pk.put_code("0")
    for _ in range(3):  # remaining Y blocks: diff 0
        pk.put_code("01")
        pk.put_code("0")
    for dc in (dc_cb, dc_cr):
        pk.put_code("10")  # cat 7
        enc = dc if dc >= 0 else dc + (1 << 7) - 1
        pk.put(enc, 7)
        pk.put_code("0")
    return out + pk.tobytes() + b"\xff\xd9"


def _jpeg_progressive_gray_2blk_fixture():
    """16×8 grayscale PROGRESSIVE (SOF2) fixture, two 8×8 blocks,
    exercising all four scan kinds: DC first (Al=1), DC refinement,
    AC first (Al=1) with zero-runs, AC refinement with correction
    bits.  Expected coefficients (quant 1): block1 DC=33, AC(z1)=7,
    AC(z3)=2; block2 DC=48 — mean = ((33+48)/2)/8 + 128 = 133.0625
    (AC terms have zero mean; a bit-accounting error desyncs block2's
    DC and shifts the mean)."""
    out = b"\xff\xd8" + _dqt_unit()
    out += _seg(0xC2, bytes([8]) + (8).to_bytes(2, "big") + (16).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    out += _dht(0, 0, {2: 2}, [5, 4])        # DC cats: '00'->5, '01'->4
    out += _dht(1, 0, {2: 3}, [0x00, 0x02, 0x11])  # AC: '00'->EOB, '01'->(0,2), '10'->(1,1)
    # scan 1: DC first, Al=1 — diffs 16 (cat5) then 8 (cat4)
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
    pk = _BitPacker()
    pk.put_code("00"); pk.put(16, 5)   # block1: pred 16 -> coef 32
    pk.put_code("01"); pk.put(8, 4)    # block2: pred 24 -> coef 48
    out += pk.tobytes()
    # scan 2: DC refinement, Ah=1 Al=0 — one raw bit per block
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
    pk = _BitPacker()
    pk.put_code("1")  # block1: 32|1 = 33
    pk.put_code("0")  # block2: stays 48
    out += pk.tobytes()
    # scan 3: AC first, band 1..63, Al=1
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
    pk = _BitPacker()
    pk.put_code("01"); pk.put(3, 2)    # block1 z1: 3<<1 = 6
    pk.put_code("10"); pk.put(1, 1)    # run 1 -> z3: 1<<1 = 2
    pk.put_code("00")                  # EOB
    pk.put_code("00")                  # block2: EOB immediately
    out += pk.tobytes()
    # scan 4: AC refinement, Ah=1 Al=0
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
    pk = _BitPacker()
    pk.put_code("00")   # EOB0 (eobrun covers this block's tail)
    pk.put_code("1")    # correction bit z1: 6 -> 7
    pk.put_code("0")    # correction bit z3: 2 stays
    pk.put_code("00")   # block2: EOB0, no nonzero history
    out += pk.tobytes()
    return out + b"\xff\xd9"


def _jpeg_progressive_gray_eobrun_fixture():
    """32×8 progressive fixture (4 blocks) whose AC first scan uses a
     2-block EOB RUN (EOB1 + 1 extra bit): miscounting the run
    desyncs the 4th block's symbols.  DCs 16/24/16/32 → mean
    130.75 exactly."""
    out = b"\xff\xd8" + _dqt_unit()
    out += _seg(0xC2, bytes([8]) + (8).to_bytes(2, "big") + (32).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    out += _dht(0, 0, {2: 2}, [5, 4])
    out += _dht(1, 0, {2: 3}, [0x00, 0x02, 0x10])  # '10' -> EOB1 (r=1,s=0)
    # DC first, Al=0: diffs +16 (cat5), +8 (cat4), -8 (cat4), +16 (cat5)
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    pk = _BitPacker()
    pk.put_code("00"); pk.put(16, 5)
    pk.put_code("01"); pk.put(8, 4)
    pk.put_code("01"); pk.put(-8 + (1 << 4) - 1, 4)  # negative diff encoding
    pk.put_code("00"); pk.put(16, 5)
    out += pk.tobytes()
    # AC first, Al=0: block1 one AC then EOB1(+1) covering blocks 2-3
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    pk = _BitPacker()
    pk.put_code("01"); pk.put(3, 2)  # block1 z1 = 3
    pk.put_code("10"); pk.put(1, 1)  # EOB1 + extra bit 1 -> run of 2 blocks
    pk.put_code("00")                # block4: EOB0
    out += pk.tobytes()
    return out + b"\xff\xd9"


def test_jpeg_progressive_all_scan_kinds():
    from rakam_api_spark.llm.multimodal import decode_image_bytes, decode_jpeg_bytes

    b = _jpeg_progressive_gray_2blk_fixture()
    got = decode_jpeg_bytes(b)
    assert got is not None
    w, h, nch, rgb = got
    assert (w, h, nch) == (16, 8, 1)
    # mean is DC-only: ((33 + 48)/2)/8 + 128
    assert abs(rgb[0] - 133.0625) < 1e-9
    assert decode_image_bytes(b) == got  # dispatch reaches progressive


def test_jpeg_progressive_eob_run_spans_blocks():
    from rakam_api_spark.llm.multimodal import decode_jpeg_bytes

    got = decode_jpeg_bytes(_jpeg_progressive_gray_eobrun_fixture())
    assert got is not None
    w, h, nch, rgb = got
    assert (w, h, nch) == (32, 8, 1)
    assert abs(rgb[0] - 130.75) < 1e-9  # (16+24+16+32)/4/8 + 128


def test_jpeg_progressive_truncation_returns_none():
    from rakam_api_spark.llm.multimodal import decode_jpeg_bytes

    b = _jpeg_progressive_gray_2blk_fixture()
    # truncating inside scan data must not crash
    for cut in (len(b) - 4, len(b) // 2, 30):
        r = decode_jpeg_bytes(b[:cut])
        assert r is None or isinstance(r, tuple)


def test_jpeg_baseline_gray():
    from rakam_api_spark.llm.multimodal import decode_jpeg_bytes

    w, h, nch, rgb = decode_jpeg_bytes(_jpeg_gray_fixture(dc=32))
    assert (w, h, nch) == (8, 8, 1)
    assert abs(rgb[0] - 132.0) < 1e-6 and rgb[0] == rgb[1] == rgb[2]


def test_jpeg_baseline_gray_negative_dc():
    from rakam_api_spark.llm.multimodal import decode_jpeg_bytes

    # cat(−24)=5; encoded magnitude is v + 2^5 − 1 = 7
    fix = _jpeg_gray_fixture(dc=32)

    # build a dedicated fixture: DC −24 → pixels 125
    cat = 5
    out = b"\xff\xd8" + _dqt_unit()
    out += _seg(0xC0, bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    out += _dht(0, 0, {2: 2}, [cat, 0])
    out += _dht(1, 0, {1: 1}, [0x00])
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    pk = _BitPacker()
    pk.put_code("00")
    pk.put(-24 + (1 << cat) - 1, cat)
    pk.put_code("0")
    out += pk.tobytes() + b"\xff\xd9"
    w, h, nch, rgb = decode_jpeg_bytes(out)
    assert (w, h, nch) == (8, 8, 1)
    assert abs(rgb[0] - 125.0) < 1e-6
    assert decode_jpeg_bytes(fix)[3][0] > rgb[0]


def test_jpeg_baseline_color_420():
    from rakam_api_spark.llm.multimodal import decode_jpeg_bytes

    w, h, nch, rgb = decode_jpeg_bytes(_jpeg_color_420_fixture())
    assert (w, h, nch) == (16, 16, 3)
    y, cb, cr = 130.0, 120.0, 138.0
    exp_r = y + 1.402 * (cr - 128.0)
    exp_g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    exp_b = y + 1.772 * (cb - 128.0)
    assert abs(rgb[0] - exp_r) < 1e-6
    assert abs(rgb[1] - exp_g) < 1e-6
    assert abs(rgb[2] - exp_b) < 1e-6


def test_jpeg_restart_interval():
    from rakam_api_spark.llm.multimodal import decode_jpeg_bytes

    w, h, nch, rgb = decode_jpeg_bytes(_jpeg_gray_fixture(dc=32, dri=1, width=16))
    assert (w, h, nch) == (16, 8, 1)
    assert abs(rgb[0] - 132.0) < 1e-6


def test_jpeg_rejects_progressive():
    from rakam_api_spark.llm.multimodal import decode_jpeg_bytes

    fix = bytearray(_jpeg_gray_fixture())
    idx = fix.find(b"\xff\xc0")
    fix[idx + 1] = 0xC2  # SOF2: progressive
    assert decode_jpeg_bytes(bytes(fix)) is None


def test_jpeg_decodes_via_decode_image_bytes():
    from rakam_api_spark.llm.multimodal import decode_image_bytes

    w, h, nch, rgb = decode_image_bytes(_jpeg_gray_fixture(dc=32))
    assert (w, h, nch) == (8, 8, 1)
    assert abs(rgb[0] - 132.0) < 1e-6


# --- audio spectral features (numpy rFFT; analytic sine fixtures) --------


def _sine_wav(freqs_amps, rate=8000, n=1024):
    import io

    import numpy as np
    import struct as st
    import wave

    t = np.arange(n) / rate
    sig = np.zeros(n)
    for f, a in freqs_amps:
        sig += a * np.sin(2 * np.pi * f * t)
    sig = (sig / max(1.0, np.abs(sig).max()) * 32000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(st.pack(f"<{n}h", *sig))
    return buf.getvalue()


def test_audio_dominant_frequency_exact_bin():
    from rakam_api_spark.llm.multimodal import audio_spectral_features

    # 500 Hz = bin 64 of a 1024-sample / 8 kHz frame: zero leakage,
    # so dominant and centroid are both analytic
    dom, cen = audio_spectral_features(_sine_wav([(500.0, 1.0)]))
    assert dom == 500.0
    assert abs(cen - 500.0) < 1.0


def test_audio_dominant_vs_centroid_two_tones():
    from rakam_api_spark.llm.multimodal import audio_spectral_features

    # 500 Hz at amplitude 1.0 + 1500 Hz at 0.5 (both exact bins):
    # dominant is the stronger tone; centroid the amplitude-weighted
    # mean (500 + 0.5*1500)/1.5
    dom, cen = audio_spectral_features(_sine_wav([(500.0, 1.0), (1500.0, 0.5)]))
    assert dom == 500.0
    assert abs(cen - (500.0 + 0.5 * 1500.0) / 1.5) < 1.0


# --- property-based JPEG DC-chain verification ---------------------------


def _jpeg_gray_multiblock(dcs):
    """Grayscale 8x(8*len(dcs)) fixture where block i has absolute
    DC value dcs[i] (encoded as a diff chain).  Decoded image mean is
    analytically mean(dcs)/8 + 128."""
    out = b"\xff\xd8" + _dqt_unit()
    width = 8 * len(dcs)
    out += _seg(0xC0, bytes([8]) + (8).to_bytes(2, "big") + width.to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    # DC categories 0..11 at code length 4 (12 of the 16 len-4 codes)
    out += _dht(0, 0, {4: 12}, list(range(12)))
    out += _dht(1, 0, {1: 1}, [0x00])
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    pk = _BitPacker()
    pred = 0
    for v in dcs:
        diff = v - pred
        pred = v
        cat = abs(diff).bit_length()
        assert cat <= 11
        pk.put(cat, 4)  # canonical len-4 code for category == its index
        if cat:
            pk.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
        pk.put_code("0")  # EOB
    return out + pk.tobytes() + b"\xff\xd9"


def test_jpeg_dc_chain_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rakam_api_spark.llm.multimodal import decode_jpeg_bytes

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.integers(min_value=-200, max_value=200), min_size=1, max_size=8))
    def check(dcs):
        w, h, nch, rgb = decode_jpeg_bytes(_jpeg_gray_multiblock(dcs))
        assert (w, h, nch) == (8 * len(dcs), 8, 1)
        exp = sum(min(255.0, max(0.0, d / 8.0 + 128.0)) for d in dcs) / len(dcs)
        assert abs(rgb[0] - exp) < 1e-6

    check()


def test_png_roundtrip_property():
    """Property: ANY pixel grid, per-row filter choice, color type,
    bit depth, and interlace layout round-trips through the stdlib
    PNG decoder to exact channel means — the decoder's whole input
    space in one invariant."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np

    from rakam_api_spark.llm.multimodal import decode_png_bytes

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(min_value=1, max_value=9),   # w
        st.integers(min_value=1, max_value=9),   # h
        st.sampled_from([(0, 1), (2, 3), (4, 2), (6, 4)]),  # (ctype, nch)
        st.sampled_from([8, 16]),
        st.booleans(),                           # interlaced?
        st.integers(min_value=0, max_value=2**32 - 1),  # pixel seed
    )
    def check(w, h, ct_nch, depth, interlaced, seed):
        ctype, nch = ct_nch
        rng = np.random.default_rng(seed)
        hi = 65536 if depth == 16 else 256
        px = rng.integers(0, hi, size=(h, w, nch), dtype=np.uint16 if depth == 16 else np.uint8)
        if interlaced:
            if depth == 16:
                return  # test encoder supports 8-bit Adam7 only
            b = _png_adam7_bytes(px, ctype)
        else:
            filters = [int(x) for x in rng.integers(0, 5, size=h)]
            b = _png_bytes(px, ctype, filters, depth=depth)
        got = decode_png_bytes(b)
        assert got is not None
        gw, gh, gnch, rgb = got
        assert (gw, gh, gnch) == (w, h, nch)
        scale = 257.0 if depth == 16 else 1.0
        vals = px.astype(np.float64) / scale
        if ctype in (0, 4):  # gray / gray+alpha → luma replicated
            g = float(vals[..., 0].mean())
            want = [g, g, g]
        else:
            want = list(vals[..., :3].reshape(-1, 3).mean(axis=0))
        assert all(abs(a - e) < 1e-9 for a, e in zip(rgb, want))

    check()


def test_corrupt_payloads_return_none_not_crash():
    """The decode contract is None-not-crash: one malformed blob must
    never kill a mapInPandas task."""
    from rakam_api_spark.llm.multimodal import (
        audio_spectral_features,
        decode_audio_bytes,
        decode_image_bytes,
        decode_jpeg_bytes,
    )

    zero_sampling = bytearray(_jpeg_gray_fixture(dc=32))
    sof = zero_sampling.find(b"\xff\xc0")
    zero_sampling[sof + 11] = 0x00  # component H/V sampling byte → 0
    corrupt_jpegs = [
        b"\xff\xd8\xff\xc0\x00\x05\x08\x00\x08",  # truncated SOF
        b"\xff\xd8\xff\xdb\x00\x05\x00\x01\x02",  # truncated DQT
        b"\xff\xd8\xff\xda\x00\x02",  # SOS before any frame
        _jpeg_gray_fixture(dc=32)[:40],  # mid-stream truncation
        bytes(zero_sampling),  # zero sampling factors in SOF
    ]
    for payload in corrupt_jpegs:
        assert decode_jpeg_bytes(payload) is None
        assert decode_image_bytes(payload) is None

    # WAV with a data chunk truncated mid-frame (odd byte count at
    # sampwidth=2): must clip to whole frames or return None — the
    # test is that neither call raises
    truncated = _sine_wav([(500.0, 1.0)])[:-1]
    time_domain = decode_audio_bytes(truncated)
    spectral = audio_spectral_features(truncated)
    if time_domain is not None:
        # reported frame count must match the frames the stats cover
        assert time_domain[2] == 1023  # 1024 frames, one clipped
        assert time_domain[3] >= 0.0
    if spectral is not None:
        assert spectral[0] >= 0.0


def _gradient_bmp(w=32, h=32, fn=None):
    """24-bit BMP with a per-pixel pattern (row-major fn(x, y) -> 0-255)."""
    import struct as _s

    fn = fn or (lambda x, y: (x * 7 + y * 3) % 256)
    stride = ((w * 3 + 3) // 4) * 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(w):
            v = fn(x, y) & 0xFF
            row += bytes((v, v, v))
        rows.append(bytes(row).ljust(stride, b"\0"))
    px = b"".join(rows)
    header = _s.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54) + _s.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 2835, 2835, 0, 0
    )
    return header + px


class TestPerceptualHashDedup:
    def test_dhash_brightness_invariant(self):
        from rakam_api_spark.llm.multimodal import image_dhash

        a = image_dhash(_gradient_bmp(w=16, h=16))  # max 15*7+15*3=150: no wrap
        b = image_dhash(_gradient_bmp(w=16, h=16, fn=lambda x, y: x * 7 + y * 3 + 40))
        assert a is not None and a == b  # constant shift: same gradients

    def test_dhash_distinguishes_structure(self):
        from rakam_api_spark.llm.multimodal import image_dhash

        a = image_dhash(_gradient_bmp(fn=lambda x, y: (x * 8) % 250))
        b = image_dhash(_gradient_bmp(fn=lambda x, y: 250 - (x * 8) % 250))
        assert a is not None and b is not None
        assert bin(a ^ b).count("1") > 16  # opposite gradients differ widely

    def test_pixel_grid_formats(self):
        from rakam_api_spark.llm.multimodal import gray_pixel_grid

        g = gray_pixel_grid(_gradient_bmp(w=4, h=2, fn=lambda x, y: x * 10 + y))
        assert g is not None and g.shape == (2, 4)
        assert g[0][1] == 10.0  # row 0 = top row, x=1 → 10+0
        p6 = gray_pixel_grid(_ppm_bytes())
        assert p6 is not None and p6.shape == (2, 3) and p6[0][0] == 20.0
        assert gray_pixel_grid(b"\x00nonsense") is None

    def test_phash_dedup_pipeline(self, spark):
        from rakam_api_spark.llm.multimodal import media_phash_dedup

        base = _gradient_bmp(w=16, h=16)
        shifted = _gradient_bmp(w=16, h=16, fn=lambda x, y: x * 7 + y * 3 + 40)
        other = _gradient_bmp(w=16, h=16, fn=lambda x, y: 250 - (x * 8) % 250)
        media = spark.createDataFrame(
            [
                (1, "image", bytearray(base), None),
                (2, "image", bytearray(shifted), None),  # near-dup of 1
                (3, "image", bytearray(other), None),
                (4, "audio", bytearray(b"not an image"), None),
                (5, "image", bytearray(b"undecodable"), None),
            ],
            "asset_id long, media_type string, payload binary, meta map<string,string>",
        )
        pairs = media_phash_dedup(media, max_hamming=6).collect()
        assert [(r["asset_a"], r["asset_b"], r["hamming"]) for r in pairs] == [(1, 2, 0)]


class TestAudioFingerprintDedup:
    def test_volume_invariance_and_separation(self):
        from rakam_api_spark.llm.multimodal import audio_fingerprint

        a = audio_fingerprint(_wav_bytes(rate=8000, n=4096))
        assert a is not None
        # louder re-encode of the same tone: identical fingerprint
        import io
        import math
        import struct as _s
        import wave

        def tone(freq, amp, n=4096, rate=8000):
            buf = io.BytesIO()
            with wave.open(buf, "wb") as wv:
                wv.setnchannels(1)
                wv.setsampwidth(2)
                wv.setframerate(rate)
                wv.writeframes(
                    b"".join(
                        _s.pack("<h", int(amp * math.sin(2 * math.pi * freq * i / rate)))
                        for i in range(n)
                    )
                )
            return buf.getvalue()

        loud = audio_fingerprint(tone(440, 30000))
        quiet = audio_fingerprint(tone(440, 3000))
        other = audio_fingerprint(tone(1313, 30000))
        assert loud == quiet  # gain-invariant
        assert bin(loud ^ other).count("1") > 10  # different material separates

    def test_audio_dedup_pipeline(self, spark):
        from rakam_api_spark.llm.multimodal import media_audio_dedup

        w1 = _wav_bytes(rate=8000, n=4096)
        media = spark.createDataFrame(
            [
                (1, "audio", bytearray(w1), None),
                (2, "audio", bytearray(w1), None),  # exact dup
                (3, "audio", bytearray(_wav_bytes(rate=8000, n=2048)), None),
                (4, "image", bytearray(b"not audio"), None),
            ],
            "asset_id long, media_type string, payload binary, meta map<string,string>",
        )
        pairs = media_audio_dedup(media, max_hamming=2).collect()
        assert [(r["asset_a"], r["asset_b"], r["hamming"]) for r in pairs] == [(1, 2, 0)]


class TestVideoFrameDedup:
    def _video(self, fns, w=16, h=16):
        from rakam_api_spark.llm.multimodal import encode_video

        return encode_video([_gradient_bmp(w=w, h=h, fn=f) for f in fns])

    def test_container_roundtrip_and_truncation(self):
        from rakam_api_spark.llm.multimodal import decode_video, encode_video

        frames = [b"abc", b"", b"xy" * 10]
        blob = encode_video(frames)
        assert decode_video(blob) == frames
        assert decode_video(blob[:-3]) is None  # truncated
        assert decode_video(b"nope") is None

    def test_frame_sample_real_rows(self, spark):
        from rakam_api_spark.llm.multimodal import frame_sample

        vid = self._video([lambda x, y, k=k: x * 3 + y + k for k in range(6)])
        media = spark.createDataFrame(
            [(1, "video", bytearray(vid), None), (2, "image", bytearray(b"x"), None)],
            "asset_id long, media_type string, payload binary, meta map<string,string>",
        )
        rows = frame_sample(media, every_n=2).collect()
        assert [(r["asset_id"], r["frame_no"]) for r in rows] == [(1, 0), (1, 2), (1, 4)]
        assert all(bytes(r["frame"])[:2] == b"BM" for r in rows)

    def test_video_dedup_shared_frames(self, spark):
        from rakam_api_spark.llm.multimodal import media_video_dedup

        # structurally distinct frames: dHash keeps only the SIGN of
        # the horizontal gradient (brightness- and slope-invariant),
        # so frames must differ in where the gradient flips —
        # sawtooth patterns with distinct periods do
        fns = [lambda x, y, k=k: (x * (17 + 13 * k) + y * 7) % 120 for k in range(5)]
        other = [lambda x, y, k=k: (x * (19 + 11 * k) + y * 31) % 90 for k in range(5)]
        v1 = self._video(fns)
        v2 = self._video(fns[1:] + other[:1])  # shares 4 of 5 frames with v1
        v3 = self._video(other)
        media = spark.createDataFrame(
            [
                (1, "video", bytearray(v1), None),
                (2, "video", bytearray(v2), None),
                (3, "video", bytearray(v3), None),
            ],
            "asset_id long, media_type string, payload binary, meta map<string,string>",
        )
        pairs = media_video_dedup(media, min_shared=3).collect()
        assert [(r["asset_a"], r["asset_b"], r["n_shared_frames"]) for r in pairs] == [(1, 2, 4)]
        assert pairs[0]["n_frames_a"] == 5 and pairs[0]["n_frames_b"] == 5

    def test_video_dedup_hot_frame_capped(self, spark):
        """A frame shared by MANY videos (title card / black frame) is a
        hot posting list: without the idf floor, 60 videos sharing one
        frame expand to C(60,2)=1770 candidate pairs.  With
        max_postings below the fan-out, the ubiquitous hash is dropped
        and contributes ZERO pairs — while genuinely shared rare
        frames still dedup."""
        from rakam_api_spark.llm.multimodal import encode_video, media_video_dedup

        title_card = _gradient_bmp(w=16, h=16, fn=lambda x, y: (x * 29 + y * 3) % 100)
        uniq = [
            _gradient_bmp(w=16, h=16, fn=lambda x, y, k=k: (x * (23 + 13 * k) + y * 5) % 110)
            for k in range(62)
        ]
        rows = [
            (i, "video", bytearray(encode_video([title_card, uniq[i]])), None)
            for i in range(60)
        ]
        # videos 100/101 share 3 RARE frames (plus the hot title card)
        rows.append((100, "video", bytearray(encode_video([title_card] + uniq[59:62])), None))
        rows.append((101, "video", bytearray(encode_video([title_card] + uniq[59:62])), None))
        media = spark.createDataFrame(
            rows,
            "asset_id long, media_type string, payload binary, meta map<string,string>",
        )
        pairs = media_video_dedup(media, min_shared=1, max_postings=10).collect()
        got = [(r["asset_a"], r["asset_b"], r["n_shared_frames"]) for r in pairs]
        # the 1770 title-card-only pairs are gone; the rare-frame pair
        # survives with the title card excluded from its shared count
        assert got == [(59, 100, 1), (59, 101, 1), (100, 101, 3)]
