"""Real codec-free decoders (functions/codecs.py): PNG pixels recovered
bit-exact through zlib + every RFC 2083 filter type, PCM WAV waveforms
recovered sample-exact, and the default extract_media_features path emitting
real (not md5-stub) features for decodable payloads."""

import random
import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import Row

from py_stringsimjoin_spark.functions.codecs import (
    audio_features,
    decode_png,
    decode_wav_pcm,
    image_features,
    real_media_features,
)
from py_stringsimjoin_spark.operators.multimodal import (
    _fake_decode,
    extract_media_features,
)


def _chunk(ctype, payload):
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload))
    )


def _filter_rows(flat, filters, ch):
    """Apply RFC 2083 per-row filters to ``flat`` int16 [h, stride]; returns
    the filtered scanline byte stream (filter id + filtered bytes per row)."""
    stride = flat.shape[1]
    raw = b""
    for y, ftype in enumerate(filters):
        line = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int16)
        if ftype == 0:
            enc = line
        elif ftype == 1:  # Sub
            left = np.concatenate([np.zeros(ch, dtype=np.int16), line[:-ch]])
            enc = line - left
        elif ftype == 2:  # Up
            enc = line - prev
        elif ftype == 3:  # Average
            left = np.concatenate([np.zeros(ch, dtype=np.int16), line[:-ch]])
            enc = line - ((left + prev) >> 1)
        else:  # Paeth
            enc = np.zeros(stride, dtype=np.int16)
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = int(line[x]) - pred
        raw += bytes([ftype]) + (enc % 256).astype(np.uint8).tobytes()
    return raw


def _png_encode(pixels, filters):
    """Reference PNG encoder: ``pixels`` uint8 [h, w, ch], ``filters`` one
    RFC 2083 filter id per row (the encoder applies it for real, so the
    decoder must undo it for real)."""
    h, w, ch = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    flat = pixels.reshape(h, w * ch).astype(np.int16)
    raw = _filter_rows(flat, filters, ch)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


# Adam7 pass grid (x_start, y_start, x_step, y_step) — independent spelling
# of the decoder's table, straight from RFC 2083 §2.6
_ADAM7_GRID = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_encode_adam7(pixels):
    """Adam7-interlaced PNG encoder: each pass is its own filtered
    sub-image; filter ids cycle 0..4 across pass rows so every filter is
    exercised against pass-local left/up neighbours."""
    h, w, ch = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1)
    raw = b""
    for pi, (x0, y0, dx, dy) in enumerate(_ADAM7_GRID):
        sub = pixels[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        flat = sub.reshape(ph, pw * ch).astype(np.int16)
        raw += _filter_rows(flat, [(y + pi) % 5 for y in range(ph)], ch)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _wav_pcm16(samples, rate):
    """samples: float [n, ch] in [-1,1] -> canonical PCM16 WAV bytes."""
    arr = np.clip(np.asarray(samples) * 32768.0, -32768, 32767).astype("<i2")
    return _wav_raw(arr.tobytes(), 1, arr.shape[1], rate, 16)


def _wav_raw(data, audio_format, ch, rate, bits, extensible=False):
    block = ch * bits // 8
    if extensible:
        # WAVE_FORMAT_EXTENSIBLE: tag 0xFFFE, real code leads the SubFormat
        fmt = struct.pack("<HHIIHH", 0xFFFE, ch, rate, rate * block, block,
                          bits)
        fmt += struct.pack("<HHI", 22, bits, 0)
        fmt += struct.pack("<H", audio_format) + b"\x00" * 14
    else:
        fmt = struct.pack("<HHIIHH", audio_format, ch, rate, rate * block,
                          block, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _compress_mulaw(x16):
    """Independent G.711 mu-law compressor (bit-position segment search,
    the classic linear2ulaw shape — not the decoder's closed form)."""
    out = []
    for v in x16:
        s = 0x80 if v < 0 else 0
        m = min(abs(int(v)), 32635) + 0x84          # bias, then find seg
        exp = m.bit_length() - 8                    # top bit at exp+7
        mant = (m >> (exp + 3)) & 0x0F
        out.append((~(s | (exp << 4) | mant)) & 0xFF)
    return bytes(out)


def _compress_alaw(x16):
    """Independent G.711 A-law compressor (sign bit = positive, XOR 0x55)."""
    out = []
    for v in x16:
        pos = 0x80 if v >= 0 else 0
        a = min(abs(int(v)), 32767)
        if a < 256:
            exp, mant = 0, a >> 4
        else:
            exp = a.bit_length() - 8
            mant = (a >> (exp + 3)) & 0x0F
        out.append((pos | (exp << 4) | mant) ^ 0x55)
    return bytes(out)


RNG = np.random.RandomState(7)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_every_filter(ch):
    pixels = RNG.randint(0, 256, size=(5, 7, ch), dtype=np.uint8)
    for filters in [[0] * 5, [1] * 5, [2] * 5, [3] * 5, [4] * 5, [0, 1, 2, 3, 4]]:
        got = decode_png(_png_encode(pixels, filters))
        assert got is not None and got.shape == (5, 7, ch), filters
        np.testing.assert_array_equal(got, pixels)


def test_png_gradient_image():
    # structured (non-random) content exercises filter predictions for real
    y, x = np.mgrid[0:16, 0:24]
    pixels = np.stack([y * 8, x * 5, (y + x) * 4], axis=2).astype(np.uint8)
    got = decode_png(_png_encode(pixels, [4] * 16))
    np.testing.assert_array_equal(got, pixels)


def test_png_rejects_unsupported():
    pixels = RNG.randint(0, 256, size=(3, 3, 3), dtype=np.uint8)
    good = _png_encode(pixels, [0, 0, 0])
    assert decode_png(good[:30]) is None            # truncated
    assert decode_png(b"") is None
    bad_depth = bytearray(good)
    bad_depth[24] = 16                               # 16-bit
    assert decode_png(bytes(bad_depth)) is None
    corrupt = bytearray(good)
    corrupt[45] ^= 0xFF                              # flip a zlib byte
    decode_png(bytes(corrupt))                       # must not raise


def test_wav_pcm_roundtrip():
    t = np.linspace(0, 1, 8000, endpoint=False)
    wave = np.stack([np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 220 * t)], axis=1)
    out = decode_wav_pcm(_wav_pcm16(wave, 8000))
    assert out is not None
    samples, rate = out
    assert rate == 8000 and samples.shape == (8000, 2)
    assert np.max(np.abs(samples - wave)) < 1 / 16384.0  # 16-bit quantization


def test_wav_rejects_non_pcm():
    b = bytearray(_wav_pcm16(np.zeros((10, 1)), 8000))
    b[20:22] = b"\x03\x00"  # IEEE float tag but 16-bit: invalid combination
    assert decode_wav_pcm(bytes(b)) is None
    b[20:22] = b"\x11\x00"  # IMA ADPCM: genuinely needs a codec
    assert decode_wav_pcm(bytes(b)) is None
    assert decode_wav_pcm(b"RIFFxxxxWAVE") is None
    assert decode_wav_pcm(None) is None


def test_wav_pcm_widths_and_float():
    t = np.linspace(0, 1, 2000, endpoint=False)
    wave = (0.7 * np.sin(2 * np.pi * 440 * t)).reshape(-1, 1)
    cases = [
        (np.clip(wave * (1 << 23), -(1 << 23), (1 << 23) - 1).astype("<i4"),
         1, 24, 1 / (1 << 22), "i24"),
        ((np.clip(wave, -1, 1) * ((1 << 31) - 1)).astype("<i4"),
         1, 32, 1 / (1 << 24), "i32"),
        (wave.astype("<f4"), 3, 32, 1e-6, "f32"),
        (wave.astype("<f8"), 3, 64, 1e-6, "f64"),
    ]
    for arr, tag, bits, tol, name in cases:
        if bits == 24:  # low 3 bytes of each i4, little-endian
            data = arr.astype("<i4").tobytes()
            data = b"".join(data[i:i + 3] for i in range(0, len(data), 4))
        else:
            data = arr.tobytes()
        out = decode_wav_pcm(_wav_raw(data, tag, 1, 8000, bits))
        assert out is not None, name
        samples, rate = out
        assert rate == 8000 and samples.shape == (2000, 1), name
        assert np.max(np.abs(samples - wave)) < tol, name


def test_wav_extensible_wrapper():
    t = np.linspace(0, 0.25, 2000, endpoint=False)
    wave = (0.5 * np.sin(2 * np.pi * 300 * t)).reshape(-1, 1)
    data = np.clip(wave * 32768, -32768, 32767).astype("<i2").tobytes()
    out = decode_wav_pcm(_wav_raw(data, 1, 1, 8000, 16, extensible=True))
    assert out is not None
    assert np.max(np.abs(out[0] - wave)) < 1 / 16384.0


def test_wav_g711_companding():
    rng = np.random.RandomState(3)
    x16 = np.concatenate([
        rng.randint(-32768, 32768, size=500),
        [0, 1, -1, 8, -8, 255, -255, 32767, -32768],
    ]).astype(np.int64)
    # mu-law: compressor is the classic bit-search form; expansion must
    # land within one top-segment quantization step (1024 in the 16-bit
    # domain; the 32767 clip case lands 643 off at the mu-law max 32124)
    out = decode_wav_pcm(_wav_raw(_compress_mulaw(x16), 7, 1, 8000, 8))
    assert out is not None
    err = np.abs(out[0][:, 0] * 32768.0 - x16)
    assert err.max() <= 1024, err.max()
    # exact anchors: 0xFF = +0, 0x7F = -0, 0x80 = +32124, 0x00 = -32124
    anchors = decode_wav_pcm(
        _wav_raw(bytes([0xFF, 0x7F, 0x80, 0x00]), 7, 1, 8000, 8))
    a = np.round(anchors[0][:, 0] * 32768.0).astype(int)
    assert list(a) == [0, 0, 32124, -32124]
    # A-law
    out = decode_wav_pcm(_wav_raw(_compress_alaw(x16), 6, 1, 8000, 8))
    assert out is not None
    err = np.abs(out[0][:, 0] * 32768.0 - x16)
    assert err.max() <= 1024, err.max()  # seg-7 step is 1024 in A-law
    # exact anchors: 0xD5 = +8, 0x55 = -8 (A-law has no true zero)
    anchors = decode_wav_pcm(_wav_raw(bytes([0xD5, 0x55]), 6, 1, 8000, 8))
    a = np.round(anchors[0][:, 0] * 32768.0).astype(int)
    assert list(a) == [8, -8]


def _bmp_encode(pixels, bits=24, top_down=False, palette=None):
    """Independent BMP writer: BITMAPFILEHEADER + BITMAPINFOHEADER,
    4-byte-padded rows, bottom-up unless top_down."""
    h, w = pixels.shape[:2]
    stride = ((w * bits // 8) + 3) & ~3
    pal = b""
    if bits == 8:
        pal = b"".join(bytes([b_, g, r, 0]) for r, g, b_ in palette)
    data_off = 14 + 40 + len(pal)
    rows = []
    for y in range(h):
        if bits == 8:
            row = bytes(pixels[y, :w].astype(np.uint8))
        else:
            px = pixels[y]
            row = b"".join(
                bytes([int(p[2]), int(p[1]), int(p[0])]) +
                (b"\xff" if bits == 32 else b"") for p in px)
        rows.append(row + b"\x00" * (stride - len(row)))
    if not top_down:
        rows.reverse()
    body = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, w, (-h if top_down else h), 1,
                       bits, 0, len(body), 2835, 2835,
                       len(palette) if bits == 8 else 0, 0)
    head = b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
    return head + info + pal + body


def test_bmp_roundtrip():
    from py_stringsimjoin_spark.functions.codecs import decode_bmp

    px = RNG.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    for bits in (24, 32):
        for td in (False, True):
            got = decode_bmp(_bmp_encode(px, bits=bits, top_down=td))
            assert got is not None, (bits, td)
            np.testing.assert_array_equal(got, px)
    # 8-bit palette
    palette = [(250, 10, 30), (0, 255, 0), (12, 34, 56)]
    idx = RNG.randint(0, 3, size=(6, 9))
    got = decode_bmp(_bmp_encode(idx, bits=8, palette=palette))
    np.testing.assert_array_equal(got, np.array(palette, dtype=np.uint8)[idx])
    # rejects: RLE compression flag, truncation, junk
    blob = bytearray(_bmp_encode(px))
    blob[30] = 1  # BI_RLE8
    assert decode_bmp(bytes(blob)) is None
    assert decode_bmp(_bmp_encode(px)[:40]) is None
    assert decode_bmp(b"BM but not a bitmap") is None
    assert decode_bmp(None) is None


def test_real_media_features_covers_bmp_and_law_wav():
    px = RNG.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    feats = real_media_features(_bmp_encode(px), feat_dim=16)
    assert feats is not None
    expect = px.reshape(-1, 3).mean(axis=0) / 255.0
    assert np.abs(feats[:3] - expect).max() < 1e-6
    silence = _wav_raw(_compress_mulaw(np.zeros(100, dtype=int)), 7, 1, 8000, 8)
    feats = real_media_features(silence, feat_dim=16)
    assert feats is not None and feats[0] == 0.0  # mu-law 0 is exact


def test_feature_vectors_deterministic_and_sized():
    pixels = RNG.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    f1 = image_features(pixels, 16)
    f2 = image_features(pixels, 16)
    np.testing.assert_array_equal(f1, f2)
    assert f1.shape == (16,) and f1.dtype == np.float32
    assert image_features(pixels, 6).shape == (6,)

    t = np.linspace(0, 0.5, 4000, endpoint=False)
    mono = np.sin(2 * np.pi * 440 * t).reshape(-1, 1)
    a = audio_features(mono, 8000, 16)
    assert a.shape == (16,) and 0.6 < a[0] < 0.8  # sine RMS ~ 0.707


def test_extract_media_features_real_vs_stub(spark):
    """PNG and WAV payloads get REAL features (≠ the md5 stub); opaque
    payloads still flow through the deterministic fake."""
    pixels = np.full((4, 4, 3), 200, dtype=np.uint8)
    png = _png_encode(pixels, [0] * 4)
    wav = _wav_pcm16(np.zeros((100, 1)), 8000)
    blob = b"not decodable media"
    df = spark.createDataFrame(
        [Row(id=1, payload=png), Row(id=2, payload=wav), Row(id=3, payload=blob)]
    )
    rows = {r["id"]: r for r in
            extract_media_features(df, "id", "payload", feat_dim=16).collect()}
    # PNG: all-200 pixels -> channel means 200/255, std 0
    assert abs(rows[1]["features"][0] - 200 / 255.0) < 1e-6
    assert abs(rows[1]["features"][4]) < 1e-6
    # WAV of silence: rms == 0
    assert rows[2]["features"][0] == 0.0
    # opaque payload: identical to the md5 stub
    np.testing.assert_allclose(
        rows[3]["features"], _fake_decode(blob, 16), rtol=1e-6
    )


def test_multimodal_to_ann_composition(spark):
    """End-to-end multimodal pipeline: mixed binary payloads -> header
    metadata gate (images only) -> real pixel features -> cosine top-k.
    Identical images must be each other's nearest neighbors with cosine 1."""
    from pyspark.sql import functions as F

    from py_stringsimjoin_spark.operators.ann import brute_force_topk
    from py_stringsimjoin_spark.operators.multimodal import attach_media_meta

    def img(val):
        return _png_encode(np.full((6, 6, 3), val, dtype=np.uint8), [0] * 6)

    rows = [
        Row(id=1, payload=img(10)),
        Row(id=2, payload=img(10)),            # exact duplicate of 1
        Row(id=3, payload=img(240)),
        Row(id=4, payload=_wav_pcm16(np.zeros((50, 1)), 8000)),  # audio
        Row(id=5, payload=b"opaque"),                            # junk
    ]
    df = attach_media_meta(spark.createDataFrame(rows), "payload", "media")
    images = df.where(F.col("media_meta")["format"] == "png")
    assert images.count() == 3  # the gate drops wav + junk
    feats = extract_media_features(images, "id", "payload", feat_dim=16)
    nn = brute_force_topk(feats, feats, id_col="id", vec_col="features", k=1)
    best = {r["query_id"]: r for r in nn.collect()}
    assert best[1]["neighbor_id"] == 2 and abs(best[1]["cosine"] - 1.0) < 1e-6
    assert best[2]["neighbor_id"] == 1


# --- GIF fixtures: a real LZW encoder (width growth mirrored against the
# decoder's table-size rule) + GIF container assembly ---------------------

def _lzw_encode(indices, min_code):
    clear, end = 1 << min_code, (1 << min_code) + 1
    codes = [(clear, min_code + 1)]
    d = {(i,): i for i in range(clear)}
    next_code, width, table_len = end + 1, min_code + 1, clear + 2
    first_data = True
    buf = ()

    def emit(code):
        nonlocal table_len, width, first_data
        codes.append((code, width))
        if first_data:
            first_data = False
        else:
            table_len += 1
            if table_len == (1 << width) and width < 12:
                width += 1

    for k in indices:
        cand = buf + (int(k),)
        if cand in d:
            buf = cand
            continue
        emit(d[buf])
        d[cand] = next_code
        next_code += 1
        assert next_code <= 4096, "test encoder: dict overflow"
        buf = (int(k),)
    if buf:
        emit(d[buf])
    codes.append((end, width))
    acc = nbits = 0
    out = bytearray()
    for code, w in codes:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_encode(indices2d, palette, with_gce=False):
    """First-frame GIF89a bytes from an index raster + RGB palette rows."""
    h, w = indices2d.shape
    n = len(palette)
    bits = max(2, (n - 1).bit_length())
    size_field = bits - 1
    table = b"".join(bytes(c) for c in palette) + b"\x00" * (3 * ((1 << bits) - n))
    out = b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x80 | size_field, 0, 0])
    out += table
    if with_gce:  # graphic control extension before the image descriptor
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    lzw_min = max(2, bits)
    out += bytes([lzw_min])
    data = _lzw_encode(indices2d.reshape(-1), lzw_min)
    for i in range(0, len(data), 255):
        blk = data[i:i + 255]
        out += bytes([len(blk)]) + blk
    return out + b"\x00" + b"\x3b"


def _gif_encode_animated(screen_wh, palette, frames):
    """Animated GIF89a writer. ``frames`` entries:
    (indices2d, left, top, delay_cs, transparent_idx_or_None, disposal)."""
    w, h = screen_wh
    n = len(palette)
    bits = max(2, (n - 1).bit_length())
    table = (b"".join(bytes(c) for c in palette)
             + b"\x00" * (3 * ((1 << bits) - n)))
    out = b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x80 | (bits - 1), 0, 0])
    out += table
    for idx, left, top, delay_cs, transp, disposal in frames:
        ih, iw = idx.shape
        packed = (disposal << 2) | (1 if transp is not None else 0)
        out += b"\x21\xf9\x04" + bytes([packed]) + struct.pack("<H", delay_cs)
        out += bytes([transp if transp is not None else 0, 0])
        out += b"\x2c" + struct.pack("<HHHH", left, top, iw, ih) + b"\x00"
        lzw_min = max(2, bits)
        out += bytes([lzw_min])
        data = _lzw_encode(idx.reshape(-1), lzw_min)
        for i in range(0, len(data), 255):
            blk = data[i:i + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00"
    return out + b"\x3b"


def test_gif_animation_compositing():
    from py_stringsimjoin_spark.functions.codecs import decode_gif_frames

    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    full = np.full((6, 8), 1)                      # red base frame
    patch = np.full((2, 3), 2)                     # green sub-rectangle
    overlay = np.array([[3, 0], [0, 3]])           # blue w/ transparent 0s
    blob = _gif_encode_animated((8, 6), pal, [
        (full, 0, 0, 5, None, 0),
        (patch, 2, 1, 0, None, 1),                 # delay 0 -> 100ms
        (overlay, 0, 0, 20, 0, 3),                 # transparency + restore
        (np.full((1, 1), 2), 7, 5, 1, None, 2),    # dispose-to-background
        (np.full((1, 1), 1), 0, 0, 1, None, 0),
    ])
    res = decode_gif_frames(blob)
    assert res is not None
    frames, delays = res
    assert len(frames) == 5 and delays == [50, 100, 200, 10, 10]
    f0, f1, f2, f3, f4 = frames
    assert (f0 == [255, 0, 0]).all()
    assert (f1[1:3, 2:5] == [0, 255, 0]).all()     # patch painted
    assert (f1[0, 0] == [255, 0, 0]).all()         # rest untouched
    assert (f2[0, 0] == [0, 0, 255]).all()         # overlay opaque px
    assert (f2[0, 1] == [255, 0, 0]).all()         # transparent -> shows f1
    assert (f2[1, 2] == [0, 255, 0]).all()         # patch survives under f2
    assert (f3[0, 0] == [255, 0, 0]).all()         # disposal 3 restored f1
    assert (f3[5, 7] == [0, 255, 0]).all()         # corner painted green
    assert (f4[5, 7] == [0, 0, 0]).all()           # disposal 2 cleared it


def test_gif_duration_and_frame_at():
    from py_stringsimjoin_spark.functions.codecs import (
        decode_gif,
        gif_duration_ms,
        gif_frame_at,
    )

    pal = [(9, 9, 9), (200, 30, 40)]
    blob = _gif_encode_animated((4, 4), pal, [
        (np.full((4, 4), 0), 0, 0, 10, None, 0),   # 100ms
        (np.full((4, 4), 1), 0, 0, 30, None, 0),   # 300ms
    ])
    assert gif_duration_ms(blob) == 400
    assert (gif_frame_at(blob, 0) == [9, 9, 9]).all()
    assert (gif_frame_at(blob, 99) == [9, 9, 9]).all()
    assert (gif_frame_at(blob, 100) == [200, 30, 40]).all()
    assert (gif_frame_at(blob, 399) == [200, 30, 40]).all()
    assert gif_frame_at(blob, 400) is None
    # a single-frame GIF is a still image, not a video
    still = _gif_encode(np.full((3, 3), 1), pal)
    assert gif_duration_ms(still) is None
    assert decode_gif(still) is not None  # still decodes as an image


def test_gif_frames_fuzz_never_raises():
    from py_stringsimjoin_spark.functions.codecs import decode_gif_frames

    pal = [(0, 0, 0), (255, 255, 255), (1, 2, 3), (4, 5, 6)]
    rng = np.random.RandomState(8)
    good = _gif_encode_animated((10, 7), pal, [
        (rng.randint(0, 4, size=(7, 10)), 0, 0, 5, 2, 0),
        (rng.randint(0, 4, size=(3, 4)), 2, 2, 5, None, 3),
        (rng.randint(0, 4, size=(7, 10)), 0, 0, 5, 1, 2),
    ])
    res = decode_gif_frames(good)
    assert res is not None and len(res[0]) == 3
    pyrnd = random.Random(21)
    blobs = [good[:n] for n in range(0, len(good), 17)]
    for _ in range(150):
        mut = bytearray(good)
        for _ in range(pyrnd.randint(1, 6)):
            mut[pyrnd.randrange(len(mut))] = pyrnd.randrange(256)
        blobs.append(bytes(mut))
    for blob in blobs:
        out = decode_gif_frames(blob)
        assert out is None or isinstance(out, tuple)


def test_frame_sample_plan_animated_gif(spark):
    from py_stringsimjoin_spark.operators.multimodal import frame_sample_plan

    pal = [(10, 20, 30), (200, 100, 50)]
    blob = _gif_encode_animated((4, 4), pal, [
        (np.full((4, 4), 0), 0, 0, 10, None, 0),
        (np.full((4, 4), 1), 0, 0, 10, None, 0),
    ])
    df = spark.createDataFrame([Row(id=1, payload=blob)])
    rows = sorted(frame_sample_plan(df, "id", "payload", every_ms=100).collect(),
                  key=lambda r: r["frame_idx"])
    assert [r["frame_ts_ms"] for r in rows] == [0, 100]
    np.testing.assert_allclose(rows[0]["features"][:3],
                               np.array([10, 20, 30]) / 255.0, atol=1e-6)
    np.testing.assert_allclose(rows[1]["features"][:3],
                               np.array([200, 100, 50]) / 255.0, atol=1e-6)


def test_lzw_codec_roundtrip_property():
    from py_stringsimjoin_spark.functions.codecs import _lzw_decode

    for seed in range(5):
        rng = np.random.RandomState(seed)
        for min_code in (2, 4, 7):
            n = int(rng.randint(1, 400))
            idx = rng.randint(0, 1 << min_code, size=n)
            data = _lzw_encode(idx, min_code)
            got = _lzw_decode(data, min_code, n)
            assert got is not None, (seed, min_code)
            np.testing.assert_array_equal(np.asarray(got), idx)


def test_gif_decode_roundtrip():
    from py_stringsimjoin_spark.functions.codecs import decode_gif

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    rng = np.random.RandomState(3)
    idx = rng.randint(0, 4, size=(9, 13))
    for gce in (False, True):
        got = decode_gif(_gif_encode(idx, palette, with_gce=gce))
        assert got is not None and got.shape == (9, 13, 3)
        expect = np.array(palette, dtype=np.uint8)[idx]
        np.testing.assert_array_equal(got, expect)


def test_gif_decode_rejects_malformed():
    from py_stringsimjoin_spark.functions.codecs import decode_gif

    palette = [(1, 2, 3), (4, 5, 6)]
    idx = np.zeros((4, 4), dtype=int)
    good = _gif_encode(idx, palette)
    assert decode_gif(good[:20]) is None
    assert decode_gif(b"GIF89a") is None
    assert decode_gif(None) is None
    truncated_lzw = good[: good.index(b"\x2c") + 12]
    assert decode_gif(truncated_lzw) is None


def test_real_media_features_covers_gif():
    from py_stringsimjoin_spark.functions.codecs import real_media_features

    palette = [(200, 200, 200), (0, 0, 0)]
    idx = np.zeros((5, 5), dtype=int)  # uniform light gray
    feats = real_media_features(_gif_encode(idx, palette), 16)
    assert feats is not None
    assert abs(feats[0] - 200 / 255.0) < 1e-6  # real pixels, not a stub


def _png_encode_palette(indices2d, palette):
    """8-bit palette (color type 3) PNG from an index raster."""
    h, w = indices2d.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    plte = b"".join(bytes(c) for c in palette)
    raw = b"".join(b"\x00" + indices2d[y].astype(np.uint8).tobytes()
                   for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _png_encode_16bit(pixels16, filters):
    """16-bit RGB PNG (big-endian samples) with real per-row filters applied
    at byte level with bpp=6, exactly as the spec defines."""
    h, w, ch = pixels16.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    bpp = ch * 2
    stride = w * bpp
    flat = np.zeros((h, stride), dtype=np.int16)
    for y in range(h):
        flat[y] = np.frombuffer(pixels16[y].astype(">u2").tobytes(),
                                dtype=np.uint8).astype(np.int16)
    raw = b""
    for y, ftype in enumerate(filters):
        line = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int16)
        if ftype == 0:
            enc = line
        elif ftype == 1:
            left = np.concatenate([np.zeros(bpp, dtype=np.int16), line[:-bpp]])
            enc = line - left
        else:  # Up
            enc = line - prev
        raw += bytes([ftype]) + (enc % 256).astype(np.uint8).tobytes()
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_png_palette_roundtrip():
    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9)]
    idx = RNG.randint(0, 4, size=(6, 11))
    got = decode_png(_png_encode_palette(idx, palette))
    assert got is not None and got.shape == (6, 11, 3)
    np.testing.assert_array_equal(got, np.array(palette, dtype=np.uint8)[idx])
    # out-of-range index -> reject, never garbage
    assert decode_png(_png_encode_palette(idx + 10, palette)) is None


def test_png_16bit_roundtrip():
    pixels16 = RNG.randint(0, 65536, size=(5, 4, 3)).astype(np.uint16)
    for filters in ([0] * 5, [1] * 5, [2] * 5, [0, 1, 2, 1, 0]):
        got = decode_png(_png_encode_16bit(pixels16, list(filters)))
        assert got is not None and got.shape == (5, 4, 3)
        np.testing.assert_array_equal(got, (pixels16 >> 8).astype(np.uint8))


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_adam7_roundtrip(ch):
    # sizes straddle the 8x8 Adam7 tile: exact multiples, odd remainders,
    # and images small enough that whole passes are empty
    for h, w in [(16, 16), (13, 21), (7, 5), (1, 1), (2, 9), (8, 3)]:
        pixels = RNG.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
        dec = decode_png(_png_encode_adam7(pixels))
        assert dec is not None and dec.shape == (h, w, ch), (h, w, ch)
        np.testing.assert_array_equal(dec, pixels)


def test_png_adam7_matches_sequential_decode():
    pixels = RNG.randint(0, 256, size=(19, 14, 3), dtype=np.uint8)
    seq = decode_png(_png_encode(pixels, [y % 5 for y in range(19)]))
    ada = decode_png(_png_encode_adam7(pixels))
    np.testing.assert_array_equal(seq, ada)


def test_png_adam7_truncated_rejected():
    good = _png_encode_adam7(RNG.randint(0, 256, size=(16, 16, 3), dtype=np.uint8))
    for cut in (len(good) // 3, len(good) // 2, len(good) - 20):
        assert decode_png(good[:cut]) is None  # reject, never raise


def test_gif_interlaced_roundtrip():
    """GIF89a appendix-E interlacing: the encoder stores rows in 4-pass
    order; the decoder must put them back."""
    from py_stringsimjoin_spark.functions.codecs import decode_gif

    palette = [(i, 2 * i, 3 * i) for i in range(8)]
    idx = RNG.randint(0, 8, size=(11, 5))
    order = np.concatenate([np.arange(0, 11, 8), np.arange(4, 11, 8),
                            np.arange(2, 11, 4), np.arange(1, 11, 2)])
    stored = idx[order]  # rows as an interlaced encoder writes them
    gif = bytearray(_gif_encode(stored, palette))
    pos = bytes(gif).index(b"\x2c")
    gif[pos + 9] |= 0x40  # set the interlace flag
    got = decode_gif(bytes(gif))
    assert got is not None
    np.testing.assert_array_equal(got, np.array(palette, dtype=np.uint8)[idx])
