"""WebM (EBML) + MP3 duration probes vs independently built containers."""

from __future__ import annotations

import random
import struct

from py_stringsimjoin_spark.functions.mp3 import mp3_duration_ms, parse_mp3_info
from py_stringsimjoin_spark.functions.webm import parse_webm_info, webm_duration_ms


# --- independent EBML writer ----------------------------------------------

def ebml_size(n: int) -> bytes:
    """Shortest EBML size varint for n."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            v = n | (1 << (7 * length))
            return v.to_bytes(length, "big")
    raise ValueError(n)


def element(eid: int, payload: bytes) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big") \
        + ebml_size(len(payload)) + payload


def webm(duration=None, scale=None, f64=False, unknown_segment=False,
         junk_siblings=True):
    info = b""
    if scale is not None:
        info += element(0x2AD7B1, scale.to_bytes(
            (max(scale.bit_length(), 1) + 7) // 8, "big"))
    if duration is not None:
        info += element(0x4489, struct.pack(">d" if f64 else ">f", duration))
    info += element(0x4D80, b"muxer")        # MuxingApp string sibling
    seg = b""
    if junk_siblings:
        seg += element(0x114D9B74, b"\x00" * 9)   # SeekHead before Info
    seg += element(0x1549A966, info)
    seg += element(0x1F43B675, b"\x00" * 40)      # a Cluster after Info
    head = element(0x1A45DFA3, element(0x4282, b"webm"))
    if unknown_segment:
        segment = (0x18538067).to_bytes(4, "big") + b"\x01" + b"\xff" * 7 + seg
    else:
        segment = element(0x18538067, seg)
    return head + segment


def test_webm_duration_float32_and_64():
    blob = webm(duration=2500.0, scale=1_000_000)
    assert parse_webm_info(blob) == {"timestamp_scale_ns": 1_000_000,
                                     "duration_ticks": 2500.0}
    assert webm_duration_ms(blob) == 2500
    assert webm_duration_ms(webm(duration=1234.5, f64=True)) == 1234
    # non-default scale: ticks are 2 ms each
    assert webm_duration_ms(webm(duration=100.0, scale=2_000_000)) == 200


def test_webm_default_scale_and_unknown_size_segment():
    assert webm_duration_ms(webm(duration=750.0)) == 750  # default 1e6 ns
    blob = webm(duration=600.0, unknown_segment=True)
    assert webm_duration_ms(blob) == 600


def test_webm_rejects():
    assert webm_duration_ms(b"") is None
    assert webm_duration_ms(b"\x1a\x45\xdf\xa3") is None
    assert webm_duration_ms(webm(duration=None)) is None   # no Duration
    assert webm_duration_ms(webm(duration=-5.0)) is None
    assert webm_duration_ms(b"RIFF" + b"\x00" * 30) is None


# --- independent MP3 frame builder ----------------------------------------

def mp3_frame_header(ver=3, bri=9, sri=0, mono=False) -> bytes:
    b1 = 0xFF
    b2 = 0xE0 | (ver << 3) | (1 << 1) | 1       # layer III, no CRC
    b3 = (bri << 4) | (sri << 2)
    b4 = 0xC0 if mono else 0x00
    return bytes([b1, b2, b3, b4])


def mp3(frames=None, ver=3, bri=9, sri=0, mono=False, id3_pad=0,
        tag=b"Xing", tail=2000):
    out = b""
    if id3_pad:
        out += b"ID3\x04\x00\x00" + bytes(
            [(id3_pad >> 21) & 0x7F, (id3_pad >> 14) & 0x7F,
             (id3_pad >> 7) & 0x7F, id3_pad & 0x7F]) + b"\x00" * id3_pad
    out += mp3_frame_header(ver, bri, sri, mono)
    side = (17 if mono else 32) if ver == 3 else (9 if mono else 17)
    out += b"\x00" * side
    if frames is not None:
        out += tag + struct.pack(">I", 1) + struct.pack(">I", frames)
    out += b"\x00" * tail
    return out


def test_mp3_xing_exact_duration():
    # MPEG1 stereo 44100: 1152 samples/frame
    blob = mp3(frames=383)  # ~10.0 s
    info = parse_mp3_info(blob)
    assert info["sample_rate"] == 44100 and info["frames"] == 383
    assert info["vbr"] is True
    assert mp3_duration_ms(blob) == 383 * 1152 * 1000 // 44100
    # Info tag (CBR-with-header) also carries an exact count
    assert mp3_duration_ms(mp3(frames=100, tag=b"Info")) == \
        100 * 1152 * 1000 // 44100


def test_mp3_id3_skip_and_mpeg2_mono():
    blob = mp3(frames=50, id3_pad=777)
    assert mp3_duration_ms(blob) == 50 * 1152 * 1000 // 44100
    # MPEG2 mono 22050: 576 samples/frame, side info 9 bytes
    blob = mp3(frames=200, ver=2, mono=True)
    assert parse_mp3_info(blob)["sample_rate"] == 22050
    assert mp3_duration_ms(blob) == 200 * 576 * 1000 // 22050


def test_mp3_cbr_estimate():
    # no Xing block: 128 kbps CBR estimate over the audio bytes
    blob = mp3(frames=None, tail=16000)
    info = parse_mp3_info(blob)
    assert info["frames"] is None and info["bitrate_kbps"] == 128
    assert mp3_duration_ms(blob) == (len(blob) * 8) // 128


def test_mp3_rejects():
    assert mp3_duration_ms(b"") is None
    assert mp3_duration_ms(b"\x00" * 100) is None
    assert mp3_duration_ms(b"OggS" + b"\x00" * 40) is None
    # free-format (bitrate index 0) and bad samplerate index rejected
    assert parse_mp3_info(mp3_frame_header(bri=0) + b"\x00" * 50) is None
    assert parse_mp3_info(mp3_frame_header(sri=3) + b"\x00" * 50) is None


def test_fuzz_never_raises():
    rng = random.Random(0xEB31)
    bases = [webm(duration=1500.0, scale=1_000_000),
             mp3(frames=80), mp3(frames=None, tail=900)]
    for base in bases:
        for _ in range(200):
            b = bytearray(base)
            k = rng.randrange(3)
            if k == 0:
                b = b[: rng.randrange(len(b) + 1)]
            elif k == 1:
                for _ in range(rng.randrange(1, 8)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
            else:
                b += bytes(rng.randrange(256)
                           for _ in range(rng.randrange(1, 30)))
            webm_duration_ms(bytes(b))   # must not raise
            mp3_duration_ms(bytes(b))    # must not raise


def test_jvm_tags_and_probe_chain(spark):
    """media_format_col tags EBML as 'webm' and ID3/raw-sync as 'mp3'
    (durations stay NULL on both engines — Python-probe-only), and the
    frame_sample_plan default probe returns the real durations."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from py_stringsimjoin_spark.functions.media import (
        media_duration_col,
        media_format_col,
        py_container_duration_ms,
    )
    from py_stringsimjoin_spark.operators.multimodal import frame_sample_plan

    blobs = {1: webm(duration=2500.0), 2: mp3(frames=100, id3_pad=11),
             3: mp3(frames=None, tail=16000)}
    df = spark.createDataFrame([Row(id=k, payload=v) for k, v in blobs.items()])
    rows = {
        r["id"]: (r["f"], r["d"])
        for r in df.select(
            "id",
            media_format_col(F.col("payload")).alias("f"),
            media_duration_col(F.col("payload")).alias("d"),
        ).collect()
    }
    assert rows[1] == ("webm", None)
    assert rows[2] == ("mp3", None) and rows[3] == ("mp3", None)
    assert all(py_container_duration_ms(v) is None for v in blobs.values())

    got = {}
    for r in frame_sample_plan(df, "id", "payload", every_ms=1000).collect():
        got[r["id"]] = max(got.get(r["id"], 0), r["frame_ts_ms"])
    assert got[1] == 2000                      # 2500 ms -> ts 0,1000,2000
    want2 = 100 * 1152 * 1000 // 44100         # 2612 ms
    assert got[2] == (want2 - 1) // 1000 * 1000
