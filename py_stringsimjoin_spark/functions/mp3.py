"""MP3 duration via frame-header math — ZERO codec libraries.

MP3 audio decode (hybrid filterbank + Huffman) genuinely needs a codec
and stays stub-routed, but DURATION is pure header arithmetic (ISO 11172-3
frame header fields are public):

* skip an ID3v2 tag (synchsafe size), find the first 0xFFE sync;
* VBR: the first frame usually carries a Xing/Info block whose frame
  count is exact — duration = frames x samples_per_frame / sample_rate;
* CBR fallback: duration = audio_bytes x 8 / bitrate from the first
  frame's bitrate/samplerate indices.

Scale shape: header-bytes-only probe inside the declared ``mapInPandas``
batch stage (same tier as functions/ogg.py / webm.py); the JVM
``media_format_col`` cannot express the ID3-skip + sync scan, so MP3 is
Python-probe-only.
"""

from __future__ import annotations

# Layer III bitrate (kbps) by [version_group][index]; index 0 = free, 15 bad
_BR_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_BR_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_SR = {3: [44100, 48000, 32000],      # MPEG1
       2: [22050, 24000, 16000],      # MPEG2
       0: [11025, 12000, 8000]}       # MPEG2.5


def _first_frame(b: bytes):
    """(offset, version_bits, bitrate_kbps, sample_rate, spf, side_info)
    of the first Layer III frame after any ID3v2 tag; None if no valid
    sync in the first 64 KiB."""
    off = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) \
            | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        off = 10 + size
    end = min(len(b) - 4, off + 65536)
    while off <= end:
        if b[off] == 0xFF and (b[off + 1] & 0xE0) == 0xE0:
            ver = (b[off + 1] >> 3) & 0x03      # 3=MPEG1 2=MPEG2 0=MPEG2.5
            layer = (b[off + 1] >> 1) & 0x03    # 1 = Layer III
            bri = (b[off + 2] >> 4) & 0x0F
            sri = (b[off + 2] >> 2) & 0x03
            if ver != 1 and layer == 1 and 0 < bri < 15 and sri < 3:
                rate = _SR[ver][sri]
                br = (_BR_V1_L3 if ver == 3 else _BR_V2_L3)[bri]
                spf = 1152 if ver == 3 else 576
                mono = ((b[off + 3] >> 6) & 0x03) == 3
                if ver == 3:
                    side = 17 if mono else 32
                else:
                    side = 9 if mono else 17
                return off, ver, br, rate, spf, side
        off += 1
    return None


def parse_mp3_info(payload: bytes):
    """dict(sample_rate, bitrate_kbps, frames|None, vbr) from the first
    frame (+ Xing/Info block when present); None when no MP3 sync."""
    b = payload or b""
    if len(b) < 8:
        return None
    got = _first_frame(b)
    if got is None:
        return None
    off, ver, br, rate, spf, side = got
    xoff = off + 4 + side
    frames = None
    vbr = False
    tag = b[xoff:xoff + 4]
    if tag in (b"Xing", b"Info") and len(b) >= xoff + 12:
        flags = int.from_bytes(b[xoff + 4:xoff + 8], "big")
        if flags & 1:
            frames = int.from_bytes(b[xoff + 8:xoff + 12], "big")
            vbr = tag == b"Xing"
    return {"sample_rate": rate, "bitrate_kbps": br, "frames": frames,
            "vbr": vbr, "audio_off": off, "spf": spf}


def mp3_duration_ms(payload: bytes):
    """Exact (Xing/Info frame count) or CBR-estimated duration in ms; None
    for non-MP3 / zero-length payloads."""
    info = parse_mp3_info(payload)
    if info is None:
        return None
    if info["frames"]:
        return (info["frames"] * info["spf"] * 1000) // info["sample_rate"]
    if not info["bitrate_kbps"]:
        return None
    nbytes = len(payload) - info["audio_off"]
    ms = (nbytes * 8) // info["bitrate_kbps"]
    return ms if ms > 0 else None
