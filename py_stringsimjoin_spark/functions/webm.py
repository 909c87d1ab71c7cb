"""Matroska/WebM duration via an EBML walk — ZERO codec libraries.

WebM (VP8/VP9/AV1 video, Vorbis/Opus audio) is the dominant royalty-free
web video container; its framing is EBML (RFC 8794): every element is
(varint id, varint size, payload). Duration needs no codec: the Segment's
Info element carries TimestampScale (ns per tick, default 1,000,000) and
Duration (float ticks). The walk descends exactly three master levels
(EBML header / Segment -> Info -> fields) and skips siblings by size —
O(#top-level-siblings), not O(filesize), because Clusters are skipped
whole.

Honest coverage: metadata only. VP8/VP9/AV1 frame decode genuinely needs
a codec library and stays stub-routed (operators/multimodal.py); the
unbounded sibling walk is Python-probe-only, like Ogg — the JVM
``media_format_col`` tags the EBML magic as 'webm'.

Scale shape: runs inside the declared ``mapInPandas`` batch stage; the
probe touches only the header bytes it skips across (seeks, not reads,
in a real filesystem; bounded slices here).
"""

from __future__ import annotations

import struct

_EBML_MAGIC = b"\x1a\x45\xdf\xa3"
_SEGMENT_ID = 0x18538067
_INFO_ID = 0x1549A966
_TIMESTAMP_SCALE_ID = 0x2AD7B1
_DURATION_ID = 0x4489


def _varint(b: bytes, off: int, keep_marker: bool):
    """(value, next_off, all_ones) for an EBML varint at ``off``; None on
    underrun or a reserved all-zero marker byte. Element IDs keep the
    length-marker bit (RFC 8794 reads IDs as raw VINT), sizes strip it;
    ``all_ones`` flags the every-value-bit-set "unknown size" encoding at
    ANY length (not just the 8-byte form muxers usually emit)."""
    if off >= len(b):
        return None
    first = b[off]
    if first == 0:
        return None
    n = 8 - first.bit_length()  # leading zero bits -> total length n+1
    length = n + 1
    if off + length > len(b):
        return None
    v = first if keep_marker else first & ((1 << (7 - n)) - 1)
    for i in range(1, length):
        v = (v << 8) | b[off + i]
    stripped = v & ((1 << (7 * length)) - 1)
    return v, off + length, stripped == (1 << (7 * length)) - 1


def _walk(b: bytes, off: int, end: int, max_children: int = 512):
    """Yield (element_id, payload_start, payload_end) for the children of
    [off, end); stops silently on malformed bytes."""
    for _ in range(max_children):
        if off >= end:
            return
        got = _varint(b, off, keep_marker=True)
        if got is None:
            return
        eid, off, _ = got
        got = _varint(b, off, keep_marker=False)
        if got is None:
            return
        size, off, unknown = got
        # "unknown size": the payload runs to the end of the enclosing scope
        # (live-muxed Segments use this)
        pend = end if unknown else min(end, off + size)
        yield eid, off, pend
        off = pend


def parse_webm_info(payload: bytes):
    """dict(timestamp_scale_ns, duration_ticks) from Segment>Info; None
    when the payload is not EBML or carries no Duration."""
    b = payload or b""
    if b[:4] != _EBML_MAGIC:
        return None
    scale, dur = 1_000_000, None
    for eid, ps, pe in _walk(b, 0, len(b)):
        if eid != _SEGMENT_ID:
            continue
        for eid2, ps2, pe2 in _walk(b, ps, pe):
            if eid2 != _INFO_ID:
                continue
            for eid3, ps3, pe3 in _walk(b, ps2, pe2):
                raw = b[ps3:pe3]
                if eid3 == _TIMESTAMP_SCALE_ID and raw:
                    scale = int.from_bytes(raw, "big")
                elif eid3 == _DURATION_ID:
                    if len(raw) == 4:
                        dur = struct.unpack(">f", raw)[0]
                    elif len(raw) == 8:
                        dur = struct.unpack(">d", raw)[0]
            break
        break
    if dur is None or dur < 0 or scale <= 0:
        return None
    return {"timestamp_scale_ns": scale, "duration_ticks": dur}


def webm_duration_ms(payload: bytes):
    """Duration in ms (ticks x scale, ns -> ms floor); None for non-EBML /
    malformed / duration-less streams."""
    info = parse_webm_info(payload)
    if info is None:
        return None
    ms = int(info["duration_ticks"] * info["timestamp_scale_ns"]) // 1_000_000
    return ms if ms > 0 else None
