"""Media container header parsing — pure JVM expressions, zero Python.

Real image metadata (format, width, height) extracted from the leading
bytes of a ``binary`` column without any codec library: PNG and GIF carry
dimensions at fixed offsets; JPEG requires walking the variable-length
segment chain to the SOF marker, done here as a bounded ``F.aggregate``
fold (``JPEG_MAX_HOPS`` segments) so the whole parse stays inside
whole-stage codegen. Malformed / truncated / unknown payloads yield NULLs,
never errors — at crawl scale a parse failure is data, not an exception.

Also provides deterministic JVM-side fixture builders (``synth_*_hex``)
that assemble byte-exact PNG/GIF/JPEG headers from integer columns via hex
string concatenation + ``unhex`` — used by tests and the ``media_meta_docs``
driver query so the parser is exercised on real container bytes while the
DuckDB oracle checks pure arithmetic.

Capability positioning vs the reference: py_stringsimjoin has no media
support; this implements the brief's multimodal-metadata ask (typed
metadata over opaque binary columns) for the LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# SOF0-SOF15 minus DHT(C4)/JPG(C8)/DAC(CC): the frame headers that carry
# image dimensions (ITU T.81 table B.1)
_SOF_MARKERS = [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
# segments a scanner can meet before SOF in real files: APPn (0-15) + COM +
# DQT/DHT/DRI interleavings — 24 hops covers every layout seen in practice
JPEG_MAX_HOPS = 24

_PNG_SIG_HEX = "89504E470D0A1A0A"


def _be(b: Column, pos, n: int) -> Column:
    """Big-endian unsigned int from ``n`` bytes at 1-based position ``pos``
    (pos may be a Column). Out-of-range reads yield NULL, not errors."""
    return F.conv(F.hex(F.substring(b, pos, n)), 16, 10).cast("long")


def _is_png(b: Column) -> Column:
    return (
        (F.length(b) >= 24)
        & (F.hex(F.substring(b, 1, 8)) == _PNG_SIG_HEX)
        & (F.substring(b, 13, 4).cast("string") == "IHDR")
    )


def _is_gif(b: Column) -> Column:
    return (F.length(b) >= 10) & F.substring(b, 1, 6).cast("string").isin(
        "GIF87a", "GIF89a"
    )


def _is_jpeg(b: Column) -> Column:
    return (F.length(b) >= 4) & (F.hex(F.substring(b, 1, 2)) == "FFD8")


def _jpeg_dims(b: Column, max_hops: int = JPEG_MAX_HOPS) -> Column:
    """struct(w, h) from the first SOF segment, via a bounded fold over the
    segment chain. State: (off = 1-based position of the segment's 0xFF
    byte, w, h); a hop either records SOF dims, advances past a segment, or
    parks the offset at -1 (done / malformed)."""

    def hop(acc: Column, _: Column) -> Column:
        off, w, h = acc["off"], acc["w"], acc["h"]
        valid = F.coalesce(
            (off > 0) & (off + 3 <= F.length(b)) & (_be(b, off, 1) == 0xFF),
            F.lit(False),
        )
        m = _be(b, off + 1, 1)
        seglen = _be(b, off + 2, 2)
        is_sof = F.coalesce(m.isin(*_SOF_MARKERS), F.lit(False)) & valid
        # TEM(01) / RSTn(D0-D7) / SOI(D8) are standalone (no length field);
        # EOI(D9)/SOS(DA) end the metadata section — dims not found
        standalone = (m == 0x01) | ((m >= 0xD0) & (m <= 0xD8))
        ended = F.coalesce((m == 0xD9) | (m == 0xDA), F.lit(True))
        new_w = F.when(w.isNotNull(), w).when(
            is_sof, _be(b, off + 7, 2).cast("int")
        )
        new_h = F.when(h.isNotNull(), h).when(
            is_sof, _be(b, off + 5, 2).cast("int")
        )
        new_off = (
            F.when(w.isNotNull() | ~valid | is_sof | ended, F.lit(-1).cast("long"))
            .when(standalone, off + 2)
            .otherwise(off + 2 + seglen)
        )
        return F.struct(new_off.alias("off"), new_w.alias("w"), new_h.alias("h"))

    init = F.struct(
        F.lit(3).cast("long").alias("off"),
        F.lit(None).cast("int").alias("w"),
        F.lit(None).cast("int").alias("h"),
    )
    return F.aggregate(F.sequence(F.lit(1), F.lit(max_hops)), init, hop)


def media_format_col(b: Column) -> Column:
    """'png' | 'gif' | 'jpeg' | NULL from the payload's magic bytes."""
    return (
        F.when(_is_png(b), F.lit("png"))
        .when(_is_gif(b), F.lit("gif"))
        .when(_is_jpeg(b), F.lit("jpeg"))
        .otherwise(F.lit(None).cast("string"))
    )


def media_dims_col(b: Column) -> Column:
    """struct(width, height) parsed from PNG IHDR / GIF logical screen
    descriptor / JPEG SOF; NULLs when the format is unknown or truncated."""
    jd = _jpeg_dims(b)
    w = (
        F.when(_is_png(b), _be(b, 17, 4).cast("int"))
        .when(_is_gif(b), (_be(b, 7, 1) + _be(b, 8, 1) * 256).cast("int"))
        .when(_is_jpeg(b), jd["w"])
        .otherwise(F.lit(None).cast("int"))
    )
    h = (
        F.when(_is_png(b), _be(b, 21, 4).cast("int"))
        .when(_is_gif(b), (_be(b, 9, 1) + _be(b, 10, 1) * 256).cast("int"))
        .when(_is_jpeg(b), jd["h"])
        .otherwise(F.lit(None).cast("int"))
    )
    return F.struct(w.alias("width"), h.alias("height"))


# ---------------------------------------------------------------------------
# deterministic fixture builders (JVM hex assembly -> unhex); byte counts are
# closed-form so oracles can check n_bytes arithmetically:
#   PNG  = 33 bytes   (sig 8 + IHDR len/type 8 + data 13 + crc 4)
#   GIF  = 10 bytes   (header 6 + logical screen w/h 4)
#   JPEG = 25 + pad   (SOI 2 + COM [marker 2 + len 2 + pad] + SOF0 2+17)
# ---------------------------------------------------------------------------

def _hex_be(v: Column, nbytes: int) -> Column:
    return F.lpad(F.hex(v.cast("long")), 2 * nbytes, "0")


def _hex_le16(v: Column) -> Column:
    v = v.cast("long")
    return F.concat(_hex_be(v % 256, 1), _hex_be((v / 256).cast("long"), 1))


def synth_png_hex(w: Column, h: Column) -> Column:
    return F.concat(
        F.lit(_PNG_SIG_HEX + "0000000D" + "49484452"),
        _hex_be(w, 4),
        _hex_be(h, 4),
        F.lit("0806000000" + "00000000"),
    )


def synth_gif_hex(w: Column, h: Column) -> Column:
    return F.concat(F.lit("474946383961"), _hex_le16(w), _hex_le16(h))


def synth_jpeg_hex(w: Column, h: Column, pad: Column) -> Column:
    """SOI + a COM segment of ``2 + pad`` payload bytes (forces the parser
    to actually walk a variable-length segment) + SOF0 with the dims."""
    pad = pad.cast("int")
    zeros = F.substring(F.lit("0" * 512), F.lit(1), pad * 2)
    return F.concat(
        F.lit("FFD8" + "FFFE"),
        _hex_be(F.lit(2) + pad, 2),
        zeros,
        F.lit("FFC0" + "0011" + "08"),
        _hex_be(h, 2),
        _hex_be(w, 2),
        F.lit("03" + "011100" + "021101" + "031101"),
    )


def synth_media_bytes(fmt: Column, w: Column, h: Column, pad: Column) -> Column:
    """binary PNG/GIF/JPEG header per the ``fmt`` column ('png'/'gif'/'jpeg')."""
    return F.unhex(
        F.when(fmt == "png", synth_png_hex(w, h))
        .when(fmt == "gif", synth_gif_hex(w, h))
        .otherwise(synth_jpeg_hex(w, h, pad))
    )
