"""Baseline JPEG (SOF0) decoder with ZERO external codec libraries.

Baseline sequential JPEG is fully specified by ITU-T T.81: canonical Huffman
entropy coding, zigzag run-length AC coefficients, uniform dequantization,
and a separable 8x8 inverse DCT — all of which numpy + pure Python express
exactly. This closes the largest remaining "needs an external codec" gap in
``functions/codecs.py``: JPEG payloads now yield REAL pixels, so
``extract_media_features`` emits real image features for the dominant web
image format instead of the md5 stub.

Supported: baseline DCT (SOF0), 8-bit precision, 1 or 3 components, any
integer chroma subsampling (4:4:4, 4:2:2, 4:2:0, ...), restart markers,
multiple DQT/DHT segments, fill bytes, and DHT-less streams (MJPEG frames
inside AVI conventionally omit DHT and imply the T.81 Annex K typical
tables — the fallback kicks in per missing table id). Rejected as ``None``
(data, not errors): progressive/extended/lossless/arithmetic SOFs, 12-bit
precision, 4-component (CMYK) scans, truncated or corrupt entropy data.

Scale shape: the decoder runs inside the already-declared ``mapInPandas``
batch stage of ``extract_media_features`` / ``frame_sample_plan`` — per-batch
Python over binary payloads that never enter a shuffle. The per-bit Huffman
walk is pure Python (fine for thumbnail/web-image payloads; a production
cluster with a real codec wheel plugs into the same ``decode_fn`` hook).

Capability positioning vs the reference: py_stringsimjoin has no media
support (reference scope is string similarity joins); this implements the
brief's multimodal-decode ask.
"""

from __future__ import annotations

import numpy as np

# natural-order index of the k-th zigzag-scan element (T.81 figure A.6)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II basis: spatial = M @ coeffs @ M.T
_M = np.zeros((8, 8), dtype=np.float64)
for _x in range(8):
    for _u in range(8):
        c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
        _M[_x, _u] = 0.5 * c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def build_huffman(bits, vals):
    """Canonical Huffman table from the DHT (BITS, HUFFVAL) lists:
    dict[(code_length, code)] -> symbol. None when the spec is over-full
    (more codes at a length than the prefix space allows)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        n = bits[length - 1]
        if code + n > (1 << length):
            return None
        for _ in range(n):
            if k >= len(vals):
                return None
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over one entropy-coded segment (already
    unstuffed). Raises ValueError past the end — callers map that to None."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("bit underrun")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: magnitude bits -> signed coefficient."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# T.81 Annex K.3.3 "typical" Huffman specs. MJPEG frames inside AVI
# containers conventionally OMIT the DHT segment and imply these tables
# (OpenDML AVI spec); decode_jpeg falls back to them for any table id the
# stream never defined. (BITS, HUFFVAL) per (class, luma|chroma):
_K_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
_K_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12)))
_K_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_K_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])

_DEFAULT_HUFF_CACHE: dict = {}


def _default_huff(tc: int, th: int):
    """Annex K table for (class tc, id th): id 0 -> luma, others -> chroma
    (the MJPEG convention). Built once, cached."""
    key = (tc, 1 if th else 0)
    if key not in _DEFAULT_HUFF_CACHE:
        spec = {(0, 0): _K_DC_LUMA, (0, 1): _K_DC_CHROMA,
                (1, 0): _K_AC_LUMA, (1, 1): _K_AC_CHROMA}[key]
        _DEFAULT_HUFF_CACHE[key] = build_huffman(*spec)
    return _DEFAULT_HUFF_CACHE[key]


def _entropy_segments(b: bytes, pos: int):
    """Split the entropy-coded data starting at ``pos`` into restart
    segments (0xFF00 unstuffed, RSTn boundaries). Returns (segments, done)
    where done=True iff a terminating marker (EOI or next header) was
    seen."""
    segs = []
    cur = bytearray()
    i = pos
    n = len(b)
    while i < n:
        byte = b[i]
        if byte != 0xFF:
            cur.append(byte)
            i += 1
            continue
        if i + 1 >= n:
            return None
        nxt = b[i + 1]
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker: EOI or any next header ends the scan
            segs.append(bytes(cur))
            return segs
    return None


def _decode_block(reader, dc_table, ac_table, pred: int):
    """One 8x8 block: (zigzag coeff int32[64], new DC predictor)."""
    coeffs = np.zeros(64, dtype=np.int32)
    s = reader.read_symbol(dc_table)
    if s > 11:
        raise ValueError("bad DC category")
    diff = _extend(reader.read_bits(s), s) if s else 0
    pred += diff
    coeffs[0] = pred
    k = 1
    while k < 64:
        rs = reader.read_symbol(ac_table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if rs == 0xF0:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        coeffs[k] = _extend(reader.read_bits(s), s)
        k += 1
    return coeffs, pred


def decode_jpeg(payload: bytes):
    """uint8 pixel array [h, w, 3] (YCbCr->RGB) or [h, w, 1] (grayscale) for
    a baseline-sequential 8-bit JPEG; None for anything else (progressive,
    arithmetic, 12-bit, CMYK, truncated, corrupt). Pure stdlib + numpy."""
    b = payload or b""
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    qt = {}      # table id -> float64[64] in zigzag order
    huff = {}    # (class 0|1, table id) -> canonical table
    sof = None   # (h, w, [(comp_id, H, V, tq)])
    restart_interval = 0
    pos = 2
    try:
        while pos + 2 <= len(b):
            if b[pos] != 0xFF:
                return None
            # fill bytes: any number of 0xFF before the marker id
            while pos < len(b) and b[pos] == 0xFF:
                pos += 1
            if pos >= len(b):
                return None
            marker = b[pos]
            pos += 1
            if marker == 0xD9:  # EOI before any scan
                return None
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
                continue
            if pos + 2 > len(b):
                return None
            seglen = int.from_bytes(b[pos:pos + 2], "big")
            if seglen < 2 or pos + seglen > len(b):
                return None
            seg = b[pos + 2:pos + seglen]
            if marker == 0xDB:  # DQT: one or more tables
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 0x0F
                    if pq not in (0, 1):
                        return None
                    width = 2 if pq else 1
                    end = i + 1 + 64 * width
                    if end > len(seg):
                        return None
                    raw = seg[i + 1:end]
                    if pq:
                        vals = np.frombuffer(raw, dtype=">u2")
                    else:
                        vals = np.frombuffer(raw, dtype=np.uint8)
                    qt[tq] = vals.astype(np.float64)
                    i = end
            elif marker == 0xC4:  # DHT: one or more tables
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 0x0F
                    if tc not in (0, 1) or i + 17 > len(seg):
                        return None
                    bits = list(seg[i + 1:i + 17])
                    nv = sum(bits)
                    if i + 17 + nv > len(seg):
                        return None
                    vals = list(seg[i + 17:i + 17 + nv])
                    table = build_huffman(bits, vals)
                    if table is None:
                        return None
                    huff[(tc, th)] = table
                    i += 17 + nv
            elif marker == 0xC0:  # SOF0 baseline
                if len(seg) < 6 or seg[0] != 8:
                    return None
                h = int.from_bytes(seg[1:3], "big")
                w = int.from_bytes(seg[3:5], "big")
                ncomp = seg[5]
                if ncomp not in (1, 3) or len(seg) < 6 + 3 * ncomp or not (w and h):
                    return None
                comps = []
                for c in range(ncomp):
                    cid = seg[6 + 3 * c]
                    hv = seg[7 + 3 * c]
                    comps.append((cid, hv >> 4, hv & 0x0F, seg[8 + 3 * c]))
                if any(not (1 <= H <= 4 and 1 <= V <= 4) for _, H, V, _ in comps):
                    return None
                sof = (h, w, comps)
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # non-baseline SOF: unsupported, not an error
            elif marker == 0xDD:  # DRI
                if len(seg) < 2:
                    return None
                restart_interval = int.from_bytes(seg[0:2], "big")
            elif marker == 0xDA:  # SOS: decode and return
                if sof is None:
                    return None
                return _decode_scan(b, pos + seglen, seg, sof, qt, huff,
                                    restart_interval)
            # APPn / COM / others: skip
            pos += seglen
        return None
    except (ValueError, IndexError):
        return None


def _decode_scan(b, data_pos, sos, sof, qt, huff, restart_interval):
    h, w, comps = sof
    if len(sos) < 1:
        return None
    ns = sos[0]
    if ns != len(comps) or len(sos) < 1 + 2 * ns + 3:
        return None
    # scan component -> (frame comp index, dc table, ac table)
    order = []
    for i in range(ns):
        cs = sos[1 + 2 * i]
        tda = sos[2 + 2 * i]
        match = [j for j, (cid, _, _, _) in enumerate(comps) if cid == cs]
        if not match:
            return None
        j = match[0]
        dc = huff.get((0, tda >> 4)) or _default_huff(0, tda >> 4)
        ac = huff.get((1, tda & 0x0F)) or _default_huff(1, tda & 0x0F)
        if dc is None or ac is None or comps[j][3] not in qt:
            return None
        order.append((j, dc, ac))
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if any(hmax % c[1] or vmax % c[2] for c in comps):
        return None  # non-integer upsampling ratio
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [np.zeros((mcus_y * 8 * V, mcus_x * 8 * H), dtype=np.float32)
              for _, H, V, _ in comps]
    # dezigzagged quant table per component, as an 8x8 multiplier
    qtabs = []
    for _, _, _, tq in comps:
        q = np.zeros(64, dtype=np.float64)
        q[ZIGZAG] = qt[tq]
        qtabs.append(q.reshape(8, 8))
    segs = _entropy_segments(b, data_pos)
    if not segs:
        return None
    seg_idx = 0
    reader = _BitReader(segs[0])
    preds = [0] * len(comps)
    n_mcus = mcus_x * mcus_y
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                return None
            reader = _BitReader(segs[seg_idx])
            preds = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for j, dc_t, ac_t in order:
            _, H, V, _ = comps[j]
            for v in range(V):
                for u in range(H):
                    coeffs, preds[j] = _decode_block(reader, dc_t, ac_t,
                                                     preds[j])
                    blk = np.zeros(64, dtype=np.float64)
                    blk[ZIGZAG] = coeffs
                    spatial = _M @ (blk.reshape(8, 8) * qtabs[j]) @ _M.T
                    y0 = (my * V + v) * 8
                    x0 = (mx * H + u) * 8
                    planes[j][y0:y0 + 8, x0:x0 + 8] = spatial + 128.0
    # upsample every component to the full-resolution grid, crop, stack
    full = []
    for j, (_, H, V, _) in enumerate(comps):
        p = planes[j]
        if H != hmax or V != vmax:
            p = p.repeat(vmax // V, axis=0).repeat(hmax // H, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return gray.reshape(h, w, 1)
    y, cb, cr = (f.astype(np.float64) for f in full)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
