"""Progressive-JPEG decoder tests against an independent test-side
progressive ENCODER (T.81 Annex G: spectral selection + successive
approximation, DC/AC first + refinement scans, EOBRUN, restarts).

The oracle is exact: a progressive encoding carries the SAME quantized
coefficients as the baseline encoding of the same image (same forward DCT,
same quant table), so ``decode_jpeg(progressive) == decode_jpeg(baseline)``
must hold BIT-IDENTICALLY. That checks every scan kind end to end without
any codec library.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from py_stringsimjoin_spark.functions.jpeg import ZIGZAG, decode_jpeg

from .test_jpeg import (
    _AC_BITS,
    _AC_VALS,
    _DC_BITS,
    _DC_VALS,
    _MF,
    _BitWriter,
    _downsample,
    _enc_table,
    _mag,
    _rng_img,
    _seg,
    encode_jpeg,
)

# progressive AC table: the sequential test table + EOBn symbols r=1..14
# (EOB0 = 0x00 already present; sequential tables never need longer runs)
_AC_VALS_PROG = [0x00] + [r << 4 for r in range(1, 15)] + _AC_VALS
# EOB0 gets the one 2-bit code; all other symbols are 9-bit
_AC_BITS_PROG = [0, 1, 0, 0, 0, 0, 0, 0, len(_AC_VALS_PROG) - 1] + [0] * 7
_DC_ENC_P = _enc_table(_DC_BITS, _DC_VALS)
_AC_ENC_P = _enc_table(_AC_BITS_PROG, _AC_VALS_PROG)

# default scan script (libjpeg-style): DC first at Al=1; banded AC first
# scans at mixed Al; AC refinement down to Al=0; DC refinement last
_SCRIPT_COLOR = [
    ([0, 1, 2], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([2], 1, 63, 0, 1),
    ([1], 1, 63, 0, 1),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0, 1, 2], 0, 0, 1, 0),
    ([2], 1, 63, 1, 0),
    ([1], 1, 63, 1, 0),
    ([0], 1, 63, 1, 0),
]
_SCRIPT_GRAY = [
    ([0], 0, 0, 0, 1),
    ([0], 1, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0], 0, 0, 1, 0),
    ([0], 1, 63, 1, 0),
]
# pure spectral selection, no successive approximation
_SCRIPT_SPECTRAL = [
    ([0, 1, 2], 0, 0, 0, 0),
    ([0], 1, 5, 0, 0),
    ([0], 6, 63, 0, 0),
    ([1], 1, 63, 0, 0),
    ([2], 1, 63, 0, 0),
]


def _quantized_blocks(img, q, sub):
    """(h, w, comps, blocks) where blocks[j] is int64 [BY, BX, 64] zigzag
    quantized coefficients over the MCU-padded grid — the same coefficients
    the baseline test encoder produces."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        comps = [(1, 1, 1, 0)]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        sh, sv = sub
        planes = [y, _downsample(cb, sv, sh), _downsample(cr, sv, sh)]
        comps = [(1, sh, sv, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    qtab = np.full((8, 8), float(q))
    blocks = []
    for p, (_, H, V, _) in zip(planes, comps):
        th, tw = mcus_y * 8 * V, mcus_x * 8 * H
        pad = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                     mode="edge")
        by, bx = th // 8, tw // 8
        tiles = pad.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        dct = np.round(np.einsum("xu,byxw,wv->byuv", _MF, tiles - 128.0, _MF), 6)
        coef = np.round(dct / qtab).astype(np.int64)
        blocks.append(coef.reshape(by, bx, 64)[..., ZIGZAG])  # zigzag order
    return h, w, comps, blocks


class _ProgWriter:
    """Entropy writer for one progressive scan, with EOBRUN + buffered
    correction bits (T.81 G.1.2.2 / the jcphuff structure re-derived)."""

    def __init__(self, restart=0):
        self.w = _BitWriter()
        self.out = bytearray()
        self.eobrun = 0
        self.be = []      # correction bits owned by the pending EOB run
        self.restart = restart
        self.rst = 0

    def sym(self, enc, code):
        ln, c = enc[code]
        self.w.bits(c, ln)

    def flush_eob(self):
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.sym(_AC_ENC_P, r << 4)
            if r:
                self.w.bits(self.eobrun - (1 << r), r)
            for bit in self.be:
                self.w.bit(bit)
            self.be = []
            self.eobrun = 0

    def boundary(self):
        """Restart boundary: flush run state, byte-align, emit RSTn."""
        self.flush_eob()
        self.w.align()
        self.out += bytes(self.w.out)
        self.out += bytes([0xFF, 0xD0 + self.rst % 8])
        self.rst += 1
        self.w = _BitWriter()

    def finish(self):
        self.flush_eob()
        self.w.align()
        self.out += bytes(self.w.out)
        return bytes(self.out)


def _enc_dc_first(pw, blocks_sel, order, al, preds):
    for j, by, bx in order:
        v = int(blocks_sel[j][by, bx, 0]) >> al   # arithmetic shift
        s, bits = _mag(v - preds[j])
        pw.sym(_DC_ENC_P, s)
        if s:
            pw.w.bits(bits, s)
        preds[j] = v


def _enc_dc_refine(pw, blocks_sel, order, al):
    for j, by, bx in order:
        pw.w.bit((int(blocks_sel[j][by, bx, 0]) >> al) & 1)


def _enc_ac_first(pw, blk, ss, se, al):
    vals = [int(v) for v in blk[ss:se + 1]]
    shifted = [(1 if v > 0 else -1) * (abs(v) >> al) for v in vals]
    if not any(shifted):
        pw.eobrun += 1
        if pw.eobrun == 0x7FFF:
            pw.flush_eob()
        return
    pw.flush_eob()
    r = 0
    last_nz = max(i for i, v in enumerate(shifted) if v)
    for i, v in enumerate(shifted):
        if i > last_nz:
            break
        if v == 0:
            r += 1
            continue
        while r > 15:
            pw.sym(_AC_ENC_P, 0xF0)
            r -= 16
        s, bits = _mag(v)
        pw.sym(_AC_ENC_P, (r << 4) | s)
        pw.w.bits(bits, s)
        r = 0
    if last_nz < len(shifted) - 1:
        pw.eobrun += 1
        if pw.eobrun == 0x7FFF:
            pw.flush_eob()


def _enc_ac_refine(pw, blk, ss, se, al):
    vals = [int(v) for v in blk[ss:se + 1]]
    absv = [abs(v) >> al for v in vals]
    eobpos = -1
    for i, a in enumerate(absv):
        if a == 1:
            eobpos = i  # last NEWLY-significant coefficient
    r = 0
    br = []  # correction bits since the last emitted symbol
    for i, a in enumerate(absv):
        if a == 0:
            r += 1
            continue
        while r > 15 and i <= eobpos:
            pw.flush_eob()
            pw.sym(_AC_ENC_P, 0xF0)
            r -= 16
            for bit in br:
                pw.w.bit(bit)
            br = []
        if a > 1:  # already significant: buffer its correction bit
            br.append((abs(vals[i]) >> al) & 1)
            continue
        # newly significant: RS + sign, then the buffered corrections
        pw.flush_eob()
        pw.sym(_AC_ENC_P, (r << 4) | 1)
        pw.w.bit(1 if vals[i] > 0 else 0)
        for bit in br:
            pw.w.bit(bit)
        br = []
        r = 0
    if r > 0 or br:
        pw.eobrun += 1
        pw.be.extend(br)
        if pw.eobrun == 0x7FFF:
            pw.flush_eob()


def encode_jpeg_progressive(img, q=1, sub=(1, 1), script=None, restart=0):
    """Minimal progressive (SOF2) encoder over the same quantized
    coefficients as the baseline test encoder. ``script`` entries are
    (component_indices, Ss, Se, Ah, Al); default exercises every scan kind.
    ``restart`` inserts RSTn every N MCUs/blocks in every scan."""
    h, w, comps, blocks = _quantized_blocks(img, q, sub)
    gray = len(comps) == 1
    if script is None:
        script = _SCRIPT_GRAY if gray else _SCRIPT_COLOR
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    qtab = np.full((8, 8), float(q))
    out = bytearray(b"\xff\xd8")
    qzz = bytes(qtab.flatten()[ZIGZAG].astype(np.uint8))
    out += _seg(0xDB, bytes([0x00]) + qzz)
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + qzz)
    sofp = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sofp += bytes([len(comps)])
    for cid, H, V, tq in comps:
        sofp += bytes([cid, (H << 4) | V, tq])
    out += _seg(0xC2, sofp)  # SOF2: progressive
    for tid in range(1 if gray else 2):
        out += _seg(0xC4, bytes([tid]) + bytes(_DC_BITS) + bytes(_DC_VALS))
        out += _seg(0xC4, bytes([0x10 | tid]) + bytes(_AC_BITS_PROG)
                    + bytes(_AC_VALS_PROG))
    if restart:
        out += _seg(0xDD, restart.to_bytes(2, "big"))
    for comp_sel, ss, se, ah, al in script:
        sosp = bytes([len(comp_sel)])
        for j in comp_sel:
            tid = 0 if j == 0 else 1
            sosp += bytes([comps[j][0], (tid << 4) | tid])
        sosp += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sosp)
        pw = _ProgWriter(restart)
        if ss == 0:  # DC scan
            if len(comp_sel) > 1:
                units = []
                for m in range(mcus_x * mcus_y):
                    my, mx = divmod(m, mcus_x)
                    unit = []
                    for j in comp_sel:
                        _, H, V, _ = comps[j]
                        for v in range(V):
                            for u in range(H):
                                unit.append((j, my * V + v, mx * H + u))
                    units.append(unit)
            else:
                j = comp_sel[0]
                _, H, V, _ = comps[j]
                cw = -(-w * H // hmax)
                ch = -(-h * V // vmax)
                bw, bh = -(-cw // 8), -(-ch // 8)
                units = [[(j, m // bw, m % bw)]
                         for m in range(bw * bh)]
            preds = {j: 0 for j in comp_sel}
            for m, unit in enumerate(units):
                if restart and m and m % restart == 0:
                    pw.boundary()
                    preds = {j: 0 for j in comp_sel}
                if ah == 0:
                    _enc_dc_first(pw, blocks, unit, al, preds)
                else:
                    _enc_dc_refine(pw, blocks, unit, al)
        else:        # AC scan: single component
            j = comp_sel[0]
            _, H, V, _ = comps[j]
            cw = -(-w * H // hmax)
            ch = -(-h * V // vmax)
            bw, bh = -(-cw // 8), -(-ch // 8)
            for m in range(bw * bh):
                if restart and m and m % restart == 0:
                    pw.boundary()
                blk = blocks[j][m // bw, m % bw]
                if ah == 0:
                    _enc_ac_first(pw, blk, ss, se, al)
                else:
                    _enc_ac_refine(pw, blk, ss, se, al)
        out += pw.finish()
    out += b"\xff\xd9"
    return bytes(out)


def _assert_prog_equals_baseline(img, q=1, sub=(1, 1), script=None, restart=0):
    base = decode_jpeg(encode_jpeg(img, q=q, sub=sub))
    prog = decode_jpeg(encode_jpeg_progressive(img, q=q, sub=sub,
                                               script=script, restart=restart))
    assert base is not None and prog is not None
    np.testing.assert_array_equal(prog, base)


def test_progressive_gray_exact_vs_baseline():
    for h, w in [(8, 8), (24, 17), (7, 5), (1, 1), (16, 33)]:
        _assert_prog_equals_baseline(_rng_img(h, w, h * 7 + w, gray=True))


def test_progressive_color_444_exact_vs_baseline():
    _assert_prog_equals_baseline(_rng_img(19, 26, 3))
    _assert_prog_equals_baseline(_rng_img(32, 32, 4), q=4)


def test_progressive_subsampled_exact_vs_baseline():
    for sub in [(2, 2), (2, 1), (1, 2)]:
        _assert_prog_equals_baseline(_rng_img(33, 40, 11), q=2, sub=sub)


def test_progressive_spectral_only_script():
    _assert_prog_equals_baseline(_rng_img(21, 18, 13), script=_SCRIPT_SPECTRAL)


def test_progressive_smooth_image_long_eobruns():
    # a flat image makes EVERY AC block empty -> maximal EOB runs
    img = np.full((40, 48), 130, dtype=np.uint8)
    _assert_prog_equals_baseline(img)
    yy, xx = np.meshgrid(np.arange(40), np.arange(48), indexing="ij")
    smooth = ((yy + xx) // 4).astype(np.uint8)
    _assert_prog_equals_baseline(smooth, q=8)


def test_progressive_restart_markers():
    _assert_prog_equals_baseline(_rng_img(32, 24, 3), restart=2)
    _assert_prog_equals_baseline(_rng_img(40, 16, 5, gray=True), restart=3)


def test_extended_sequential_sof1_decodes():
    img = _rng_img(16, 16, 5, gray=True)
    good = encode_jpeg(img, q=1)
    sof_at = good.find(b"\xff\xc0")
    ext = good[:sof_at + 1] + b"\xc1" + good[sof_at + 2:]
    np.testing.assert_array_equal(decode_jpeg(ext), decode_jpeg(good))


def test_progressive_fuzz_never_raises():
    img = _rng_img(24, 16, 9)
    good = encode_jpeg_progressive(img, q=2, sub=(2, 2), restart=3)
    rnd = random.Random(11)
    blobs = [good[:n] for n in range(0, len(good), 53)]
    for _ in range(150):
        mut = bytearray(good)
        for _ in range(rnd.randint(1, 6)):
            mut[rnd.randrange(len(mut))] = rnd.randrange(256)
        blobs.append(bytes(mut))
    for blob in blobs:
        out = decode_jpeg(blob)  # array or None, never an exception
        assert out is None or out.dtype == np.uint8
