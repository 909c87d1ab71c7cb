"""IMA + MS ADPCM WAV decode (functions/codecs.py) vs independent
test-side encoders.

Both codecs are fully-specified integer state machines, so the oracle is
exact: the encoders below (written fresh from the published IMA-1992 /
Microsoft specs, sharing no code with the decoder) track the decoder
state transitions themselves; ``decode_wav_pcm`` must reproduce the
tracked samples bit-identically. Lossy-vs-source is irrelevant — the
nibble stream determines the output exactly.

Reference relevance: py_stringsimjoin has no media support; this extends
the brief's multimodal-decode ask (same tier as tests/test_flac.py).
"""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from py_stringsimjoin_spark.functions.codecs import decode_wav_pcm

# --- independent spec tables (typed fresh, not imported from the decoder) --

IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767]
IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]
MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
            768, 614, 512, 409, 307, 230, 230, 230]
MS_COEFS = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
            (460, -208), (392, -232)]


def _cl16(v):
    return max(-32768, min(32767, v))


def _ima_decode_step(pred, index, nib):
    step = IMA_STEPS[index]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    pred = _cl16(pred - diff if nib & 8 else pred + diff)
    return pred, max(0, min(88, index + IMA_INDEX[nib & 7]))


def _ima_pick_nibble(sample, pred, index):
    """Spec's reference encoder: sign bit + greedy step subtraction."""
    diff = sample - pred
    nib = 0
    if diff < 0:
        nib = 8
        diff = -diff
    step = IMA_STEPS[index]
    if diff >= step:
        nib |= 4
        diff -= step
    if diff >= step >> 1:
        nib |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nib |= 1
    return nib


def encode_ima(samples, channels, groups_per_block):
    """(data_bytes, block_align, expected [n, ch] int) — blocks of one
    header sample + 8*groups nibble-coded samples per channel."""
    spb = 1 + 8 * groups_per_block
    block_align = 4 * channels + 4 * groups_per_block * channels
    n = (len(samples) // (spb * channels)) * spb  # whole blocks only
    cols = [[samples[i * channels + c] for i in range(n)]
            for c in range(channels)]
    data = bytearray()
    expected = [[] for _ in range(channels)]
    idxs = [0] * channels
    for b0 in range(0, n, spb):
        for c in range(channels):
            first = cols[c][b0]
            data += struct.pack("<h", first) + bytes([idxs[c], 0])
            expected[c].append(first)
        preds = [cols[c][b0] for c in range(channels)]
        for g in range(groups_per_block):
            for c in range(channels):
                for bi in range(4):
                    byte = 0
                    for half in range(2):  # low nibble first
                        s = cols[c][b0 + 1 + 8 * g + 2 * bi + half]
                        nib = _ima_pick_nibble(s, preds[c], idxs[c])
                        preds[c], idxs[c] = _ima_decode_step(
                            preds[c], idxs[c], nib)
                        expected[c].append(preds[c])
                        byte |= nib << (4 * half)
                    data.append(byte)
    exp = np.array(expected, dtype=np.int32).T
    return bytes(data), block_align, exp


def encode_ms(samples, channels, block_align, coef_idx=0):
    """(data_bytes, expected [n, ch] int) — MS ADPCM blocks with the given
    coef pair; nibbles HIGH-first, channel-interleaved."""
    spb = 2 + 2 * (block_align - 7 * channels) // channels
    n = (len(samples) // (spb * channels)) * spb
    cols = [[samples[i * channels + c] for i in range(n)]
            for c in range(channels)]
    c1, c2 = MS_COEFS[coef_idx]
    data = bytearray()
    expected = [[] for _ in range(channels)]
    for b0 in range(0, n, spb):
        s2 = [cols[c][b0] for c in range(channels)]
        s1 = [cols[c][b0 + 1] for c in range(channels)]
        delta = [max(16, abs(cols[c][b0 + 1] - cols[c][b0]) // 4 or 16)
                 for c in range(channels)]
        data += bytes([coef_idx] * channels)
        for c in range(channels):
            data += struct.pack("<h", delta[c])
        for c in range(channels):
            data += struct.pack("<h", s1[c])
        for c in range(channels):
            data += struct.pack("<h", s2[c])
        for c in range(channels):
            expected[c].extend([s2[c], s1[c]])
        nibs = []
        state = [(s1[c], s2[c], delta[c]) for c in range(channels)]
        for i in range(2, spb):
            for c in range(channels):
                a, b, d = state[c]
                pred = (a * c1 + b * c2) >> 8
                want = cols[c][b0 + i]
                q = max(-8, min(7, (want - pred) // d))
                dec = _cl16(pred + q * d)
                state[c] = (dec, a, max(16, (MS_ADAPT[q & 0x0F] * d) >> 8))
                expected[c].append(dec)
                nibs.append(q & 0x0F)
        for j in range(0, len(nibs), 2):
            lo = nibs[j + 1] if j + 1 < len(nibs) else 0
            data.append((nibs[j] << 4) | lo)
        data += b"\x00" * (block_align - (7 * channels
                                          + (len(nibs) + 1) // 2))
    exp = np.array(expected, dtype=np.int32).T
    return bytes(data), exp


def _wav(fmt_tag, channels, rate, bits, block_align, data, extra=b""):
    fmt = struct.pack("<HHIIHH", fmt_tag, channels, rate,
                      rate * block_align, block_align, bits)
    if extra:
        fmt += struct.pack("<H", len(extra)) + extra
    out = b"RIFF" + struct.pack("<I", 20 + len(fmt) + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def _walk(rng, n, lim=32000, step=900):
    v, out = 0, []
    for _ in range(n):
        v = max(-lim, min(lim, v + rng.randrange(-step, step + 1)))
        out.append(v)
    return out


# ---------------------------------------------------------------------------

@pytest.mark.parametrize("channels,groups", [(1, 1), (1, 4), (2, 2)])
def test_ima_adpcm_roundtrip(channels, groups):
    rng = random.Random(100 + channels * 10 + groups)
    samples = _walk(rng, (1 + 8 * groups) * channels * 5)
    data, ba, exp = encode_ima(samples, channels, groups)
    extra = struct.pack("<H", 1 + 8 * groups)
    blob = _wav(0x11, channels, 8000, 4, ba, data, extra)
    got = decode_wav_pcm(blob)
    assert got is not None
    arr, rate = got
    assert rate == 8000
    ints = np.rint(arr.astype(np.float64) * 32768.0).astype(np.int32)
    np.testing.assert_array_equal(ints, exp)


@pytest.mark.parametrize("coef_idx", range(7))
def test_ms_adpcm_all_coef_pairs(coef_idx):
    rng = random.Random(200 + coef_idx)
    ba = 32
    spb = 2 + 2 * (ba - 7)
    samples = _walk(rng, spb * 4)
    data, exp = encode_ms(samples, 1, ba, coef_idx)
    extra = struct.pack("<HH", spb, 7)
    for a, b in MS_COEFS:
        extra += struct.pack("<hh", a, b)
    blob = _wav(0x02, 1, 11025, 4, ba, data, extra)
    arr, rate = decode_wav_pcm(blob)
    ints = np.rint(arr.astype(np.float64) * 32768.0).astype(np.int32)
    np.testing.assert_array_equal(ints, exp)


def test_ms_adpcm_stereo():
    rng = random.Random(300)
    ba = 28  # stereo: 14 header bytes + 14 data bytes -> 16 samples/ch
    spb = 2 + 2 * (ba - 14) // 2
    samples = _walk(rng, spb * 2 * 6)
    data, exp = encode_ms(samples, 2, ba, coef_idx=1)
    blob = _wav(0x02, 2, 22050, 4, ba, data)
    arr, rate = decode_wav_pcm(blob)
    assert rate == 22050 and arr.shape[1] == 2
    ints = np.rint(arr.astype(np.float64) * 32768.0).astype(np.int32)
    np.testing.assert_array_equal(ints, exp)


def test_ima_adpcm_extreme_values_clamp():
    # force saturation at both rails: the clamp path must match exactly
    samples = ([32000] * 9 + [-32000] * 9) * 3
    data, ba, exp = encode_ima(samples, 1, 1)
    blob = _wav(0x11, 1, 8000, 4, ba, data)
    arr, _ = decode_wav_pcm(blob)
    ints = np.rint(arr.astype(np.float64) * 32768.0).astype(np.int32)
    np.testing.assert_array_equal(ints, exp)


def test_adpcm_rejects_malformed():
    rng = random.Random(400)
    samples = _walk(rng, 9 * 3)
    data, ba, _ = encode_ima(samples, 1, 1)
    # block_align not a multiple of the 4-byte group grid
    assert decode_wav_pcm(_wav(0x11, 1, 8000, 4, ba + 1, data)) is None
    # step index > 88 in a block header
    bad = bytearray(data)
    bad[2] = 89
    assert decode_wav_pcm(_wav(0x11, 1, 8000, 4, ba, bytes(bad))) is None
    # MS coef index out of range
    msd, _ = encode_ms(_walk(rng, 52 * 2), 1, 32)
    badms = bytearray(msd)
    badms[0] = 7
    assert decode_wav_pcm(_wav(0x02, 1, 8000, 4, 32, bytes(badms))) is None


def test_adpcm_fuzz_never_raises():
    rng = random.Random(0xADC)
    samples = _walk(rng, 9 * 4)
    data, ba, _ = encode_ima(samples, 1, 1)
    base = _wav(0x11, 1, 8000, 4, ba, data)
    msd, _ = encode_ms(_walk(rng, 52 * 2), 1, 32)
    base2 = _wav(0x02, 1, 8000, 4, 32, msd)
    for payload in (base, base2):
        for _ in range(150):
            b = bytearray(payload)
            k = rng.randrange(3)
            if k == 0:
                b = b[: rng.randrange(len(b) + 1)]
            elif k == 1:
                for _ in range(rng.randrange(1, 6)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
            else:
                b += bytes(rng.randrange(256)
                           for _ in range(rng.randrange(1, 30)))
            out = decode_wav_pcm(bytes(b))  # must not raise
            if out is not None:
                assert out[0].dtype == np.float32


def test_real_media_features_routes_adpcm():
    from py_stringsimjoin_spark.functions.codecs import real_media_features

    rng = random.Random(500)
    samples = _walk(rng, 9 * 8)
    data, ba, _ = encode_ima(samples, 1, 1)
    blob = _wav(0x11, 1, 8000, 4, ba, data)
    feats = real_media_features(blob, feat_dim=16)
    assert feats is not None and feats.shape == (16,)
    assert not np.isnan(feats).any()
