"""From-spec FLAC decoder (functions/flac_decode.py): fixtures are
byte-built by an independent in-test encoder (own bit-writer, own CRC
tables, forward difference equations applied explicitly), expected
statistics hand-computed from the input samples."""

import math

from kiwi_spark.functions.flac_decode import decode_flac


class _W:
    def __init__(self):
        self.bits: list[int] = []

    def w(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def ws(self, value: int, n: int):
        self.w(value & ((1 << n) - 1), n)

    def unary(self, q: int):
        self.bits.extend([0] * q)
        self.bits.append(1)

    def rice(self, value: int, param: int):
        folded = (value << 1) if value >= 0 else ((-value << 1) - 1)
        self.unary(folded >> param)
        if param:
            self.w(folded & ((1 << param) - 1), param)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def tobytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for b in self.bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
        return bytes(out)


# independent CRC implementations (table-driven, vs the decoder's bitwise)
_T8 = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _T8.append(_c)

_T16 = []
for _i in range(256):
    _c = _i << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _T16.append(_c)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _T8[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _T16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


def streaminfo(sr=44100, channels=1, bps=16) -> bytes:
    w = _W()
    w.w(16, 16)      # min block size
    w.w(65535, 16)   # max block size
    w.w(0, 24)
    w.w(0, 24)
    w.w(sr, 20)
    w.w(channels - 1, 3)
    w.w(bps - 1, 5)
    w.w(0, 36)       # total samples unknown
    body = w.tobytes() + b"\x00" * 16  # md5
    header = bytes([0x80]) + len(body).to_bytes(3, "big")  # last block, type 0
    return b"fLaC" + header + body


def frame(subframe_bits, block: int, ch_code: int, frame_no: int = 0) -> bytes:
    """One frame: header (block size via 8-bit code 6) + subframes + CRCs."""
    h = _W()
    h.w(0x3FFE, 14)  # sync
    h.w(0, 1)        # reserved
    h.w(0, 1)        # fixed blocking
    h.w(6, 4)        # block size: 8-bit at end of header
    h.w(0, 4)        # sample rate: streaminfo
    h.w(ch_code, 4)
    h.w(0, 3)        # sample size: streaminfo
    h.w(0, 1)        # reserved
    assert frame_no < 0x80
    h.w(frame_no, 8)  # utf8-coded frame number (single byte)
    h.w(block - 1, 8)
    header = h.tobytes()
    header += bytes([crc8(header)])

    body = _W()
    for sub in subframe_bits:
        sub(body)
    payload = header + body.tobytes()
    return payload + crc16(payload).to_bytes(2, "big")


def sub_verbatim(samples, bps=16):
    def write(w: _W):
        w.w(0, 1)
        w.w(1, 6)    # VERBATIM
        w.w(0, 1)    # no wasted bits
        for s in samples:
            w.ws(s, bps)
    return write


def sub_constant(value, bps=16):
    def write(w: _W):
        w.w(0, 1)
        w.w(0, 6)
        w.w(0, 1)
        w.ws(value, bps)
    return write


def sub_fixed(samples, order, bps=16, param=4, part_order=0):
    """Applies the FORWARD difference of the given order explicitly (the
    independent arithmetic) and rice-codes the residual."""
    coefs = {1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}.get(order, [])

    def write(w: _W):
        w.w(0, 1)
        w.w(8 + order, 6)
        w.w(0, 1)
        for s in samples[:order]:
            w.ws(s, bps)
        w.w(0, 2)            # rice method 0 (4-bit params)
        w.w(part_order, 4)
        n = len(samples)
        idx = order
        for part in range(1 << part_order):
            count = (n >> part_order) - (order if part == 0 else 0)
            w.w(param, 4)
            for _ in range(count):
                r = samples[idx] - sum(
                    c * samples[idx - 1 - j] for j, c in enumerate(coefs)
                )
                w.rice(r, param)
                idx += 1
    return write


def sub_lpc(samples, coefs, shift, bps=16, precision=12, param=4):
    order = len(coefs)

    def write(w: _W):
        w.w(0, 1)
        w.w(32 + order - 1, 6)
        w.w(0, 1)
        for s in samples[:order]:
            w.ws(s, bps)
        w.w(precision - 1, 4)
        w.ws(shift, 5)
        for c in coefs:
            w.ws(c, precision)
        w.w(0, 2)
        w.w(0, 4)
        w.w(param, 4)
        for i in range(order, len(samples)):
            pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs)) >> shift
            w.rice(samples[i] - pred, param)
    return write


def _stats(chans, bps):
    scale = float(1 << (bps - 1))
    vals = [s / scale for ch in chans for s in ch]
    rms = math.sqrt(sum(v * v for v in vals) / len(vals))
    peak = max(abs(v) for v in vals)
    return rms, peak


def test_verbatim_mono():
    samples = [0, 16384, -16384, 0] * 8
    data = streaminfo() + frame([sub_verbatim(samples)], len(samples), 0)
    got = decode_flac(data)
    assert got is not None
    sr, ch, dur, rms, peak = got
    assert (sr, ch) == (44100, 1)
    assert dur == round(len(samples) * 1000 / 44100)
    exp_rms, exp_peak = _stats([samples], 16)
    assert abs(rms - exp_rms) < 1e-12 and abs(peak - exp_peak) < 1e-12


def test_constant_and_multiframe():
    f1 = frame([sub_constant(8192)], 16, 0, frame_no=0)
    f2 = frame([sub_constant(-4096)], 16, 0, frame_no=1)
    got = decode_flac(streaminfo() + f1 + f2)
    assert got is not None
    _, _, dur, rms, peak = got
    assert dur == round(32 * 1000 / 44100)
    exp_rms, exp_peak = _stats([[8192] * 16 + [-4096] * 16], 16)
    assert abs(rms - exp_rms) < 1e-12 and abs(peak - exp_peak) < 1e-12


def test_fixed_orders_reconstruct_polynomials():
    # order-2 on a quadratic: residual is the constant 2nd difference
    quad = [i * i for i in range(32)]
    got = decode_flac(
        streaminfo() + frame([sub_fixed(quad, 2, param=2)], 32, 0)
    )
    assert got is not None
    exp_rms, exp_peak = _stats([quad], 16)
    assert abs(got[3] - exp_rms) < 1e-12 and abs(got[4] - exp_peak) < 1e-12

    # order-4 on a cubic-ish signal, with 2 rice partitions
    sig = [((i * i * i) % 5000) - 2500 for i in range(32)]
    got = decode_flac(
        streaminfo()
        + frame([sub_fixed(sig, 4, param=9, part_order=1)], 32, 0)
    )
    assert got is not None
    exp_rms, exp_peak = _stats([sig], 16)
    assert abs(got[3] - exp_rms) < 1e-12 and abs(got[4] - exp_peak) < 1e-12


def test_lpc_subframe():
    # integrator filter: s[i] = s[i-1] + r  (coef 1, shift 0)
    sig = []
    acc = 0
    for i in range(24):
        acc += (7 * i) % 13 - 6
        sig.append(acc * 100)
    got = decode_flac(
        streaminfo() + frame([sub_lpc(sig, [1], 0)], 24, 0)
    )
    assert got is not None
    exp_rms, exp_peak = _stats([sig], 16)
    assert abs(got[3] - exp_rms) < 1e-12 and abs(got[4] - exp_peak) < 1e-12


def test_mid_side_stereo():
    left = [100 * i for i in range(16)]
    right = [1500 - 100 * i for i in range(16)]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    side = [l - r for l, r in zip(left, right)]
    data = streaminfo(channels=2) + frame(
        [sub_verbatim(mid, 16), sub_verbatim(side, 17)], 16, 10
    )
    got = decode_flac(data)
    assert got is not None
    assert got[1] == 2
    exp_rms, exp_peak = _stats([left, right], 16)
    assert abs(got[3] - exp_rms) < 1e-12 and abs(got[4] - exp_peak) < 1e-12


def test_left_side_and_right_side():
    left = [2000, -1000, 500, 0] * 4
    right = [100, 200, -300, 400] * 4
    side = [l - r for l, r in zip(left, right)]
    exp_rms, exp_peak = _stats([left, right], 16)
    # left/side (code 8): [left, side]; side has bps+1
    got = decode_flac(
        streaminfo(channels=2)
        + frame([sub_verbatim(left, 16), sub_verbatim(side, 17)], 16, 8)
    )
    assert got and abs(got[3] - exp_rms) < 1e-12 and abs(got[4] - exp_peak) < 1e-12
    # right/side (code 9): [side, right]
    got = decode_flac(
        streaminfo(channels=2)
        + frame([sub_verbatim(side, 17), sub_verbatim(right, 16)], 16, 9)
    )
    assert got and abs(got[3] - exp_rms) < 1e-12 and abs(got[4] - exp_peak) < 1e-12


def test_wasted_bits():
    samples = [s << 3 for s in (100, -200, 300, -400) * 4]

    def write(w: _W):
        w.w(0, 1)
        w.w(1, 6)          # verbatim
        w.w(1, 1)          # wasted-bits flag
        w.unary(2)         # wasted = 1 + 2 = 3
        for s in samples:
            w.ws(s >> 3, 13)  # bps 16 - 3 wasted
    got = decode_flac(streaminfo() + frame([write], 16, 0))
    assert got is not None
    exp_rms, exp_peak = _stats([samples], 16)
    assert abs(got[3] - exp_rms) < 1e-12 and abs(got[4] - exp_peak) < 1e-12


def test_rice_escape_partition():
    samples = [(i * 37) % 200 - 100 for i in range(16)]

    def write(w: _W):
        w.w(0, 1)
        w.w(8, 6)          # fixed order 0
        w.w(0, 1)
        w.w(0, 2)
        w.w(0, 4)          # one partition
        w.w(0xF, 4)        # escape
        w.w(9, 5)          # raw 9-bit residuals
        for s in samples:
            w.ws(s, 9)
    got = decode_flac(streaminfo() + frame([write], 16, 0))
    assert got is not None
    exp_rms, exp_peak = _stats([samples], 16)
    assert abs(got[3] - exp_rms) < 1e-12 and abs(got[4] - exp_peak) < 1e-12


def test_malformed_routes_to_none():
    good = streaminfo() + frame([sub_constant(1000)], 16, 0)
    assert decode_flac(good) is not None
    # corrupt header CRC
    bad = bytearray(good)
    bad[len(streaminfo()) + 4] ^= 0xFF
    assert decode_flac(bytes(bad)) is None
    # corrupt frame CRC16
    bad = bytearray(good)
    bad[-1] ^= 0x01
    assert decode_flac(bytes(bad)) is None
    # truncated mid-frame
    assert decode_flac(good[:-3]) is None
    # not flac at all
    assert decode_flac(b"RIFF....WAVE") is None
    assert decode_flac(b"") is None


def test_audio_features_operator_decodes_flac(spark):
    from kiwi_spark.operators.multimodal import (
        ASSET_SCHEMA,
        decode_audio_features,
    )

    samples = [0, 16384, -16384, 0] * 64
    payload = streaminfo() + frame(
        [sub_verbatim(samples[:128])], 128, 0, frame_no=0
    ) + frame([sub_verbatim(samples[128:])], 128, 0, frame_no=1)
    assets = spark.createDataFrame(
        [("fl1", "u1", "audio", bytearray(payload), ("audio/flac", None, None, None))],
        schema=ASSET_SCHEMA,
    )
    rows = decode_audio_features(assets).collect()
    assert len(rows) == 1
    row = rows[0]
    assert row["sample_rate"] == 44100 and row["n_channels"] == 1
    exp_rms, exp_peak = _stats([samples], 16)
    assert abs(row["rms"] - exp_rms) < 1e-9 and abs(row["peak"] - exp_peak) < 1e-9
