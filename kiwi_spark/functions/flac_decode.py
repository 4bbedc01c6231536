"""From-spec FLAC decoder (RFC 9639 / the published FLAC format) —
closes most of the "non-WAV audio" stub in operators/multimodal.py.

Scope: everything a conforming FLAC stream can contain on the audio
path — STREAMINFO + metadata walk, frame sync and header (UTF-8-coded
frame index, all block-size/sample-rate/sample-size code forms, CRC-8
verified), subframes CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32) with
wasted-bits, Rice residual (both 4- and 5-bit parameter methods,
partition orders, escape-to-raw), inter-channel decorrelation
(left/side, right/side, mid/side with the side channel's +1 bit), and
frame CRC-16. Output contract mirrors ``decode_wav``:
(sample_rate, n_channels, duration_ms, rms, peak) — the audio-feature
operator needs amplitude statistics, so samples normalize to [-1, 1).

Malformed input returns None (never raises); a stream that goes bad
mid-way decodes to None rather than emitting wrong statistics.

Like the sibling decoders (webp_decode, jpeg_decode), this is a scoped
re-implementation from the public specification, not a port of any
library. The fixed-predictor reconstructions are the standard
polynomial difference inversions:

    order 1:  s[i] = r[i] +  s[i-1]
    order 2:  s[i] = r[i] + 2s[i-1] -  s[i-2]
    order 3:  s[i] = r[i] + 3s[i-1] - 3s[i-2] +  s[i-3]
    order 4:  s[i] = r[i] + 4s[i-1] - 6s[i-2] + 4s[i-3] - s[i-4]

and LPC applies the quantized filter  s[i] = r[i] +
(Σ c[j]·s[i-1-j]) >> shift  with signed coefficients.
"""

from __future__ import annotations


class _Bits:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # bit position

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise EOFError
        value = 0
        pos = self.pos
        while n > 0:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            shift = avail - take
            value = (value << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return value

    def read_signed(self, n: int) -> int:
        value = self.read(n)
        if value >= 1 << (n - 1):
            value -= 1 << n
        return value

    def unary(self) -> int:
        # zeros terminated by a one
        count = 0
        while self.read(1) == 0:
            count += 1
            if count > 1_000_000:
                raise EOFError
        return count

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_coded(bits: _Bits) -> int:
    """FLAC's UTF-8-style variable-length frame/sample number."""
    first = bits.read(8)
    if first < 0x80:
        return first
    n_follow = 0
    mask = 0x40
    while first & mask:
        n_follow += 1
        mask >>= 1
    if n_follow < 1 or n_follow > 6:
        raise ValueError("bad utf8 code")
    value = first & (mask - 1)
    for _ in range(n_follow):
        byte = bits.read(8)
        if byte & 0xC0 != 0x80:
            raise ValueError("bad utf8 continuation")
        value = (value << 6) | (byte & 0x3F)
    return value


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _residual(bits: _Bits, n: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError("reserved residual method")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    part_order = bits.read(4)
    n_parts = 1 << part_order
    if (n >> part_order) << part_order != n:
        raise ValueError("block size not divisible into partitions")
    out: list[int] = []
    for part in range(n_parts):
        count = (n >> part_order) - (order if part == 0 else 0)
        if count < 0:
            raise ValueError("bad partition")
        param = bits.read(param_bits)
        if param == escape:
            raw_bits = bits.read(5)
            for _ in range(count):
                out.append(bits.read_signed(raw_bits) if raw_bits else 0)
        else:
            for _ in range(count):
                q = bits.unary()
                folded = (q << param) | (bits.read(param) if param else 0)
                out.append(-(folded >> 1) - 1 if folded & 1 else folded >> 1)
    return out


def _subframe(bits: _Bits, n: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("bad subframe padding bit")
    sf_type = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.unary()
    bps -= wasted
    if bps <= 0:
        raise ValueError("wasted bits exhaust sample size")

    if sf_type == 0:  # CONSTANT
        value = bits.read_signed(bps)
        samples = [value] * n
    elif sf_type == 1:  # VERBATIM
        samples = [bits.read_signed(bps) for _ in range(n)]
    elif 8 <= sf_type <= 12:  # FIXED order 0-4
        order = sf_type - 8
        samples = [bits.read_signed(bps) for _ in range(order)]
        res = _residual(bits, n, order)
        coefs = _FIXED_COEFS[order]
        for r in res:
            acc = r
            for j, c in enumerate(coefs):
                acc += c * samples[-1 - j]
            samples.append(acc)
    elif sf_type >= 32:  # LPC order 1-32
        order = sf_type - 31
        samples = [bits.read_signed(bps) for _ in range(order)]
        precision = bits.read(4) + 1
        if precision == 16:
            raise ValueError("invalid lpc precision")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("negative lpc shift")
        coefs = [bits.read_signed(precision) for _ in range(order)]
        res = _residual(bits, n, order)
        for r in res:
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * samples[-1 - j]
            samples.append(r + (acc >> shift))
    else:
        raise ValueError("reserved subframe type")

    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(payload: bytes):
    """(sample_rate, n_channels, duration_ms, rms, peak) or None."""
    import math

    if len(payload) < 42 or payload[:4] != b"fLaC":
        return None
    pos = 4
    streaminfo = None
    while pos + 4 <= len(payload):
        header = payload[pos]
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        if header & 0x7F == 0 and len(body) >= 34:
            streaminfo = body
        pos += 4 + length
        if header & 0x80:
            break
    if streaminfo is None:
        return None

    si = _Bits(streaminfo)
    si.read(16)  # min block size
    si.read(16)  # max block size
    si.read(24)
    si.read(24)
    si_rate = si.read(20)
    si_channels = si.read(3) + 1
    si_bps = si.read(5) + 1
    si.read(36)  # total samples (frames still carry their own counts)
    if si_rate <= 0:
        return None

    sum_sq = 0.0
    peak = 0.0
    total = 0
    n_samples = 0
    rate = si_rate
    channels = si_channels

    try:
        while pos + 5 <= len(payload):
            frame_start = pos
            sync = int.from_bytes(payload[pos : pos + 2], "big")
            if sync >> 2 != 0x3FFE:
                break
            if sync & 0b10:
                raise ValueError("reserved sync-follow bit set")
            # bit 15 = blocking strategy (0 fixed / 1 variable) — both legal
            bits = _Bits(payload, pos * 8 + 16)
            bs_code = bits.read(4)
            sr_code = bits.read(4)
            ch_code = bits.read(4)
            ss_code = bits.read(3)
            if bits.read(1):
                raise ValueError("reserved header bit")
            _utf8_coded(bits)
            if bs_code == 0:
                raise ValueError("reserved block size code")
            if bs_code == 1:
                block = 192
            elif 2 <= bs_code <= 5:
                block = 576 << (bs_code - 2)
            elif bs_code == 6:
                block = bits.read(8) + 1
            elif bs_code == 7:
                block = bits.read(16) + 1
            else:
                block = 256 << (bs_code - 8)
            if sr_code == 0:
                rate = si_rate
            elif sr_code in _RATE_CODES:
                rate = _RATE_CODES[sr_code]
            elif sr_code == 12:
                rate = bits.read(8) * 1000
            elif sr_code == 13:
                rate = bits.read(16)
            elif sr_code == 14:
                rate = bits.read(16) * 10
            else:
                raise ValueError("invalid sample rate code")
            bps = {
                0: si_bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32,
            }.get(ss_code)
            if bps is None:
                raise ValueError("reserved sample size code")
            # CRC-8 covers the header bytes up to (not incl.) the crc byte
            header_end = (bits.pos + 7) >> 3
            if _crc8(payload[frame_start:header_end]) != payload[header_end]:
                raise ValueError("frame header crc mismatch")
            bits.pos = (header_end + 1) * 8

            if ch_code <= 7:
                channels = ch_code + 1
                chan_bps = [bps] * channels
            elif ch_code in (8, 9, 10):
                channels = 2
                side = {8: 1, 9: 0, 10: 1}[ch_code]
                chan_bps = [bps, bps]
                chan_bps[side] += 1
            else:
                raise ValueError("reserved channel assignment")

            decoded = [_subframe(bits, block, b) for b in chan_bps]
            bits.align()
            crc_pos = bits.pos >> 3
            if crc_pos + 2 > len(payload):
                raise ValueError("truncated frame footer")
            if _crc16(payload[frame_start:crc_pos]) != int.from_bytes(
                payload[crc_pos : crc_pos + 2], "big"
            ):
                raise ValueError("frame crc16 mismatch")
            pos = crc_pos + 2

            if ch_code == 8:  # left/side
                left, diff = decoded
                decoded = [left, [l - s for l, s in zip(left, diff)]]
            elif ch_code == 9:  # right/side
                diff, right = decoded
                decoded = [[r + s for r, s in zip(right, diff)], right]
            elif ch_code == 10:  # mid/side
                mid, diff = decoded
                left_chan, right_chan = [], []
                for m, s in zip(mid, diff):
                    m = (m << 1) | (s & 1)
                    left_chan.append((m + s) >> 1)
                    right_chan.append((m - s) >> 1)
                decoded = [left_chan, right_chan]

            scale = float(1 << (bps - 1))
            for chan in decoded:
                for s in chan:
                    v = s / scale
                    sum_sq += v * v
                    a = abs(v)
                    if a > peak:
                        peak = a
            total += block
            # per-frame channel count: frame headers may legally switch
            # channel assignment mid-stream, so the rms denominator must
            # count the samples each frame actually carried
            n_samples += block * len(decoded)
    except (EOFError, ValueError, IndexError):
        return None

    if total == 0 or n_samples == 0:
        return None
    rms = math.sqrt(sum_sq / n_samples)
    duration_ms = int(round(total * 1000.0 / rate))
    return rate, channels, duration_ms, float(rms), float(peak)
