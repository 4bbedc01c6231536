"""Compressed-audio metadata — MP3 (MPEG-1/2 Layer III) and Ogg
(Vorbis / Opus) — parsed from the public framing specs (ISO/IEC 11172-3
header layout; RFC 3533 Ogg pages; the Vorbis I identification header;
RFC 7845 OpusHead).

Amplitude features (rms/peak) genuinely need the codec (the documented
``decode_audio_features`` stub for lossy formats), but the triage
metadata — codec, sample rate, channels, duration — is pure structure:

* **MP3**: skip an ID3v2 tag, then walk sync-framed headers; each
  frame's byte length follows from (bitrate, sample rate, padding) and
  its sample count from the layer/version (1152 for MPEG-1 Layer III,
  576 for MPEG-2/2.5); duration = Σ samples / rate. VBR streams are
  handled by the walk itself (no Xing table needed).
* **Ogg**: pages carry a 64-bit granule position; duration = the LAST
  page's granule over the codec clock (Vorbis: the declared sample
  rate; Opus: 48 kHz less the OpusHead pre-skip). Channels/rate come
  from the first packet's identification header.

Malformed/foreign payloads return None — never raise.
"""

from __future__ import annotations

import struct

_MP3_BITRATES_V1_L3 = [
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]
_MP3_BITRATES_V2_L3 = [
    0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160,
]
_MP3_RATES = {
    3: [44100, 48000, 32000],   # MPEG-1
    2: [22050, 24000, 16000],   # MPEG-2
    0: [11025, 12000, 8000],    # MPEG-2.5
}


def _skip_id3(data: bytes) -> int:
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    size = (
        (data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
        | (data[8] & 0x7F) << 7 | (data[9] & 0x7F)
    )
    return 10 + size


def _mp3_frame_at(data: bytes, pos: int):
    """(frame_len, rate, samples, channels) for a valid Layer-III header
    at ``pos`` whose frame fits in ``data``; None otherwise."""
    if pos + 4 > len(data):
        return None
    b0, b1, b2, b3 = data[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = (b1 >> 3) & 0x3            # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (b1 >> 1) & 0x3              # 1 = Layer III
    if version == 1 or layer != 1:
        return None
    bitrate_idx = (b2 >> 4) & 0xF
    rate_idx = (b2 >> 2) & 0x3
    padding = (b2 >> 1) & 0x1
    if bitrate_idx in (0, 15) or rate_idx == 3:
        return None
    table = _MP3_BITRATES_V1_L3 if version == 3 else _MP3_BITRATES_V2_L3
    bitrate = table[bitrate_idx] * 1000
    rate = _MP3_RATES[version][rate_idx]
    samples = 1152 if version == 3 else 576
    frame_len = samples // 8 * bitrate // rate + padding
    if frame_len <= 4 or pos + frame_len > len(data):
        return None
    channels = 1 if ((b3 >> 6) & 0x3) == 3 else 2
    return frame_len, rate, samples, channels


def probe_mp3(data: bytes):
    pos = _skip_id3(data)
    n_frames = 0
    total_samples = 0
    rate = None
    channels = None
    while pos + 4 <= len(data):
        frame = _mp3_frame_at(data, pos)
        if frame is None:
            if n_frames:
                break  # trailing garbage / tag after a valid frame run
            pos += 1   # resync through leading junk
            continue
        frame_len, frame_rate, samples, frame_channels = frame
        if n_frames == 0:
            # a lone sync word is 11 bits of noise away from random
            # bytes — only anchor the walk where the implied NEXT frame
            # also starts with a valid header (or the frame ends the
            # buffer), the standard false-sync rejection
            nxt = pos + frame_len
            if nxt < len(data) and _mp3_frame_at(data, nxt) is None:
                pos += 1
                continue
        rate, channels = frame_rate, frame_channels
        n_frames += 1
        total_samples += samples
        pos += frame_len
    if n_frames == 0 or not rate:
        return None
    return "mp3", rate, channels, int(round(total_samples * 1000.0 / rate))


def _ogg_pages(data: bytes):
    pos = 0
    while pos + 27 <= len(data):
        if data[pos : pos + 4] != b"OggS":
            return
        bos = bool(data[pos + 5] & 0x02)  # header-type: beginning-of-stream
        (granule,) = struct.unpack_from("<q", data, pos + 6)
        (serial,) = struct.unpack_from("<I", data, pos + 14)
        n_segs = data[pos + 26]
        if pos + 27 + n_segs > len(data):
            return
        lacing = data[pos + 27 : pos + 27 + n_segs]
        body_start = pos + 27 + n_segs
        body_len = sum(lacing)
        if body_start + body_len > len(data):
            return
        yield serial, granule, data[body_start : body_start + body_len], bos
        pos = body_start + body_len


def _ogg_ident(body: bytes):
    """(codec, rate, channels, clock, pre_skip) from an identification
    packet, or None."""
    if body.startswith(b"\x01vorbis") and len(body) >= 16:
        channels = body[11]
        (rate,) = struct.unpack_from("<I", body, 12)
        return "vorbis", rate, channels, rate, 0
    if body.startswith(b"OpusHead") and len(body) >= 19:
        channels = body[9]
        (pre_skip,) = struct.unpack_from("<H", body, 10)
        (rate,) = struct.unpack_from("<I", body, 12)
        return "opus", rate, channels, 48000, pre_skip  # 48 kHz granules
    return None


def probe_ogg(data: bytes):
    """Tracks logical streams by SERIAL (RFC 3533): granules only count
    toward the stream they belong to, so a multiplexed second stream
    cannot corrupt the clock, and CHAINED streams (concatenated logical
    streams, granule restarting at 0 — radio rips) sum their per-chain
    durations. Reported codec/rate/channels come from the first
    identified audio stream."""
    if data[:4] != b"OggS":
        return None
    streams: dict[int, dict] = {}   # serial → {ident, last, chain_ms}
    order: list[int] = []

    def _bank(entry):
        """Fold the finished chain segment's duration into the running
        total and reset the live-granule clock for the next segment."""
        _c, _r, _ch, clock, pre_skip = entry["ident"]
        if entry["last"] is not None and clock:
            entry["chain_ms"] += (
                max(0, entry["last"] - pre_skip) * 1000.0 / clock
            )
        entry["last"] = None

    for serial, granule, body, bos in _ogg_pages(data):
        if serial not in streams:
            ident = _ogg_ident(body)
            if ident is None:
                continue  # non-audio (e.g. skeleton) stream — ignore
            # `report` keeps the FIRST chain's ident for the returned
            # codec/rate/channels; `ident` tracks the LIVE chain's
            # clock/pre-skip for duration accounting
            streams[serial] = {
                "ident": ident, "report": ident, "last": None, "chain_ms": 0.0,
            }
            order.append(serial)
            continue
        entry = streams[serial]
        if bos:
            # chained stream REUSING the serial (legal per RFC 3533 §4 —
            # serials need only be unique within a chain segment): the
            # BOS flag is the authoritative segment boundary — it fires
            # even when the new segment's first granule exceeds the old
            # segment's last (where a regression check stays silent).
            # Bank the finished segment and adopt the new ident so the
            # next granules use the new segment's clock/pre-skip.
            _bank(entry)
            new_ident = _ogg_ident(body)
            if new_ident is not None:
                entry["ident"] = new_ident
            continue
        if granule >= 0:
            if entry["last"] is not None and granule < entry["last"]:
                # fallback boundary signal for captures whose BOS page
                # was truncated away: a granule can never regress within
                # one segment
                _bank(entry)
            entry["last"] = granule
    if not order:
        return None
    codec, rate, channels, _clock, _skip = streams[order[0]]["report"]
    total_ms = 0.0
    any_granule = False
    for serial in order:
        entry = streams[serial]
        _c, _r, _ch, clock, pre_skip = entry["ident"]
        if entry["chain_ms"]:
            any_granule = True
            total_ms += entry["chain_ms"]
        if entry["last"] is None or not clock:
            continue
        any_granule = True
        total_ms += max(0, entry["last"] - pre_skip) * 1000.0 / clock
    duration_ms = int(round(total_ms)) if any_granule else None
    # channels == 0 in an ident header is declared-but-meaningless → NULL
    return codec, rate or None, channels or None, duration_ms


def probe_audio(data: bytes):
    """(codec, sample_rate, n_channels, duration_ms) or None."""
    try:
        return probe_ogg(data) or probe_mp3(data)
    except (struct.error, IndexError, OverflowError):
        return None
