"""Container-level video metadata — ISO-BMFF (mp4/mov/m4v) and
Matroska/WebM — parsed from the public container specs (ISO/IEC
14496-12; the Matroska EBML RFC 8794 + codec-independent element IDs).

Frame DECODING still needs a codec library (pyav — absent here, the
documented stub in operators/multimodal.py), but the triage metadata a
training-data pipeline filters on — dimensions, duration, container —
lives in pure structure:

* **ISO-BMFF**: length-prefixed box walk → ``moov``: ``mvhd`` carries
  (timescale, duration); each ``trak``'s ``tkhd`` ends with 16.16
  fixed-point width/height (non-zero only for visual tracks).
* **EBML/Matroska**: varint-tagged element walk → ``Segment`` →
  ``Info`` (TimestampScale ns, Duration float) and ``Tracks`` →
  ``TrackEntry`` → ``Video`` (PixelWidth/PixelHeight). Unknown-size
  (all-ones) elements extend to end of input, as streamed files use.

Malformed or foreign payloads return None — never raise.
"""

from __future__ import annotations

import struct


# --------------------------------------------------------------------------
# ISO-BMFF
# --------------------------------------------------------------------------

def _iso_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        box_type = data[pos + 8 - 4 : pos + 8]
        header = 8
        if size == 1:
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            header = 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < header or pos + size > end:
            return
        yield box_type, pos + header, pos + size
        pos += size


def _parse_mvhd(data: bytes, start: int, end: int):
    if start >= end:
        return None
    version = data[start]
    if version == 1:
        if start + 32 > end:
            return None
        (timescale,) = struct.unpack_from(">I", data, start + 20)
        (duration,) = struct.unpack_from(">Q", data, start + 24)
        unknown = duration == 0xFFFFFFFFFFFFFFFF
    else:
        if start + 20 > end:
            return None
        (timescale,) = struct.unpack_from(">I", data, start + 12)
        (duration,) = struct.unpack_from(">I", data, start + 16)
        unknown = duration == 0xFFFFFFFF
    # all-ones = "cannot be determined" (ISO 14496-12); 0 = fragmented
    # file whose real duration lives in mvex/mehd — both are NULL here
    if timescale == 0 or unknown or duration == 0:
        return None
    return int(round(duration * 1000.0 / timescale))


def _parse_tkhd(data: bytes, start: int, end: int):
    if start >= end:
        return None
    version = data[start]
    # v0 body: ver/flags 4 + times 8 + track 4 + resv 4 + duration 4 +
    # resv 8 + layer/group/volume/resv 8 + matrix 36 + width 4 + height 4
    # = 84; v1 widens times+duration to 8 bytes each → 96
    need = 96 if version == 1 else 84
    if start + need > end:
        return None
    off = start + need - 8  # width, then height, close the box
    (w_fixed,) = struct.unpack_from(">I", data, off)
    (h_fixed,) = struct.unpack_from(">I", data, off + 4)
    width, height = w_fixed >> 16, h_fixed >> 16
    if width and height:
        return width, height
    return None


def probe_isobmff(data: bytes):
    if len(data) < 12 or data[4:8] != b"ftyp":
        return None
    duration_ms = None
    dims = None
    for box, s, e in _iso_boxes(data, 0, len(data)):
        if box != b"moov":
            continue
        for inner, is_, ie in _iso_boxes(data, s, e):
            if inner == b"mvhd":
                duration_ms = _parse_mvhd(data, is_, ie)
            elif inner == b"trak":
                for tb, ts, te in _iso_boxes(data, is_, ie):
                    if tb == b"tkhd" and dims is None:
                        dims = _parse_tkhd(data, ts, te)
        break
    if dims is None and duration_ms is None:
        return None
    width, height = dims or (None, None)
    return "mp4", width, height, duration_ms


# --------------------------------------------------------------------------
# EBML / Matroska / WebM
# --------------------------------------------------------------------------

def _ebml_vint(data: bytes, pos: int, keep_marker: bool):
    """(value, next_pos) or None; all-ones size means 'unknown'."""
    if pos >= len(data):
        return None
    first = data[pos]
    if first == 0:
        return None
    length = 1
    mask = 0x80
    while not first & mask:
        mask >>= 1
        length += 1
    if pos + length > len(data):
        return None
    value = first if keep_marker else first & (mask - 1)
    unknown = (first & (mask - 1)) == mask - 1
    for i in range(1, length):
        byte = data[pos + i]
        value = (value << 8) | byte
        unknown = unknown and byte == 0xFF
    if not keep_marker and unknown:
        value = -1  # unknown size
    return value, pos + length


def _ebml_children(data: bytes, start: int, end: int):
    pos = start
    while pos < end:
        eid = _ebml_vint(data, pos, keep_marker=True)
        if eid is None:
            return
        size = _ebml_vint(data, eid[1], keep_marker=False)
        if size is None:
            return
        body_start = size[1]
        body_end = end if size[0] == -1 else body_start + size[0]
        if body_end > end:
            return
        yield eid[0], body_start, body_end
        pos = body_end


def probe_matroska(data: bytes):
    if len(data) < 8 or data[:4] != b"\x1a\x45\xdf\xa3":
        return None
    container = "mkv"
    width = height = None
    saw_video_track = False
    duration_ms = None
    timescale_ns = 1_000_000  # Matroska default
    duration_raw = None
    for eid, s, e in _ebml_children(data, 0, len(data)):
        if eid == 0x1A45DFA3:  # EBML header: DocType 0x4282
            for hid, hs, he in _ebml_children(data, s, e):
                if hid == 0x4282 and data[hs:he].startswith(b"webm"):
                    container = "webm"
        elif eid == 0x18538067:  # Segment
            for sid, ss, se in _ebml_children(data, s, e):
                if sid == 0x1549A966:  # Info
                    for iid, is_, ie in _ebml_children(data, ss, se):
                        if iid == 0x2AD7B1:  # TimestampScale (uint, ns)
                            timescale_ns = int.from_bytes(data[is_:ie], "big")
                        elif iid == 0x4489:  # Duration (float)
                            raw = data[is_:ie]
                            if len(raw) == 4:
                                duration_raw = struct.unpack(">f", raw)[0]
                            elif len(raw) == 8:
                                duration_raw = struct.unpack(">d", raw)[0]
                elif sid == 0x1654AE6B:  # Tracks
                    for tid, ts, te in _ebml_children(data, ss, se):
                        if tid != 0xAE:  # TrackEntry
                            continue
                        for vid, vs, ve in _ebml_children(data, ts, te):
                            if vid != 0xE0:  # Video
                                continue
                            # first video track wins (later entries are
                            # typically thumbnail/cover tracks), matching
                            # the ISO-BMFF path; zero/empty dims are NULL.
                            # The guard is a track-level flag, not `width`:
                            # a first track carrying only PixelHeight must
                            # still block a later track's width from
                            # merging into mixed-track dimensions.
                            if saw_video_track:
                                continue
                            saw_video_track = True
                            for pid, ps, pe in _ebml_children(data, vs, ve):
                                if pid == 0xB0:
                                    width = int.from_bytes(data[ps:pe], "big") or None
                                elif pid == 0xBA:
                                    height = int.from_bytes(data[ps:pe], "big") or None
    if duration_raw is not None and timescale_ns > 0:
        duration_ms = int(round(duration_raw * timescale_ns / 1e6))
    if width is None and height is None and duration_ms is None:
        return None
    return container, width, height, duration_ms


def probe_video(data: bytes):
    """(container, width, height, duration_ms) — any field but container
    may be None; None overall when the payload is neither container."""
    try:
        return probe_isobmff(data) or probe_matroska(data)
    except (struct.error, IndexError, OverflowError):
        return None
