"""Lossless WebP (VP8L) decoder — pure Python, from the public spec
(RFC 9649 / the WebP lossless bitstream specification).

Scope: the complete VP8L feature set — LSB-first bitstream, simple and
canonical (deflate-style) prefix codes, color cache, meta prefix
(entropy image), LZ77 with the 120-entry 2D distance map, and all four
transforms (predictor with its 14 modes, cross-color, subtract-green,
color-indexing incl. sub-byte pixel bundling). Returns
``(width, height, luma ndarray)`` like the sibling decoders, or ``None``
for anything unparseable. **Lossy** WebP (``VP8 `` chunks) is a full VP8
video intra-frame — boolean arithmetic coding, loop filters — and stays
out of scope (`None`); the multimodal operator documents that split.

Container: RIFF → ``VP8L`` chunk directly, or ``VP8X`` extended layout
scanned for an inner ``VP8L`` chunk.

Reference behavior anchor: packages/graph/src/loader/image.ts routes
webp through sharp/libwebp; this module re-implements the lossless half
of that surface from the public spec (cited per function).
"""

from __future__ import annotations

import struct

import numpy as np


class _BitReader:
    """LSB-first bit reader (VP8L bit packing)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0        # bit position

    def read(self, n: int) -> int:
        value = 0
        for i in range(n):
            byte_index = self.pos >> 3
            if byte_index >= len(self.data):
                raise EOFError
            bit = (self.data[byte_index] >> (self.pos & 7)) & 1
            value |= bit << i
            self.pos += 1
        return value

    def read_bit(self) -> int:
        return self.read(1)


class _Prefix:
    """Prefix code: decode one symbol by walking bits MSB-first through a
    canonical (deflate-style) code table; single-symbol codes cost 0 bits."""

    def __init__(self, lookup: dict[tuple[int, int], int],
                 single: int | None = None):
        self.lookup = lookup
        self.single = single

    @classmethod
    def from_lengths(cls, lengths: list[int]) -> "_Prefix | None":
        present = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not present:
            return None
        if len(present) == 1:
            return cls({}, single=present[0][1])
        lookup: dict[tuple[int, int], int] = {}
        code = 0
        prev_len = 0
        for length, symbol in sorted(present):
            code <<= length - prev_len
            lookup[(length, code)] = symbol
            code += 1
            prev_len = length
        return cls(lookup)

    @classmethod
    def simple(cls, symbols: list[int]) -> "_Prefix":
        if len(symbols) == 1:
            return cls({}, single=symbols[0])
        return cls({(1, 0): symbols[0], (1, 1): symbols[1]})

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | br.read_bit()
            symbol = self.lookup.get((length, code))
            if symbol is not None:
                return symbol
        raise ValueError("invalid prefix code")


# order in which code-length code lengths are stored (spec §6.2.2)
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _Prefix:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        first_bits = 8 if br.read_bit() else 1
        symbols = [br.read(first_bits)]
        if num_symbols == 2:
            symbols.append(br.read(8))
        return _Prefix.simple(symbols)
    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _Prefix.from_lengths(clc_lengths)
    if clc is None:
        raise ValueError("empty code-length code")

    if br.read_bit():  # limited symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        clen = clc.decode(br)
        if clen < 16:
            lengths[symbol] = clen
            symbol += 1
            if clen:
                prev_len = clen
        elif clen == 16:
            repeat = 3 + br.read(2)
            for _ in range(repeat):
                if symbol < alphabet_size:
                    lengths[symbol] = prev_len
                    symbol += 1
        elif clen == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
    prefix = _Prefix.from_lengths(lengths)
    if prefix is None:
        raise ValueError("empty prefix code")
    return prefix


def _lz77_value(code: int, br: _BitReader) -> int:
    """Length/distance prefix decoding (spec §6.2.3)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _distance_map() -> list[tuple[int, int]]:
    """The 120 short-distance codes: 2D neighborhood offsets (dy 0..7,
    dx -7..8; dy=0 restricted to dx>0), ordered by squared distance,
    larger dy first on ties, positive dx before negative (spec §6.2.3)."""
    cands = [(dx, 0) for dx in range(1, 9)]
    cands += [(dx, dy) for dy in range(1, 8) for dx in range(-7, 9)]
    return sorted(cands, key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))


_DISTANCE_MAP = _distance_map()


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_spatial(br: _BitReader, width: int, height: int,
                    is_main: bool) -> list[list[int]]:
    """One spatially-coded image → pixels as [a, r, g, b] lists in raster
    order (spec §6.2: color-cache-info, meta-prefix (ARGB only), data)."""
    cache_bits = br.read(4) if br.read_bit() else 0
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta = None
    meta_bits = 0
    num_groups = 1
    if is_main and br.read_bit():
        meta_bits = br.read(3) + 2
        mw, mh = _subsample(width, meta_bits), _subsample(height, meta_bits)
        meta = _decode_spatial(br, mw, mh, False)
        num_groups = max(((p[1] << 8) | p[2]) for p in meta) + 1

    green_alphabet = 256 + 24 + cache_size
    groups = []
    for _ in range(num_groups):
        groups.append((
            _read_prefix_code(br, green_alphabet),
            _read_prefix_code(br, 256),   # red
            _read_prefix_code(br, 256),   # blue
            _read_prefix_code(br, 256),   # alpha
            _read_prefix_code(br, 40),    # distance
        ))

    n = width * height
    pixels: list[list[int]] = []

    def insert_cache(px: list[int]) -> None:
        if cache_size:
            argb = (px[0] << 24) | (px[1] << 16) | (px[2] << 8) | px[3]
            index = (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)
            cache[index] = argb

    while len(pixels) < n:
        if meta is not None:
            x, y = len(pixels) % width, len(pixels) // width
            mp = meta[(y >> meta_bits) * _subsample(width, meta_bits) + (x >> meta_bits)]
            group = groups[(mp[1] << 8) | mp[2]]
        else:
            group = groups[0]
        g_code, r_code, b_code, a_code, d_code = group
        sym = g_code.decode(br)
        if sym < 256:
            green = sym
            red = r_code.decode(br)
            blue = b_code.decode(br)
            alpha = a_code.decode(br)
            px = [alpha, red, green, blue]
            pixels.append(px)
            insert_cache(px)
        elif sym < 280:
            length = _lz77_value(sym - 256, br)
            dist_raw = _lz77_value(d_code.decode(br), br)
            if dist_raw > 120:
                distance = dist_raw - 120
            else:
                dx, dy = _DISTANCE_MAP[dist_raw - 1]
                distance = dy * width + dx
                if distance < 1:
                    distance = 1
            for _ in range(length):
                if distance > len(pixels) or len(pixels) >= n:
                    raise ValueError("bad lz77 reference")
                px = list(pixels[len(pixels) - distance])
                pixels.append(px)
                insert_cache(px)
        else:
            if not cache_size:
                raise ValueError("cache hit without cache")
            argb = cache[sym - 280]
            pixels.append([
                (argb >> 24) & 0xFF, (argb >> 16) & 0xFF,
                (argb >> 8) & 0xFF, argb & 0xFF,
            ])
    return pixels


# --------------------------------------------------------------------------
# inverse transforms (spec §5)
# --------------------------------------------------------------------------

def _avg2(a: int, b: int) -> int:
    return (a + b) // 2


def _predict(mode: int, left, top, top_left, top_right) -> list[int]:
    if mode == 0:
        return [255, 0, 0, 0]
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return top_right
    if mode == 4:
        return top_left
    if mode == 5:
        return [_avg2(_avg2(left[i], top_right[i]), top[i]) for i in range(4)]
    if mode == 6:
        return [_avg2(left[i], top_left[i]) for i in range(4)]
    if mode == 7:
        return [_avg2(left[i], top[i]) for i in range(4)]
    if mode == 8:
        return [_avg2(top_left[i], top[i]) for i in range(4)]
    if mode == 9:
        return [_avg2(top[i], top_right[i]) for i in range(4)]
    if mode == 10:
        return [
            _avg2(_avg2(left[i], top_left[i]), _avg2(top[i], top_right[i]))
            for i in range(4)
        ]
    if mode == 11:  # Select
        p_l = sum(abs(top[i] - top_left[i]) for i in range(4))
        p_t = sum(abs(left[i] - top_left[i]) for i in range(4))
        return left if p_l < p_t else top
    if mode == 12:  # ClampAddSubtractFull
        return [
            max(0, min(255, left[i] + top[i] - top_left[i])) for i in range(4)
        ]
    if mode == 13:  # ClampAddSubtractHalf
        out = []
        for i in range(4):
            ave = _avg2(left[i], top[i])
            # C integer division truncates toward zero (libwebp); Python's
            # // floors, which is off by one for negative odd deltas.
            d = ave - top_left[i]
            half = (abs(d) // 2) * (1 if d >= 0 else -1)
            out.append(max(0, min(255, ave + half)))
        return out
    raise ValueError(f"bad predictor mode {mode}")


def _inverse_predictor(pixels, width, height, sub, bits) -> None:
    sw = _subsample(width, bits)
    for i in range(width * height):
        x, y = i % width, i // width
        if x == 0 and y == 0:
            pred = [255, 0, 0, 0]
        elif y == 0:
            pred = pixels[i - 1]                      # L
        elif x == 0:
            pred = pixels[i - width]                  # T
        else:
            mode = sub[(y >> bits) * sw + (x >> bits)][2]  # green channel
            left = pixels[i - 1]
            top = pixels[i - width]
            top_left = pixels[i - width - 1]
            # top-right of the last column wraps to the first pixel of the
            # current row (the already-decoded raster neighbor — libwebp
            # memory-layout behavior the spec codifies)
            top_right = pixels[i - width + 1]
            pred = _predict(mode, left, top, top_left, top_right)
        px = pixels[i]
        for c in range(4):
            px[c] = (px[c] + pred[c]) & 0xFF


def _delta(t: int, c: int) -> int:
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inverse_color_transform(pixels, width, height, sub, bits) -> None:
    sw = _subsample(width, bits)
    for i in range(width * height):
        x, y = i % width, i // width
        cte = sub[(y >> bits) * sw + (x >> bits)]
        # RFC 9649 / libwebp ColorCodeToMultipliers: green_to_red is the
        # BLUE channel of the transform pixel, green_to_blue the GREEN,
        # red_to_blue the RED.
        g2r, g2b, r2b = cte[3], cte[2], cte[1]
        px = pixels[i]
        px[1] = (px[1] + _delta(g2r, px[2])) & 0xFF
        px[3] = (px[3] + _delta(g2b, px[2]) + _delta(r2b, px[1])) & 0xFF


def _inverse_subtract_green(pixels) -> None:
    for px in pixels:
        px[1] = (px[1] + px[2]) & 0xFF
        px[3] = (px[3] + px[2]) & 0xFF


def _inverse_color_indexing(pixels, width, height, palette, width_bits):
    if width_bits == 0:
        out = []
        for px in pixels:
            idx = px[2]
            out.append(list(palette[idx]) if idx < len(palette) else [0, 0, 0, 0])
        return out
    per = 1 << width_bits              # packed pixels per green byte
    bits = 8 >> width_bits             # bits per packed index
    mask = (1 << bits) - 1
    packed_w = _subsample(width, width_bits)
    out = []
    for y in range(height):
        for x in range(width):
            packed = pixels[y * packed_w + (x >> width_bits)][2]
            idx = (packed >> ((x % per) * bits)) & mask
            out.append(list(palette[idx]) if idx < len(palette) else [0, 0, 0, 0])
    return out


# --------------------------------------------------------------------------
# top level
# --------------------------------------------------------------------------

# decompression-bomb guard: VP8L LZ77 can emit ~4096 pixels per ~2 coded
# bytes, so a few-KB payload may declare a 16384×16384 canvas and expand to
# 268M pixels inside the executor's mapInPandas batch. Cap the canvas at
# 32 MP (well past real web images) and route larger files to None.
MAX_PIXELS = 1 << 25


def _decode_vp8l_stream(data: bytes):
    br = _BitReader(data)
    if br.read(8) != 0x2F:
        return None
    width = br.read(14) + 1
    height = br.read(14) + 1
    if width * height > MAX_PIXELS:
        return None
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        return None

    # transforms (main image only), applied inverse in reverse read order
    transforms: list[tuple] = []
    seen: set[int] = set()
    decode_width = width
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("duplicate transform")
        seen.add(ttype)
        if ttype in (0, 1):  # predictor / color transform
            bits = br.read(3) + 2
            sw, sh = _subsample(decode_width, bits), _subsample(height, bits)
            sub = _decode_spatial(br, sw, sh, False)
            transforms.append((ttype, bits, sub))
        elif ttype == 2:  # subtract green
            transforms.append((2,))
        else:  # 3: color indexing
            n_colors = br.read(8) + 1
            raw = _decode_spatial(br, n_colors, 1, False)
            palette = []
            prev = [0, 0, 0, 0]
            for px in raw:  # palette entries are delta-coded
                entry = [(prev[c] + px[c]) & 0xFF for c in range(4)]
                palette.append(entry)
                prev = entry
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append((3, width_bits, palette))
            decode_width = _subsample(width, width_bits)

    pixels = _decode_spatial(br, decode_width, height, True)

    cur_width = decode_width
    for transform in reversed(transforms):
        if transform[0] == 0:
            _inverse_predictor(pixels, cur_width, height, transform[2], transform[1])
        elif transform[0] == 1:
            _inverse_color_transform(pixels, cur_width, height, transform[2], transform[1])
        elif transform[0] == 2:
            _inverse_subtract_green(pixels)
        else:
            pixels = _inverse_color_indexing(
                pixels, width, height, transform[2], transform[1]
            )
            cur_width = width

    arr = np.asarray(pixels, dtype=np.float64).reshape(height, width, 4)
    luma = 0.299 * arr[:, :, 1] + 0.587 * arr[:, :, 2] + 0.114 * arr[:, :, 3]
    return width, height, luma


def decode_webp(payload: bytes):
    """WebP bytes → (width, height, luma) for lossless (VP8L) files;
    None for lossy (VP8), animations without a lossless frame, or
    anything unparseable."""
    if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    try:
        pos = 12
        while pos + 8 <= len(payload):
            fourcc = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body = payload[pos + 8 : pos + 8 + size]
            if fourcc == b"VP8L":
                return _decode_vp8l_stream(body)
            pos += 8 + size + (size & 1)
        return None
    except (EOFError, ValueError, IndexError, struct.error):
        return None
