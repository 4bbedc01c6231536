"""Baseline-sequential JPEG decoder, pure Python + numpy.

De-stubs the most common web image type for the multimodal feature
operator (reference decodes images for captioning/PDF embedding —
loader/image.ts, loader/pdf/; PIL is absent in this environment, so the
decode is implemented from the JFIF/ITU-T.81 spec directly).

Scope: baseline DCT (SOF0), Huffman entropy coding, 8-bit precision,
grayscale or YCbCr with arbitrary sampling factors (4:4:4 / 4:2:2 /
4:2:0), restart intervals, 0xFF00 byte unstuffing. Only the luma plane
is materialized (Y of YCbCr IS the BT.601 luma the feature extractor
needs), so chroma blocks are entropy-decoded (the stream is interleaved)
but not reconstructed. Progressive (SOF2) and arithmetic coding are out
of scope and return None.
"""

from __future__ import annotations

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II basis; IDCT(block) = M.T @ block @ M
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _DCT_M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


class _Huffman:
    """Canonical JPEG Huffman table: (length, code) → symbol."""

    def __init__(self, counts: bytes, symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        index = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[index]
                code += 1
                index += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 unstuffing;
    stops at any non-RST marker. ``align_restart`` consumes an RSTn."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> bool:
        data = self.data
        while self.nbits <= 24:
            if self.pos >= len(data):
                break
            byte = data[self.pos]
            if byte == 0xFF:
                nxt = data[self.pos + 1] if self.pos + 1 < len(data) else 0xD9
                if nxt == 0x00:  # stuffed: a literal 0xFF data byte
                    self.pos += 2
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
                break  # RST / EOI / next segment: stop at the marker
            self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | byte
            self.nbits += 8
        return self.nbits > 0

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise EOFError
        if self.nbits == 0:
            raise EOFError
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        value = 0
        for _ in range(n):
            value = (value << 1) | self.read_bit()
        return value

    def decode(self, table: _Huffman) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            symbol = table.lookup.get((length, code))
            if symbol is not None:
                return symbol
        raise ValueError("invalid huffman code")

    def align_restart(self) -> None:
        self.bitbuf = 0
        self.nbits = 0
        data = self.data
        while self.pos + 1 < len(data):
            if data[self.pos] == 0xFF and 0xD0 <= data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _extend(value: int, size: int) -> int:
    """ITU-T.81 F.2.2.1 EXTEND: map `size`-bit magnitude to signed."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def decode_jpeg(payload: bytes):
    """JPEG bytes → (width, height, luma ndarray) or None."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huffman] = {}
    huff_ac: dict[int, _Huffman] = {}
    components: list[dict] = []
    width = height = 0
    restart_interval = 0
    pos = 2
    scan_start = None
    scan_map: list[tuple[int, int, int]] = []  # (comp index, dc table, ac table)
    data = payload
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
        body = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                precision, table_id = body[i] >> 4, body[i] & 0xF
                i += 1
                if precision == 0:
                    table = np.frombuffer(
                        body[i : i + 64], dtype=np.uint8
                    ).astype(np.int64)
                    i += 64
                else:
                    table = np.frombuffer(
                        body[i : i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
                quant[table_id] = table
        elif marker == 0xC0:  # SOF0 baseline
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            n_comp = body[5]
            components = []
            for c in range(n_comp):
                cid, sampling, tq = body[6 + 3 * c : 9 + 3 * c]
                components.append(
                    {
                        "id": cid,
                        "h": sampling >> 4,
                        "v": sampling & 0xF,
                        "tq": tq,
                    }
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types unsupported
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                table_class, table_id = body[i] >> 4, body[i] & 0xF
                counts = body[i + 1 : i + 17]
                total = sum(counts)
                symbols = body[i + 17 : i + 17 + total]
                table = _Huffman(counts, symbols)
                if table_class == 0:
                    huff_dc[table_id] = table
                else:
                    huff_ac[table_id] = table
                i += 17 + total
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            n_scan = body[0]
            scan_map = []
            for s in range(n_scan):
                cs, tables = body[1 + 2 * s], body[2 + 2 * s]
                comp_index = next(
                    (i for i, c in enumerate(components) if c["id"] == cs), None
                )
                if comp_index is None:
                    return None
                scan_map.append((comp_index, tables >> 4, tables & 0xF))
            scan_start = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if scan_start is None or not components or width <= 0 or height <= 0:
        return None
    for comp in components:
        if comp["tq"] not in quant:
            return None

    h_max = max(c["h"] for c in components)
    v_max = max(c["v"] for c in components)
    mcu_w, mcu_h = 8 * h_max, 8 * v_max
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h

    # luma plane (component 0), at its own resolution
    luma_comp = components[0]
    lw = mcus_x * 8 * luma_comp["h"]
    lh = mcus_y * 8 * luma_comp["v"]
    luma = np.zeros((lh, lw), dtype=np.float64)

    reader = _BitReader(data, scan_start)
    predictors = [0] * len(components)
    try:
        mcu_index = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                    reader.align_restart()
                    predictors = [0] * len(components)
                for comp_index, dc_id, ac_id in scan_map:
                    comp = components[comp_index]
                    dc_table = huff_dc.get(dc_id)
                    ac_table = huff_ac.get(ac_id)
                    if dc_table is None or ac_table is None:
                        return None
                    qtable = quant[comp["tq"]]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            coeffs = np.zeros(64, dtype=np.int64)
                            size = reader.decode(dc_table)
                            diff = _extend(reader.read_bits(size), size)
                            predictors[comp_index] += diff
                            coeffs[0] = predictors[comp_index]
                            k = 1
                            while k < 64:
                                rs = reader.decode(ac_table)
                                run, magnitude = rs >> 4, rs & 0xF
                                if rs == 0x00:  # EOB
                                    break
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += run
                                if k > 63:
                                    break
                                coeffs[k] = _extend(
                                    reader.read_bits(magnitude), magnitude
                                )
                                k += 1
                            if comp_index != 0:
                                continue  # chroma: entropy-decoded only
                            block = np.zeros(64, dtype=np.float64)
                            block[ZIGZAG] = coeffs * qtable
                            spatial = (
                                _DCT_M.T @ block.reshape(8, 8) @ _DCT_M + 128.0
                            )
                            y0 = (my * comp["v"] + by) * 8
                            x0 = (mx * comp["h"] + bx) * 8
                            luma[y0 : y0 + 8, x0 : x0 + 8] = spatial
                mcu_index += 1
    except (EOFError, ValueError, IndexError):
        return None

    # luma component may be subsampled relative to the frame (rare; Y is
    # almost always full-res) — nearest-neighbor up to frame resolution
    scale_y = (8 * v_max) // (8 * luma_comp["v"])
    scale_x = (8 * h_max) // (8 * luma_comp["h"])
    if scale_y > 1 or scale_x > 1:
        luma = np.repeat(np.repeat(luma, scale_y, axis=0), scale_x, axis=1)
    return width, height, np.clip(luma[:height, :width], 0.0, 255.0)
