"""Baseline-sequential JPEG decoder, pure Python + numpy.

De-stubs the most common web image type for the multimodal feature
operator (reference decodes images for captioning/PDF embedding —
loader/image.ts, loader/pdf/; PIL is absent in this environment, so the
decode is implemented from the JFIF/ITU-T.81 spec directly).

Scope: baseline (SOF0) AND progressive (SOF2) DCT frames — Huffman
entropy coding, 8-bit precision, grayscale or YCbCr with arbitrary
sampling factors (4:4:4 / 4:2:2 / 4:2:0), restart intervals, 0xFF00 byte
unstuffing; progressive spectral selection and DC/AC successive
approximation (first + refinement passes with EOB runs, the jdphuff.c
algorithm as specified in ITU-T.81 G.2). Every scan accumulates into a
per-component coefficient store; reconstruction happens once at EOI.
Only the luma plane is materialized (Y of YCbCr IS the BT.601 luma the
feature extractor needs). Arithmetic coding, lossless and hierarchical
frames return None.
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
        # drop already-consumed high bits so bitbuf stays ≤ 32 bits wide —
        # otherwise it grows by 8 bits per input byte and every shift in
        # read_bit/_fill becomes O(bytes consumed) (quadratic in scan size)
        self.bitbuf &= (1 << self.nbits) - 1
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


def _decode_block_baseline(reader, dc_table, ac_table, block, pred):
    """Sequential DC+AC decode of one block into `block` (natural order).
    Returns the updated DC predictor."""
    size = reader.decode(dc_table)
    pred += _extend(reader.read_bits(size), size)
    block[0] = pred
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
        block[ZIGZAG[k]] = _extend(reader.read_bits(magnitude), magnitude)
        k += 1
    return pred


def _decode_block_dc_first(reader, dc_table, block, pred, al):
    size = reader.decode(dc_table)
    pred += _extend(reader.read_bits(size), size)
    block[0] = pred << al
    return pred


def _decode_block_dc_refine(reader, block, al):
    if reader.read_bit():
        block[0] |= 1 << al


def _decode_block_ac_first(reader, ac_table, block, ss, se, al, eobrun):
    """AC first scan (Ah=0) with EOB runs (T.81 G.2 / jdphuff decode_mcu_AC_first)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode(ac_table)
        run, magnitude = rs >> 4, rs & 0xF
        if magnitude == 0:
            if run < 15:
                eobrun = (1 << run) - 1
                if run:
                    eobrun += reader.read_bits(run)
                break
            k += 16  # ZRL
            continue
        k += run
        if k > se:
            break
        block[ZIGZAG[k]] = _extend(reader.read_bits(magnitude), magnitude) << al
        k += 1
    return eobrun


def _decode_block_ac_refine(reader, ac_table, block, ss, se, al, eobrun):
    """AC successive-approximation refinement (jdphuff decode_mcu_AC_refine):
    correction bits for already-nonzero coefficients, ±1<<Al insertions for
    new ones, EOB runs counting whole blocks whose band gets corrections
    only."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode(ac_table)
            run, magnitude = rs >> 4, rs & 0xF
            value = 0
            if magnitude == 0:
                if run < 15:
                    eobrun = 1 << run
                    if run:
                        eobrun += reader.read_bits(run)
                    break  # current block handled by the tail below
                # run == 15: ZRL — skip 16 zero-history positions
            else:
                # magnitude is 1 by spec: a newly-nonzero coefficient
                value = p1 if reader.read_bit() else m1
            while k <= se:
                z = ZIGZAG[k]
                if block[z] != 0:
                    if reader.read_bit() and (block[z] & p1) == 0:
                        block[z] += p1 if block[z] > 0 else m1
                else:
                    if run == 0:
                        if value:
                            block[z] = value
                        k += 1
                        break
                    run -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            z = ZIGZAG[k]
            if block[z] != 0 and reader.read_bit() and (block[z] & p1) == 0:
                block[z] += p1 if block[z] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def decode_jpeg(payload: bytes):
    """JPEG bytes → (width, height, luma ndarray) or None.

    Baseline (SOF0) and progressive (SOF2) frames: every scan decodes into
    a per-component coefficient store (spectral selection bands and
    successive-approximation DC/AC first+refinement passes accumulate);
    the Y plane is reconstructed once at the end. Arithmetic coding,
    hierarchical and lossless frames return None."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huffman] = {}
    huff_ac: dict[int, _Huffman] = {}
    components: list[dict] = []
    stores: list[np.ndarray] = []
    width = height = 0
    h_max = v_max = 1
    mcus_x = mcus_y = 0
    restart_interval = 0
    progressive = False
    data = payload
    n = len(data)
    pos = 2
    try:
        while pos + 2 <= n:
            if data[pos] != 0xFF:
                pos += 1
                continue
            marker = data[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xD9:
                break
            if pos + 4 > n:
                break
            seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
            body = data[pos + 4 : pos + 2 + seg_len]
            next_pos = pos + 2 + seg_len
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(body):
                    precision, table_id = body[i] >> 4, body[i] & 0xF
                    i += 1
                    if precision == 0:
                        quant[table_id] = np.frombuffer(
                            body[i : i + 64], dtype=np.uint8
                        ).astype(np.int64)
                        i += 64
                    else:
                        quant[table_id] = np.frombuffer(
                            body[i : i + 128], dtype=">u2"
                        ).astype(np.int64)
                        i += 128
            elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / progressive
                progressive = marker == 0xC2
                height = int.from_bytes(body[1:3], "big")
                width = int.from_bytes(body[3:5], "big")
                if width <= 0 or height <= 0:
                    return None
                n_comp = body[5]
                components = []
                for c in range(n_comp):
                    cid, sampling, tq = body[6 + 3 * c : 9 + 3 * c]
                    components.append(
                        {"id": cid, "h": sampling >> 4, "v": sampling & 0xF,
                         "tq": tq}
                    )
                h_max = max(c["h"] for c in components)
                v_max = max(c["v"] for c in components)
                mcus_x = (width + 8 * h_max - 1) // (8 * h_max)
                mcus_y = (height + 8 * v_max - 1) // (8 * v_max)
                stores = []
                for comp in components:
                    # padded interleaved grid; real block dims for
                    # non-interleaved scans computed from comp size
                    grid = np.zeros(
                        (mcus_y * comp["v"], mcus_x * comp["h"], 64),
                        dtype=np.int32,
                    )
                    comp_w = (width * comp["h"] + h_max - 1) // h_max
                    comp_h = (height * comp["v"] + v_max - 1) // v_max
                    comp["bw"] = (comp_w + 7) // 8
                    comp["bh"] = (comp_h + 7) // 8
                    stores.append(grid)
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                            0xCD, 0xCE, 0xCF):
                return None  # lossless / arithmetic / hierarchical
            elif marker == 0xC4:  # DHT
                i = 0
                while i + 17 <= len(body):
                    table_class, table_id = body[i] >> 4, body[i] & 0xF
                    counts = body[i + 1 : i + 17]
                    total = sum(counts)
                    table = _Huffman(counts, body[i + 17 : i + 17 + total])
                    if table_class == 0:
                        huff_dc[table_id] = table
                    else:
                        huff_ac[table_id] = table
                    i += 17 + total
            elif marker == 0xDD:  # DRI
                restart_interval = int.from_bytes(body[0:2], "big")
            elif marker == 0xDA:  # SOS — decode this scan's entropy data
                if not components:
                    return None
                n_scan = body[0]
                scan_comps: list[tuple[int, int, int]] = []
                for s in range(n_scan):
                    cs, tables = body[1 + 2 * s], body[2 + 2 * s]
                    index = next(
                        (i for i, c in enumerate(components) if c["id"] == cs),
                        None,
                    )
                    if index is None:
                        return None
                    scan_comps.append((index, tables >> 4, tables & 0xF))
                tail = body[1 + 2 * n_scan : 4 + 2 * n_scan]
                ss, se, ah, al = tail[0], tail[1], tail[2] >> 4, tail[2] & 0xF
                if not progressive:
                    ss, se, ah, al = 0, 63, 0, 0
                reader = _BitReader(data, next_pos)
                _decode_scan(
                    reader, components, stores, scan_comps, huff_dc, huff_ac,
                    mcus_x, mcus_y, restart_interval, progressive,
                    ss, se, ah, al,
                )
                next_pos = reader.pos
            pos = next_pos
    except (EOFError, ValueError, IndexError):
        return None
    if not components or not stores:
        return None
    comp = components[0]
    if comp["tq"] not in quant:
        return None
    # stores hold natural-order coefficients; qtable is zigzag-ordered
    qnat = np.empty(64, dtype=np.float64)
    qnat[ZIGZAG] = quant[comp["tq"]]
    grid = stores[0]
    bh, bw = grid.shape[0], grid.shape[1]
    luma = np.empty((bh * 8, bw * 8), dtype=np.float64)
    for by in range(bh):
        for bx in range(bw):
            dequant = grid[by, bx] * qnat
            luma[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                _DCT_M.T @ dequant.reshape(8, 8) @ _DCT_M + 128.0
            )
    scale_y = v_max // comp["v"]
    scale_x = h_max // comp["h"]
    if scale_y > 1 or scale_x > 1:
        luma = np.repeat(np.repeat(luma, scale_y, axis=0), scale_x, axis=1)
    return width, height, np.clip(luma[:height, :width], 0.0, 255.0)


def _decode_scan(reader, components, stores, scan_comps, huff_dc, huff_ac,
                 mcus_x, mcus_y, restart_interval, progressive,
                 ss, se, ah, al):
    """Entropy-decode one scan into the coefficient stores."""
    predictors = [0] * len(components)
    eobrun = 0

    def tables(dc_id, ac_id, need_dc, need_ac):
        dc = huff_dc.get(dc_id)
        ac = huff_ac.get(ac_id)
        if (need_dc and dc is None) or (need_ac and ac is None):
            raise ValueError("missing huffman table")
        return dc, ac

    # T.81 §A.2: a scan is interleaved iff it codes >1 component; ANY
    # single-component scan (baseline included) is non-interleaved and rasters
    # the component's real bw×bh block grid, not the padded MCU grid.
    if len(scan_comps) > 1:
        # interleaved MCU scan (baseline full-spectral, or progressive DC)
        unit = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and unit and unit % restart_interval == 0:
                    reader.align_restart()
                    predictors = [0] * len(components)
                    eobrun = 0
                for index, dc_id, ac_id in scan_comps:
                    comp = components[index]
                    grid = stores[index]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            block = grid[my * comp["v"] + by,
                                         mx * comp["h"] + bx]
                            if not progressive:
                                dc, ac = tables(dc_id, ac_id, True, True)
                                predictors[index] = _decode_block_baseline(
                                    reader, dc, ac, block, predictors[index]
                                )
                            elif ah == 0:
                                dc, _ = tables(dc_id, ac_id, True, False)
                                predictors[index] = _decode_block_dc_first(
                                    reader, dc, block, predictors[index], al
                                )
                            else:
                                _decode_block_dc_refine(reader, block, al)
                unit += 1
        return
    # non-interleaved scan: one component, its real block grid in raster order
    index, dc_id, ac_id = scan_comps[0]
    comp = components[index]
    grid = stores[index]
    dc_only = ss == 0
    unit = 0
    for by in range(comp["bh"]):
        for bx in range(comp["bw"]):
            if restart_interval and unit and unit % restart_interval == 0:
                reader.align_restart()
                predictors = [0] * len(components)
                eobrun = 0
            block = grid[by, bx]
            if not progressive:
                dc, ac = tables(dc_id, ac_id, True, True)
                predictors[index] = _decode_block_baseline(
                    reader, dc, ac, block, predictors[index]
                )
            elif dc_only:
                if ah == 0:
                    dc, _ = tables(dc_id, ac_id, True, False)
                    predictors[index] = _decode_block_dc_first(
                        reader, dc, block, predictors[index], al
                    )
                else:
                    _decode_block_dc_refine(reader, block, al)
            else:
                _, ac = tables(dc_id, ac_id, False, True)
                if ah == 0:
                    eobrun = _decode_block_ac_first(
                        reader, ac, block, ss, se, al, eobrun
                    )
                else:
                    eobrun = _decode_block_ac_refine(
                        reader, ac, block, ss, se, al, eobrun
                    )
            unit += 1
