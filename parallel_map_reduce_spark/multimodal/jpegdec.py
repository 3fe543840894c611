"""Stdlib JPEG decoder: marker walk, DHT canonical Huffman, entropy
decode with byte unstuffing and restart markers, dequantize, dezigzag,
IDCT, level shift, clamp, and JFIF YCbCr→RGB — pure ``struct``/numpy,
no libjpeg.

Scope (honest): BASELINE sequential DCT (SOF0) and PROGRESSIVE DCT
(SOF2 — spectral selection + successive approximation per ITU-T T.81
G.2: interleaved/non-interleaved DC first+refinement scans, per-
component AC first+refinement scans with EOBRUN), 8-bit samples,
grayscale or color with sampling factors 1-2 per axis — 4:4:4, 4:2:2,
4:4:0, and the ubiquitous 4:2:0 (interleaved MCU walk, nearest-
neighbor chroma upsampling). Arithmetic coding, lossless, and
hierarchical variants are rejected with ValueError rather than
mis-decoded. That covers every file the committed fixture's encoder
(imagehdr.py:build_jpeg) produces plus the two dominant wild layouts.

Exactness contract the fixture relies on: the encoder emits DC-only
blocks with ``dc * q`` divisible by 8, for which ANY correct IDCT
yields the exact flat integer block value (dc*q/8 + 128) — so decoded
pixels are bit-reproducible from block arithmetic alone, keeping the
parity oracle independent of this module. General AC paths are
exercised by unit tests against the textbook double-sum IDCT
(tests/test_jpegdec.py).
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag order: index i of the scan -> (row, col) in the 8x8 block.
ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# Separable IDCT basis: X = C.T @ F @ C with the orthonormal DCT-II C.
_C = np.array(
    [
        [
            (np.sqrt(1.0 / 8) if k == 0 else np.sqrt(2.0 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def idct_2d(coeffs: np.ndarray) -> np.ndarray:
    """Float 2-D inverse DCT of one 8x8 coefficient block."""
    return _C.T @ coeffs @ _C


class _BitReader:
    """MSB-first entropy-segment reader with 0xFF00 unstuffing; stops
    at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> bool:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:  # stuffed literal FF
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                return False  # restart marker: caller resyncs
            else:
                return False  # real marker: segment over
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8
        return True

    def read_bit(self) -> int:
        if self.n == 0 and not self._fill():
            raise ValueError("JPEG entropy segment truncated")
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self):
        """Byte-align and consume one RSTn marker."""
        self.acc = 0
        self.n = 0
        if self.data[self.pos] != 0xFF or not (0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError("expected JPEG restart marker")
        self.pos += 2


def _build_huffman(counts: list[int], symbols: list[int]) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman: {(length, code) -> symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """JPEG EXTEND: map s magnitude bits to a signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# zigzag index -> (row, col) as parallel arrays, for vectorized dezigzag
_ZR = np.array([r for r, _ in ZIGZAG])
_ZC = np.array([c for _, c in ZIGZAG])


def _nonint_block_dims(
    width: int, height: int, h_i: int, v_i: int, hmax: int, vmax: int
) -> tuple[int, int]:
    """(blocks_wide, blocks_high) of one component in a NON-interleaved
    scan: the component's true sample dims (ceil scaling), not the
    MCU-padded grid (T.81 A.2.2)."""
    cw = (width * h_i + hmax - 1) // hmax
    ch = (height * v_i + vmax - 1) // vmax
    return (cw + 7) // 8, (ch + 7) // 8


def _next_marker(data: bytes, pos: int) -> int:
    """First position >= pos of a real marker (FF followed by neither
    00 stuffing nor another FF fill byte) — where the outer marker walk
    resumes after an entropy-coded segment."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF and data[pos + 1] not in (0x00, 0xFF):
            return pos
        pos += 1
    return n


def _ac_first_block(br, act, blk, ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC FIRST-pass scan of one block (T.81 G.1.2.2):
    run/size coding of the (ss..se) band with values scaled by 2^al;
    EOBn symbols start an end-of-band run covering whole blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_symbol(br, act)
        r, s = rs >> 4, rs & 0x0F
        if s:
            k += r
            if k > se:
                raise ValueError("JPEG AC coefficient overrun")
            blk[k] = _extend(br.read_bits(s), s) << al
            k += 1
        else:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read_bits(r)
            break
    return eobrun


def _ac_refine_block(br, act, blk, ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC REFINEMENT scan of one block (T.81 G.1.2.3, the
    libjpeg decode_mcu_AC_refine control flow): newly-nonzero
    coefficients arrive as ±2^al; every already-nonzero coefficient in
    the band consumes one correction bit appending 2^al to its
    magnitude; EOB runs still emit correction bits for nonzero
    history."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_symbol(br, act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                val = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("invalid JPEG refinement magnitude")
                val = p1 if br.read_bit() else m1
            # Advance past r zero-HISTORY coefficients, emitting
            # correction bits for nonzero-history ones on the way.
            while k <= se:
                if blk[k] != 0:
                    if br.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if br.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _finish_pixels(planes, comps, width: int, height: int, hmax: int, vmax: int):
    """Shared decode tail: nearest-neighbor upsample each component
    plane to full resolution (JFIF sample replication), crop, and
    convert (grayscale passthrough / YCbCr→RGB)."""
    ys_full = np.arange(height)
    xs_full = np.arange(width)
    cropped = []
    for plane, (_, _, h_i, v_i) in zip(planes, comps):
        ys = (ys_full * v_i) // vmax
        xs = (xs_full * h_i) // hmax
        cropped.append(np.clip(np.rint(plane[ys][:, xs]), 0, 255))
    if len(cropped) == 1:
        return width, height, 1, cropped[0].astype(np.uint8).tobytes()
    if len(cropped) == 3:
        y, cb, cr = (p.astype(np.float64) for p in cropped)
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack(
            [np.clip(np.rint(ch), 0, 255) for ch in (r, g, b)], axis=2
        )
        return width, height, 3, rgb.astype(np.uint8).tobytes()
    raise ValueError(f"unsupported JPEG component count {len(cropped)}")


def decode_jpeg_pixels(data: bytes):
    """(width, height, channels, pixels) for a baseline (SOF0) or
    progressive (SOF2) 8-bit JPEG, grayscale or YCbCr with sampling
    factors 1-2 per axis (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0). Raises
    ValueError otherwise — including on truncation anywhere in the
    stream."""
    try:
        return _decode_jpeg_pixels(data)
    except (IndexError, struct.error, MemoryError) as exc:
        raise ValueError(f"truncated/corrupt JPEG: {exc}") from exc


def _decode_jpeg_pixels(data: bytes):
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None  # (height, width, [(comp_id, q_id, h_i, v_i)], progressive)
    coef: dict[int, np.ndarray] = {}  # progressive coefficient store per comp
    restart_interval = 0
    i, n = 2, len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            raise ValueError("desynchronized JPEG marker stream")
        marker = data[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack(">H", data[i + 2 : i + 4])
        seg = data[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if prec != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.zeros((8, 8), np.int32)
                for z in range(64):
                    r, c = ZIGZAG[z]
                    tbl[r, c] = seg[p + z]
                qt[tid] = tbl
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                total = sum(counts)
                symbols = list(seg[p + 17 : p + 17 + total])
                tbl = _build_huffman(counts, symbols)
                (dc_tables if cls == 0 else ac_tables)[tid] = tbl
                p += 17 + total
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            height, width = struct.unpack(">HH", seg[1:5])
            n_comp = seg[5]
            comps = []
            for c in range(n_comp):
                cid, sampling, qid = seg[6 + 3 * c : 9 + 3 * c]
                h_i, v_i = sampling >> 4, sampling & 0x0F
                if h_i not in (1, 2) or v_i not in (1, 2):
                    raise ValueError(
                        "unsupported JPEG sampling factor (1-2 only: "
                        "4:4:4 / 4:2:2 / 4:4:0 / 4:2:0)"
                    )
                comps.append((cid, qid, h_i, v_i))
            frame = (height, width, comps, marker == 0xC2)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0) and progressive (SOF2) JPEG supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            height, width, comps, progressive = frame
            ns = seg[0]
            scan_tables = {}
            scan_ids = []
            for c in range(ns):
                cid, tids = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cid] = (tids >> 4, tids & 0x0F)
                scan_ids.append(cid)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            if progressive:
                i = _decode_progressive_scan(
                    data, i + 2 + seg_len, frame, scan_ids, scan_tables,
                    ss, se, ah, al, coef, dc_tables, ac_tables,
                    restart_interval,
                )
                continue
            if ns != len(comps):
                raise ValueError("multi-scan baseline JPEG not supported")
            if (ss, se, ah, al) != (0, 63, 0, 0):
                raise ValueError("baseline scan must cover the full band")
            br = _BitReader(data, i + 2 + seg_len)
            # General interleaved-MCU walk: an MCU spans 8*hmax x
            # 8*vmax pixels and carries h_i*v_i raster-ordered blocks
            # per component — 4:4:4 degenerates to one block each.
            hmax = max(h for _, _, h, _ in comps)
            vmax = max(v for _, _, _, v in comps)
            mcux = (width + 8 * hmax - 1) // (8 * hmax)
            mcuy = (height + 8 * vmax - 1) // (8 * vmax)
            # Pre-allocation sanity check on the header-declared dims:
            # every block costs >= 2 entropy bits (1-bit DC symbol +
            # 1-bit EOB), so a frame whose block count exceeds
            # 4 bits-per-byte x remaining bytes is structurally
            # truncated — reject as ValueError BEFORE allocating
            # width*height-scale planes (a crafted 64k x 64k header
            # must not surface as MemoryError from here).
            total_blocks = mcux * mcuy * sum(h * v for _, _, h, v in comps)
            if total_blocks * 2 > (n - (i + 2 + seg_len)) * 8:
                raise ValueError(
                    "JPEG entropy segment too short for declared dimensions"
                )
            planes = [
                np.zeros((mcuy * v * 8, mcux * h * 8), np.float64)
                for _, _, h, v in comps
            ]
            preds = [0] * len(comps)
            mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        br.sync_restart()
                        preds = [0] * len(comps)
                    for ci, (cid, qid, h_i, v_i) in enumerate(comps):
                        dc_id, ac_id = scan_tables[cid]
                        dct = dc_tables.get(dc_id)
                        act = ac_tables.get(ac_id)
                        if dct is None or act is None:
                            raise ValueError("JPEG scan references missing Huffman table")
                        q = qt.get(qid)
                        if q is None:
                            raise ValueError("JPEG frame references missing quant table")
                        for vb in range(v_i):
                            for hb in range(h_i):
                                coeffs = np.zeros((8, 8), np.int32)
                                s = _decode_symbol(br, dct)
                                diff = _extend(br.read_bits(s), s) if s else 0
                                preds[ci] += diff
                                coeffs[0, 0] = preds[ci]
                                z = 1
                                while z < 64:
                                    rs = _decode_symbol(br, act)
                                    if rs == 0x00:  # EOB
                                        break
                                    if rs == 0xF0:  # ZRL: 16 zeros
                                        z += 16
                                        continue
                                    run, size = rs >> 4, rs & 0x0F
                                    z += run
                                    if z >= 64 or size == 0:
                                        raise ValueError("JPEG AC coefficient overrun")
                                    r, c = ZIGZAG[z]
                                    coeffs[r, c] = _extend(br.read_bits(size), size)
                                    z += 1
                                block = idct_2d((coeffs * q).astype(np.float64)) + 128.0
                                py = (my * v_i + vb) * 8
                                px = (mx * h_i + hb) * 8
                                planes[ci][py : py + 8, px : px + 8] = block
                    mcu += 1
            return _finish_pixels(planes, comps, width, height, hmax, vmax)
        i += 2 + seg_len
    if frame is not None and frame[3] and coef:
        # Progressive: every scan accumulated into the coefficient
        # store; EOI (or stream end) triggers reconstruction.
        return _reconstruct_progressive(frame, coef, qt)
    raise ValueError("JPEG has no scan data")


def _decode_progressive_scan(
    data: bytes,
    pos: int,
    frame,
    scan_ids: list[int],
    scan_tables: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    coef: dict[int, "np.ndarray"],
    dc_tables: dict,
    ac_tables: dict,
    restart_interval: int,
) -> int:
    """Entropy-decode ONE progressive scan into the shared coefficient
    store (T.81 G.2: spectral selection ss..se, successive
    approximation ah→al). Returns the stream position where the outer
    marker walk resumes."""
    height, width, comps, _ = frame
    hmax = max(h for _, _, h, _ in comps)
    vmax = max(v for _, _, _, v in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    comp_idx = {cid: k for k, (cid, _, _, _) in enumerate(comps)}
    try:
        in_scan = [comp_idx[cid] for cid in scan_ids]
    except KeyError as exc:
        raise ValueError(f"JPEG scan references unknown component {exc}") from exc
    if ss == 0 and ah == 0:
        # Coefficient stores allocate HERE, in DC FIRST scans only
        # (T.81 G.1.1.1.1: each component's DC scan precedes its AC
        # scans and refinements), where every block costs >= 1 entropy
        # bit — so a crafted header's huge declared dims fail this
        # structural check as ValueError before any width*height-scale
        # allocation (the baseline guard's progressive counterpart; AC
        # scans cannot length-bound this way because one EOBRUN symbol
        # can cover thousands of blocks).
        scan_blocks = 0
        for ci in in_scan:
            _, _, h_i, v_i = comps[ci]
            scan_blocks += mcux * mcuy * h_i * v_i
        if scan_blocks > (len(data) - pos) * 8:
            raise ValueError(
                "JPEG entropy segment too short for declared dimensions"
            )
        for ci in in_scan:
            if ci not in coef:
                _, _, h_i, v_i = comps[ci]
                # MCU-padded block grid (same extent the baseline
                # planes use); non-interleaved scans fill its
                # true-dims prefix.
                coef[ci] = np.zeros((mcuy * v_i, mcux * h_i, 64), np.int32)
    else:
        # DC refinements (ss=0, ah>0) and AC scans refine an EXISTING
        # store: a refinement with no preceding DC first scan is an
        # invalid stream and must reject, not silently refine zeros
        # (advisor r12 — the DC path previously allocated here).
        for ci in in_scan:
            if ci not in coef:
                raise ValueError(
                    "progressive scan refines a component before its "
                    "DC first scan"
                )
    br = _BitReader(data, pos)
    if ss == 0:  # DC scan (first or refinement), 1..ns components
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        dc_tbls = {}
        if ah == 0:
            for cid in scan_ids:
                t = dc_tables.get(scan_tables[cid][0])
                if t is None:
                    raise ValueError("JPEG scan references missing Huffman table")
                dc_tbls[cid] = t
        preds = dict.fromkeys(in_scan, 0)

        def dc_unit(ci: int, by: int, bx: int) -> None:
            cid = comps[ci][0]
            blk = coef[ci][by, bx]
            if ah == 0:
                s = _decode_symbol(br, dc_tbls[cid])
                diff = _extend(br.read_bits(s), s) if s else 0
                preds[ci] += diff
                blk[0] = preds[ci] << al
            elif br.read_bit():
                blk[0] |= 1 << al

        units = 0
        if len(in_scan) > 1:  # interleaved MCU walk
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and units and units % restart_interval == 0:
                        br.sync_restart()
                        preds = dict.fromkeys(in_scan, 0)
                    for ci in in_scan:
                        _, _, h_i, v_i = comps[ci]
                        for vb in range(v_i):
                            for hb in range(h_i):
                                dc_unit(ci, my * v_i + vb, mx * h_i + hb)
                    units += 1
        else:  # single-component: non-interleaved true block dims
            ci = in_scan[0]
            _, _, h_i, v_i = comps[ci]
            nbx, nby = _nonint_block_dims(width, height, h_i, v_i, hmax, vmax)
            for by in range(nby):
                for bx in range(nbx):
                    if restart_interval and units and units % restart_interval == 0:
                        br.sync_restart()
                        preds = dict.fromkeys(in_scan, 0)
                    dc_unit(ci, by, bx)
                    units += 1
    else:  # AC scan: exactly one component, non-interleaved (T.81 B.2.3)
        if len(in_scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if se < ss or se > 63:
            raise ValueError("invalid JPEG spectral band")
        ci = in_scan[0]
        cid, _, h_i, v_i = comps[ci]
        act = ac_tables.get(scan_tables[cid][1])
        if act is None:
            raise ValueError("JPEG scan references missing Huffman table")
        nbx, nby = _nonint_block_dims(width, height, h_i, v_i, hmax, vmax)
        eobrun = 0
        units = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and units and units % restart_interval == 0:
                    br.sync_restart()
                    eobrun = 0
                blk = coef[ci][by, bx]
                if ah == 0:
                    eobrun = _ac_first_block(br, act, blk, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine_block(br, act, blk, ss, se, al, eobrun)
                units += 1
    return _next_marker(data, br.pos)


def _reconstruct_progressive(frame, coef: dict[int, "np.ndarray"], qt: dict):
    """Dequantize + IDCT the accumulated coefficient store and run the
    shared upsample/convert tail."""
    height, width, comps, _ = frame
    hmax = max(h for _, _, h, _ in comps)
    vmax = max(v for _, _, _, v in comps)
    planes = []
    for ci, (cid, qid, h_i, v_i) in enumerate(comps):
        q = qt.get(qid)
        if q is None:
            raise ValueError("JPEG frame references missing quant table")
        store = coef.get(ci)
        if store is None:
            raise ValueError(f"JPEG component {cid} has no scan data")
        nby, nbx = store.shape[:2]
        plane = np.full((nby * 8, nbx * 8), 128.0)
        for by in range(nby):
            for bx in range(nbx):
                cz = store[by, bx]
                if not cz.any():
                    continue  # all-zero block decodes to flat 128
                nat = np.zeros((8, 8), np.int64)
                nat[_ZR, _ZC] = cz
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    idct_2d((nat * q).astype(np.float64)) + 128.0
                )
        planes.append(plane)
    return _finish_pixels(planes, comps, width, height, hmax, vmax)
