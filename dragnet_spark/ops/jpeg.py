"""Baseline JPEG codec — stdlib + numpy only, no codec libraries.

Completes the real-decode path for the multimodal operators
(reference parity target: the engine must ingest what a real image
corpus contains; PNG/BMP/WAV live in ``ops/multimodal.py``).

Decoder: baseline sequential (SOF0) and progressive (SOF2 — spectral
selection, successive approximation, EOB runs) DCT, 8-bit, grayscale
or YCbCr, sampling factors 1 or 2 per axis (4:4:4 / 4:2:2 / 4:2:0),
restart markers, Huffman and quantization tables read from the
stream. Lossless/arithmetic variants are rejected with a clear
error. Encoder: 4:4:4 baseline with the JPEG Annex-K example tables
(quality-scaled the way libjpeg does), which is all the roundtrip
needs — any spec-valid tables work because the decoder trusts the
stream, not these constants.

Everything operates on numpy arrays; the DCT is an 8×8 matrix
product (T @ B @ T.T), exact enough that roundtrip error is bounded
by quantization alone.
"""

from __future__ import annotations

import functools
import struct

import numpy as np

# ---------------------------------------------------------------- constants

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

#: inverse zigzag permutation: sq = blk[_UNZIGZAG] ⟺ sq[ZIGZAG] = blk
_UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)

QUANT_CHROM = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32,
    dtype=np.float64,
)

# Annex-K example Huffman tables: (bits[1..16], values)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
     0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
     0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
     0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
     0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
     0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
     0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
     0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
     0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
     0xf9, 0xfa],
)
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
     0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
     0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
     0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
     0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
     0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
     0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
     0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
     0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
     0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
     0xf9, 0xfa],
)


def _dct_matrix() -> np.ndarray:
    T = np.zeros((8, 8))
    for k in range(8):
        c = np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8)
        for n in range(8):
            T[k, n] = c * np.cos((2 * n + 1) * k * np.pi / 16)
    return T


_T = _dct_matrix()


# ------------------------------------------------------------------ Huffman


def _canonical_codes(bits, values):
    """bits[1..16] counts + values → {symbol: (code, length)}.
    Cached by table content: the standard Annex-K tables are rebuilt
    for every frame in a media pipeline (measured 4×/frame), and the
    output is read-only."""
    return _canonical_codes_cached(tuple(bits), tuple(values))


@functools.lru_cache(maxsize=64)
def _canonical_codes_cached(bits, values):
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _canonical_code_arrays(bits, values, size):
    """Array form of :func:`_canonical_codes` for the vectorized
    encoder: (code[symbol], length[symbol]) int64 lookups, length 0
    marking symbols absent from the table (the dict's KeyError)."""
    return _canonical_code_arrays_cached(tuple(bits), tuple(values), size)


@functools.lru_cache(maxsize=64)
def _canonical_code_arrays_cached(bits, values, size):
    codes = _canonical_codes_cached(bits, values)
    code = np.zeros(size, dtype=np.int64)
    ln = np.zeros(size, dtype=np.int64)
    for sym, (c, l) in codes.items():
        if sym < size:
            code[sym] = c
            ln[sym] = l
    code.setflags(write=False)
    ln.setflags(write=False)
    return code, ln


class _Bits:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing and RSTn handling (reset() is called by the scan loop)."""

    def __init__(self, data: bytes, start: int):
        self.d = data
        self.i = start
        self.acc = 0
        self.n = 0

    def _fill(self):
        while self.n <= 24:
            if self.i >= len(self.d):
                self.acc = (self.acc << 8) | 0
                self.n += 8
                continue
            b = self.d[self.i]
            if b == 0xFF:
                nxt = self.d[self.i + 1] if self.i + 1 < len(self.d) else 0xD9
                if nxt == 0x00:
                    self.i += 2
                else:
                    # any real marker ends this scan's entropy data:
                    # pad with zero bits, leave i pointing at the
                    # marker (skip_rst / _find_next_marker consume it)
                    self.acc = (self.acc << 8) | 0
                    self.n += 8
                    continue
            else:
                self.i += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def peek16(self) -> int:
        self._fill()
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def take(self, k: int) -> int:
        self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def drop(self, k: int) -> None:
        """Discard k bits already exposed by :meth:`peek16` (k ≤ 16;
        the preceding peek's _fill guarantees n ≥ 16)."""
        self.n -= k
        self.acc &= (1 << self.n) - 1

    def skip_rst(self):
        """Byte-align and consume an RSTn marker if present. The spec
        (B.1.1.2) permits any number of 0xFF fill bytes before a
        marker, so runs of 0xFF are skipped before testing the marker
        byte; position only advances when a marker is consumed."""
        self.acc = 0
        self.n = 0
        j = self.i
        while j + 1 < len(self.d) and self.d[j] == 0xFF and self.d[j + 1] == 0xFF:
            j += 1
        if j + 1 < len(self.d) and self.d[j] == 0xFF and (
            0xD0 <= self.d[j + 1] <= 0xD7
        ):
            self.i = j + 2


class _HuffTable:
    """Decoded-Huffman lookup: the legacy (length, code)→symbol dict
    plus a 65536-entry peek-16 LUT (``lut[p] = (symbol << 5) | length``,
    0 = invalid prefix) so one 16-bit peek replaces up to 16
    bit-at-a-time reads per symbol."""

    __slots__ = ("table", "lut")

    def __init__(self, table, lut):
        self.table = table
        self.lut = lut


def _build_decode_table(bits, values):
    """symbol lookup for ``_read_symbol``; cached by table content
    (media pipelines decode thousands of frames sharing the same
    DHT segments — the 64k LUT is built once per distinct table)."""
    return _build_decode_table_cached(tuple(bits), tuple(values))


@functools.lru_cache(maxsize=64)
def _build_decode_table_cached(bits, values):
    table = {}
    lut = [0] * 65536
    code = 0
    k = 0
    for length in range(1, 17):
        shift = 16 - length
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            packed = (values[k] << 5) | length
            lut[code << shift : (code + 1) << shift] = [packed] * (1 << shift)
            code += 1
            k += 1
        code <<= 1
    return _HuffTable(table, lut)


def _read_symbol(br: _Bits, ht: _HuffTable) -> int:
    # One peek + one drop per symbol. peek16's zero-padding past the
    # scan end reproduces the old bit-at-a-time reads exactly (those
    # also took zero bits from _fill's padding), so the decoded
    # (length, code) — and every later bit position — is identical.
    packed = ht.lut[br.peek16()]
    if packed:
        br.drop(packed & 31)
        return packed >> 5
    raise ValueError("invalid JPEG: bad Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _clean_entropy(d: bytes, start: int):
    """Pre-unstuff one entropy segment starting at ``start``: returns
    (seg, rawmap, end) where ``seg`` is the segment's data bytes with
    every 0xFF00-stuffed zero removed, ``rawmap[i]`` is the raw-buffer
    index of ``seg[i]``, and ``end`` is the raw index of the byte that
    terminated the segment (the 0xFF of the first marker, or len(d)).
    The serial bit loop then refills from ``seg`` in multi-byte gulps
    with no per-byte 0xFF test — the same byte stream the old
    per-byte fill produced, because inside a segment the only 0xFF
    bytes are stuffed pairs (anything else ended the segment) and the
    old fill never advanced past a marker either."""
    dlen = len(d)
    i = start
    stuffed = []
    while True:
        k = d.find(0xFF, i)
        if k == -1:
            end = dlen
            break
        if k + 1 >= dlen:
            # trailing 0xFF: the old fill synthesized nxt=0xD9 (EOI)
            # and padded from here
            end = k
            break
        if d[k + 1] == 0x00:
            stuffed.append(k + 1)
            i = k + 2
            continue
        end = k
        break
    raw = np.frombuffer(d, dtype=np.uint8, count=end - start, offset=start)
    rawmap = np.arange(start, end, dtype=np.int64)
    if stuffed:
        local = np.array(stuffed, dtype=np.int64) - start
        raw = np.delete(raw, local)
        rawmap = np.delete(rawmap, local)
    return raw.tobytes(), rawmap, end


# ------------------------------------------------------------------ decoder


def decode_jpeg(data: bytes):
    """JPEG bytes → (width, height, pixels) — pixels is a uint8 numpy
    array of shape (h, w) for grayscale or (h, w, 3) RGB. Baseline
    and progressive DCT; lossless/arithmetic raise ValueError.

    Error contract for corpus ingestion: every malformed input raises
    ValueError (internal KeyError/struct.error/etc are normalized), so
    an error-tolerant pipeline pass needs exactly one except clause.
    """
    try:
        return _decode_jpeg_impl(data)
    except ValueError:
        raise
    except (KeyError, IndexError, TypeError, ZeroDivisionError,
            struct.error) as e:
        raise ValueError(f"invalid JPEG: {type(e).__name__}: {e}") from e


def _decode_jpeg_impl(data: bytes):
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", data[i + 2 : i + 4])[0]
        seg = data[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(
                        np.float64
                    )
                    j += 64
                else:
                    tbl = np.frombuffer(
                        seg[j : j + 128], dtype=">u2"
                    ).astype(np.float64)
                    j += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                bits = list(seg[j + 1 : j + 17])
                nvals = sum(bits)
                vals = list(seg[j + 17 : j + 17 + nvals])
                tbl = _build_decode_table(bits, vals)
                (huff_ac if tc else huff_dc)[th] = tbl
                j += 17 + nvals
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (w, h, comps)
        elif marker == 0xC2:  # progressive DCT
            return _decode_progressive(data)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline/progressive DCT JPEG supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("invalid JPEG: SOS before SOF")
            ns = seg[0]
            scan_sel = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_sel.append((cs, tt >> 4, tt & 0xF))
            return _decode_scan(
                data, i + 2 + seglen, frame, scan_sel, qt, huff_dc,
                huff_ac, restart_interval,
            )
        i += 2 + seglen
    raise ValueError("invalid JPEG: no scan data")


def _decode_scan(data, start, frame, scan_sel, qt, huff_dc, huff_ac, dri):
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors > 2 not supported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    sel = {cs: (td, ta) for cs, td, ta in scan_sel}
    planes = []
    for cid, ch, cv, tq in comps:
        pw, ph = mcux * ch * 8, mcuy * cv * 8
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    pred = [0] * len(comps)
    n_mcu = 0
    # pass 1: entropy decode (inherently sequential) collects each
    # block's nonzero zigzag coefficients as (block, pos, value)
    # triplets scattered into one preallocated (nblocks, 64) stack in
    # a single numpy assignment; pass 2 below dequantizes, un-zigzags
    # and IDCTs the WHOLE stack per component in three vectorized ops
    # instead of two 8×8 matmuls per block.
    #
    # The bit reader is INLINED on local ints (the _Bits methods cost
    # more than the work — measured ~2.1 s of a 2.9 s decode in call
    # overhead): `acc`/`nb` mirror _Bits.acc/.n, one fill tops up to
    # ≥48 bits so a (code ≤16) + (value ≤16) pair never refills.
    # The entropy bytes are pre-unstuffed per restart segment
    # (_clean_entropy), so the refill is one ≤6-byte int.from_bytes
    # gulp with no per-byte 0xFF branch — the identical bit sequence:
    # inside a segment the only 0xFF bytes were stuffed pairs, the
    # old fill never advanced past a marker, and zero-padding past
    # the segment end reproduces the old pad-at-marker bits (fill
    # depth does not change the stream).
    bpm = sum(ch * cv for _, ch, cv, _ in comps)
    coefs = np.zeros((mcuy * mcux * bpm, 64), dtype=np.float64)
    place: list[list[tuple[int, int, int]]] = [[] for _ in comps]
    bi = 0
    sched = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        td, ta = sel[cid]
        for by in range(cv):
            for bx in range(ch):
                sched.append(
                    (ci, huff_dc[td].lut, huff_ac[ta].lut, cv, ch, by, bx)
                )
    d = data
    dlen = len(d)
    ifb = int.from_bytes
    seg, rawmap, seg_end = _clean_entropy(d, start)
    slen = len(seg)
    pos = 0
    acc = 0
    nb = 0
    t_bi: list[int] = []
    t_k: list[int] = []
    t_v: list[int] = []
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and n_mcu and n_mcu % dri == 0:
                # skip_rst on the RAW buffer (byte-align by dropping
                # buffered bits, skip 0xFF fill runs, consume an RSTn
                # if present): j is the raw cursor the old per-byte
                # fill would hold — the next unread data byte, or the
                # terminating marker once the segment is drained
                acc = 0
                nb = 0
                j = int(rawmap[pos]) if pos < slen else seg_end
                while j + 1 < dlen and d[j] == 0xFF and d[j + 1] == 0xFF:
                    j += 1
                if j + 1 < dlen and d[j] == 0xFF and 0xD0 <= d[j + 1] <= 0xD7:
                    seg, rawmap, seg_end = _clean_entropy(d, j + 2)
                    slen = len(seg)
                    pos = 0
                pred = [0] * len(comps)
            n_mcu += 1
            for ci, dclut, aclut, cv, ch, by, bx in sched:
                if nb < 48:
                    acc &= (1 << nb) - 1  # bound acc to the live bits
                    take = slen - pos
                    if take > 0:
                        if take > 6:
                            take = 6
                        acc = (acc << (take << 3)) | ifb(
                            seg[pos:pos + take], "big"
                        )
                        nb += take << 3
                        pos += take
                    if nb < 48:  # past segment end: pad zeros
                        acc <<= 48 - nb
                        nb = 48
                packed = dclut[(acc >> (nb - 16)) & 0xFFFF]
                if not packed:
                    raise ValueError("invalid JPEG: bad Huffman code")
                nb -= packed & 31
                s = packed >> 5
                if s:
                    nb -= s
                    v = (acc >> nb) & ((1 << s) - 1)
                    pred[ci] += (
                        v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                    )
                t_bi.append(bi)
                t_k.append(0)
                t_v.append(pred[ci])
                k = 1
                while k < 64:
                    if nb < 48:
                        acc &= (1 << nb) - 1
                        take = slen - pos
                        if take > 0:
                            if take > 6:
                                take = 6
                            acc = (acc << (take << 3)) | ifb(
                                seg[pos:pos + take], "big"
                            )
                            nb += take << 3
                            pos += take
                        if nb < 48:
                            acc <<= 48 - nb
                            nb = 48
                    packed = aclut[(acc >> (nb - 16)) & 0xFFFF]
                    if not packed:
                        raise ValueError("invalid JPEG: bad Huffman code")
                    nb -= packed & 31
                    rs = packed >> 5
                    size = rs & 0xF
                    if size == 0:
                        if rs >> 4 == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += rs >> 4
                    if k > 63:
                        raise ValueError("invalid JPEG: AC overrun")
                    nb -= size
                    v = (acc >> nb) & ((1 << size) - 1)
                    t_bi.append(bi)
                    t_k.append(k)
                    t_v.append(
                        v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                    )
                    k += 1
                place[ci].append(
                    (bi, (my * cv + by) * 8, (mx * ch + bx) * 8)
                )
                bi += 1
    if t_bi:
        coefs[np.array(t_bi, dtype=np.intp), np.array(t_k, dtype=np.intp)] = (
            np.array(t_v, dtype=np.float64)
        )
    # pass 2: batched dequant + inverse-permutation gather + IDCT.
    # Left-association (_T.T @ sq) @ _T matches the retired per-block
    # expression; the stacked matmul MAY differ from per-block 2D
    # dgemm by a few ulps when the BLAS picks different kernels for
    # the two shapes (observed under OpenBLAS DYNAMIC_ARCH on AVX512
    # hosts) — the decoder's contract is the clip(round()) uint8
    # output, which an ulp can only move at an exact .5 boundary
    # (test_batched_block_math_matches_per_block_reference pins the
    # discretized equality; end-to-end pixel goldens pin real frames).
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        pl = place[ci]
        if not pl:
            continue
        rows = np.array([r for r, _, _ in pl], dtype=np.intp)
        deq = coefs[rows] * qt[tq]
        sq = deq[:, _UNZIGZAG].reshape(-1, 8, 8)
        px = _T.T @ sq @ _T + 128.0
        dst = planes[ci]
        for j, (_, y0, x0) in enumerate(pl):
            dst[y0 : y0 + 8, x0 : x0 + 8] = px[j]
    # upsample each component to full resolution and crop
    full = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return w, h, np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    Y, Cb, Cr = full
    R = Y + 1.402 * (Cr - 128)
    G = Y - 0.344136 * (Cb - 128) - 0.714136 * (Cr - 128)
    B = Y + 1.772 * (Cb - 128)
    rgb = np.stack([R, G, B], axis=-1)
    return w, h, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            # pad with 1-bits to a byte boundary
            pad = 8 - self.n
            self.acc = (self.acc << pad) | ((1 << pad) - 1)
            b = self.acc & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """Quality-scaled quantization table; cached read-only by table
    content (rebuilt per frame otherwise — callers only copy/divide)."""
    return _scaled_quant_cached(base.tobytes(), base.dtype.str,
                                base.shape, int(quality))


@functools.lru_cache(maxsize=32)
def _scaled_quant_cached(raw, dtype, shape, quality):
    base = np.frombuffer(raw, dtype=dtype).reshape(shape)
    quality = min(max(quality, 1), 100)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((base * scale + 50) / 100)
    q = np.clip(q, 1, 255)
    q.setflags(write=False)
    return q


def _size_cat(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(bw, zz, dc_codes, ac_codes, pred):
    """Huffman-emit one block's already-quantized zigzag coefficients
    (int64, length 64). Retired from the encode path by the vectorized
    :func:`_emit_entropy`; kept as the per-symbol REFERENCE the
    byte-identity test pins the vectorized emitter against."""
    zzl = zz.tolist()
    diff = zzl[0] - pred
    s = _size_cat(diff)
    code, ln = dc_codes[s]
    bw.put(code, ln)
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    # walk only the nonzero AC positions; the zero gaps between them
    # become the run lengths directly (identical bitstream to the
    # retired 1..63 scan — runs of ≥16 still split into ZRLs first)
    nzi = np.flatnonzero(zz)
    last_nz = int(nzi[-1]) if nzi.size else 0
    prev = 0
    for k in nzi.tolist():
        if k == 0:
            continue
        run = k - prev - 1
        while run >= 16:
            code, ln = ac_codes[0xF0]
            bw.put(code, ln)
            run -= 16
        v = zzl[k]
        s = _size_cat(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        prev = k
    if last_nz < 63:
        code, ln = ac_codes[0x00]
        bw.put(code, ln)
    return zzl[0]


#: powers of two for exact vectorized bit_length via searchsorted
_POW2 = np.int64(1) << np.arange(63, dtype=np.int64)


def _bit_length(x: np.ndarray) -> np.ndarray:
    """Exact ``int.bit_length`` over a non-negative int64 array (no
    float log2 — 2^k boundaries must not wobble)."""
    return np.searchsorted(_POW2, x, side="right").astype(np.int64)


def _emit_entropy(zzs, dc_tabs, ac_tabs) -> bytes:
    """Vectorized Huffman emission for a whole baseline scan.

    Replaces the per-symbol Python loop (`_BitWriter.put` twice per
    coefficient) with array ops: per plane the (code, length) symbol
    stream is derived vectorized (DC category+diff bits from a shifted
    difference, AC run/size symbols from the nonzero positions, ZRL
    splits by repeat, per-block EOB), interleaved into MCU order
    (block-major, plane-minor, in-block sequence last) by one integer
    sort key, then bit-packed and 0xFF-stuffed in one numpy pass.
    Bitstream is byte-identical to the retired `_encode_block` loop
    (test-pinned); unknown size categories raise KeyError exactly as
    the code-dict lookups did.
    """
    nplanes = len(zzs)
    ks, cs, ls = [], [], []
    for ci, zz in enumerate(zzs):
        nb = zz.shape[0]
        dc_code, dc_len = dc_tabs[ci]
        ac_code, ac_len = ac_tabs[ci]
        # per-block sort-key base: block-major, plane-minor; low 10
        # bits hold the in-block sequence (max used value 514)
        bkey = (np.arange(nb, dtype=np.int64) * nplanes + ci) << 10
        # --- DC: category code, then the mapped diff bits (seq 0, 1)
        dc = zz[:, 0]
        diff = np.empty(nb, dtype=np.int64)
        diff[0] = dc[0]
        diff[1:] = dc[1:] - dc[:-1]
        s = _bit_length(np.abs(diff))
        if int(s.max(initial=0)) >= dc_len.size or bool((dc_len[s] == 0).any()):
            raise KeyError("DC size category outside the Huffman table")
        ks.append(bkey)
        cs.append(dc_code[s])
        ls.append(dc_len[s])
        has = s > 0
        ks.append(bkey[has] + 1)
        cs.append(
            np.where(diff[has] >= 0, diff[has], diff[has] + _POW2[s[has]] - 1)
        )
        ls.append(s[has])
        # --- AC: each nonzero position k in 1..63 emits up to three
        # ZRLs (seq 2+8k+j), its (run, size) code (+5) and value (+6)
        bi, km1 = np.nonzero(zz[:, 1:] != 0)
        if bi.size:
            k = km1.astype(np.int64) + 1
            prevk = np.empty_like(k)
            prevk[0] = 0
            prevk[1:] = k[:-1]
            firsts = np.empty(bi.size, dtype=bool)
            firsts[0] = True
            firsts[1:] = bi[1:] != bi[:-1]
            prevk[firsts] = 0
            run = k - prevk - 1
            v = zz[bi, k]
            sv = _bit_length(np.abs(v))
            sym = ((run & 15) << 4) | sv
            if bool((ac_len[sym] == 0).any()):
                raise KeyError("AC (run, size) outside the Huffman table")
            bk = bkey[bi]
            seq = 8 * k + 2
            nzrl = run >> 4
            tot = int(nzrl.sum())
            if tot:
                rep = np.repeat(np.arange(nzrl.size), nzrl)
                j = np.arange(tot, dtype=np.int64) - np.repeat(
                    np.cumsum(nzrl) - nzrl, nzrl
                )
                ks.append(bk[rep] + seq[rep] + j)
                cs.append(np.full(tot, int(ac_code[0xF0]), dtype=np.int64))
                ls.append(np.full(tot, int(ac_len[0xF0]), dtype=np.int64))
            ks.append(bk + seq + 5)
            cs.append(ac_code[sym])
            ls.append(ac_len[sym])
            ks.append(bk + seq + 6)
            cs.append(np.where(v >= 0, v, v + _POW2[sv] - 1))
            ls.append(sv)
        # --- EOB wherever the last nonzero sits before position 63
        lastnz = np.max(
            np.where(zz != 0, np.arange(64, dtype=np.int64), -1), axis=1
        )
        eob = lastnz < 63
        n_eob = int(eob.sum())
        if n_eob:
            ks.append(bkey[eob] + 514)
            cs.append(np.full(n_eob, int(ac_code[0x00]), dtype=np.int64))
            ls.append(np.full(n_eob, int(ac_len[0x00]), dtype=np.int64))
    keys = np.concatenate(ks)
    order = np.argsort(keys)
    codes = np.concatenate(cs).astype(np.int64)[order]
    lens = np.concatenate(ls).astype(np.int64)[order]
    # --- pack MSB-first; the byte-boundary pad is 1-bits (the retired
    # flush), emitted here as one final pad symbol
    total = int(lens.sum())
    pad = (-total) % 8
    if pad:
        codes = np.append(codes, np.int64((1 << pad) - 1))
        lens = np.append(lens, np.int64(pad))
        total += pad
    sym_of_bit = np.repeat(np.arange(lens.size), lens)
    off = np.cumsum(lens) - lens
    jpos = np.arange(total, dtype=np.int64) - off[sym_of_bit]
    bits = ((codes[sym_of_bit] >> (lens[sym_of_bit] - 1 - jpos)) & 1).astype(
        np.uint8
    )
    by = np.packbits(bits)
    # --- 0xFF byte stuffing (covers a padded final 0xFF exactly like
    # the retired flush: the stuffed 0x00 follows it)
    ff = by == 0xFF
    if bool(ff.any()):
        cnt = ff.astype(np.int64) + 1
        pos = np.cumsum(cnt) - cnt
        stuffed = np.zeros(int(cnt.sum()), dtype=np.uint8)
        stuffed[pos] = by
        by = stuffed
    return by.tobytes()


def encode_jpeg(px, quality: int = 90) -> bytes:
    """uint8 array (h, w) or (h, w, 3) RGB → baseline JFIF bytes
    (4:4:4, Annex-K tables scaled by quality)."""
    px = np.asarray(px, dtype=np.float64)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if not gray and px.shape[2] != 3:
        raise ValueError("encode_jpeg expects (h,w) or (h,w,3)")
    qlum = _scaled_quant(QUANT_LUM, quality)
    qchrom = _scaled_quant(QUANT_CHROM, quality)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    zl = qlum.reshape(64)[ZIGZAG].astype(np.uint8)  # stored in zigzag order
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(zl)
    if not gray:
        zc = qchrom.reshape(64)[ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(zc)
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    sof += bytes((1, 0x11, 0))
    if not gray:
        sof += bytes((2, 0x11, 1)) + bytes((3, 0x11, 1))
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, th, (bits, vals) in (
        (0, 0, DC_LUM), (1, 0, AC_LUM), (0, 1, DC_CHROM), (1, 1, AC_CHROM)
    ):
        if gray and th == 1:
            continue
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([nc, 1, 0x00])
    if not gray:
        sos += bytes((2, 0x11, 3, 0x11))
    sos += bytes((0, 63, 0))
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    if gray:
        planes = [px]
        tabs = [(
            qlum,
            _canonical_code_arrays(*DC_LUM, 16),
            _canonical_code_arrays(*AC_LUM, 256),
        )]
    else:
        R, G, B = px[..., 0], px[..., 1], px[..., 2]
        Y = 0.299 * R + 0.587 * G + 0.114 * B
        Cb = -0.168736 * R - 0.331264 * G + 0.5 * B + 128
        Cr = 0.5 * R - 0.418688 * G - 0.081312 * B + 128
        planes = [Y, Cb, Cr]
        dcl = _canonical_code_arrays(*DC_LUM, 16)
        acl = _canonical_code_arrays(*AC_LUM, 256)
        dcc = _canonical_code_arrays(*DC_CHROM, 16)
        acc = _canonical_code_arrays(*AC_CHROM, 256)
        tabs = [(qlum, dcl, acl), (qchrom, dcc, acc), (qchrom, dcc, acc)]
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    padded = []
    for p in planes:
        pp = np.empty((ph, pw))
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1 : h, :]  # edge-replicate padding
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp)
    qz = [t[0].reshape(64)[ZIGZAG] for t in tabs]  # divide in zigzag domain
    nby, nbx = ph // 8, pw // 8
    # batched DCT + quantization: every block of a plane through one
    # stacked matmul instead of two 8×8 matmuls per block. The
    # left-association (_T @ (blocks-128)) @ _T.T and the elementwise
    # zigzag divide match the retired per-block expression through the
    # round()-to-int64 discretization (the stacked and per-block BLAS
    # kernels may differ by ulps on some hosts — see the decode-side
    # note in _decode_scan); the coefficient stream, and therefore the
    # bitstream, only moves if a product lands within an ulp of an
    # exact .5, which the discretized test pin guards.
    zzs = []
    for ci, pp in enumerate(padded):
        blocks = (
            pp.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        coef = _T @ (blocks - 128.0) @ _T.T
        zzs.append(
            np.round(coef.reshape(-1, 64)[:, ZIGZAG] / qz[ci]).astype(np.int64)
        )
    # vectorized entropy emission across every block of every plane
    # (the retired loop called _BitWriter.put twice per coefficient)
    out += _emit_entropy(
        zzs, [t[1] for t in tabs], [t[2] for t in tabs]
    )
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------- progressive decoder


def _find_next_marker(data: bytes, i: int) -> int:
    """First offset >= i of a segment marker (0xFF + non-stuffing,
    non-RST byte)."""
    while i + 1 < len(data):
        if data[i] == 0xFF and data[i + 1] != 0x00 and not (
            0xD0 <= data[i + 1] <= 0xD7
        ):
            return i
        i += 1
    return len(data)


def _decode_progressive(data: bytes):
    """Progressive (SOF2) decode: coefficients accumulate across
    scans — DC first/refine, AC first (with EOB runs), AC refine
    (correction bits) — then one dequantize+IDCT pass at the end.
    Mirrors the successive-approximation control flow of the spec
    (G.2) and libjpeg's jdphuff."""
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    dri = 0
    coef = None  # per component: (bh, bw, 8, 8) int32
    geom = None
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", data[i + 2 : i + 4])[0]
        seg = data[i + 4 : i + 2 + seglen]
        if marker == 0xDB:
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                j += 1
                if pq == 0:
                    qt[tq] = np.frombuffer(
                        seg[j : j + 64], dtype=np.uint8
                    ).astype(np.float64)
                    j += 64
                else:
                    qt[tq] = np.frombuffer(
                        seg[j : j + 128], dtype=">u2"
                    ).astype(np.float64)
                    j += 128
        elif marker == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                bits = list(seg[j + 1 : j + 17])
                nvals = sum(bits)
                vals = list(seg[j + 17 : j + 17 + nvals])
                (huff_ac if tc else huff_dc)[th] = _build_decode_table(bits, vals)
                j += 17 + nvals
        elif marker == 0xC2:
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if hmax > 2 or vmax > 2:
                raise ValueError("sampling factors > 2 not supported")
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            frame = (w, h, comps, hmax, vmax, mcux, mcuy)
            coef = [
                np.zeros((mcuy * cv, mcux * ch, 8, 8), dtype=np.int32)
                for _, ch, cv, _ in comps
            ]
        elif marker == 0xDD:
            dri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("invalid JPEG: SOS before SOF")
            ns = seg[0]
            sel = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                sel.append((cs, tt >> 4, tt & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            end = _decode_progressive_scan(
                data, i + 2 + seglen, frame, coef, sel, huff_dc, huff_ac,
                ss, se, ah, al, dri,
            )
            i = end
            continue
        i += 2 + seglen
    if frame is None or coef is None:
        raise ValueError("invalid JPEG: no frame")
    return _render_coefficients(frame, coef, qt)


def _decode_progressive_scan(
    data, start, frame, coef, sel, huff_dc, huff_ac, ss, se, ah, al, dri
):
    w, h, comps, hmax, vmax, mcux, mcuy = frame
    byid = {c[0]: (ci, c) for ci, c in enumerate(comps)}
    br = _Bits(data, start)
    eobrun = 0
    pred = {cs: 0 for cs, _, _ in sel}

    def dc_first(ci, by, bx, td, cs):
        s = _read_symbol(br, huff_dc[td])
        diff = _extend(br.take(s), s) if s else 0
        pred[cs] += diff
        coef[ci][by, bx, 0, 0] = pred[cs] << al

    def dc_refine(ci, by, bx):
        if br.take(1):
            coef[ci][by, bx, 0, 0] |= 1 << al

    def ac_first(ci, by, bx, ta):
        nonlocal eobrun
        blk = coef[ci][by, bx].reshape(64)
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = _read_symbol(br, huff_ac[ta])
            r, s = rs >> 4, rs & 0xF
            if s:
                k += r
                if k > se:
                    raise ValueError("invalid JPEG: AC overrun")
                blk[ZIGZAG[k]] = _extend(br.take(s), s) << al
                k += 1
            else:
                if r != 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.take(r)
                    break
                k += 16
        coef[ci][by, bx] = blk.reshape(8, 8)

    def ac_refine(ci, by, bx, ta):
        nonlocal eobrun
        blk = coef[ci][by, bx].reshape(64)
        p1, m1 = 1 << al, -1 << al

        def correct(pos):
            if br.take(1) and (blk[pos] & p1) == 0:
                blk[pos] += p1 if blk[pos] >= 0 else m1

        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _read_symbol(br, huff_ac[ta])
                r, s = rs >> 4, rs & 0xF
                newval = 0
                if s:
                    newval = p1 if br.take(1) else m1
                elif r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.take(r)
                    break
                while k <= se:
                    pos = ZIGZAG[k]
                    if blk[pos] != 0:
                        correct(pos)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    blk[ZIGZAG[k]] = newval
                k += 1
        if eobrun > 0:
            while k <= se:
                pos = ZIGZAG[k]
                if blk[pos] != 0:
                    correct(pos)
                k += 1
            eobrun -= 1
        coef[ci][by, bx] = blk.reshape(8, 8)

    def do_block(ci, by, bx, td, ta, cs):
        if ss == 0 and se == 0:
            if ah == 0:
                dc_first(ci, by, bx, td, cs)
            else:
                dc_refine(ci, by, bx)
        else:
            if ah == 0:
                ac_first(ci, by, bx, ta)
            else:
                ac_refine(ci, by, bx, ta)

    n_unit = 0

    def maybe_rst():
        nonlocal n_unit, eobrun
        if dri and n_unit and n_unit % dri == 0:
            br.skip_rst()
            eobrun = 0
            for cs in pred:
                pred[cs] = 0

    if len(sel) == 1:
        cs, td, ta = sel[0]
        ci, (_, ch, cv, _) = byid[cs]
        bw = (-(-(w * ch) // hmax) + 7) // 8
        bh = (-(-(h * cv) // vmax) + 7) // 8
        for by in range(bh):
            for bx in range(bw):
                maybe_rst()
                n_unit += 1
                do_block(ci, by, bx, td, ta, cs)
    else:
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_rst()
                n_unit += 1
                for cs, td, ta in sel:
                    ci, (_, ch, cv, _) = byid[cs]
                    for by in range(cv):
                        for bx in range(ch):
                            do_block(
                                ci, my * cv + by, mx * ch + bx, td, ta, cs
                            )
    return _find_next_marker(data, br.i)


def _render_coefficients(frame, coef, qt):
    w, h, comps, hmax, vmax, mcux, mcuy = frame
    full = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        qnat = np.zeros(64)
        qnat[ZIGZAG] = qt[tq]
        qnat = qnat.reshape(8, 8)
        blocks = coef[ci].astype(np.float64) * qnat  # broadcast per block
        bh, bw = blocks.shape[:2]
        plane = np.zeros((bh * 8, bw * 8))
        # IDCT all blocks with one einsum: T.T @ B @ T
        px = np.einsum("ij,abjk,kl->abil", _T.T, blocks, _T) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        plane = np.repeat(
            np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1
        )
        full.append(plane[:h, :w])
    if len(full) == 1:
        return w, h, np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    Y, Cb, Cr = full
    R = Y + 1.402 * (Cr - 128)
    G = Y - 0.344136 * (Cb - 128) - 0.714136 * (Cr - 128)
    B = Y + 1.772 * (Cb - 128)
    rgb = np.stack([R, G, B], axis=-1)
    return w, h, np.clip(np.round(rgb), 0, 255).astype(np.uint8)
