"""Baseline JPEG (ITU-T T.81) decoder — pure Python + numpy, no imaging
library — closing the next codec gap behind the multimodal ``decoder=``
seam after PNG (r4) and WAV (r5): JFIF images now decode for REAL
through the same ``(content, fmt) -> (w, h, channels, pixels)`` contract
``extract_features`` / ``resize_images`` consume.

Scope (the baseline-sequential profile that covers the overwhelming
majority of real-world JPEGs):

  * SOF0 (baseline DCT), 8-bit precision
  * grayscale (1 component) and YCbCr (3 components)
  * any subsampling the SOF declares (4:4:4, 4:2:0, 4:2:2, ...) via
    per-component sampling factors
  * restart markers (DRI/RSTn)
  * entropy-coded-segment byte unstuffing (0xFF 0x00)

Progressive (SOF2), arithmetic coding, 12-bit precision and CMYK raise
``NotImplementedError`` with the marker that triggered it — the same
documented-seam behavior as the other codecs.

The companion :func:`encode_baseline_jpeg` exists to produce REAL test
vectors (standard Annex-K quantization tables, spec Table K.3-K.6
Huffman tables, 4:4:4, no subsampling) so the decoder is exercised on
actual entropy-coded JPEG bytes without an external library. Structural
elements shared by both paths (zigzag order, the DCT basis) are unit
tests' cross-check surface: the zigzag table is asserted against the
spec's layout and the DCT/IDCT pair against numpy's orthonormal
transform, so an error there cannot silently cancel between encoder and
decoder.

Everything here derives from the public T.81 spec text.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Shared constants (T.81 Annex K)
# --------------------------------------------------------------------------

#: zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
ZIGZAG: list[tuple[int, int]] = []


def _build_zigzag() -> None:
    order = []
    r = c = 0
    for _ in range(64):
        order.append((r, c))
        if (r + c) % 2 == 0:  # moving up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # moving down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    ZIGZAG.extend(order)


_build_zigzag()

# Annex K.1 luminance / K.2 chrominance quantization tables (quality 50)
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# Annex K.3-K.6 "typical" Huffman tables: (BITS counts per length 1..16,
# HUFFVAL symbol list)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_basis() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis matrix C with X = C @ x @ C.T."""
    C = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            C[k, n] = np.cos((2 * n + 1) * k * np.pi / 16)
    C *= 0.5
    C[0, :] *= 1 / np.sqrt(2)
    return C


_C = _dct_basis()


def idct2(block: np.ndarray) -> np.ndarray:
    """2-D inverse DCT of one 8x8 coefficient block (T.81 A.3.3)."""
    return _C.T @ block @ _C


def fdct2(block: np.ndarray) -> np.ndarray:
    """2-D forward DCT of one 8x8 sample block."""
    return _C @ block @ _C.T


# --------------------------------------------------------------------------
# Huffman machinery
# --------------------------------------------------------------------------
def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, built by the canonical T.81 C.2 walk."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (length, code): the inverse of the decode walk."""
    return {sym: (ln, code) for (ln, code), sym in _huff_decode_table(bits, vals).items()}


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with 0xFF00
    unstuffing; RSTn markers are consumed by ``sync_restart``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            elif 0xD0 <= nxt <= 0xD7:
                # restart marker reached mid-read: signal via exception
                self.pos -= 1
                raise _RestartMarker()
            elif nxt == 0xD9:  # EOI: pad with zero bits (spec-legal tail)
                self.pos -= 1
                b = 0
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Consume an RSTn marker at a restart interval boundary."""
        self.bitbuf = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1  # skip any padding bits already byte-consumed
        marker = self.data[self.pos + 1]
        if not (0xD0 <= marker <= 0xD7):
            raise ValueError(f"expected RSTn, found 0xFF{marker:02X}")
        self.pos += 2


class _RestartMarker(Exception):
    pass


def _decode_huff_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------
def decode_jpeg(content: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG to ``(width, height, channels,
    pixel_bytes)`` — the multimodal decoder contract (pixels row-major,
    channel-interleaved; channels = 1 for grayscale, 3 for RGB).

    Contract: raises ``ValueError`` for corrupt/truncated streams and
    ``NotImplementedError`` at documented capability boundaries — never
    module-private or built-in lookup/index errors (ADVICE r5): bad
    table ids, reads past the buffer, and unexpected restart markers
    are all converted here."""
    try:
        return _decode_jpeg(content)
    except (_RestartMarker, KeyError, IndexError, StopIteration, struct.error) as exc:
        raise ValueError(
            f"corrupt JPEG stream ({type(exc).__name__}: {exc})"
        ) from exc


def _decode_jpeg(content: bytes) -> tuple[int, int, int, bytes]:
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0

    while pos < len(content):
        if content[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        (seglen,) = struct.unpack(">H", content[pos : pos + 2])
        seg = content[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                tbl = np.zeros((8, 8), dtype=np.int32)
                for k in range(64):
                    tbl[ZIGZAG[k]] = seg[p + k]
                qtables[tq] = tbl
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"JPEG precision {precision}")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG frame type 0xFF{marker:02X} (only baseline SOF0)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            if ns < len(frame["comps"]):
                # T.81 A.2: a scan covering fewer components than the
                # frame means a non-interleaved multi-scan encoding;
                # decoding only the first scan would silently return a
                # luma-only image posing as the picture (ADVICE r5)
                raise NotImplementedError(
                    f"non-interleaved multi-scan JPEG (scan has {ns} of "
                    f"{len(frame['comps'])} frame components; only "
                    "single-scan baseline)"
                )
            scan = []
            for i in range(ns):
                cs, tds = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "dc": tds >> 4, "ac": tds & 0xF})
            if ns == 1:
                # T.81 A.2.2: an Ns==1 scan is non-interleaved — the MCU
                # is ONE 8x8 block regardless of the SOF sampling
                # factors (a grayscale frame declaring 2x2 sampling must
                # not be laid out in 2x2-block MCUs)
                scan[0]["h"] = scan[0]["v"] = 1
            pixels = _decode_scan(
                content, pos + seglen, frame, scan, qtables, huff_dc, huff_ac,
                restart_interval,
            )
            return frame["w"], frame["h"], (1 if ns == 1 else 3), pixels
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qtables, huff_dc, huff_ac, dri):
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in scan
    }
    r = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in scan}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                r.sync_restart()
                pred = {c["id"]: 0 for c in scan}
            for c in scan:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = _decode_block(
                            r, huff_dc[c["dc"]], huff_ac[c["ac"]],
                            qtables[c["tq"]], pred, c["id"],
                        )
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    # upsample each component to full resolution and crop
    full = []
    for c in scan:
        p = planes[c["id"]]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        out = np.clip(np.round(full[0] + 128), 0, 255).astype(np.uint8)
        return out.tobytes()
    y, cb, cr = (f + 128 for f in full)
    cb -= 128.0
    cr -= 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()


def _decode_block(r, dc_tbl, ac_tbl, qtbl, pred, cid):
    try:
        t = _decode_huff_symbol(r, dc_tbl)
        diff = _extend(r.read_bits(t), t)
    except _RestartMarker:
        raise ValueError("restart marker without DRI accounting")
    pred[cid] += diff
    coeffs = np.zeros((8, 8))
    coeffs[0, 0] = pred[cid]
    k = 1
    while k < 64:
        rs = _decode_huff_symbol(r, ac_tbl)
        rr, ss = rs >> 4, rs & 0xF
        if ss == 0:
            if rr == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += rr
        if k > 63:
            raise ValueError("AC run past end of block")
        coeffs[ZIGZAG[k]] = _extend(r.read_bits(ss), ss)
        k += 1
    return idct2(coeffs * qtbl)


# --------------------------------------------------------------------------
# Minimal baseline encoder (test-vector generator): 4:4:4, Annex-K tables
# --------------------------------------------------------------------------
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s (spec F.1.2.3)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _quant_scaled(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex-K table (public libjpeg formula)."""
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _encode_block(wtr, block, qtbl, dc_tbl, ac_tbl, pred):
    coeffs = np.round(fdct2(block) / qtbl).astype(np.int64)
    zz = [int(coeffs[ZIGZAG[k]]) for k in range(64)]
    diff = zz[0] - pred
    t = int(diff != 0 and int(abs(diff)).bit_length() or 0)
    ln, code = dc_tbl[t]
    wtr.write(code, ln)
    if t:
        v = diff if diff > 0 else diff + (1 << t) - 1
        wtr.write(v & ((1 << t) - 1), t)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, 64):
        if k > last_nz:
            ln, code = ac_tbl[0x00]  # EOB
            wtr.write(code, ln)
            break
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_tbl[0xF0]  # ZRL
            wtr.write(code, ln)
            run -= 16
        s = int(abs(zz[k])).bit_length()
        ln, code = ac_tbl[(run << 4) | s]
        wtr.write(code, ln)
        v = zz[k] if zz[k] > 0 else zz[k] + (1 << s) - 1
        wtr.write(v & ((1 << s) - 1), s)
        run = 0
    return zz[0]


def encode_baseline_jpeg(pixels: bytes, w: int, h: int, channels: int,
                         quality: int = 90, restart_interval: int = 0) -> bytes:
    """Encode row-major channel-interleaved 8-bit pixels (1 = grayscale,
    3 = RGB) as a baseline 4:4:4 JFIF JPEG with the Annex-K tables;
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    N MCUs (so the decoder's restart path has a real test vector).
    Exists to generate entropy-coded test vectors for
    :func:`decode_jpeg`; it is NOT the production media path."""
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, channels).astype(np.float64)
    if channels == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128,
        ]
        qsel = [0, 1, 1]
        hsel = [0, 1, 1]
    elif channels == 1:
        comps = [img[..., 0]]
        qsel = [0]
        hsel = [0]
    else:
        raise ValueError("channels must be 1 or 3")
    qt = [_quant_scaled(QUANT_LUMA, quality), _quant_scaled(QUANT_CHROMA, quality)]
    dc_enc = [
        _huff_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
        _huff_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_enc = [
        _huff_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
        _huff_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16)
            + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq in range(2 if channels == 3 else 1):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(qt[tq][ZIGZAG[k]]) for k in range(64))
    # SOF0
    nf = len(comps)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
    for i in range(nf):
        out += bytes([i + 1, 0x11, qsel[i]])
    # DHT
    def dht(tc, th, bits, vals):
        return (b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
                + bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if channels == 3:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nf, nf)
    for i in range(nf):
        out += bytes([i + 1, (hsel[i] << 4) | hsel[i]])
    out += b"\x00\x3f\x00"

    wtr = _BitWriter()
    mcux = (w + 7) // 8
    mcuy = (h + 7) // 8
    padded = []
    for comp in comps:
        p = np.zeros((mcuy * 8, mcux * 8))
        p[:h, :w] = comp
        # edge-replicate padding avoids ringing at the crop boundary
        p[h:, :w] = comp[-1:, :]
        p[:h, w:] = comp[:, -1:]
        p[h:, w:] = comp[-1, -1]
        padded.append(p - 128.0)
    pred = [0] * nf
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * nf
            for i in range(nf):
                block = padded[i][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                pred[i] = _encode_block(
                    wtr, block, qt[qsel[i]], dc_enc[hsel[i]], ac_enc[hsel[i]], pred[i]
                )
            mcu_count += 1
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
