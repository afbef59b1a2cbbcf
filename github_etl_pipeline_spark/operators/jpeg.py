"""Baseline JPEG (ITU-T T.81) decoder — pure Python + numpy, no imaging
library — closing the next codec gap behind the multimodal ``decoder=``
seam after PNG (r4) and WAV (r5): JFIF images now decode for REAL
through the same ``(content, fmt) -> (w, h, channels, pixels)`` contract
``extract_features`` / ``resize_images`` consume.

Scope (baseline + progressive — together the profiles covering
essentially all real-world JPEGs):

  * SOF0 (baseline DCT) and SOF2 (progressive DCT, r6: spectral
    selection + successive approximation per T.81 Annex G.1.2, IJG
    reference semantics), 8-bit precision
  * grayscale (1 component) and YCbCr (3 components)
  * any subsampling the SOF declares (4:4:4, 4:2:0, 4:2:2, ...) via
    per-component sampling factors
  * restart markers (DRI/RSTn)
  * entropy-coded-segment byte unstuffing (0xFF 0x00)

Arithmetic coding, hierarchical/lossless frames, 12-bit precision and
CMYK raise ``NotImplementedError`` with the marker that triggered it —
the same documented-seam behavior as the other codecs.

The companion encoders :func:`encode_baseline_jpeg` and
:func:`encode_progressive_jpeg` exist to produce REAL test vectors
(standard Annex-K quantization tables; Annex-K or explicit DHT Huffman
tables; 4:4:4, plus 4:2:0 on the baseline encoder so the subsampled
multi-block-MCU decode + upsample path sees real bytes — r6) so both
decode paths are exercised on actual entropy-coded JPEG bytes without
an external library. The two encoders
share one quantization front half, so a progressive encoding carries
coefficients IDENTICAL to the baseline encoding of the same image —
tests pin that both decode to byte-identical pixels, which anchors the
progressive entropy pipeline to the independently-verified baseline
path (a matched encoder/decoder bug pair would have to reproduce
baseline's pixels exactly to hide). Structural elements shared by both
paths (zigzag order, the DCT basis) are unit tests' cross-check
surface: the zigzag table is asserted against the spec's layout and
the DCT/IDCT pair against numpy's orthonormal transform.

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


def _next_marker(data: bytes, pos: int) -> int:
    """Position of the next marker (the 0xFF byte) at or after ``pos``,
    skipping stuffed 0xFF00 pairs and 0xFF fill bytes inside the
    entropy-coded segment."""
    while pos < len(data) - 1:
        if data[pos] == 0xFF and data[pos + 1] not in (0x00, 0xFF):
            return pos
        pos += 1
    raise ValueError("truncated JPEG: no marker after scan data")


class _ProgressiveState:
    """Coefficient accumulator for progressive (SOF2) decoding — T.81
    Annex G.1.2, successive-approximation semantics matched to the IJG
    reference behavior (public libjpeg): DC values are arithmetic-
    shifted by Al, AC values magnitude-shifted; refinement scans append
    one bit per coefficient.

    Per component the full zigzag coefficient grid lives in an int32
    array of shape (blocks_y, blocks_x, 64) sized to the MCU-padded
    grid (so interleaved DC scans can write their dummy blocks);
    non-interleaved AC scans touch only the component's real block
    grid. ``finish`` dequantizes + IDCTs every block and reuses the
    baseline pixel-composition path."""

    def __init__(self, frame: dict):
        self.frame = frame
        comps = frame["comps"]
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        self.mcux = (frame["w"] + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcuy = (frame["h"] + 8 * self.vmax - 1) // (8 * self.vmax)
        self.coef: dict[int, np.ndarray] = {
            c["id"]: np.zeros(
                (self.mcuy * c["v"], self.mcux * c["h"], 64), dtype=np.int32
            )
            for c in comps
        }
        self.scans_done = 0

    def _blocks_grid(self, c: dict) -> tuple[int, int]:
        """Real (non-interleaved) block grid of one component."""
        w, h = self.frame["w"], self.frame["h"]
        cw = (w * c["h"] + self.hmax - 1) // self.hmax
        ch = (h * c["v"] + self.vmax - 1) // self.vmax
        return (ch + 7) // 8, (cw + 7) // 8

    def decode_scan(
        self, data, pos, seg, qtables, huff_dc, huff_ac, dri
    ) -> int:
        """Decode one scan's entropy data starting at ``pos``; returns
        the position of the next marker."""
        ns = seg[0]
        scan = []
        for i in range(ns):
            cs, tds = seg[1 + 2 * i], seg[2 + 2 * i]
            comp = next(c for c in self.frame["comps"] if c["id"] == cs)
            scan.append({**comp, "dc": tds >> 4, "ac": tds & 0xF})
        ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
        ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0xF
        r = _BitReader(data, pos)
        if ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan must have Se == 0")
            self._dc_scan(r, scan, huff_dc, ah, al, dri)
        else:
            if ns != 1:
                raise ValueError("progressive AC scan must be single-component")
            self._ac_scan(r, scan[0], huff_ac, ss, se, ah, al, dri)
        self.scans_done += 1
        return _next_marker(data, r.pos)

    # -- DC scans (interleaved over all scan components) ------------------
    def _dc_scan(self, r, scan, huff_dc, ah, al, dri) -> None:
        if len(scan) == 1:
            sub = [{**scan[0], "h": 1, "v": 1}]
            by, bx = self._blocks_grid(scan[0])
            mcus = by * bx
            grid = (1, 1)
        elif len(scan) == len(self.frame["comps"]):
            sub = scan
            mcus = self.mcux * self.mcuy
            grid = None
        else:
            raise NotImplementedError(
                "progressive DC scan over a strict component subset"
            )
        pred = {c["id"]: 0 for c in scan}
        count = 0
        for m in range(mcus):
            if dri and count and count % dri == 0:
                r.sync_restart()
                pred = {c["id"]: 0 for c in scan}
            for c in sub:
                for byy in range(c["v"]):
                    for bxx in range(c["h"]):
                        if grid == (1, 1):
                            yb, xb = divmod(m, bx)
                        else:
                            my, mx = divmod(m, self.mcux)
                            yb = my * c["v"] + byy
                            xb = mx * c["h"] + bxx
                        zz = self.coef[c["id"]][yb, xb]
                        if ah == 0:
                            t = _decode_huff_symbol(r, huff_dc[c["dc"]])
                            diff = _extend(r.read_bits(t), t)
                            pred[c["id"]] += diff
                            zz[0] = pred[c["id"]] << al
                        else:
                            if r.read_bit():
                                zz[0] |= 1 << al
            count += 1

    # -- AC scans (always non-interleaved) --------------------------------
    def _ac_scan(self, r, c, huff_ac, ss, se, ah, al, dri) -> None:
        by, bx = self._blocks_grid(c)
        tbl = huff_ac[c["ac"]]
        eobrun = 0
        count = 0
        for m in range(by * bx):
            if dri and count and count % dri == 0:
                r.sync_restart()
                eobrun = 0
            yb, xb = divmod(m, bx)
            zz = self.coef[c["id"]][yb, xb]
            if ah == 0:
                eobrun = self._ac_first_block(r, tbl, zz, ss, se, al, eobrun)
            else:
                eobrun = self._ac_refine_block(r, tbl, zz, ss, se, al, eobrun)
            count += 1

    @staticmethod
    def _ac_first_block(r, tbl, zz, ss, se, al, eobrun) -> int:
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = _decode_huff_symbol(r, tbl)
            rr, s = rs >> 4, rs & 0xF
            if s == 0:
                if rr != 15:
                    eobrun = (1 << rr) - 1
                    if rr:
                        eobrun += r.read_bits(rr)
                    break
                k += 16  # ZRL
                continue
            k += rr
            if k > se:
                raise ValueError("AC run past end of spectral band")
            zz[k] = _extend(r.read_bits(s), s) << al
            k += 1
        return eobrun

    @staticmethod
    def _ac_refine_block(r, tbl, zz, ss, se, al, eobrun) -> int:
        p1 = 1 << al
        m1 = -(1 << al)
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _decode_huff_symbol(r, tbl)
                rr, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if rr != 15:
                        eobrun = 1 << rr  # includes the current block
                        if rr:
                            eobrun += r.read_bits(rr)
                        break
                    # ZRL: pass over 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("AC refinement magnitude != 1")
                    val = p1 if r.read_bit() else m1
                # advance over rr zero-history coefficients, emitting
                # correction bits for every nonzero-history one passed
                while k <= se:
                    z = int(zz[k])
                    if z != 0:
                        if r.read_bit() and (z & p1) == 0:
                            zz[k] = z + (p1 if z >= 0 else m1)
                    else:
                        if rr == 0:
                            break
                        rr -= 1
                    k += 1
                if val and k <= se:
                    zz[k] = val
                k += 1
        if eobrun > 0:
            # EOB band covers the rest of this block: correction bits
            # still appear for nonzero-history coefficients
            while k <= se:
                z = int(zz[k])
                if z != 0 and r.read_bit() and (z & p1) == 0:
                    zz[k] = z + (p1 if z >= 0 else m1)
                k += 1
            eobrun -= 1
        return eobrun

    # -- final reconstruction ---------------------------------------------
    def finish(self, qtables) -> tuple[int, int, int, bytes]:
        frame = self.frame
        planes = {}
        for c in frame["comps"]:
            grid = self.coef[c["id"]]
            by, bx = grid.shape[0], grid.shape[1]
            plane = np.zeros((by * 8, bx * 8))
            q = qtables[c["tq"]]
            for yb in range(by):
                for xb in range(bx):
                    zz = grid[yb, xb]
                    coeffs = np.zeros((8, 8))
                    for k in range(64):
                        coeffs[ZIGZAG[k]] = zz[k]
                    plane[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8] = idct2(
                        coeffs * q
                    )
            planes[c["id"]] = plane
        return (
            frame["w"],
            frame["h"],
            len(frame["comps"]),
            _compose_pixels(planes, frame["comps"], frame["w"], frame["h"],
                            self.hmax, self.vmax),
        )


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
    prog = None
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"JPEG precision {precision}")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps, "progressive": marker == 0xC2}
            if frame["progressive"]:
                prog = _ProgressiveState(frame)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG frame type 0xFF{marker:02X} (baseline SOF0 / progressive SOF2)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            if frame["progressive"]:
                # progressive: accumulate this scan's coefficient
                # contribution and continue the marker loop from the
                # next marker after the entropy-coded data
                pos = prog.decode_scan(
                    content, pos + seglen, seg, qtables, huff_dc, huff_ac,
                    restart_interval,
                )
                continue
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
    if prog is not None and prog.scans_done:
        return prog.finish(qtables)
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
    return _compose_pixels(planes, scan, w, h, hmax, vmax)


def _compose_pixels(planes, comps, w, h, hmax, vmax) -> bytes:
    """Upsample each component plane to full resolution, crop, and
    color-convert (shared by the baseline and progressive paths)."""
    full = []
    for c in comps:
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


def _convert_components(pixels, w, h, channels, subsampling):
    """Color-convert + optional 4:2:0 chroma box-average — the front
    half both encoders share (was duplicated; ADVICE r7). Returns
    (comps, qsel, hv): float component planes, per-component quant-table
    selectors, and (h, v) sampling factors. ``subsampling="420"``
    requires 3 channels: grayscale has no chroma to subsample, and
    silently encoding 4:4:4 would mislabel the test vector the caller
    asked for, so that contract is an explicit ValueError."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, channels).astype(np.float64)
    if channels == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128,
        ]
        qsel = [0, 1, 1]
        if subsampling == "420":
            # box-average chroma over 2x2 (even-pad by edge replication)
            def down2(p):
                ph = np.pad(p, ((0, p.shape[0] & 1), (0, p.shape[1] & 1)), "edge")
                return (
                    ph[0::2, 0::2] + ph[1::2, 0::2] + ph[0::2, 1::2] + ph[1::2, 1::2]
                ) / 4.0

            comps = [comps[0], down2(comps[1]), down2(comps[2])]
            hv = [(2, 2), (1, 1), (1, 1)]
        else:
            hv = [(1, 1)] * 3
    elif channels == 1:
        if subsampling == "420":
            raise ValueError(
                "subsampling='420' requires channels=3 — grayscale has no "
                "chroma to subsample (a silent 4:4:4 fallback would mislabel "
                "the requested test vector)"
            )
        comps = [img[..., 0]]
        qsel = [0]
        hv = [(1, 1)]
    else:
        raise ValueError("channels must be 1 or 3")
    return comps, qsel, hv


def _pad_to_mcu_grid(comp, hvi, mcux, mcuy):
    """Edge-replicate pad one component plane to its MCU-aligned block
    grid and level-shift by -128 (shared by both encoders; replicate
    padding avoids ringing at the crop boundary)."""
    ch, cw = comp.shape
    p = np.zeros((mcuy * hvi[1] * 8, mcux * hvi[0] * 8))
    p[:ch, :cw] = comp
    p[ch:, :cw] = comp[-1:, :]
    p[:ch, cw:] = comp[:, -1:]
    p[ch:, cw:] = comp[-1, -1]
    return p - 128.0


def encode_baseline_jpeg(pixels: bytes, w: int, h: int, channels: int,
                         quality: int = 90, restart_interval: int = 0,
                         subsampling: str = "444") -> bytes:
    """Encode row-major channel-interleaved 8-bit pixels (1 = grayscale,
    3 = RGB) as a baseline JFIF JPEG with the Annex-K tables;
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    N MCUs (so the decoder's restart path has a real test vector), and
    ``subsampling="420"`` (color only) emits 2x2-sampled luma with
    box-averaged chroma — the real test vector for the decoder's
    multi-block-MCU + upsample path (on spatially constant chroma the
    2x2 average is lossless, so 4:2:0 and 4:4:4 decodes of such images
    are pinned byte-identical in tests). Exists to generate
    entropy-coded test vectors for :func:`decode_jpeg`; it is NOT the
    production media path."""
    comps, qsel, hv = _convert_components(pixels, w, h, channels, subsampling)
    hsel = qsel  # Huffman table selectors mirror the quant selectors
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
        out += bytes([i + 1, (hv[i][0] << 4) | hv[i][1], qsel[i]])
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
    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = [
        _pad_to_mcu_grid(comp, hv[i], mcux, mcuy) for i, comp in enumerate(comps)
    ]
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
                for by in range(hv[i][1]):
                    for bx in range(hv[i][0]):
                        y0 = (my * hv[i][1] + by) * 8
                        x0 = (mx * hv[i][0] + bx) * 8
                        block = padded[i][y0 : y0 + 8, x0 : x0 + 8]
                        pred[i] = _encode_block(
                            wtr, block, qt[qsel[i]],
                            dc_enc[hsel[i]], ac_enc[hsel[i]], pred[i],
                        )
            mcu_count += 1
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Minimal progressive encoder (test-vector generator): 4:4:4 or 4:2:0,
# spectral selection + successive approximation, Annex-K DC tables + a
# uniform 9-bit AC table (Annex-K AC tables lack the (r<<4)|0 EOBRUN
# symbols)
# --------------------------------------------------------------------------
# all 256 symbols: 255 at 9 bits + 1 at 10 (a DHT BITS count is one
# byte, so a single length cannot hold all 256)
PROG_AC_BITS = [0] * 8 + [255, 1] + [0] * 6
PROG_AC_VALS = list(range(256))


def _component_zz_blocks(pixels, w, h, channels, quality, subsampling="444"):
    """Quantized zigzag coefficient blocks per component — the shared
    front half of both encoders: color-convert, optional 4:2:0 chroma
    box-average, edge-pad to the MCU-aligned grid, per-block
    fdct/quantize. Returns (zz, qt, qsel, hv, real) where
    ``zz[comp][by][bx] -> list[64]`` covers the PADDED grid (what
    interleaved DC scans encode, dummy blocks included),
    ``real[comp] = (rb_y, rb_x)`` is the component's real block grid
    (what non-interleaved AC scans cover), and ``hv`` the sampling
    factors."""
    comps, qsel, hv = _convert_components(pixels, w, h, channels, subsampling)
    qt = [_quant_scaled(QUANT_LUMA, quality), _quant_scaled(QUANT_CHROMA, quality)]
    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    zz_all = []
    real = []
    for i, comp in enumerate(comps):
        ch, cw = comp.shape
        real.append(((ch + 7) // 8, (cw + 7) // 8))
        by = mcuy * hv[i][1]
        bx = mcux * hv[i][0]
        p = _pad_to_mcu_grid(comp, hv[i], mcux, mcuy)
        rows = []
        for yb in range(by):
            row = []
            for xb in range(bx):
                block = p[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8]
                coeffs = np.round(fdct2(block) / qt[qsel[i]]).astype(np.int64)
                row.append([int(coeffs[ZIGZAG[k]]) for k in range(64)])
            rows.append(row)
        zz_all.append(rows)
    return zz_all, qt, qsel, hv, real


def _mcu_blocks(zz_all, hv):
    """Yield (comp_index, zz_block) in interleaved-MCU order over the
    padded grids — the walk both DC emitters share (matches the
    decoder's ``_dc_scan``)."""
    # MCU grid derived from component 0's padded grid (identical for all)
    mcuy = len(zz_all[0]) // hv[0][1]
    mcux = len(zz_all[0][0]) // hv[0][0]
    for my in range(mcuy):
        for mx in range(mcux):
            for i in range(len(zz_all)):
                for by in range(hv[i][1]):
                    for bx in range(hv[i][0]):
                        yield i, zz_all[i][my * hv[i][1] + by][mx * hv[i][0] + bx]


def _emit_dc_first(wtr, zz_all, dc_encs, al, hv):
    """Interleaved DC scan, Ah=0: diff-coded (dc >> al) — arithmetic
    shift per G.1.2.1."""
    pred = [0] * len(zz_all)
    for i, zz in _mcu_blocks(zz_all, hv):
        v = zz[0] >> al
        diff = v - pred[i]
        pred[i] = v
        t = int(abs(diff)).bit_length() if diff else 0
        ln, code = dc_encs[i][t]
        wtr.write(code, ln)
        if t:
            b = diff if diff > 0 else diff + (1 << t) - 1
            wtr.write(b & ((1 << t) - 1), t)


def _emit_dc_refine(wtr, zz_all, al, hv):
    """Interleaved DC refinement: one raw bit per block."""
    for i, zz in _mcu_blocks(zz_all, hv):
        wtr.write((zz[0] >> al) & 1, 1)


def _emit_ac_first(wtr, blocks, ac_enc, ss, se, al):
    """Single-component AC first scan (Ah=0): magnitude-shifted
    coefficients with ZRL and EOBRUN coding (G.1.2.2)."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            nbits = eobrun.bit_length() - 1
            ln, code = ac_enc[nbits << 4]
            wtr.write(code, ln)
            if nbits:
                wtr.write(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0

    for zz in blocks:
        r_run = 0
        for k in range(ss, se + 1):
            z = zz[k]
            t = (abs(z) >> al) * (1 if z >= 0 else -1)
            if t == 0:
                r_run += 1
                continue
            while r_run > 15:
                flush_eob()
                ln, code = ac_enc[0xF0]
                wtr.write(code, ln)
                r_run -= 16
            flush_eob()
            s = int(abs(t)).bit_length()
            ln, code = ac_enc[(r_run << 4) | s]
            wtr.write(code, ln)
            b = t if t > 0 else t + (1 << s) - 1
            wtr.write(b & ((1 << s) - 1), s)
            r_run = 0
        if r_run > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _emit_ac_refine(wtr, blocks, ac_enc, ss, se, al):
    """Single-component AC refinement scan (Ah = Al+1): correction bits
    for previously-significant coefficients, (r<<4)|1 symbols for newly
    significant ones, EOBRUN with buffered correction bits — bit order
    matched to the decoder's interleaved read (G.1.2.3 / IJG)."""
    eobrun = 0
    be_bits: list[int] = []  # owed after the next EOB symbol

    def flush_eob():
        nonlocal eobrun, be_bits
        if eobrun:
            nbits = eobrun.bit_length() - 1
            ln, code = ac_enc[nbits << 4]
            wtr.write(code, ln)
            if nbits:
                wtr.write(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0
            for b in be_bits:
                wtr.write(b, 1)
            be_bits = []

    for zz in blocks:
        mags = [(abs(zz[k]) >> al) for k in range(ss, se + 1)]
        eob_k = max((ss + i for i, m in enumerate(mags) if m == 1), default=ss - 1)
        r_run = 0
        br_bits: list[int] = []  # owed after the next in-block symbol
        for k in range(ss, se + 1):
            t = mags[k - ss]
            if t == 0:
                r_run += 1
                continue
            while r_run > 15 and k <= eob_k:
                flush_eob()
                ln, code = ac_enc[0xF0]
                wtr.write(code, ln)
                for b in br_bits:
                    wtr.write(b, 1)
                br_bits = []
                r_run -= 16
            if t > 1:  # previously significant: one correction bit
                br_bits.append(t & 1)
                continue
            flush_eob()
            ln, code = ac_enc[(r_run << 4) | 1]
            wtr.write(code, ln)
            wtr.write(1 if zz[k] >= 0 else 0, 1)
            for b in br_bits:
                wtr.write(b, 1)
            br_bits = []
            r_run = 0
        if r_run > 0 or br_bits:
            eobrun += 1
            be_bits.extend(br_bits)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def encode_progressive_jpeg(
    pixels: bytes, w: int, h: int, channels: int,
    quality: int = 90, successive: bool = True, subsampling: str = "444",
) -> bytes:
    """Encode a progressive (SOF2) JFIF JPEG, 4:4:4 or 4:2:0
    (``subsampling="420"``, color only). With ``successive``
    the scan script exercises every progressive code path — DC first at
    Al=1, split spectral AC first scans at Al=2, two AC refinement
    passes, DC refinement; without it, plain spectral selection (one DC
    + one full-band AC scan per component) at Al=0. The quantized
    coefficients are IDENTICAL to :func:`encode_baseline_jpeg` at the
    same quality (shared quantization front half), so progressive and
    baseline encodings of the same image must decode to byte-identical
    pixels — the anchor :mod:`tests.test_jpeg_progressive` pins.
    Test-vector generator, not the production media path."""
    zz_all, qt, qsel, hv, real = _component_zz_blocks(
        pixels, w, h, channels, quality, subsampling
    )
    nf = channels if channels == 3 else 1
    # non-interleaved AC scans cover each component's REAL block grid
    # in raster order (the padded grid's dummy blocks are DC-scan-only)
    flat = [
        [zz_all[i][yb][xb] for yb in range(real[i][0]) for xb in range(real[i][1])]
        for i in range(nf)
    ]
    dc_encs = [
        _huff_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
        _huff_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    dc_for_comp = [dc_encs[0 if i == 0 else 1] for i in range(nf)]
    ac_enc = _huff_encode_table(PROG_AC_BITS, PROG_AC_VALS)

    out = bytearray(b"\xff\xd8")
    out += (b"\xff\xe0" + struct.pack(">H", 16)
            + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq in range(2 if channels == 3 else 1):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(qt[tq][ZIGZAG[k]]) for k in range(64))
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
    for i in range(nf):
        out += bytes([i + 1, (hv[i][0] << 4) | hv[i][1], qsel[i]])

    def dht(tc, th, bits, vals):
        return (b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
                + bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    if channels == 3:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
    out += dht(1, 0, PROG_AC_BITS, PROG_AC_VALS)

    def sos(comps_td, ss, se, ah, al):
        n = len(comps_td)
        seg = bytearray(b"\xff\xda" + struct.pack(">HB", 6 + 2 * n, n))
        for cid, td in comps_td:
            seg += bytes([cid, td])
        seg += bytes([ss, se, (ah << 4) | al])
        return bytes(seg)

    def scan(header, emit):
        nonlocal out
        out += header
        wtr = _BitWriter()
        emit(wtr)
        wtr.flush()
        out += wtr.out

    all_dc = [(i + 1, ((0 if i == 0 else 1) << 4) | 0) for i in range(nf)]
    if successive:
        scan(sos(all_dc, 0, 0, 0, 1), lambda w_: _emit_dc_first(w_, zz_all, dc_for_comp, 1, hv))
        for i in range(nf):
            scan(sos([(i + 1, 0)], 1, 5, 0, 2),
                 lambda w_, i=i: _emit_ac_first(w_, flat[i], ac_enc, 1, 5, 2))
        for i in range(nf):
            scan(sos([(i + 1, 0)], 6, 63, 0, 2),
                 lambda w_, i=i: _emit_ac_first(w_, flat[i], ac_enc, 6, 63, 2))
        for i in range(nf):
            scan(sos([(i + 1, 0)], 1, 63, 2, 1),
                 lambda w_, i=i: _emit_ac_refine(w_, flat[i], ac_enc, 1, 63, 1))
        for i in range(nf):
            scan(sos([(i + 1, 0)], 1, 63, 1, 0),
                 lambda w_, i=i: _emit_ac_refine(w_, flat[i], ac_enc, 1, 63, 0))
        scan(sos(all_dc, 0, 0, 1, 0), lambda w_: _emit_dc_refine(w_, zz_all, 0, hv))
    else:
        scan(sos(all_dc, 0, 0, 0, 0), lambda w_: _emit_dc_first(w_, zz_all, dc_for_comp, 0, hv))
        for i in range(nf):
            scan(sos([(i + 1, 0)], 1, 63, 0, 0),
                 lambda w_, i=i: _emit_ac_first(w_, flat[i], ac_enc, 1, 63, 0))
    out += b"\xff\xd9"
    return bytes(out)
