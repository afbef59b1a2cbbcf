"""Baseline JPEG decode through the multimodal decoder seam: REAL
entropy-coded T.81 bytes (from the in-repo test-vector encoder with
Annex-K tables) decode end-to-end, including the mapInPandas media path.

The shared structural pieces (zigzag layout, DCT basis, Huffman table
construction) are asserted independently against the spec so an error
there cannot silently cancel between encoder and decoder."""

import numpy as np
import pytest

from github_etl_pipeline_spark.operators.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    ZIGZAG,
    _huff_decode_table,
    decode_jpeg,
    encode_baseline_jpeg,
    fdct2,
    idct2,
)
from github_etl_pipeline_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    extract_features,
    resize_images,
)


def _gradient(w, h):
    x = np.linspace(0, 255, w).astype(np.uint8)
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[..., 0] = x[None, :]
    img[..., 1] = 128
    img[..., 2] = x[::-1][None, :]
    return img


def test_zigzag_matches_spec_layout():
    # the first and last entries of T.81 Figure A.6, plus bijectivity
    assert ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    # spec flat order ends ..., 55, 62, 63 -> (6,7), (7,6), (7,7)
    assert ZIGZAG[-3:] == [(6, 7), (7, 6), (7, 7)]
    assert len(set(ZIGZAG)) == 64


def test_dct_pair_is_orthonormal_inverse():
    rng = np.random.RandomState(7)
    b = rng.randint(-128, 128, (8, 8)).astype(float)
    assert np.allclose(idct2(fdct2(b)), b, atol=1e-9)
    # Parseval: orthonormal transform preserves energy
    assert np.isclose((fdct2(b) ** 2).sum(), (b**2).sum())


def test_huffman_canonical_codes():
    # T.81 C.2: codes are assigned in increasing length, left-justified;
    # the DC luma table's first few canonical codes are known
    t = _huff_decode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    assert t[(2, 0b00)] == 0
    assert t[(3, 0b010)] == 1
    assert t[(3, 0b110)] == 5
    # AC luma: EOB (0x00) is the 4-bit code 1010 per Annex K.5
    ac = _huff_decode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    assert ac[(4, 0b1010)] == 0x00
    # prefix-free WITHIN each table (DC and AC are separate code spaces)
    for table in (t, ac):
        codes = list(table)
        for ln, c in codes:
            for ln2, c2 in codes:
                if ln2 > ln:
                    assert (c2 >> (ln2 - ln)) != c, (ln, c, ln2, c2)


def test_solid_gray_roundtrip_exact():
    w, h = 24, 16
    solid = np.full((h, w, 1), 130, dtype=np.uint8)
    enc = encode_baseline_jpeg(solid.tobytes(), w, h, 1, quality=90)
    W, H, C, px = decode_jpeg(enc)
    assert (W, H, C) == (w, h, 1)
    out = np.frombuffer(px, dtype=np.uint8)
    assert int(np.abs(out.astype(int) - 130).max()) == 0


def test_rgb_gradient_roundtrip_tight():
    w, h = 40, 24
    img = _gradient(w, h)
    enc = encode_baseline_jpeg(img.tobytes(), w, h, 3, quality=95)
    W, H, C, px = decode_jpeg(enc)
    assert (W, H, C) == (w, h, 3)
    out = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


def test_restart_markers_do_not_change_pixels():
    w, h = 32, 16
    img = _gradient(w, h)
    plain = decode_jpeg(encode_baseline_jpeg(img.tobytes(), w, h, 3, quality=95))
    rst = decode_jpeg(
        encode_baseline_jpeg(img.tobytes(), w, h, 3, quality=95, restart_interval=2)
    )
    assert plain == rst


def test_odd_dimensions_crop():
    w, h = 13, 9
    img = (np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3) % 200)
    W, H, C, px = decode_jpeg(encode_baseline_jpeg(img.tobytes(), w, h, 3))
    assert (W, H, C) == (w, h, 3)
    assert len(px) == w * h * 3


def test_single_component_scan_ignores_sof_sampling():
    """T.81 A.2.2: an Ns==1 scan is non-interleaved — one 8x8 block per
    MCU regardless of declared sampling factors. A grayscale JPEG whose
    SOF claims 2x2 sampling must decode to the SAME pixels as its 1x1
    twin (previously it silently mis-decoded with a 2x2-block MCU
    layout)."""
    w, h = 24, 16
    img = (np.arange(w * h, dtype=np.uint8).reshape(h, w, 1) % 181)
    enc = bytearray(encode_baseline_jpeg(img.tobytes(), w, h, 1, quality=90))
    baseline = decode_jpeg(bytes(enc))
    i = enc.find(b"\xff\xc0")
    # SOF0 payload: len(2) precision(1) h(2) w(2) ncomp(1) [id samp tq]
    samp_off = i + 4 + 5 + 1 + 1
    assert enc[samp_off] == 0x11
    enc[samp_off] = 0x22
    assert decode_jpeg(bytes(enc)) == baseline


def test_non_interleaved_multi_scan_raises():
    """A 3-component frame whose first scan covers only 1 component must
    fail loud (NotImplementedError), not return a luma-only image."""
    w, h = 8, 8
    enc = bytearray(encode_baseline_jpeg(_gradient(w, h).tobytes(), w, h, 3))
    i = enc.find(b"\xff\xda")
    seglen = (enc[i + 2] << 8) | enc[i + 3]
    # rewrite the SOS to a single-component scan (Ns=1, comp 1, tables 0)
    new_sos = bytes([0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x3F, 0x00])
    enc2 = bytes(enc[:i]) + new_sos + bytes(enc[i + 2 + seglen:])
    with pytest.raises(NotImplementedError, match="non-interleaved"):
        decode_jpeg(enc2)


def test_corrupt_streams_raise_value_error():
    """The decoder contract is (ValueError | NotImplementedError) — no
    module-private exceptions, KeyError or IndexError may escape
    (ADVICE r5)."""
    w, h = 16, 16
    enc = encode_baseline_jpeg(_gradient(w, h).tobytes(), w, h, 3, quality=90)
    sos = enc.find(b"\xff\xda")
    # truncated mid-scan: the bit reader runs off the buffer
    with pytest.raises(ValueError):
        decode_jpeg(enc[: sos + 20])
    # missing Huffman tables: the scan references absent table ids
    dht = enc.find(b"\xff\xc4")
    dht_len = (enc[dht + 2] << 8) | enc[dht + 3]
    with pytest.raises(ValueError):
        decode_jpeg(enc[:dht] + enc[dht + 2 + dht_len:])
    # restart marker appearing with no DRI accounting
    rst = encode_baseline_jpeg(
        _gradient(w, h).tobytes(), w, h, 3, quality=90, restart_interval=1
    )
    dri = rst.find(b"\xff\xdd")
    with pytest.raises(ValueError):
        decode_jpeg(rst[:dri] + rst[dri + 6:])  # drop the 6-byte DRI segment


def test_arithmetic_coding_raises_not_implemented():
    # splice an SOF9 (arithmetic sequential) marker into a valid prefix
    w, h = 8, 8
    enc = bytearray(encode_baseline_jpeg(b"\x80" * 64, w, h, 1))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(enc))


def test_baseline_scan_under_sof2_is_rejected():
    # SOF2 + a baseline full-band SOS (Ss=0, Se=63) is structurally
    # invalid progressive data -> ValueError, not a wrong decode
    w, h = 8, 8
    enc = bytearray(encode_baseline_jpeg(b"\x80" * 64, w, h, 1))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with pytest.raises(ValueError, match="Se == 0"):
        decode_jpeg(bytes(enc))


def test_jpeg_through_mapinpandas_seam(spark):
    """Real JPEG bytes flow through extract_features and resize_images
    with decoder=decode_image: feat_mean/feat_dim are the decoded-pixel
    values, resize output is the exact nearest-neighbor resample of the
    decoded pixels."""
    w, h = 16, 8
    img = _gradient(w, h)
    enc = encode_baseline_jpeg(img.tobytes(), w, h, 3, quality=95)
    media = spark.createDataFrame(
        [(1, "image", "jpeg", bytearray(enc), None, None, None)], MEDIA_SCHEMA
    )
    feats = extract_features(media, decoder=decode_image).collect()
    assert len(feats) == 1
    _, _, _, px = decode_image(enc, "jpeg")
    assert feats[0].feat_dim == len(px) == w * h * 3
    assert feats[0].feat_mean == sum(px) // len(px)

    resized = resize_images(media, 4, 4, decoder=decode_image).collect()
    assert len(resized) == 1 and resized[0].width == 4 and resized[0].height == 4
    # independent nearest-neighbor reference over the decoded pixels
    dec = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    ref = bytearray()
    for y in range(4):
        sy = min(h - 1, (y * h) // 4)
        for x in range(4):
            sx = min(w - 1, (x * w) // 4)
            ref += dec[sy, sx].tobytes()
    assert bytes(resized[0].content) == bytes(ref)


def test_cross_codec_perceptual_dedup(spark):
    """The flagship cross-codec case: the SAME picture stored as a PNG
    master and a JPEG export must collide perceptually (tiny Hamming
    distance over real decoded pixels) while a different picture stays
    far — the near-dup byte-level dedup can never catch."""
    from github_etl_pipeline_spark.operators.multimodal import perceptual_ahash
    from tests.test_png_decode import encode_png

    w, h = 32, 32
    rng = np.random.RandomState(3)
    # smooth image (random low-res upsampled) so JPEG stays faithful
    base = rng.randint(0, 255, (4, 4, 3)).astype(np.uint8)
    imgA = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)
    imgB = 255 - imgA.transpose(1, 0, 2)  # a genuinely different picture

    rows = [
        (1, "image", "png", bytearray(encode_png(imgA.tobytes(), w, h, 3)), None, None, None),
        (2, "image", "jpeg", bytearray(encode_baseline_jpeg(imgA.tobytes(), w, h, 3, quality=92)), None, None, None),
        (3, "image", "png", bytearray(encode_png(imgB.tobytes(), w, h, 3)), None, None, None),
        (4, "audio", "wav", bytearray(b"notimg"), None, None, None),  # filtered out
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r.ahash for r in perceptual_ahash(media, decode_image).collect()}
    assert set(got) == {1, 2, 3}

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(got[1], got[2]) <= 4, "same picture across codecs must collide"
    assert hamming(got[1], got[3]) >= 16, "different pictures must stay far"


def test_420_constant_chroma_equals_444_exactly():
    """Real 4:2:0 bytes through the decoder's multi-block-MCU +
    upsample path: on spatially CONSTANT chroma the 2x2 box average is
    lossless, so the 4:2:0 decode must equal the 4:4:4 decode
    byte-for-byte (incl. odd dimensions exercising the crop)."""
    for w, h in [(32, 16), (13, 9), (17, 24)]:
        x = np.linspace(0, 255, w).astype(np.uint8)
        img = np.zeros((h, w, 3), dtype=np.uint8)
        img[..., 0] = x[None, :]  # R gradient ...
        img[..., 1] = x[None, :]  # ... with G == R == B per pixel:
        img[..., 2] = x[None, :]  # Cb and Cr are constant 128 everywhere
        full = decode_jpeg(encode_baseline_jpeg(img.tobytes(), w, h, 3, quality=90))
        sub = decode_jpeg(
            encode_baseline_jpeg(img.tobytes(), w, h, 3, quality=90, subsampling="420")
        )
        assert sub == full, (w, h)


def test_420_smooth_image_close_and_shaped():
    """Varying chroma: 4:2:0 is lossy in chroma only — decoded shape is
    full resolution and pixels stay near the 4:4:4 decode on a smooth
    image (chroma varies slowly, so the 2x2 average is a good fit)."""
    w, h = 40, 24
    base = np.zeros((h, w, 3), dtype=np.uint8)
    base[..., 0] = np.linspace(30, 220, w).astype(np.uint8)[None, :]
    base[..., 1] = np.linspace(220, 30, h).astype(np.uint8)[:, None]
    base[..., 2] = 90
    W, H, C, px_sub = decode_jpeg(
        encode_baseline_jpeg(base.tobytes(), w, h, 3, quality=95, subsampling="420")
    )
    assert (W, H, C) == (w, h, 3)
    _, _, _, px_full = decode_jpeg(
        encode_baseline_jpeg(base.tobytes(), w, h, 3, quality=95)
    )
    a = np.frombuffer(px_sub, np.uint8).astype(int)
    b = np.frombuffer(px_full, np.uint8).astype(int)
    assert np.abs(a - b).mean() < 3.0
    assert np.abs(a - b).max() <= 20


def test_420_with_restart_markers():
    w, h = 48, 32
    img = _gradient(w, h)
    plain = decode_jpeg(
        encode_baseline_jpeg(img.tobytes(), w, h, 3, quality=92, subsampling="420")
    )
    rst = decode_jpeg(
        encode_baseline_jpeg(
            img.tobytes(), w, h, 3, quality=92, subsampling="420", restart_interval=2
        )
    )
    assert plain == rst


def test_420_grayscale_is_an_explicit_error():
    """Grayscale has no chroma to subsample: requesting 4:2:0 on a
    1-channel image must raise, not silently encode 4:4:4 (the caller
    asked for a vector the encoder cannot produce)."""
    import numpy as np
    import pytest

    from github_etl_pipeline_spark.operators.jpeg import (
        encode_baseline_jpeg,
        encode_progressive_jpeg,
    )

    img = np.zeros((8, 8, 1), dtype=np.uint8)
    with pytest.raises(ValueError, match="channels=3"):
        encode_baseline_jpeg(img.tobytes(), 8, 8, 1, subsampling="420")
    with pytest.raises(ValueError, match="channels=3"):
        encode_progressive_jpeg(img.tobytes(), 8, 8, 1, subsampling="420")
