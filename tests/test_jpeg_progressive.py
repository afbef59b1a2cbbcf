"""Progressive (SOF2) JPEG decode: spectral selection + successive
approximation (T.81 Annex G.1.2). The anchor: the progressive encoder
shares its quantization front half with the baseline encoder, so a
progressive encoding carries IDENTICAL coefficients — decoding it must
reproduce the baseline decode's pixels byte-for-byte. A bug anywhere in
the progressive entropy pipeline (EOBRUN, ZRL, refinement correction
bits, DC successive approximation) breaks that identity against the
independently-verified baseline path."""

import numpy as np
import pytest

from github_etl_pipeline_spark.operators.jpeg import (
    decode_jpeg,
    encode_baseline_jpeg,
    encode_progressive_jpeg,
)
from github_etl_pipeline_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    extract_features,
)


def _gradient(w, h):
    x = np.linspace(0, 255, w).astype(np.uint8)
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[..., 0] = x[None, :]
    img[..., 1] = 128
    img[..., 2] = x[::-1][None, :]
    return img


@pytest.mark.parametrize("successive", [False, True])
def test_grayscale_progressive_equals_baseline(successive):
    w, h = 24, 16
    img = (np.arange(w * h, dtype=np.uint8).reshape(h, w, 1) % 181)
    base = decode_jpeg(encode_baseline_jpeg(img.tobytes(), w, h, 1, quality=90))
    prog = decode_jpeg(
        encode_progressive_jpeg(img.tobytes(), w, h, 1, quality=90, successive=successive)
    )
    assert prog == base


@pytest.mark.parametrize("successive", [False, True])
def test_color_progressive_equals_baseline(successive):
    w, h = 40, 24
    img = _gradient(w, h)
    base = decode_jpeg(encode_baseline_jpeg(img.tobytes(), w, h, 3, quality=85))
    prog = decode_jpeg(
        encode_progressive_jpeg(img.tobytes(), w, h, 3, quality=85, successive=successive)
    )
    assert prog == base


def test_noise_image_stresses_refinement_paths():
    """Random noise maximizes nonzero AC coefficients: every refinement
    branch (correction bits inside runs, ZRL-with-corrections, buffered
    EOB bits) executes. Identity with baseline is the proof."""
    rng = np.random.RandomState(11)
    w, h = 56, 32
    noise = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    base = decode_jpeg(encode_baseline_jpeg(noise.tobytes(), w, h, 3, quality=75))
    prog = decode_jpeg(
        encode_progressive_jpeg(noise.tobytes(), w, h, 3, quality=75, successive=True)
    )
    assert prog == base


def test_solid_image_exercises_long_eobrun():
    """A solid image makes every AC band empty: the whole scan is one
    multi-block EOBRUN (the (r<<4)|0 code path on both sides)."""
    w, h = 48, 40
    solid = np.full((h, w, 1), 130, np.uint8)
    base = decode_jpeg(encode_baseline_jpeg(solid.tobytes(), w, h, 1, quality=90))
    prog = decode_jpeg(
        encode_progressive_jpeg(solid.tobytes(), w, h, 1, quality=90, successive=True)
    )
    assert prog == base
    # and the pixels are exactly the solid shade (quantization-exact)
    assert set(prog[3]) == {130}


def test_progressive_through_mapinpandas_seam(spark):
    """Progressive bytes flow through the standard decode_image dispatch
    (sniffed by SOI magic) inside the Arrow-batched media path."""
    w, h = 16, 8
    img = _gradient(w, h)
    enc = encode_progressive_jpeg(img.tobytes(), w, h, 3, quality=92)
    media = spark.createDataFrame(
        [(1, "image", "jpeg", bytearray(enc), None, None, None)], MEDIA_SCHEMA
    )
    feats = extract_features(media, decoder=decode_image).collect()
    _, _, _, px = decode_jpeg(enc)
    assert feats[0].feat_dim == len(px) == w * h * 3
    assert feats[0].feat_mean == sum(px) // len(px)


def test_truncated_progressive_raises_value_error():
    w, h = 24, 16
    enc = encode_progressive_jpeg(_gradient(w, h).tobytes(), w, h, 3)
    sos = enc.find(b"\xff\xda")
    with pytest.raises(ValueError):
        decode_jpeg(enc[: sos + 14])


@pytest.mark.parametrize("w,h", [(13, 9), (17, 11), (8, 24), (25, 8)])
def test_odd_dimensions_progressive_equals_baseline(w, h):
    """Non-multiple-of-8 geometries exercise the padded-block encode and
    the crop on reconstruction — identity with baseline must hold."""
    img = (np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3) % 211)
    base = decode_jpeg(encode_baseline_jpeg(img.tobytes(), w, h, 3, quality=88))
    for successive in (False, True):
        prog = decode_jpeg(
            encode_progressive_jpeg(img.tobytes(), w, h, 3, quality=88, successive=successive)
        )
        assert prog == base, (w, h, successive)


def test_random_images_progressive_equals_baseline():
    rng = np.random.RandomState(42)
    for trial in range(5):
        w = int(rng.randint(8, 49))
        h = int(rng.randint(8, 41))
        ch = int(rng.choice([1, 3]))
        q = int(rng.choice([70, 85, 95]))
        img = rng.randint(0, 256, (h, w, ch)).astype(np.uint8)
        base = decode_jpeg(encode_baseline_jpeg(img.tobytes(), w, h, ch, quality=q))
        prog = decode_jpeg(
            encode_progressive_jpeg(img.tobytes(), w, h, ch, quality=q, successive=True)
        )
        assert prog == base, (trial, w, h, ch, q)


@pytest.mark.parametrize("successive", [False, True])
def test_progressive_420_constant_chroma_equals_baseline_444(successive):
    """Subsampled progressive: with constant chroma the 2x2 average is
    lossless, so progressive-4:2:0 decode equals the baseline-4:4:4
    decode byte-for-byte — real bytes through the progressive decoder's
    multi-block interleaved DC scan and per-component AC grids."""
    for w, h in [(32, 16), (13, 9)]:
        x = np.linspace(0, 255, w).astype(np.uint8)
        img = np.zeros((h, w, 3), dtype=np.uint8)
        img[..., 0] = img[..., 1] = img[..., 2] = x[None, :]
        base = decode_jpeg(encode_baseline_jpeg(img.tobytes(), w, h, 3, quality=90))
        prog = decode_jpeg(
            encode_progressive_jpeg(
                img.tobytes(), w, h, 3, quality=90,
                successive=successive, subsampling="420",
            )
        )
        assert prog == base, (w, h, successive)


@pytest.mark.parametrize("successive", [False, True])
def test_progressive_420_equals_baseline_420_on_noise(successive):
    """Strongest anchor: identical quantized coefficients through two
    entirely different entropy pipelines (baseline interleaved vs
    progressive DC/AC scan scripts) must decode identically even with
    chroma that subsampling distorts."""
    rng = np.random.RandomState(5)
    w, h = 40, 24
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    b420 = decode_jpeg(
        encode_baseline_jpeg(img.tobytes(), w, h, 3, quality=85, subsampling="420")
    )
    p420 = decode_jpeg(
        encode_progressive_jpeg(
            img.tobytes(), w, h, 3, quality=85,
            successive=successive, subsampling="420",
        )
    )
    assert p420 == b420
