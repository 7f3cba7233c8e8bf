"""Real multimodal decode: BMP/WAV codec round trips, the actor-pool
decode stage, and the generator-golden feature oracle."""

import os

import numpy as np
import pytest


def test_bmp_roundtrip():
    from rse_ray.functions.media import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    # odd widths exercise the 4-byte row padding
    for h, w in [(1, 1), (5, 3), (16, 16), (7, 31), (2, 2)]:
        px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_png_roundtrip():
    from rse_ray.functions.media import decode_png, encode_png

    rng = np.random.default_rng(7)
    # >=5 rows hits every filter type (encoder uses filter y % 5);
    # 1x1 / odd widths / tall-thin cover the edge geometry
    for h, w in [(1, 1), (5, 3), (16, 16), (7, 31), (48, 2), (2, 48)]:
        px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px)
    # smooth gradients (the case filters exist for) must survive too
    grad = np.arange(24 * 17 * 3, dtype=np.uint64).reshape(24, 17, 3)
    px = (grad % 251).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


def test_png_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rse_ray.functions.media import decode_png, encode_png

    @settings(max_examples=30, deadline=None)
    @given(st.integers(1, 24), st.integers(1, 24),
           st.integers(0, 2**32 - 1))
    def check(h, w, seed):
        px = (np.random.default_rng(seed)
              .integers(0, 256, size=(h, w, 3)).astype(np.uint8))
        assert np.array_equal(decode_png(encode_png(px)), px)

    check()


def test_png_crc_and_magic_rejected():
    from rse_ray.functions.media import decode_png, encode_png

    with pytest.raises(ValueError):
        decode_png(b"notapng!" * 8)
    buf = bytearray(encode_png(np.zeros((4, 4, 3), dtype=np.uint8)))
    buf[-5] ^= 0xFF  # corrupt a byte inside IEND's CRC
    with pytest.raises(ValueError):
        decode_png(bytes(buf))


def test_jpeg_roundtrip_equals_reference():
    """The serialization layer is lossless: decode(encode(px)) must be
    BIT-IDENTICAL to jpeg_reference_pixels (the pre-encode
    quant->dequant->IDCT reconstruction the fixture goldens use), for
    non-multiple-of-8 dims (edge-block cropping) and across the
    quality range."""
    from rse_ray.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        jpeg_reference_pixels,
    )

    rng = np.random.default_rng(7)
    for h, w in [(8, 8), (13, 27), (1, 1), (40, 33), (7, 9)]:
        px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        got = decode_jpeg(encode_jpeg(px, quality=75))
        assert got.shape == (h, w, 3)
        assert np.array_equal(got, jpeg_reference_pixels(px, 75))
    px = rng.integers(0, 256, size=(24, 16, 3)).astype(np.uint8)
    for q in (5, 50, 95, 100):
        assert np.array_equal(decode_jpeg(encode_jpeg(px, q)),
                              jpeg_reference_pixels(px, q))
    # extreme aspect ratios: single-row/column MCU grids
    for h, w in [(1, 200), (200, 1), (3, 100)]:
        px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(px, 60)),
                              jpeg_reference_pixels(px, 60))


def test_jpeg_lossy_behavior():
    """Sanity on the lossy math itself: a smooth gradient survives
    high quality nearly unchanged; lower quality compresses smaller;
    reconstruction error grows as quality drops."""
    from rse_ray.functions.jpeg import decode_jpeg, encode_jpeg

    x = np.linspace(0, 255, 64)
    px = np.stack([np.tile(x, (64, 1))] * 3, axis=-1).astype(np.uint8)
    hi = decode_jpeg(encode_jpeg(px, 95))
    err_hi = np.abs(hi.astype(int) - px.astype(int)).mean()
    assert err_hi < 1.0
    lo_b, hi_b = encode_jpeg(px, 10), encode_jpeg(px, 95)
    assert len(lo_b) < len(hi_b)
    lo = decode_jpeg(lo_b)
    assert np.abs(lo.astype(int) - px.astype(int)).mean() >= err_hi


def test_jpeg_worst_case_coefficients():
    """Max-energy high-frequency blocks (checkerboards/stripes) at
    quality 100 push quantized ACs toward the 10-bit Huffman magnitude
    ceiling — the encoder must stay total and exactly reproducible."""
    from rse_ray.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        jpeg_reference_pixels,
    )

    for pat in range(3):
        px = np.zeros((8, 8, 3), dtype=np.uint8)
        if pat == 0:
            px[::2, ::2] = 255
            px[1::2, 1::2] = 255
        elif pat == 1:
            px[:, ::2] = 255
        else:
            px[:4] = 255
        for q in (100, 99):
            assert np.array_equal(decode_jpeg(encode_jpeg(px, q)),
                                  jpeg_reference_pixels(px, q))


def test_jpeg_bad_payloads_raise():
    from rse_ray.functions.jpeg import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")
    # progressive SOF2 must be rejected, not mis-decoded
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    buf = bytearray(encode_jpeg(px))
    sof = bytes(buf).find(b"\xFF\xC0")
    buf[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(buf))


def test_decode_image_dispatch_jpeg():
    from rse_ray.functions.jpeg import encode_jpeg, \
        jpeg_reference_pixels
    from rse_ray.functions.media import decode_image

    px = np.random.default_rng(1).integers(
        0, 256, size=(12, 20, 3)).astype(np.uint8)
    assert np.array_equal(decode_image(encode_jpeg(px)),
                          jpeg_reference_pixels(px))


def test_decode_image_dispatch():
    from rse_ray.functions.media import decode_image, encode_bmp, encode_png

    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, size=(9, 13, 3)).astype(np.uint8)
    assert np.array_equal(decode_image(encode_bmp(px)), px)
    assert np.array_equal(decode_image(encode_png(px)), px)
    with pytest.raises(ValueError):
        decode_image(b"\x00" * 32)


def test_wav_roundtrip():
    from rse_ray.functions.media import decode_wav, encode_wav

    rng = np.random.default_rng(4)
    s = rng.integers(-32768, 32768, size=777).astype(np.int16)
    out, rate = decode_wav(encode_wav(s, rate=16000))
    assert rate == 16000
    assert np.array_equal(out, s)
    # odd data length (chunk word-alignment)
    s1 = np.array([1], dtype=np.int16)
    out1, _ = decode_wav(encode_wav(s1))
    assert np.array_equal(out1, s1)


def test_bad_payloads_raise():
    from rse_ray.functions.media import decode_bmp, decode_wav

    with pytest.raises(ValueError):
        decode_bmp(b"notabmp" * 20)
    with pytest.raises(ValueError):
        decode_wav(b"nope" * 20)


def test_truncated_jpeg_raises_valueerror():
    """EVERY prefix truncation of a valid JPEG dies with ValueError —
    never IndexError (cut entropy stream) or an opaque numpy broadcast
    error (cut DQT body): decode_image callers route bad media rows on
    ValueError, and real crawls carry truncated payloads (round-4
    ADVICE). Also: bit-flip corruption in the marker stream stays
    inside the ValueError/EOFError contract."""
    import numpy as np

    from rse_ray.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    buf = encode_jpeg(px, quality=60)
    decode_jpeg(buf)  # sanity: the untruncated payload decodes
    raised = 0
    for cut in range(0, len(buf)):  # EVERY proper prefix
        try:
            decode_jpeg(buf[:cut])
        except (ValueError, EOFError):
            raised += 1
        # anything else (IndexError, struct.error, numpy broadcast
        # ValueError is fine — still ValueError) fails the test
    # a cut that removes only trailing padding/EOI may legally decode,
    # but the vast majority of prefixes must have been rejected
    assert raised >= len(buf) - 8
    # truncated tail replaced by a stray EOI: entropy stream cut at a
    # marker -> EOFError ("marker inside entropy stream") is the
    # documented signal; ValueError also acceptable
    with pytest.raises((ValueError, EOFError)):
        decode_jpeg(buf[: len(buf) // 2] + b"\xFF\xD9")


def test_media_features_real_matches_golden(ray_session, tmp_path):
    """Pipeline decode over encoded payloads == generator's golden
    features from the raw arrays (the encode->ship->decode round trip
    is bit-exact)."""
    import pyarrow.parquet as pq
    import ray.data

    from rse_ray.pipelines.multimodal import (
        media_features,
        write_real_media_fixture,
    )

    d = str(tmp_path / "media")
    write_real_media_fixture(d, n=24, seed=9)
    ds = ray.data.read_parquet(os.path.join(d, "media.parquet"))
    got = (
        media_features(ds, backend="real")
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    want = (
        pq.read_table(os.path.join(d, "golden_features.parquet"))
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    got = got[want.columns.tolist()]
    assert got.equals(want)


def test_video_roundtrip_and_frame_sampling(ray_session):
    """RVID encode/decode is frame-exact; the sampler emits every k-th
    frame with features equal to the pre-encode golden."""
    import os
    import shutil

    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data

    from rse_ray.functions.media import decode_video, encode_video
    from rse_ray.pipelines.multimodal import (
        resize_images,
        sample_video_frames,
        write_video_fixture,
    )

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(7, 10, 12, 3)).astype(np.uint8)
    back = decode_video(encode_video(frames))
    assert len(back) == 7
    assert all((a == b).all() for a, b in zip(frames, back))

    d = "/tmp/rse_ray_cache/video_fixture_test"
    shutil.rmtree(d, ignore_errors=True)
    write_video_fixture(d, n=8, seed=2, every_k=3, out_h=12, out_w=20)
    con = duckdb.connect()
    got = sample_video_frames(
        ray.data.read_parquet(os.path.join(d, "videos.parquet")),
        every_k=3).to_pandas().sort_values(
        ["media_id", "frame_idx"]).reset_index(drop=True)
    want = con.sql(f"""SELECT * FROM
        read_parquet('{os.path.join(d, "golden_frames.parquet")}')
        ORDER BY media_id, frame_idx""").df()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)

    rgot = resize_images(
        ray.data.read_parquet(os.path.join(d, "stills.parquet")),
        out_h=12, out_w=20).to_pandas().sort_values(
        "media_id").reset_index(drop=True)
    rwant = con.sql(f"""SELECT * FROM
        read_parquet('{os.path.join(d, "golden_resized.parquet")}')
        ORDER BY media_id""").df()
    pd.testing.assert_frame_equal(rgot[rwant.columns.tolist()], rwant,
                                  check_dtype=False)


def test_phash_invariances():
    """pHash is brightness-perturbation tolerant (planted +1 corner
    stays within Hamming 2) but separates distinct images; grayscale
    and RGB paths agree on gray input."""
    import numpy as np

    from rse_ray.functions.media import phash64

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(24, 36, 3)).astype(np.uint8)
    h0 = phash64(px)
    px2 = px.copy()
    px2[:3, :3] = np.minimum(px2[:3, :3].astype(np.int16) + 1,
                             255).astype(np.uint8)
    assert bin(h0 ^ phash64(px2)).count("1") <= 3
    other = rng.integers(0, 256, size=(24, 36, 3)).astype(np.uint8)
    assert bin(h0 ^ phash64(other)).count("1") > 10
    # 2D (grayscale) input accepted
    gray = px[..., 0]
    assert isinstance(phash64(gray), int)


def test_image_phash_pipeline_matches_golden(ray_session, tmp_path):
    """Decode -> pHash reproduces the pre-encode golden hashes, and
    the banded dup-pair engine finds exactly the planted pairs."""
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from rse_ray.pipelines.multimodal import (
        image_dup_pairs,
        image_phash,
        write_phash_fixture,
    )

    d = str(tmp_path / "phash_fx")
    write_phash_fixture(d, n_base=16, seed=11)
    ds = ray.data.read_parquet(os.path.join(d, "media.parquet"))
    got = image_phash(ds).to_pandas().sort_values("media_id") \
        .reset_index(drop=True)
    want = pq.read_table(os.path.join(d, "golden_phash.parquet")) \
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    assert (got["media_id"] == want["media_id"]).all()
    assert (got["phash"] == want["phash"]).all()

    pairs = image_dup_pairs(ds, max_hamming=3).to_pandas()
    planted = {(i, 1000 + i) for i in range(0, 16, 4)}
    assert set(zip(pairs["media_a"], pairs["media_b"])) == planted
    # exact ground truth: brute-force popcount over the golden hashes
    h = want.set_index("media_id")["phash"].to_dict()
    brute = {(a, b) for a in h for b in h if a < b
             and bin((int(h[a]) ^ int(h[b])) & (2**64 - 1)).count("1") <= 3}
    assert set(zip(pairs["media_a"], pairs["media_b"])) == brute

    from rse_ray.pipelines.multimodal import image_dup_clusters

    cl = image_dup_clusters(ds, max_hamming=3)
    assert set(zip(cl["media_id"], cl["cluster_id"])) == \
        {(i, i) for i in range(0, 16, 4)} | \
        {(1000 + i, i) for i in range(0, 16, 4)}


def test_transcode_images_matches_golden(ray_session, tmp_path):
    """Decode->re-encode-as-JPEG reproduces the generator's pre-write
    transcode report byte-exactly (sizes AND crc32), and the
    keep_payload variant emits payloads that decode back to exactly
    what a reference reconstruction of the report row promises."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from rse_ray.functions.jpeg import decode_jpeg
    from rse_ray.pipelines.multimodal import (
        transcode_images,
        write_real_media_fixture,
    )

    d = str(tmp_path / "media_fx")
    write_real_media_fixture(d, n=24, seed=5)
    ds = ray.data.read_parquet(os.path.join(d, "media.parquet"))
    got = transcode_images(ds).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    want = pq.read_table(os.path.join(d, "golden_transcode.parquet")) \
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    assert got.equals(want[got.columns.tolist()])
    assert set(got["in_fmt"]) == {"bmp", "png", "jpeg"}
    # every output is smaller codec-normalized JPEG; payloads decode
    with_payload = transcode_images(
        ds, keep_payload=True).to_pandas()
    for _, r in with_payload.iterrows():
        px = decode_jpeg(bytes(r["payload"]))
        assert px.shape == (r["height"], r["width"], 3)
        assert len(r["payload"]) == r["out_bytes"]


def test_audio_rms_windows(ray_session, tmp_path):
    """Framewise RMS: decode reproduces pre-encode goldens; the frame
    count follows the (len - frame) // hop + 1 contract and a
    too-short clip yields no frames."""
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from rse_ray.functions.media import rms_frames
    from rse_ray.pipelines.multimodal import (
        audio_rms_windows,
        write_real_media_fixture,
    )

    assert len(rms_frames(np.zeros(255, dtype=np.int16))) == 0
    assert len(rms_frames(np.zeros(256, dtype=np.int16))) == 1
    assert len(rms_frames(np.zeros(512, dtype=np.int16))) == 3

    d = str(tmp_path / "media_fx")
    write_real_media_fixture(d, n=12, seed=5)
    ds = ray.data.read_parquet(os.path.join(d, "media.parquet"))
    got = audio_rms_windows(ds).to_pandas() \
        .sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    want = pq.read_table(os.path.join(d, "golden_rms.parquet")) \
        .to_pandas().sort_values(["media_id", "frame_idx"]) \
        .reset_index(drop=True)
    assert got.equals(want)
