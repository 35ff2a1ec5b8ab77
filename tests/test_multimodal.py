"""Multimodal plumbing: resize + frame-sample stages (decode/features
covered in test_text_analysis)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from document_ai_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    DecodeMedia,
    make_media_payload,
    resize_media,
    sample_frames,
)


def _media(n=6):
    rows = [
        {
            "media_id": i,
            "media_type": "image/synthetic",
            "payload": make_media_payload(i, 64 * (i + 1), 48),
            "meta": {"width": 64 * (i + 1), "height": 48, "sample_rate": 0},
        }
        for i in range(n)
    ]
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))


def test_resize_rewrites_dimensions_and_payload_size():
    out = resize_media(_media(), width=32, height=32).take_all()
    assert len(out) == 6
    for r in out:
        assert r["meta"]["width"] == 32 and r["meta"]["height"] == 32
        # fake codec: body bytes track the new dimensions
        assert len(r["payload"]) == 16 + max(16, (32 * 32) // 64)
    # resized payloads still decode
    dec = DecodeMedia()._decode(out[0]["payload"])
    assert len(dec) == DecodeMedia.FEATURE_DIM


def test_resize_deterministic():
    a = resize_media(_media(), 32, 32).take_all()
    b = resize_media(_media(), 32, 32).take_all()
    assert {r["media_id"]: r["payload"] for r in a} == {
        r["media_id"]: r["payload"] for r in b
    }


def test_sample_frames_explodes_and_strides():
    out = sample_frames(_media(), every=2).to_pandas()
    assert set(out["media_id"]) == set(range(6))
    g = out[out["media_id"] == 5]
    assert list(g["frame_idx"]) == sorted(g["frame_idx"])
    assert all(i % 2 == 0 for i in g["frame_idx"])  # stride respected
    assert (g["frame"].str.len() > 0).all()


def test_real_bmp_ppm_roundtrip_and_resize():
    import numpy as np

    from document_ai_ray.stages.multimodal import (
        ResizeMedia,
        decode_bmp,
        decode_ppm,
        encode_bmp,
        encode_ppm,
    )

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (11, 7, 3), dtype=np.uint8)   # odd width -> row padding
    assert (decode_bmp(encode_bmp(px)) == px).all()
    assert (decode_ppm(encode_ppm(px)) == px).all()

    rz = ResizeMedia(width=4, height=6)
    out = decode_bmp(rz._resize(encode_bmp(px)))
    assert out.shape == (6, 4, 3)
    # nearest-neighbor: every output pixel exists in the source
    src = {tuple(p) for row in px for p in row}
    assert all(tuple(p) in src for row in out for p in row)


def test_real_wav_roundtrip_and_features():
    import numpy as np

    from document_ai_ray.stages.multimodal import (
        DecodeMedia,
        _audio_features,
        decode_wav,
        encode_wav,
    )

    sr = 8000
    t = np.arange(1600) / sr
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    got, rate = decode_wav(encode_wav(tone, sr))
    assert rate == sr and len(got) == len(tone)
    assert np.abs(got - tone).max() < 1e-3                  # 16-bit quantization only

    f = _audio_features(got)
    assert len(f) == 16
    assert np.allclose(f, 0.5 / np.sqrt(2), atol=0.02)      # RMS of a 0.5 sine

    silence = encode_wav(np.zeros(500), sr)
    fs = DecodeMedia()._decode(silence)
    assert np.allclose(fs, 0.0, atol=1e-4)


def test_real_image_features_constant_color():
    import numpy as np

    from document_ai_ray.stages.multimodal import DecodeMedia, encode_bmp

    px = np.full((16, 16, 3), 200, dtype=np.uint8)
    f = DecodeMedia()._decode(encode_bmp(px))
    assert len(f) == 16 and np.allclose(f, 200 / 255.0, atol=1e-6)


def test_media_real_decode_query_no_errors():
    from document_ai_ray.pipelines.media_queries import media_real_decode

    rows = media_real_decode("unused").take_all()
    assert len(rows) == 200
    assert all(r["error"] is None for r in rows)            # every format REALLY decoded
    assert all(any(v > 0 for v in r["features"]) for r in rows)


def test_png_roundtrip_all_filters_and_colors():
    import numpy as np

    from document_ai_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.RandomState(5)
    for shape in [(9, 7, 3), (6, 5), (8, 4, 4), (1, 1, 3), (3, 17, 3)]:
        px = rng.randint(0, 256, shape, dtype=np.uint8)
        for ft in range(5):
            got = decode_png(encode_png(px, filter_type=ft))
            if px.ndim == 2:
                assert (got == px[:, :, None].repeat(3, 2)).all()
            elif px.shape[2] == 4:
                assert (got == px[:, :, :3]).all()
            else:
                assert (got == px).all()


def test_png_palette_and_error_tiers():
    import struct
    import zlib

    import numpy as np
    import pytest

    from document_ai_ray.stages.multimodal import _png_chunk, _PNG_SIG, decode_png

    # hand-built 2x2 palette PNG (color type 3)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 7, 7])
    scan = bytes([0, 0, 1]) + bytes([0, 2, 3])  # filter 0 + indices per row
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(scan))
        + _png_chunk(b"IEND", b"")
    )
    px = decode_png(png)
    assert px.tolist() == [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [7, 7, 7]]]

    # sub-byte depths stay honest NotImplementedError stubs
    bad = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 3))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        decode_png(bad)

    # corrupted CRC is a hard error
    good = _png_chunk(b"IEND", b"")
    corrupt = good[:-1] + bytes([good[-1] ^ 1])
    full = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        + corrupt
    )
    with pytest.raises(ValueError):
        decode_png(full)


def test_png_through_decode_and_resize_stages():
    import numpy as np
    import pyarrow as pa

    from document_ai_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        DecodeMedia,
        ResizeMedia,
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, (24, 16, 3), dtype=np.uint8)
    t = pa.Table.from_pylist(
        [
            {
                "media_id": 1,
                "media_type": "image/png",
                "payload": encode_png(px, filter_type=4),
                "meta": {"width": 16, "height": 24, "sample_rate": 0},
            }
        ],
        schema=MEDIA_SCHEMA,
    )
    resized = ResizeMedia(width=8, height=8)(t)
    out_px = decode_png(resized.column("payload").to_pylist()[0])
    assert out_px.shape == (8, 8, 3)
    feats = DecodeMedia()(resized)
    assert feats.column("error").to_pylist() == [None]
    assert len(feats.column("features").to_pylist()[0]) == DecodeMedia.FEATURE_DIM


def test_gif_roundtrip_and_compositing():
    import numpy as np

    from document_ai_ray.stages.multimodal import decode_gif, encode_gif

    rng = np.random.RandomState(8)
    frames = [(rng.randint(0, 6, (10, 14, 3)) * 51).astype(np.uint8) for _ in range(4)]
    got = decode_gif(encode_gif(frames))
    assert len(got) == 4
    for a, b in zip(frames, got):
        assert (a == b).all()
    # arbitrary colors land on the nearest web-safe entry (<= 26 off)
    f = rng.randint(0, 256, (6, 6, 3), dtype=np.uint8)
    g = decode_gif(encode_gif([f]))[0]
    assert np.abs(g.astype(int) - f.astype(int)).max() <= 26


def test_gif_subrect_compositing():
    """Hand-built GIF with a 1x1 sub-rectangle second frame: the frame
    composites onto the prior canvas, rest of the pixels carry over."""
    import struct

    import numpy as np

    from document_ai_ray.stages.multimodal import (
        _gif_lzw_encode_literals,
        decode_gif,
        encode_gif,
    )

    base = (np.ones((4, 4, 3)) * 51).astype(np.uint8)  # palette cube index 43
    gif = bytearray(encode_gif([base]))
    assert gif[-1] == 0x3B
    gif.pop()  # drop trailer, append a 1x1 frame at (2,1) with color index 0
    sub = b"\x2c" + struct.pack("<HHHH", 2, 1, 1, 1) + b"\x00" + bytes([8])
    data = _gif_lzw_encode_literals(np.array([215], np.uint8), 8)  # cube idx 215 = (5,5,5)*51=255
    sub += bytes([len(data)]) + data + b"\x00" + b"\x3b"
    frames = decode_gif(bytes(gif) + sub)
    assert len(frames) == 2
    assert (frames[0] == base).all()
    expect = base.copy()
    expect[1, 2] = [255, 255, 255]
    assert (frames[1] == expect).all()


def test_gif_frame_sampling_stage():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from document_ai_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        decode_png,
        encode_gif,
        sample_frames,
    )

    rng = np.random.RandomState(6)
    frames = [(rng.randint(0, 6, (8, 6, 3)) * 51).astype(np.uint8) for _ in range(5)]
    t = pa.Table.from_pylist(
        [
            {
                "media_id": 9,
                "media_type": "image/gif",
                "payload": encode_gif(frames),
                "meta": {"width": 6, "height": 8, "sample_rate": 0},
            }
        ],
        schema=MEDIA_SCHEMA,
    )
    out = sample_frames(rd.from_arrow(t), every=2).take_all()
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    for r in out:
        px = decode_png(r["frame"])
        assert (px == frames[r["frame_idx"]]).all()


def test_png_adam7_and_16bit():
    import numpy as np

    from document_ai_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.RandomState(9)
    # interlaced decodes identically to non-interlaced for every filter
    # and for sizes straddling the 8x8 Adam7 grid
    for shape in [(1, 1, 3), (3, 9, 3), (8, 8, 3), (17, 5, 3), (9, 13, 4), (10, 7)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        for ft in range(5):
            assert np.array_equal(
                decode_png(encode_png(img, filter_type=ft, interlace=True)),
                decode_png(encode_png(img, filter_type=ft)),
            ), (shape, ft)
    # 16-bit samples scale to the high byte, plain and interlaced
    img16 = rng.randint(0, 65536, (7, 11, 3)).astype(np.uint16)
    exp = (img16 >> 8).astype(np.uint8)
    for inter in (False, True):
        assert np.array_equal(
            decode_png(encode_png(img16, filter_type=4, interlace=inter)), exp
        )
    g16 = rng.randint(0, 65536, (5, 6)).astype(np.uint16)
    assert np.array_equal(
        decode_png(encode_png(g16, interlace=True)),
        np.repeat((g16 >> 8).astype(np.uint8)[:, :, None], 3, 2),
    )


def test_stft_spectrogram_pure_tones_and_parseval():
    from document_ai_ray.stages.multimodal import dominant_frequency, stft_spectrogram

    sr = 8000
    t = np.arange(4000) / sr
    for f in (440.0, 1234.0, 3100.0):
        x = 0.5 * np.sin(2 * np.pi * f * t)
        power = stft_spectrogram(x)
        assert power.shape == (1 + (4000 - 256) // 128, 129)
        # quadratic peak interpolation: well under one 31.25 Hz bin
        assert abs(dominant_frequency(power, sr) - f) < 4.0, f
    # Parseval: frame power-spectrum sum ~ windowed-frame energy * n_fft/2
    win = np.hanning(256)
    frame = (0.5 * np.sin(2 * np.pi * 440.0 * t[:256])) * win
    spec = np.fft.rfft(frame)
    lhs = (spec.real**2 + spec.imag**2).sum() * 2 / 256  # rfft half-spectrum
    assert abs(lhs - (frame**2).sum()) / (frame**2).sum() < 0.02


def test_stft_two_tone_band_separation():
    from document_ai_ray.stages.multimodal import stft_spectrogram

    sr = 8000
    t = np.arange(2048) / sr
    x = np.sin(2 * np.pi * 300 * t) + 0.2 * np.sin(2 * np.pi * 2500 * t)
    bands = np.array_split(stft_spectrogram(x).mean(axis=0), 8)
    energies = [b.sum() for b in bands]
    # 300 Hz lives in band 0 (<500 Hz), 2500 Hz in band 5 — both peaks
    # present, low band dominant (amplitude 1.0 vs 0.2)
    assert np.argmax(energies) == 0
    assert energies[5] > 10 * max(energies[i] for i in (2, 3, 7))


def test_stft_short_input_pads():
    from document_ai_ray.stages.multimodal import stft_spectrogram

    power = stft_spectrogram(np.ones(10), n_fft=64, hop=32)
    assert power.shape == (1, 33)


def test_media_audio_spectrogram_query():
    from document_ai_ray.pipelines.media_queries import media_audio_spectrogram

    rows = media_audio_spectrogram("").take_all()
    assert rows, "no WAV rows in the corpus"
    for r in rows:
        # pure sine at expected_hz: interpolated peak lands within 5 Hz
        assert r["err_hz"] < 5.0, (r["media_id"], r["dominant_hz"], r["expected_hz"])
        assert r["n_frames"] >= 5
        assert len(r["band_power"]) == 8


# --- AVI/MJPEG container -----------------------------------------------------


def _avi_frames(n=5, w=32, h=24):
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 120 // (w - 1) + yy * 100 // (h - 1)).astype(np.int32)
    return [
        np.stack([base + k * 5, base // 2, 200 - base // 2], -1).astype(np.uint8)
        for k in range(n)
    ]


def test_avi_mux_demux_byte_exact():
    from document_ai_ray.functions.avi import avi_info, demux_avi, encode_avi_mjpeg
    from document_ai_ray.functions.jpeg import encode_jpeg

    frames = _avi_frames()
    avi = encode_avi_mjpeg(frames, fps=12, quality=90)
    info = avi_info(avi)
    assert info == {"width": 32, "height": 24, "fps": 12.0, "n_frames": 5}
    jpegs = demux_avi(avi)
    # the demuxed chunk payloads ARE the encoded JPEGs, byte-identical
    assert jpegs == [encode_jpeg(f, quality=90) for f in frames]


def test_avi_decode_accuracy_and_odd_sizes():
    from document_ai_ray.functions.avi import decode_avi, encode_avi_mjpeg

    # odd geometry exercises the even-byte RIFF padding path
    frames = _avi_frames(n=4, w=33, h=21)
    dec = decode_avi(encode_avi_mjpeg(frames, quality=92))
    assert len(dec) == 4
    for got, want in zip(dec, frames):
        assert got.shape == want.shape
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 24


def test_avi_truncation_and_garbage():
    import pytest

    from document_ai_ray.functions.avi import demux_avi, encode_avi_mjpeg

    avi = encode_avi_mjpeg(_avi_frames())
    with pytest.raises(ValueError):
        demux_avi(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        demux_avi(b"not a riff at all")
    # mid-movi truncation salvages the complete leading frames
    salvaged = demux_avi(avi[: len(avi) * 2 // 3])
    assert 0 < len(salvaged) < 5


def test_avi_through_sample_frames_and_resize():
    from document_ai_ray.functions.avi import avi_info, decode_avi, encode_avi_mjpeg
    from document_ai_ray.stages.multimodal import decode_png

    frames = _avi_frames(n=6)
    avi = encode_avi_mjpeg(frames, fps=10, quality=90)
    rows = [
        {
            "media_id": 7,
            "media_type": "video/x-msvideo",
            "payload": avi,
            "meta": {"width": 32, "height": 24, "sample_rate": 0},
        }
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
    out = sample_frames(ds, every=2).take_all()
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    for r in out:
        px = decode_png(r["frame"])
        want = frames[r["frame_idx"]]
        assert np.abs(px.astype(int) - want.astype(int)).max() <= 24

    # real video resize: decode -> nn-resample every frame -> re-mux
    resized = resize_media(ds, width=16, height=12).take_all()[0]["payload"]
    assert avi_info(resized)["width"] == 16
    assert len(decode_avi(resized)) == 6


def test_avi_decode_media_features():
    from document_ai_ray.functions.avi import encode_avi_mjpeg

    feats = DecodeMedia()._decode(encode_avi_mjpeg(_avi_frames()))
    assert feats.shape == (16,)
    assert feats.min() >= 0.0 and feats.max() <= 1.0


def test_media_avi_frames_query():
    from document_ai_ray.pipelines.media_queries import media_avi_frames

    rows = media_avi_frames("").take_all()
    assert len(rows) >= 48 * 2  # every clip has >=3 frames, stride 2 -> >=2 rows
    assert all(r["within_bound"] for r in rows), max(r["max_abs_err"] for r in rows)


def test_media_scene_cuts_exact_on_planted_boundaries():
    from document_ai_ray.pipelines.media_queries import N_SCENE_CLIPS, media_scene_cuts

    df = media_scene_cuts("unused").to_pandas()
    assert len(df) == N_SCENE_CLIPS
    assert df["cut_match"].all()  # every planted cut found exactly
    assert (df["margin"] >= 2.0).all()  # dominant, not borderline
    # detected boundary is always interior
    assert ((df["detected_cut"] > 0) & (df["detected_cut"] < df["n_frames"])).all()


def test_media_audio_dup_pairs_full_recall_zero_noise():
    from document_ai_ray.pipelines.media_queries import (
        N_AUDIO_BASES,
        media_audio_dup_pairs,
    )

    df = media_audio_dup_pairs("unused").to_pandas()
    assert df["same_base"].all()  # no cross-base pair survives 0.75
    assert len(df) == N_AUDIO_BASES * 6  # full recall: C(4,2) per base
    assert (df["id_a"] // 4).equals(df["id_b"] // 4)
    assert (df["overlap"] >= 0.75).all()


def test_tiff_roundtrip_compressions_endians_and_predictor():
    """Pixel-exact TIFF round-trips: none/PackBits/LZW, II and MM,
    gray + RGB, horizontal predictor, multi-strip layout."""
    import numpy as np

    from document_ai_ray.functions.tiff import decode_tiff, encode_tiff

    rng = np.random.RandomState(11)
    for shape in ((9, 23), (21, 16, 3)):
        img = rng.randint(0, 256, shape).astype(np.uint8)
        want = np.repeat(img[:, :, None], 3, axis=2) if img.ndim == 2 else img
        for comp in (1, 5, 32773):
            for be in (False, True):
                got = decode_tiff(encode_tiff(img, compression=comp, big_endian=be))
                assert (got == want).all(), (shape, comp, be)
        got = decode_tiff(encode_tiff(img, compression=5, predictor=2))
        assert (got == want).all(), (shape, "predictor2")


def test_tiff_lzw_clear_reset_and_whitezero():
    import numpy as np

    from document_ai_ray.functions.tiff import (
        decode_tiff,
        encode_tiff,
        lzw_decode,
        lzw_encode,
    )

    rng = np.random.RandomState(3)
    # > 4096 table entries forces the in-stream CLEAR reset
    d = rng.bytes(300000)
    assert lzw_decode(lzw_encode(d), len(d)) == d
    # WhiteIsZero inversion (photometric 0): build by patching the
    # encoder's photometric tag (262, value short at offset of tag)
    img = rng.randint(0, 256, (7, 5)).astype(np.uint8)
    b = bytearray(encode_tiff(img))
    import struct

    n_ent = struct.unpack_from("<H", b, 8)[0]
    for k in range(n_ent):
        off = 10 + k * 12
        if struct.unpack_from("<H", b, off)[0] == 262:
            struct.pack_into("<H", b, off + 8, 0)
    got = decode_tiff(bytes(b))
    assert (got == np.repeat((255 - img)[:, :, None], 3, axis=2)).all()


def test_tiff_through_decode_stage():
    """TIFF payloads flow through DecodeMedia with no error rows."""
    import numpy as np
    import pyarrow as pa

    from document_ai_ray.functions.tiff import encode_tiff
    from document_ai_ray.stages.multimodal import DecodeMedia

    rng = np.random.RandomState(5)
    payloads = [
        encode_tiff(rng.randint(0, 256, (8, 8, 3)).astype(np.uint8), compression=c)
        for c in (1, 5, 32773)
    ]
    t = pa.table(
        {
            "media_id": pa.array([0, 1, 2], pa.int64()),
            "media_type": pa.array(["image"] * 3, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    out = DecodeMedia()(t)
    assert out.column("error").null_count == 3  # all decoded for real
