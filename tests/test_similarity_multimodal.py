"""ANN similarity + multimodal plumbing tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pg_cjk_parser_spark.ops.multimodal import (
    frame_sample,
    html_to_text,
    image_features,
    synth_media,
)
from pg_cjk_parser_spark.ops.similarity import (
    ann_cosine_topk,
    brute_force_cosine_topk,
    embedding_near_dups,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    import os

    return spark.read.parquet(os.path.join(SF, "embeddings.parquet"))


def test_ann_recall_vs_brute_force(spark, emb):
    q = emb.where(F.col("vec_id") == 7).collect()[0].embedding
    exact = [r.vec_id for r in brute_force_cosine_topk(emb, q, k=10).collect()]
    approx = [
        r.vec_id
        for r in ann_cosine_topk(emb, q, k=10, n_planes=8, n_tables=8, probe_bits=1).collect()
    ]
    assert approx[0] == 7  # the query vector itself is its own NN
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, (recall, exact, approx)


def test_embedding_near_dups_on_planted_clusters(spark):
    """Planted tight clusters: the LSH-bucketed pair operator must
    recover exactly the intra-cluster pairs found by exact all-pairs
    cosine at the same threshold."""
    rng = np.random.RandomState(5)
    rows = []
    vid = 0
    centers = rng.standard_normal((6, 32))
    vecs = []
    for c in centers:
        for _ in range(5):  # tight cluster: cos ~0.99 within
            v = c + 0.05 * rng.standard_normal(32)
            rows.append((vid, [float(x) for x in v]))
            vecs.append(v)
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.id_a, r.id_b)
        for r in embedding_near_dups(
            emb, threshold=0.9, n_planes=8, n_tables=8
        ).collect()
    }
    # exact ground truth (float32-rounded like the table column)
    M = np.array([r[1] for r in rows], dtype=np.float64)
    X = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = X @ X.T
    want = {
        (a, b)
        for a in range(vid)
        for b in range(a + 1, vid)
        if round(S[a, b], 4) >= 0.9
    }
    assert want, "clusters must produce near-dup pairs"
    missed = want - got
    assert not (got - want), "verification must be exact"
    assert len(missed) / len(want) < 0.05, f"missed {len(missed)}/{len(want)}"


def test_ann_candidates_are_subset(spark, emb):
    q = emb.where(F.col("vec_id") == 3).collect()[0].embedding
    approx = ann_cosine_topk(emb, q, k=5, n_planes=10, n_tables=4, probe_bits=1).collect()
    exact = {
        r.vec_id: r.cos
        for r in brute_force_cosine_topk(emb, q, k=500).collect()
    }
    for r in approx:
        assert abs(exact[r.vec_id] - r.cos) < 1e-9  # same scores, fewer cands


def test_html_to_text_strips_tags(spark):
    from pg_cjk_parser_spark.spark.corpus import synth_corpus

    docs = synth_corpus(spark, 20, seed=42, num_partitions=2)
    out = html_to_text(docs, "html").select("url", "text", "text_extracted")
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert "<" not in r.text_extracted
        assert "var x" not in r.text_extracted  # script body suppressed
        assert f"t{0}" not in ("",)  # smoke


def test_image_features_fake_decoder(spark):
    media = synth_media(spark, 30, seed=42)
    feats = image_features(media, use_fake_decoder=True).collect()
    assert len(feats) == 10  # every third row is an image
    for r in feats:
        assert 0 <= r.mean_intensity <= 255
        assert r.std_intensity > 0
    # deterministic: same seed, same features
    feats2 = image_features(synth_media(spark, 30, seed=42), use_fake_decoder=True).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, feats2))


def test_image_features_stub_raises(spark):
    media = synth_media(spark, 3, seed=42)
    with pytest.raises(Exception, match="NotImplementedError|real image codecs"):
        image_features(media, use_fake_decoder=False).collect()


def test_frame_sampling_plumbing(spark):
    media = synth_media(spark, 30, seed=42)
    frames = frame_sample(media, every_n=30).collect()
    vids = media.where(F.col("kind") == "video").count()
    assert len(frames) == vids * 4  # 120 frames / every 30 -> 4 samples


def test_html_to_text_no_duplication(spark):
    df = spark.createDataFrame(
        [(b"<p>\xe6\x97\xa5\xe6\x9c\xac\xe8\xaa\x9e hello state-of-the-art</p>",)],
        "html binary",
    )
    out = html_to_text(df, "html").collect()[0].text_extracted
    assert out == "日本語 hello state-of-the-art"


def test_ivf_recall_and_scores(spark, emb):
    from pg_cjk_parser_spark.ops.similarity import (
        ivf_cosine_topk,
        train_ivf_centroids,
    )

    C = train_ivf_centroids(emb, n_clusters=8, iters=8, seed=42)
    q = emb.where(F.col("vec_id") == 7).collect()[0].embedding
    approx = ivf_cosine_topk(emb, q, C, k=10, nprobe=4).collect()
    exact = {
        r.vec_id: r.cos
        for r in brute_force_cosine_topk(emb, q, k=500).collect()
    }
    assert approx[0].vec_id == 7
    for r in approx:
        assert abs(exact[r.vec_id] - r.cos) < 1e-9
    top10 = sorted(exact, key=lambda v: (-exact[v], v))[:10]
    recall = len({r.vec_id for r in approx} & set(top10)) / 10
    assert recall >= 0.5, recall
    # determinism: same seed -> same centroids
    C2 = train_ivf_centroids(emb, n_clusters=8, iters=8, seed=42)
    import numpy as np

    assert np.allclose(C, C2)


def test_audio_features_plumbing(spark):
    from pg_cjk_parser_spark.ops.multimodal import audio_features, synth_media

    media = synth_media(spark, 30, seed=42)
    rows = audio_features(media, use_fake_decoder=True).collect()
    audio_ids = {r.media_id for r in media.where("kind = 'audio'").collect()}
    assert {r.media_id for r in rows} == audio_ids
    for r in rows:
        assert 0.2 < r.duration_s < 1.3
        assert 0.0 < r.rms < 1.0
        assert 0.0 < r.zcr < 1.0
    # deterministic across runs
    rows2 = audio_features(media, use_fake_decoder=True).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
    # real-codec path declares itself loudly
    import pytest as _pytest

    with _pytest.raises(Exception):
        audio_features(media, use_fake_decoder=False).collect()


# --- real pure-stdlib/NumPy decoders -----------------------------------


def test_decode_image_pgm_ppm_bytes_exact():
    import numpy as np

    from pg_cjk_parser_spark.ops.multimodal import decode_image

    # P5 2x2, hand-built: values land row-major
    pgm = b"P5\n2 2\n255\n" + bytes([0, 255, 10, 20])
    assert decode_image(pgm).tolist() == [[0, 255], [10, 20]]
    # P6 1x1 pure red -> integer Rec.601 luma (255*299)//1000 = 76
    ppm = b"P6\n# c\n1 1\n255\n" + bytes([255, 0, 0])
    assert decode_image(ppm).tolist() == [[76]]
    # comments and multi-whitespace headers parse
    pgm2 = b"P5\n# w\n 2\t1 # h\n255\n" + bytes([7, 9])
    assert decode_image(pgm2).tolist() == [[7, 9]]
    assert decode_image(pgm).dtype == np.uint8


def test_decode_image_bmp_bottom_up_and_palette():
    from pg_cjk_parser_spark.ops.multimodal import (
        _render_bmp24,
        decode_image,
    )
    import numpy as np

    # renderer/decoder roundtrip equals luma of the rendered RGB
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)

    # build a BMP for THIS array by mimicking the renderer layout
    def bmp_of(arr):
        h, w, _ = arr.shape
        stride = ((24 * w + 31) // 32) * 4
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
        data = rows.tobytes()
        hdr = (
            b"BM" + (54 + len(data)).to_bytes(4, "little") + b"\0\0\0\0"
            + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + h.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little") + len(data).to_bytes(4, "little")
            + (2835).to_bytes(4, "little") * 2
            + (0).to_bytes(4, "little") * 2
        )
        return hdr + data

    got = decode_image(bmp_of(img))
    r, g, b = (img[..., i].astype(np.uint32) for i in range(3))
    want = ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)
    assert (got == want).all()  # top row first: bottom-up undone
    # top-left pixel sanity: arr[0,0] is the FIRST decoded pixel
    solid = np.zeros((2, 1, 3), np.uint8)
    solid[0, 0] = (255, 255, 255)
    assert decode_image(bmp_of(solid)).tolist() == [[255], [0]]


def test_decode_image_unsupported_raises():
    import pytest as _pytest

    from pg_cjk_parser_spark.ops.multimodal import decode_image

    # TIFF is a SUPPORTED container since round 5: malformed = ValueError
    with _pytest.raises(ValueError):
        decode_image(b"II*\x00" + b"\0" * 16)
    # WebP is a SUPPORTED container since round 5 (VP8L); a RIFF
    # wrapper with no VP8L chunk is malformed
    with _pytest.raises(ValueError):
        decode_image(b"RIFFxxxxWEBP" + b"\0" * 16)
    with _pytest.raises(NotImplementedError, match="PPM"):
        decode_image(b"FORM1234ILBM" + b"\0" * 16)  # IFF
    # GIF is a SUPPORTED container since round 5: malformed = ValueError
    with _pytest.raises(ValueError):
        decode_image(b"GIF89a" + b"\0" * 16)
    # JPEG is a SUPPORTED container since round 5: a malformed stream
    # (SOI + APP0 full of zeros, then nothing) is ValueError, not NIE
    with _pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\0" * 16)


def test_decode_image_png_roundtrip_all_color_types():
    """_render_png rotates filter type y%5 per row, so a decode of a
    6-row image exercises every unfilter path (None/Sub/Up/Average/
    Paeth) for each of the four supported color types."""
    import numpy as np

    from pg_cjk_parser_spark.ops.multimodal import (
        _PNG_CHANNELS,
        _render_png,
        decode_image,
    )

    for ct in (0, 2, 4, 6):
        ch = _PNG_CHANNELS[ct]
        png = _render_png(7, 6, 123, ct)
        rng = np.random.default_rng(123)
        img = rng.integers(0, 256, size=(6, 7 * ch), dtype=np.uint8)
        img = img.reshape(6, 7, ch)
        if ct in (0, 4):  # gray / gray+alpha: luma IS the gray channel
            want = img[:, :, 0]
        else:  # RGB / RGBA: integer Rec.601 luma, alpha ignored
            r, g, b = (img[..., i].astype(np.uint32) for i in range(3))
            want = ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)
        got = decode_image(png)
        assert got.shape == (6, 7)
        assert (got == want).all(), f"color type {ct}"


def test_decode_image_png_external_encoder():
    """A 1x1 red PNG produced by libpng (the ubiquitous placeholder
    bytes), NOT our own encoder: decodes to Rec.601 luma of red =
    (255*299)//1000 = 76."""
    import base64

    from pg_cjk_parser_spark.ops.multimodal import decode_image

    b64 = (
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
        "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
    )
    assert decode_image(base64.b64decode(b64)).tolist() == [[76]]


def test_decode_image_png_contracts():
    """Unsupported PNG variants raise NotImplementedError; malformed
    payloads of the supported variant raise ValueError."""
    import zlib

    import pytest as _pytest

    from pg_cjk_parser_spark.ops.multimodal import (
        _PNG_SIG,
        _png_chunk,
        _render_png,
        decode_image,
    )

    good = bytearray(_render_png(4, 4, 9, 2))

    def ihdr_variant(**kw):
        w, h = kw.get("w", 1), kw.get("h", 1)
        ihdr = (
            w.to_bytes(4, "big")
            + h.to_bytes(4, "big")
            + bytes(
                [
                    kw.get("depth", 8),
                    kw.get("color", 2),
                    0,
                    0,
                    kw.get("interlace", 0),
                ]
            )
        )
        raw = b"\x00" + b"\x00" * (w * 3)
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw * h))
            + _png_chunk(b"IEND", b"")
        )

    # Adam7 is SUPPORTED since round 5: a 1x1 interlaced PNG is a
    # single pass-1 sub-image (full coverage in the dedicated test)
    assert decode_image(ihdr_variant(interlace=1)).tolist() == [[0]]
    with _pytest.raises(ValueError, match="IHDR"):
        decode_image(ihdr_variant(interlace=2))
    # palette and 16-bit are SUPPORTED since round 5; what remains
    # rejected is the INVALID depth/color combination (malformed, not
    # unimplemented) and size mismatches against the new row geometry
    with _pytest.raises(ValueError, match="invalid for color"):
        decode_image(ihdr_variant(color=3, depth=16))
    with _pytest.raises(ValueError, match="length mismatch"):
        decode_image(ihdr_variant(depth=16))  # rows sized for 8-bit
    # palette stream with correct row bytes but no PLTE chunk
    no_plte = (
        _PNG_SIG
        + _png_chunk(
            b"IHDR",
            (1).to_bytes(4, "big") + (1).to_bytes(4, "big")
            + bytes([8, 3, 0, 0, 0]),
        )
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + _png_chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="PLTE"):
        decode_image(no_plte)

    # truncated mid-chunk
    with _pytest.raises(ValueError, match="truncated"):
        decode_image(bytes(good[:20]))
    # CRC corruption (flip a byte inside IDAT data)
    bad = bytearray(good)
    idat_at = bytes(bad).index(b"IDAT")
    bad[idat_at + 6] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC"):
        decode_image(bytes(bad))
    # well-formed chunks, corrupt deflate stream: rebuild IDAT with
    # garbage bytes and a VALID crc
    garbage = _png_chunk(b"IDAT", b"\x99\x99\x99\x99")
    hdr_end = bytes(good).index(b"IDAT") - 4
    iend_at = bytes(good).index(b"IEND") - 4
    rebuilt = bytes(good[:hdr_end]) + garbage + bytes(good[iend_at:])
    with _pytest.raises(ValueError, match="IDAT"):
        decode_image(rebuilt)
    # pixel-length mismatch: valid zlib, wrong payload size
    short = _png_chunk(b"IDAT", zlib.compress(b"\x00\x01\x02"))
    rebuilt = bytes(good[:hdr_end]) + short + bytes(good[iend_at:])
    with _pytest.raises(ValueError, match="length mismatch"):
        decode_image(rebuilt)
    # missing IEND
    with _pytest.raises(ValueError, match="IEND"):
        decode_image(bytes(good[:iend_at]))


def test_decode_image_png_bomb_guard():
    """A deflate bomb (tiny payload, ~1000:1 inflate ratio) must fail
    fast on the IHDR-derived length bound instead of inflating GBs;
    absurd claimed dimensions are rejected outright."""
    import resource
    import zlib

    import pytest as _pytest

    from pg_cjk_parser_spark.ops.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_image,
    )

    def png_of(w, h, idat_raw):
        ihdr = (
            w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0])
        )
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(idat_raw, 9))
            + _png_chunk(b"IEND", b"")
        )

    # 100 MB of zeros compresses to ~100 KB; claimed 10x10 RGB
    bomb = png_of(10, 10, b"\x00" * (100 * 1024 * 1024))
    assert len(bomb) < 200 * 1024
    before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    with _pytest.raises(ValueError, match="length mismatch"):
        decode_image(bomb)
    after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # peak RSS must not have grown by anything near the 100 MB payload
    assert after - before < 20 * 1024  # KB units on Linux

    # dimension bomb: IHDR claims 67+ megapixels
    with _pytest.raises(ValueError, match="megapixel"):
        decode_image(png_of(100000, 100000, b""))


def test_decode_audio_wav_roundtrip():
    import io
    import wave

    import numpy as np
    import pytest as _pytest

    from pg_cjk_parser_spark.ops.multimodal import decode_audio

    pcm = np.array([16384, -16384, 0, 32767], dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        wv.writeframes(pcm.tobytes())
    samples, sr = decode_audio(buf.getvalue())
    assert sr == 8000
    assert samples.tolist() == [0.5, -0.5, 0.0, 32767 / 32768]
    # stereo mixes down by mean
    buf2 = io.BytesIO()
    with wave.open(buf2, "wb") as wv:
        wv.setnchannels(2)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        wv.writeframes(
            np.array([16384, 0, -16384, 0], dtype="<i2").tobytes()
        )
    s2, _ = decode_audio(buf2.getvalue())
    assert s2.tolist() == [0.25, -0.25]
    with _pytest.raises(NotImplementedError, match="WAV"):
        decode_audio(b"\xff\xfb\x90\x00 mp3-ish garbage")


def test_media_features_real_decoders_end_to_end(spark):
    """image_features/audio_features run the REAL decoders over
    genuine PGM/PPM/BMP/WAV payloads from synth_media_real -
    deterministic, no fake flag, no external data."""
    from pg_cjk_parser_spark.ops.multimodal import (
        audio_features,
        image_features,
        synth_media_real,
    )

    media = synth_media_real(spark, 30, seed=7)
    imgs = {r.media_id: r for r in image_features(media).collect()}
    assert len(imgs) == 10  # every i % 3 == 0 row
    assert all(0 <= r.mean_intensity <= 255 for r in imgs.values())
    assert any(r.std_intensity > 0 for r in imgs.values())
    auds = {r.media_id: r for r in audio_features(media).collect()}
    assert len(auds) == 10
    for r in auds.values():
        assert 0.2 < r.duration_s < 0.5  # 2000-3000 samples @ 8 kHz
        assert 0.1 < r.rms < 0.6  # ~0.5/sqrt(2) sine + noise
        assert 0.0 < r.zcr < 0.5
    # deterministic across runs
    imgs2 = {
        r.media_id: r
        for r in image_features(synth_media_real(spark, 30, seed=7)).collect()
    }
    assert {k: (v.mean_intensity, v.phash) for k, v in imgs.items()} == {
        k: (v.mean_intensity, v.phash) for k, v in imgs2.items()
    }


def test_video_frames_real_avi_decode(spark):
    """Uncompressed-AVI frame decode, end to end through the
    Arrow-batched sampler: deterministic grayscale frames with the
    same luma math as the image decoders."""
    import numpy as np

    from pg_cjk_parser_spark.ops.multimodal import (
        _render_avi,
        decode_video_frames,
        synth_media_real,
        video_frame_features,
    )

    # direct: bytes roundtrip with a hand-checkable solid frame
    w, h = 3, 2
    stride = ((24 * w + 31) // 32) * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = 255  # solid white frame, bottom-up BGR
    from pg_cjk_parser_spark.ops.multimodal import _riff_chunk, _riff_list

    avih = (0).to_bytes(4, "little") * 14

    def strf_of(height):
        return (
            (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + height.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little")
            + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little")
            + (0).to_bytes(4, "little") * 5
        )

    strh_vids = b"vids" + b"DIB " + b"\0" * 48
    # an AUDIO stream list FIRST: its strf (a WAVEFORMATEX, not a
    # bitmap header) must NOT be taken as the video format
    strh_auds = b"auds" + b"\0" * 52
    wavefmt = (1).to_bytes(2, "little") + (1).to_bytes(2, "little") + (
        44100
    ).to_bytes(4, "little") + b"\0" * 8

    def avi_of(strf, frame_bytes):
        body = (
            b"AVI "
            + _riff_list(
                b"hdrl",
                _riff_chunk(b"avih", avih),
                _riff_list(
                    b"strl",
                    _riff_chunk(b"strh", strh_auds),
                    _riff_chunk(b"strf", wavefmt),
                ),
                _riff_list(
                    b"strl",
                    _riff_chunk(b"strh", strh_vids),
                    _riff_chunk(b"strf", strf),
                ),
            )
            + _riff_list(b"movi", _riff_chunk(b"00db", frame_bytes))
        )
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    frames = list(decode_video_frames(avi_of(strf_of(h), rows.tobytes())))
    assert len(frames) == 1
    assert frames[0][1].tolist() == [[255] * 3] * 2

    # top-down (negative biHeight): rows are stored top-first and
    # must NOT be flipped
    grad = np.zeros((h, stride), np.uint8)
    grad[0, : w * 3] = 200  # first stored row
    top_down = list(
        decode_video_frames(avi_of(strf_of(-h), grad.tobytes()))
    )[0][1]
    assert top_down[0].tolist() == [200] * 3  # first row stays first
    bottom_up = list(
        decode_video_frames(avi_of(strf_of(h), grad.tobytes()))
    )[0][1]
    assert bottom_up[-1].tolist() == [200] * 3  # flipped

    # Spark path over synthetic AVIs; every_n=3 subsamples
    media = synth_media_real(spark, 30, seed=9)
    rows_df = video_frame_features(media, every_n=3).collect()
    vids = {r.media_id for r in rows_df}
    assert len(vids) == 10  # kind == video rows
    assert all(r.frame_idx % 3 == 0 for r in rows_df)
    assert all(0 <= r.mean_intensity <= 255 for r in rows_df)
    # deterministic
    rows2 = video_frame_features(
        synth_media_real(spark, 30, seed=9), every_n=3
    ).collect()
    assert sorted(map(tuple, rows_df)) == sorted(map(tuple, rows2))


def test_decoder_malformed_input_contracts():
    """Malformed payloads of SUPPORTED containers raise ValueError;
    unsupported containers raise NotImplementedError."""
    import io
    import wave

    import numpy as np
    import pytest as _pytest

    from pg_cjk_parser_spark.ops.multimodal import (
        decode_audio,
        decode_image,
    )

    with _pytest.raises(ValueError, match="truncated"):
        decode_image(b"P5\n2")  # header cut mid-field
    with _pytest.raises(ValueError, match="truncated"):
        decode_image(b"P5\n2 2\n255\n\x01")  # payload short
    with _pytest.raises(NotImplementedError, match="BITMAPINFOHEADER"):
        # BITMAPCOREHEADER (size 12) must be rejected, not misparsed
        core = b"BM" + (26).to_bytes(4, "little") + b"\0" * 4 + (
            26
        ).to_bytes(4, "little") + (12).to_bytes(4, "little") + b"\0" * 8
        decode_image(core)
    # WAV declaring sample_rate=0: wave accepts it on read; we must not
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        wv.writeframes(np.zeros(4, "<i2").tobytes())
    wav = bytearray(buf.getvalue())
    i = wav.index(b"fmt ")
    wav[i + 12 : i + 16] = (0).to_bytes(4, "little")  # nSamplesPerSec=0
    with _pytest.raises(ValueError, match="malformed WAV"):
        decode_audio(bytes(wav))


# --- JPEG -------------------------------------------------------------


def _jpeg_expected_luma(seed, w, h, blocky):
    """Regenerate _render_jpeg's source luma independently of the codec."""
    rng = np.random.default_rng(seed)
    if blocky:
        tiles = rng.integers(16, 240, size=(-(-h // 8), -(-w // 8), 3))
        rgb = np.repeat(np.repeat(tiles, 8, 0), 8, 1)[:h, :w].astype(float)
    else:
        base = rng.integers(0, 256, size=(h, w, 3)).astype(float)
        ramp = np.add.outer(
            np.linspace(0, 64, h), np.linspace(0, 64, w)
        )[..., None]
        rgb = np.clip(0.5 * base + ramp + 32, 0, 255)
    return 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]


def test_decode_jpeg_dc_only_analytic():
    """A hand-assembled (not via our encoder) single-block grayscale
    baseline JPEG with quant table all-1s and one-code Huffman tables:
    DC coefficient c makes every pixel round(c/8) + 128 exactly (the
    orthonormal IDCT of a DC-only block is flat c/8)."""
    from pg_cjk_parser_spark.ops.multimodal import decode_image

    def dc_only(scan_bytes):
        return bytes(
            b"\xff\xd8"
            # DQT: Pq/Tq=0, 64 x 1
            + b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + b"\x01" * 64
            # SOF0: 8-bit, 8x8, 1 component (id 1, 1x1 sampling, q table 0)
            + b"\xff\xc0" + (11).to_bytes(2, "big")
            + b"\x08" + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
            + b"\x01" + b"\x01\x11\x00"
            # DHT DC 0: one code of length 1 -> symbol 7 (category 7)
            + b"\xff\xc4" + (20).to_bytes(2, "big") + b"\x00"
            + b"\x01" + b"\x00" * 15 + b"\x07"
            # DHT AC 0: one code of length 1 -> symbol 0x00 (EOB)
            + b"\xff\xc4" + (20).to_bytes(2, "big") + b"\x10"
            + b"\x01" + b"\x00" * 15 + b"\x00"
            # SOS
            + b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01\x01\x00"
            + b"\x00\x3f\x00"
            + scan_bytes
            + b"\xff\xd9"
        )

    # DC diff +80 (category 7, bits 1010000): '0'+'1010000'+'0' then
    # seven 1-pad bits -> 0x50 0x7F; pixels = 128 + round(80/8) = 138
    img = decode_image(dc_only(b"\x50\x7f"))
    assert img.shape == (8, 8)
    assert (img == 138).all()
    # DC diff -80: bits = -80 + 127 = 47 = 0b0101111 -> '0'+'0101111'+'0'
    # +pad -> 0x2F 0x7F; pixels = 128 - 10 = 118
    img = decode_image(dc_only(b"\x2f\x7f"))
    assert (img == 118).all()


def test_decode_jpeg_roundtrip_blocky_analytic_bound():
    """8x8-aligned flat tiles reconstruct within DC-quantization error:
    |err| <= q_dc/16 + 0.5 + rounding slop (q_dc = 8 at quality 75)."""
    from pg_cjk_parser_spark.ops.multimodal import _render_jpeg, decode_image

    for kwargs in (dict(gray=True), dict()):
        got = decode_image(_render_jpeg(24, 17, seed=3, blocky=True, **kwargs))
        want = _jpeg_expected_luma(3, 24, 17, blocky=True)
        assert got.shape == (17, 24)
        err = np.abs(got.astype(float) - want)
        assert err.max() <= 1.5, kwargs


def test_decode_jpeg_420_restarts_luma_identical():
    """Chroma subsampling and restart markers change the stream layout
    but not the Y plane: 4:2:0 with DRI=2 decodes the identical luma as
    4:4:4 (luma blocks carry the same coefficients either way)."""
    from pg_cjk_parser_spark.ops.multimodal import _render_jpeg, decode_image

    a = decode_image(_render_jpeg(30, 22, seed=5))
    b = decode_image(
        _render_jpeg(30, 22, seed=5, subsampling="420", restart_interval=2)
    )
    assert (a == b).all()


@pytest.fixture(scope="module")
def jpeg_ref_helper(tmp_path_factory):
    """Compile the libjpeg reference helper; skip if gcc/libjpeg are
    unavailable (they are baked into this container, so in practice
    this runs)."""
    import shutil as _shutil
    import subprocess

    if not _shutil.which("gcc"):
        pytest.skip("no gcc")
    exe = tmp_path_factory.mktemp("jpegref") / "jpeg_ref_helper"
    import os as _os

    src = _os.path.join(_os.path.dirname(__file__), "jpeg_ref_helper.c")
    r = subprocess.run(
        ["gcc", "-O2", "-o", str(exe), src, "-ljpeg"], capture_output=True
    )
    if r.returncode != 0:
        pytest.skip(f"libjpeg unavailable: {r.stderr.decode()[:200]}")
    return str(exe)


def test_decode_jpeg_libjpeg_cross_check(jpeg_ref_helper):
    """Bidirectional cross-check against REAL libjpeg (not our own
    encoder): (a) libjpeg decodes our encoder's streams to the same
    luma we do, (b) we decode libjpeg-encoded streams (standard
    Annex-K Huffman tables, its own subsampling decisions) to the same
    luma libjpeg itself reconstructs.  +/-1 tolerance: libjpeg's
    integer IDCT vs our float IDCT (T.81 allows implementation slop)."""
    import subprocess

    from pg_cjk_parser_spark.ops.multimodal import _render_jpeg, decode_image

    def ref_decode(jpg):
        p = subprocess.run(
            [jpeg_ref_helper, "decode"], input=jpg, capture_output=True
        )
        assert p.returncode == 0, p.stderr
        hdr, raw = p.stdout.split(b"\n", 1)
        w, h = map(int, hdr.split())
        return np.frombuffer(raw, np.uint8, h * w).reshape(h, w)

    # (a) our encoder -> libjpeg
    for kwargs in (
        dict(gray=True),
        dict(),
        dict(subsampling="420", restart_interval=3),
    ):
        jpg = _render_jpeg(37, 25, seed=11, **kwargs)
        d = np.abs(
            ref_decode(jpg).astype(int) - decode_image(jpg).astype(int)
        )
        assert d.max() <= 1, kwargs

    # (b) libjpeg encoder -> us; prog-* modes emit real SOF2 streams
    # via jpeg_simple_progression (DC refine + per-band AC first +
    # AC refinement scans with EOB runs)
    rng = np.random.default_rng(9)
    w, h = 41, 29
    rgb = np.clip(
        rng.integers(0, 256, (h, w, 3)).astype(float) * 0.5
        + np.add.outer(np.linspace(0, 90, h), np.linspace(0, 90, w))[
            ..., None
        ],
        0,
        255,
    ).astype(np.uint8)
    for mode in ("gray", "444", "420", "prog-gray", "prog-444", "prog-420"):
        src = (
            rgb[:, :, 0].tobytes() if mode.endswith("gray") else rgb.tobytes()
        )
        p = subprocess.run(
            [jpeg_ref_helper, "encode", str(w), str(h), "85", mode],
            input=src,
            capture_output=True,
        )
        assert p.returncode == 0, p.stderr
        jpg = p.stdout
        if mode.startswith("prog-"):
            assert b"\xff\xc2" in jpg[:300]  # really SOF2
        d = np.abs(
            ref_decode(jpg).astype(int) - decode_image(jpg).astype(int)
        )
        assert d.max() <= 1, mode


def test_decode_jpeg_contracts():
    """Unsupported JPEG variants raise NotImplementedError; malformed
    payloads of the supported variant raise ValueError."""
    import pytest as _pytest

    from pg_cjk_parser_spark.ops.multimodal import _render_jpeg, decode_image

    good = _render_jpeg(16, 12, seed=1, gray=True)

    # progressive is SUPPORTED since round 5: flipping SOF0 -> SOF2 on
    # a baseline stream leaves a scan header that is ILLEGAL for
    # progressive (Ss=0 with Se=63), so it is malformed, not NIE
    prog = bytearray(good)
    i = prog.index(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with _pytest.raises(ValueError, match="DC scan with Se"):
        decode_image(bytes(prog))

    # arithmetic coding: SOF0 -> SOF9
    arith = bytearray(good)
    arith[i + 1] = 0xC9
    with _pytest.raises(NotImplementedError, match="0xFFC9"):
        decode_image(bytes(arith))

    # 12-bit precision
    deep = bytearray(good)
    deep[i + 4] = 12
    with _pytest.raises(NotImplementedError, match="12-bit"):
        decode_image(bytes(deep))

    # truncated entropy data
    with _pytest.raises(ValueError):
        decode_image(good[: len(good) // 2])

    # EOI before any scan
    with _pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xd9")

    # SOS referencing a Huffman table that was never defined
    i_dht = good.index(b"\xff\xc4")
    seglen = int.from_bytes(good[i_dht + 2 : i_dht + 4], "big")
    nodht = good[:i_dht] + good[i_dht + 2 + seglen :]  # drop DC table
    with _pytest.raises(ValueError, match="missing DHT"):
        decode_image(nodht)

    # dimension bomb: JPEG's cap is TIGHTER than PNG's 67 MP because
    # entropy decode is a per-coefficient Python loop - 4 MP bounds a
    # crafted max-dimension payload's task time
    bomb = bytearray(good)
    j = bomb.index(b"\xff\xc0")
    bomb[j + 5 : j + 7] = (4096).to_bytes(2, "big")
    bomb[j + 7 : j + 9] = (4096).to_bytes(2, "big")
    with _pytest.raises(ValueError, match="4-megapixel"):
        decode_image(bytes(bomb))


def test_decode_image_png_palette_and_deep_variants():
    """Hand-assembled (not via our encoder) palette, sub-byte-gray and
    16-bit PNGs decode to exactly predictable luma."""
    import zlib

    from pg_cjk_parser_spark.ops.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_image,
    )

    def png(w, h, depth, color, rows, extra=b""):
        ihdr = (
            w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([depth, color, 0, 0, 0])
        )
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + extra
            + _png_chunk(b"IDAT", zlib.compress(rows))
            + _png_chunk(b"IEND", b"")
        )

    # 8-bit palette: indices [[0,1],[2,0]] over R/G/B palette ->
    # Rec.601 lumas 76/149/29
    plte = _png_chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0, 0, 0, 255]))
    img = decode_image(
        png(2, 2, 8, 3, b"\x00\x00\x01" + b"\x00\x02\x00", extra=plte)
    )
    assert img.tolist() == [[76, 149], [29, 76]]

    # 4-bit palette, 3 px wide (odd -> padded nibble): row [0,1,2]
    # packs MSB-first as 0x01 0x20
    img = decode_image(png(3, 1, 4, 3, b"\x00\x01\x20", extra=plte))
    assert img.tolist() == [[76, 149, 29]]

    # 1-bit grayscale [[1,0,1]] -> 0xA0 packed; scales to 255/0/255
    img = decode_image(png(3, 1, 1, 0, b"\x00\xa0"))
    assert img.tolist() == [[255, 0, 255]]

    # 2-bit grayscale [0,1,2,3] -> 0x1B; scale factor 85
    img = decode_image(png(4, 1, 2, 0, b"\x00\x1b"))
    assert img.tolist() == [[0, 85, 170, 255]]

    # 16-bit grayscale: big-endian 0xABCD reduces to high byte 0xAB
    img = decode_image(png(1, 1, 16, 0, b"\x00\xab\xcd"))
    assert img.tolist() == [[0xAB]]

    # 16-bit RGB with a Sub filter (bpp must be 6, not 2): second
    # pixel stored as delta over the first
    row = b"\x01" + bytes(
        [0x40, 0x00, 0x80, 0x00, 0xC0, 0x00]  # pixel 1 raw
        + [0x10, 0x00, 0x10, 0x00, 0x10, 0x00]  # pixel 2 delta
    )
    img = decode_image(png(2, 1, 16, 2, row))
    r1 = (0x40 * 299 + 0x80 * 587 + 0xC0 * 114) // 1000
    r2 = (0x50 * 299 + 0x90 * 587 + 0xD0 * 114) // 1000
    assert img.tolist() == [[r1, r2]]

    # out-of-range palette index is malformed, not a crash
    import pytest as _pytest

    with _pytest.raises(ValueError, match="palette index"):
        decode_image(png(1, 1, 8, 3, b"\x00\x09", extra=plte))


# --- GIF --------------------------------------------------------------


def _gif_pack_codes(codes, width):
    """Independent LSB-first packer used only by the tests.  ``codes``
    may mix ints (packed at ``width``) and (code, width) pairs - GIF
    LZW widens mid-stream once the table reaches 2^width entries."""
    acc = nb = 0
    out = bytearray()
    for c in codes:
        c, cw = c if isinstance(c, tuple) else (c, width)
        acc |= c << nb
        nb += cw
        while nb >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nb -= 8
    if nb:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_wrap(w, h, mcs, lzw, pal_rgb, interlaced=False):
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    n_entries = len(pal_rgb) // 3
    size_field = max(0, (n_entries - 1).bit_length() - 1)
    out += bytes([0x80 | size_field, 0, 0])
    out += bytes(pal_rgb)
    out += bytes([0x2C]) + b"\x00\x00\x00\x00"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlaced else 0x00, mcs])
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_decode_gif_lzw_table_growth_and_kwkwk():
    """Hand-assembled LZW streams (mcs=2: clear=4, eoi=5, first entry
    6) hit real dictionary growth and the KwKwK special case - paths
    the 'uncompressed trick' renderer never reaches."""
    from pg_cjk_parser_spark.ops.multimodal import decode_image

    # gray palette with distinct levels: index i -> luma 10*i
    pal = bytes(v for i in range(4) for v in (10 * i,) * 3)

    # codes [4,0,1,6,2,5]: 6 was added as "0"+"1"[0] -> expands to
    # "01"; final indices 0,1,0,1,2.  Decoding 6 adds entry 7 and
    # fills the 3-bit space, so the remaining codes widen to 4 bits.
    lzw = _gif_pack_codes([4, 0, 1, 6, (2, 4), (5, 4)], 3)
    img = decode_image(_gif_wrap(5, 1, 2, lzw, pal))
    assert img.tolist() == [[0, 10, 0, 10, 20]]

    # KwKwK: codes [4,1,6,5] where 6 == next_code at decode time ->
    # output prev + prev[0] = "11"; indices 1,1,1
    lzw = _gif_pack_codes([4, 1, 6, 5], 3)
    img = decode_image(_gif_wrap(3, 1, 2, lzw, pal))
    assert img.tolist() == [[10, 10, 10]]


def test_decode_gif_roundtrip_and_interlace():
    """Renderer/decoder roundtrip equals the palette luma of the
    rendered indices; interlaced storage decodes to the same image."""
    from pg_cjk_parser_spark.ops.multimodal import (
        _luma,
        _render_gif,
        decode_image,
    )

    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(17, 23), dtype=np.uint8)
    want = _luma(pal[idx]).tolist()
    assert decode_image(_render_gif(23, 17, seed=4)).tolist() == want
    assert (
        decode_image(_render_gif(23, 17, seed=4, interlaced=True)).tolist()
        == want
    )


def test_decode_gif_contracts():
    """Malformed GIF payloads raise ValueError with the failure named."""
    import pytest as _pytest

    from pg_cjk_parser_spark.ops.multimodal import _render_gif, decode_image

    good = _render_gif(8, 6, seed=1)

    with _pytest.raises(ValueError, match="truncated GIF"):
        decode_image(good[:10])
    with _pytest.raises(ValueError, match="truncated GIF"):
        decode_image(good[: len(good) // 2])
    # trailer immediately after the screen descriptor: no image
    hdr_end = 13 + 768
    with _pytest.raises(ValueError, match="no image"):
        decode_image(good[:hdr_end] + b"\x3b")
    # unknown block tag
    with _pytest.raises(ValueError, match="unknown GIF block"):
        decode_image(good[:hdr_end] + b"\x7f")
    # palette index out of range: 4-entry palette, literal 7 (mcs=3)
    pal = bytes(12)
    lzw = _gif_pack_codes([8, 7, 9], 4)  # clear, literal 7, eoi
    with _pytest.raises(ValueError, match="palette index"):
        decode_image(_gif_wrap(1, 1, 3, lzw, pal))
    # LZW code beyond the table is malformed, not a crash
    lzw = _gif_pack_codes([4, 1, 7, 5], 3)  # 7 > next_code(6)
    pal4 = bytes(v for i in range(4) for v in (10 * i,) * 3)
    with _pytest.raises(ValueError, match="out of range"):
        decode_image(_gif_wrap(3, 1, 2, lzw, pal4))
    # dimension bomb
    bomb = bytearray(good)
    bomb[6:8] = (16384).to_bytes(2, "little")
    bomb[8:10] = (16384).to_bytes(2, "little")
    with _pytest.raises(ValueError, match="67-megapixel"):
        decode_image(bytes(bomb))


def test_decode_image_png_adam7():
    """Hand-assembled Adam7 streams (pass extraction done independently
    here, filter 0 rows) decode to the same luma as the progressive
    image - RGB 8-bit with odd dims (partial/empty passes), palette,
    and 16-bit gray."""
    import zlib

    from pg_cjk_parser_spark.ops.multimodal import (
        _PNG_SIG,
        _luma,
        _png_chunk,
        decode_image,
    )

    ADAM7 = (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    )

    def interlace_bytes(sample_rows):
        """sample_rows: (h, w, nbytes-per-px) uint8.  Returns the
        concatenated filtered pass stream."""
        h, w = sample_rows.shape[:2]
        out = bytearray()
        for xs, ys, xst, yst in ADAM7:
            sub = sample_rows[ys::yst, xs::xst]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            for row in sub:
                out += b"\x00" + row.tobytes()
        return bytes(out)

    def wrap(w, h, depth, color, stream, extra=b""):
        ihdr = (
            w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([depth, color, 0, 0, 1])
        )
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + extra
            + _png_chunk(b"IDAT", zlib.compress(stream))
            + _png_chunk(b"IEND", b"")
        )

    rng = np.random.default_rng(21)

    # RGB 8-bit, 9x10 (partial passes on both axes)
    img = rng.integers(0, 256, size=(10, 9, 3), dtype=np.uint8)
    got = decode_image(wrap(9, 10, 8, 2, interlace_bytes(img)))
    assert got.tolist() == _luma(img).tolist()

    # 8-bit palette, 5x3
    pal_rgb = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(3, 5, 1), dtype=np.uint8)
    plte = _png_chunk(b"PLTE", pal_rgb.tobytes())
    got = decode_image(wrap(5, 3, 8, 3, interlace_bytes(idx), extra=plte))
    assert got.tolist() == _luma(pal_rgb[idx[:, :, 0]]).tolist()

    # 16-bit gray, 4x9: big-endian pairs reduce to the high byte
    hi = rng.integers(0, 256, size=(9, 4), dtype=np.uint8)
    pairs = np.stack([hi, np.full_like(hi, 0xCD)], axis=2)
    got = decode_image(wrap(4, 9, 16, 0, interlace_bytes(pairs)))
    assert got.tolist() == hi.tolist()

    # truncated pass stream is malformed
    import pytest as _pytest

    full = interlace_bytes(img)
    with _pytest.raises(ValueError, match="length mismatch"):
        decode_image(wrap(9, 10, 8, 2, full[:-5]))


def test_decode_jpeg_progressive_hand_built():
    """Hand-assembled three-scan progressive stream (no encoder, no
    libjpeg): DC-first at Al=1 (diff 40 -> coefficient 80), a DC
    refinement scan contributing a 0 bit, and an AC-first scan that is
    one EOB.  Quant all-1s, one-code Huffman tables: every pixel is
    exactly round(80/8) + 128 = 138."""
    from pg_cjk_parser_spark.ops.multimodal import decode_image

    def dht(tc_th, sym):
        return (
            b"\xff\xc4" + (20).to_bytes(2, "big") + bytes([tc_th])
            + b"\x01" + b"\x00" * 15 + bytes([sym])
        )

    def sos(ss, se, ahal, scan):
        return (
            b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01\x01\x00"
            + bytes([ss, se, ahal]) + scan
        )

    jpg = (
        b"\xff\xd8"
        + b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + b"\x01" * 64
        # SOF2: 8-bit, 8x8, 1 component
        + b"\xff\xc2" + (11).to_bytes(2, "big")
        + b"\x08" + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + b"\x01" + b"\x01\x11\x00"
        + dht(0x00, 6)   # DC: one length-1 code -> category 6
        + dht(0x10, 0)   # AC: one length-1 code -> EOB
        # scan 1: DC first, Al=1; code '0' + 101000 (40) + pad -> 0x51
        + sos(0, 0, 0x01, b"\x51")
        # scan 2: DC refine Ah=1,Al=0; one raw 0 bit + pad -> 0x7f
        + sos(0, 0, 0x10, b"\x7f")
        # scan 3: AC first over 1..63; EOB code '0' + pad -> 0x7f
        + sos(1, 63, 0x00, b"\x7f")
        + b"\xff\xd9"
    )
    img = decode_image(jpg)
    assert img.shape == (8, 8)
    assert (img == 138).all()


def test_g711_decode_tables_match_audioop():
    """The spec-derived G.711 expansion tables are bit-identical to
    the classic Sun tables as exposed by stdlib audioop (present on
    this Python; skipped where removed)."""
    audioop = pytest.importorskip("audioop")

    from pg_cjk_parser_spark.ops.multimodal import _g711_decode_table

    all_codes = bytes(range(256))
    for law, fn in (("ulaw", audioop.ulaw2lin), ("alaw", audioop.alaw2lin)):
        ref = np.frombuffer(fn(all_codes, 2), "<i2")
        assert np.array_equal(_g711_decode_table(law), ref), law


def test_decode_audio_g711_wav():
    """G.711 WAV decodes through the fallback parser: same duration
    and sample rate as PCM, values within companding quantization of
    the PCM rendering of the same signal."""
    from pg_cjk_parser_spark.ops.multimodal import (
        _render_wav,
        _render_wav_g711,
        decode_audio,
    )

    ref, _ = decode_audio(_render_wav(8000, 1500, 21))
    for law in ("ulaw", "alaw"):
        s, sr = decode_audio(_render_wav_g711(8000, 1500, 21, law))
        assert sr == 8000 and len(s) == 1500
        # signal peaks ~0.56 FS -> worst segment step ~512/32768
        assert np.abs(s - ref).max() < 0.02, law
        assert np.abs(s - ref).max() > 0, law  # really re-quantized


def test_decode_audio_g711_contracts():
    """Malformed G.711 WAVs raise ValueError; non-G.711 compressed
    tags still raise NotImplementedError; stereo mixes down."""
    from pg_cjk_parser_spark.ops.multimodal import (
        _g711_decode_table,
        _riff_chunk,
        decode_audio,
    )

    def wav_of(tag, ch, sr, bits, data):
        fmt = (
            tag.to_bytes(2, "little") + ch.to_bytes(2, "little")
            + sr.to_bytes(4, "little") + sr.to_bytes(4, "little")
            + ch.to_bytes(2, "little") + bits.to_bytes(2, "little")
        )
        body = b"WAVE" + _riff_chunk(b"fmt ", fmt) + _riff_chunk(b"data", data)
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    tab = _g711_decode_table("ulaw").astype(np.float64) / (1 << 15)
    # stereo mixdown by mean, odd trailing byte dropped
    s, sr = decode_audio(wav_of(7, 2, 8000, 8, bytes([0, 255, 10, 10, 3])))
    assert sr == 8000 and len(s) == 2
    assert s[0] == pytest.approx((tab[0] + tab[255]) / 2)
    assert s[1] == pytest.approx(tab[10])
    with pytest.raises(ValueError, match="8 bits"):
        decode_audio(wav_of(7, 1, 8000, 16, b"\x00\x00"))
    with pytest.raises(ValueError, match="sample_rate"):
        decode_audio(wav_of(6, 1, 0, 8, b"\x00"))
    with pytest.raises(NotImplementedError):  # MS ADPCM: still the ceiling
        decode_audio(wav_of(2, 1, 8000, 4, b"\x00\x00"))


def test_decode_video_mjpeg_avi():
    """MJPEG AVI: every '00dc' chunk is a standalone baseline JPEG;
    frames with and without embedded DHT decode identically (the
    OpenDML default-table rule), and match decoding the same JPEG
    standalone."""
    from pg_cjk_parser_spark.ops.multimodal import (
        _decode_jpeg,
        _render_avi,
        _render_jpeg,
        decode_video_frames,
    )

    w, h, n = 24, 18, 4
    with_dht = [
        f for _, f in decode_video_frames(
            _render_avi(w, h, n, 99, codec="mjpg")
        )
    ]
    no_dht = [
        f for _, f in decode_video_frames(
            _render_avi(w, h, n, 99, codec="mjpg", emit_dht=False)
        )
    ]
    assert len(with_dht) == len(no_dht) == n
    assert all(np.array_equal(a, b) for a, b in zip(with_dht, no_dht))
    assert all(f.shape == (h, w) for f in with_dht)
    ref0 = _decode_jpeg(_render_jpeg(w, h, 99, tables="annexk"))
    assert np.array_equal(with_dht[0], ref0)
    # frames differ over time (per-frame seeds)
    assert not np.array_equal(with_dht[0], with_dht[1])

    # a DHT-less stream really has no 0xFFC4 before the first scan
    avi = _render_avi(w, h, 1, 99, codec="mjpg", emit_dht=False)
    soi = avi.index(b"\xff\xd8")
    assert b"\xff\xc4" not in avi[soi:avi.index(b"\xff\xda", soi)]

    # frame chunk that is not a JPEG -> ValueError (supported codec,
    # malformed payload)
    bad = avi.replace(b"\xff\xd8", b"\x00\x00", 1)
    with pytest.raises(ValueError, match="SOI"):
        list(decode_video_frames(bad))


def test_jpeg_default_dht_tables_match_libjpeg(jpeg_ref_helper):
    """Validates the built-in Annex-K default Huffman tables against
    libjpeg's: take a libjpeg-ENCODED stream (cjpeg emits exactly the
    spec's typical tables), STRIP its DHT segments, and decode via
    default_dht=True - pixel-identical to decoding the intact
    stream."""
    import subprocess

    from pg_cjk_parser_spark.ops.multimodal import _decode_jpeg

    rng = np.random.default_rng(3)
    w, h = 40, 24
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    for mode in ("gray", "444", "420"):
        src = rgb[:, :, 0].tobytes() if mode == "gray" else rgb.tobytes()
        p = subprocess.run(
            [jpeg_ref_helper, "encode", str(w), str(h), "80", mode],
            input=src,
            capture_output=True,
        )
        assert p.returncode == 0, p.stderr
        jpg = p.stdout

        # strip every DHT segment (marker walk, entropy data untouched)
        out = bytearray(b"\xff\xd8")
        pos = 2
        while True:
            assert jpg[pos] == 0xFF
            m = jpg[pos + 1]
            ln = int.from_bytes(jpg[pos + 2:pos + 4], "big")
            seg = jpg[pos:pos + 2 + ln]
            pos += 2 + ln
            if m != 0xC4:
                out += seg
            if m == 0xDA:
                out += jpg[pos:]  # entropy-coded data + EOI
                break
        assert b"\xff\xc4" not in out[: out.index(b"\xff\xda")]
        got = _decode_jpeg(bytes(out), default_dht=True)
        want = _decode_jpeg(jpg)
        assert np.array_equal(got, want), mode


def test_ima_adpcm_decode_matches_audioop():
    """The IMA ADPCM inner loop is bit-identical to stdlib audioop's
    Intel/DVI implementation (same step/index tables and
    reconstruction), modulo WAV's low-nibble-first byte order."""
    audioop = pytest.importorskip("audioop")

    from pg_cjk_parser_spark.ops.multimodal import _ima_decode_nibbles

    rng = np.random.default_rng(5)
    nibbles = rng.integers(0, 16, 2000).tolist()
    for pred, index in ((0, 0), (-1234, 17), (30000, 88)):
        mine, _, _ = _ima_decode_nibbles(nibbles, pred, index)
        packed = bytes(
            (nibbles[i] << 4) | nibbles[i + 1]  # audioop: high first
            for i in range(0, len(nibbles), 2)
        )
        ref = np.frombuffer(
            audioop.adpcm2lin(packed, 2, (pred, index))[0], "<i2"
        )
        assert np.array_equal(np.array(mine, np.int16), ref), (pred, index)


def test_decode_audio_ima_adpcm_wav():
    """IMA ADPCM WAV end to end: fact-chunk-exact length, block
    headers carry the running step index, reconstruction within
    4-bit-codec error of the PCM rendering of the same signal."""
    from pg_cjk_parser_spark.ops.multimodal import (
        _render_wav,
        _render_wav_ima_adpcm,
        decode_audio,
    )

    ref, _ = decode_audio(_render_wav(8000, 2345, 13))
    s, sr = decode_audio(_render_wav_ima_adpcm(8000, 2345, 13))
    assert sr == 8000 and len(s) == 2345  # fact chunk, not block pad
    err = np.abs(s - ref)
    assert err.mean() < 0.02  # ~-40 dB FS on sine+noise
    assert err.max() > 0  # really re-quantized
    # deterministic
    assert _render_wav_ima_adpcm(8000, 2345, 13) == _render_wav_ima_adpcm(
        8000, 2345, 13
    )


def test_decode_audio_ima_adpcm_contracts():
    """Malformed IMA ADPCM WAVs raise ValueError (bad bits/sample,
    undersized block_align, out-of-range step index)."""
    from pg_cjk_parser_spark.ops.multimodal import (
        _render_wav_ima_adpcm,
        _riff_chunk,
        decode_audio,
    )

    def wav_of(bits, block_align, data):
        fmt = (
            (0x11).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + (8000).to_bytes(4, "little") + (4000).to_bytes(4, "little")
            + block_align.to_bytes(2, "little") + bits.to_bytes(2, "little")
        )
        body = b"WAVE" + _riff_chunk(b"fmt ", fmt) + _riff_chunk(b"data", data)
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    with pytest.raises(ValueError, match="4 bits"):
        decode_audio(wav_of(8, 256, b"\x00" * 8))
    with pytest.raises(ValueError, match="block_align"):
        decode_audio(wav_of(4, 2, b"\x00" * 8))
    with pytest.raises(ValueError, match="step index"):
        # header with index byte 99 > 88
        decode_audio(wav_of(4, 8, b"\x00\x00\x63\x00\x00\x00\x00\x00"))
    # good stream still decodes after the contract probes
    s, _ = decode_audio(_render_wav_ima_adpcm(8000, 600, 3))
    assert len(s) == 600


def test_ima_adpcm_stereo_decode():
    """Stereo IMA ADPCM: per-channel 4-byte headers then 4-byte
    interleaved nibble words; decode_audio mixes the two channels by
    mean.  Expected values computed per channel via the (audioop-
    verified) inner loop."""
    from pg_cjk_parser_spark.ops.multimodal import (
        _ima_decode_nibbles,
        _riff_chunk,
        decode_audio,
    )

    rng = np.random.default_rng(11)
    nib = {c: rng.integers(0, 16, 8).tolist() for c in (0, 1)}
    hdr = {0: (1000, 5), 1: (-2000, 30)}

    def pack(ns):
        return bytes((ns[i] & 0x0F) | (ns[i + 1] << 4)
                     for i in range(0, len(ns), 2))

    block = b"".join(
        int(hdr[c][0]).to_bytes(2, "little", signed=True)
        + bytes([hdr[c][1], 0]) for c in (0, 1)
    ) + pack(nib[0]) + pack(nib[1])  # one 4-byte word per channel
    fmt = (
        (0x11).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
        + len(block).to_bytes(2, "little") + (4).to_bytes(2, "little")
    )
    body = b"WAVE" + _riff_chunk(b"fmt ", fmt) + _riff_chunk(b"data", block)
    wav = b"RIFF" + len(body).to_bytes(4, "little") + body
    got, sr = decode_audio(wav)
    assert sr == 8000 and len(got) == 9  # header sample + 8 nibbles
    exp = {}
    for c in (0, 1):
        out, _, _ = _ima_decode_nibbles(nib[c], *hdr[c])
        exp[c] = [hdr[c][0]] + out
    want = (np.array(exp[0], float) + np.array(exp[1], float)) / 2 / (1 << 15)
    assert np.allclose(got, want)


def test_ima_adpcm_resource_bound():
    """A data chunk that would decode past the sample cap is rejected
    before the interpreted nibble loop runs."""
    from pg_cjk_parser_spark.ops.multimodal import (
        _IMA_MAX_SAMPLES,
        _riff_chunk,
        decode_audio,
    )

    # header claims a huge data chunk; only 8 real bytes follow, but
    # the bound must trip on the DECLARED size before decoding
    big = (_IMA_MAX_SAMPLES // 2) + 256
    fmt = (
        (0x11).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
        + (256).to_bytes(2, "little") + (4).to_bytes(2, "little")
    )
    data = b"\x00" * 4096  # actual bytes present
    body = (
        b"WAVE" + _riff_chunk(b"fmt ", fmt)
        + b"data" + big.to_bytes(4, "little") + data
    )
    wav = b"RIFF" + len(body).to_bytes(4, "little") + body
    # _wav_chunks clips payload to what is PRESENT; craft the present
    # bytes over the cap instead to trip the bound for real
    over = b"\x00" * (_IMA_MAX_SAMPLES // 2 + 512)
    body2 = b"WAVE" + _riff_chunk(b"fmt ", fmt) + _riff_chunk(b"data", over)
    wav2 = b"RIFF" + len(body2).to_bytes(4, "little") + body2
    with pytest.raises(ValueError, match="resource bound"):
        decode_audio(wav2)
    # the clipped small one just decodes
    s, _ = decode_audio(wav)
    assert len(s) > 0


def test_mjpeg_avi_dropped_frame_placeholder():
    """Zero-size frame chunks (the standard dropped-frame marker in
    capture AVIs) are skipped but still consume a frame index."""
    from pg_cjk_parser_spark.ops.multimodal import (
        _render_avi,
        decode_video_frames,
    )

    from pg_cjk_parser_spark.ops.multimodal import (
        _render_jpeg,
        _riff_chunk,
        _riff_list,
    )

    def u32(x):
        return int(x).to_bytes(4, "little")

    w, h = 16, 12
    strh = b"vids" + b"MJPG" + u32(0) * 10
    strf = b"".join([
        u32(40), u32(w), u32(h), (1).to_bytes(2, "little"),
        (24).to_bytes(2, "little"),
        u32(int.from_bytes(b"MJPG", "little")), u32(0), u32(0), u32(0),
        u32(0), u32(0),
    ])
    jpgs = [
        _render_jpeg(w, h, 7 + i, tables="annexk") for i in range(2)
    ]
    body = (
        b"AVI "
        + _riff_list(
            b"hdrl",
            _riff_chunk(b"avih", u32(0) * 14),
            _riff_list(b"strl", _riff_chunk(b"strh", strh),
                       _riff_chunk(b"strf", strf)),
        )
        + _riff_list(
            b"movi",
            _riff_chunk(b"00dc", b""),      # dropped-frame placeholder
            _riff_chunk(b"00dc", jpgs[0]),
            _riff_chunk(b"00dc", b""),      # another drop mid-stream
            _riff_chunk(b"00dc", jpgs[1]),
        )
    )
    avi = b"RIFF" + len(body).to_bytes(4, "little") + body
    frames = list(decode_video_frames(avi))
    assert [i for i, _ in frames] == [1, 3]  # drops consume slots 0, 2
    from pg_cjk_parser_spark.ops.multimodal import _decode_jpeg

    assert all(
        np.array_equal(f, _decode_jpeg(j))
        for (_, f), j in zip(frames, jpgs)
    )


def test_decode_audio_deep_pcm_and_float_wav():
    """24/32-bit integer PCM (via wave) and IEEE-float WAV (tag 3,
    via the fallback parser) decode with exact sample values."""
    import io
    import wave

    from pg_cjk_parser_spark.ops.multimodal import _riff_chunk, decode_audio

    def pcm_wav(sw, frames):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wv:
            wv.setnchannels(1)
            wv.setsampwidth(sw)
            wv.setframerate(8000)
            wv.writeframes(frames)
        return buf.getvalue()

    # 24-bit: values (+2^23-1, -2^23, +1) packed little-endian
    frames24 = (
        (0x7FFFFF).to_bytes(3, "little")
        + (0x800000).to_bytes(3, "little")  # -2^23 in two's complement
        + (1).to_bytes(3, "little")
    )
    s, sr = decode_audio(pcm_wav(3, frames24))
    assert sr == 8000
    assert s.tolist() == [(2**23 - 1) / 2**23, -1.0, 1 / 2**23]

    # 32-bit int
    frames32 = np.array([2**31 - 1, -(2**31), 0], "<i4").tobytes()
    s32, _ = decode_audio(pcm_wav(4, frames32))
    assert s32.tolist() == [(2**31 - 1) / 2**31, -1.0, 0.0]

    # IEEE float32 (tag 3), stereo mixdown + overdrive clamp
    def float_wav(bits, ch, data):
        fmt = (
            (3).to_bytes(2, "little") + ch.to_bytes(2, "little")
            + (8000).to_bytes(4, "little") + (32000).to_bytes(4, "little")
            + (4 * ch).to_bytes(2, "little") + bits.to_bytes(2, "little")
        )
        body = (
            b"WAVE" + _riff_chunk(b"fmt ", fmt) + _riff_chunk(b"data", data)
        )
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    f32 = np.array([0.5, -0.25, 1.5, float("nan")], "<f4").tobytes()
    sf_, _ = decode_audio(float_wav(32, 1, f32))
    assert sf_.tolist() == [0.5, -0.25, 1.0, 0.0]  # clamp + nan->0
    st, _ = decode_audio(
        float_wav(32, 2, np.array([0.5, -0.5, 0.25, 0.25], "<f4").tobytes())
    )
    assert st.tolist() == [0.0, 0.25]
    f64 = np.array([0.125, -0.125], "<f8").tobytes()
    s64, _ = decode_audio(float_wav(64, 1, f64))
    assert s64.tolist() == [0.125, -0.125]
    with pytest.raises(ValueError, match="32 or 64"):
        decode_audio(float_wav(16, 1, b"\x00\x00"))


def test_decode_tiff_roundtrip_all_configs():
    """Baseline TIFF decode against the renderer's known pixel
    arrays: both byte orders, gray/RGB, single/multi strip,
    uncompressed/PackBits."""
    from pg_cjk_parser_spark.ops.multimodal import (
        _luma,
        _render_tiff,
        decode_image,
    )

    for kw in (
        dict(),
        dict(rgb=False),
        dict(packbits=True),
        dict(big_endian=True),
        dict(rows_per_strip=3),
        dict(packbits=True, big_endian=True, rows_per_strip=2, rgb=False),
    ):
        t = _render_tiff(17, 11, 5, **kw)
        img = decode_image(t)
        spp = 3 if kw.get("rgb", True) else 1
        px = np.random.default_rng(5).integers(
            0, 256, size=(11, 17, spp), dtype=np.uint8
        )
        want = _luma(px) if spp == 3 else px[..., 0]
        assert np.array_equal(img, want), kw


def test_decode_tiff_packbits_semantics():
    """PackBits edge cases straight from the spec: -128 no-op,
    128-byte max runs, literal/repeat mixing; white-is-zero
    photometric inverts."""
    from pg_cjk_parser_spark.ops.multimodal import (
        _packbits_decode,
        _packbits_encode,
    )

    # spec example shapes
    assert _packbits_decode(bytes([0x80, 0x00, ord("A")]), 1) == b"A"
    assert _packbits_decode(bytes([257 - 128]) + b"x", 128) == b"x" * 128
    rng = np.random.default_rng(3)
    for _ in range(20):
        row = bytes(
            rng.choice([0, 1, 7], p=[0.5, 0.3, 0.2], size=rng.integers(1, 400))
            .astype(np.uint8)
        )
        assert _packbits_decode(_packbits_encode(row), len(row)) == row
    with pytest.raises(ValueError, match="truncated"):
        _packbits_decode(bytes([5, 1, 2]), 6)  # literal run cut short


def test_decode_tiff_contracts():
    """Unsupported TIFF variants raise NotImplementedError; malformed
    structures raise ValueError; photometric 0 inverts."""
    from pg_cjk_parser_spark.ops.multimodal import (
        _render_tiff,
        decode_image,
    )

    good = _render_tiff(8, 6, 1, rgb=False)

    def patch_tag(t, tag, word):
        # II layout: find the 12-byte entry for `tag` in the IFD and
        # overwrite its inline value word
        n = int.from_bytes(t[8:10], "little")
        out = bytearray(t)
        for e in range(n):
            lo = 10 + 12 * e
            if int.from_bytes(t[lo:lo + 2], "little") == tag:
                out[lo + 8:lo + 12] = word
                return bytes(out)
        raise AssertionError("tag not found")

    # JPEG-in-TIFF compression -> loud NotImplementedError (LZW is
    # SUPPORTED since round 5; a raw strip mislabeled as LZW is a
    # malformed stream, i.e. ValueError)
    with pytest.raises(NotImplementedError, match="compression 7"):
        decode_image(patch_tag(good, 259, (7).to_bytes(4, "little")))
    with pytest.raises(ValueError):
        decode_image(patch_tag(good, 259, (5).to_bytes(4, "little")))
    # planar config 2
    with pytest.raises(NotImplementedError, match="planar"):
        decode_image(patch_tag(good, 284, (2).to_bytes(4, "little")))
    # photometric 0 = white-is-zero inverts
    inv = decode_image(patch_tag(good, 262, (0).to_bytes(4, "little")))
    assert np.array_equal(inv, 255 - decode_image(good))
    # truncated strip data
    with pytest.raises(ValueError):
        decode_image(good[:-10])
    # absurd dimensions trip the resource bound
    with pytest.raises(ValueError, match="megapixel"):
        decode_image(patch_tag(good, 256, (1 << 26).to_bytes(4, "little")))
    # zero entries
    with pytest.raises(ValueError):
        decode_image(b"II*\x00" + (8).to_bytes(4, "little")
                     + (0).to_bytes(2, "little") + b"\x00" * 4)


def test_decode_tiff_adversarial_resource_and_count0():
    """Review regressions: a huge SamplesPerPixel must not bypass the
    pixel cap (decoded BYTES are bounded), and count=0 tags raise
    ValueError, not IndexError."""
    from pg_cjk_parser_spark.ops.multimodal import _render_tiff, decode_image

    good = _render_tiff(8, 6, 1, rgb=False)

    def patch(t, tag, *, count=None, value=None):
        n = int.from_bytes(t[8:10], "little")
        out = bytearray(t)
        for e in range(n):
            lo = 10 + 12 * e
            if int.from_bytes(t[lo:lo + 2], "little") == tag:
                if count is not None:
                    out[lo + 4:lo + 8] = count.to_bytes(4, "little")
                if value is not None:
                    out[lo + 8:lo + 12] = value.to_bytes(4, "little")
                return bytes(out)
        raise AssertionError("tag not found")

    # spp=65535 with small w/h: pixel cap passes, byte bound must trip
    with pytest.raises(ValueError, match="SamplesPerPixel|MiB"):
        decode_image(patch(good, 277, value=65535))
    # moderate spp that passes the sanity range but overflows bytes
    big_dims = patch(patch(good, 256, value=1 << 13), 257, value=1 << 12)
    with pytest.raises(ValueError, match="MiB"):
        decode_image(patch(big_dims, 277, value=8))
    # count=0 on required and defaulted tags: ValueError, never IndexError
    for tag in (256, 262, 277, 258):
        with pytest.raises(ValueError, match="count 0|BitsPerSample"):
            decode_image(patch(good, tag, count=0))


@pytest.fixture(scope="session")
def tiff_ref_helper(tmp_path_factory):
    """Compile the libtiff reference helper (hand-declared public-ABI
    prototypes linked directly against the system libtiff.so.N - the
    container ships the library but not the dev headers); skip when
    gcc or the library is unavailable."""
    import glob as _glob
    import shutil as _shutil
    import subprocess

    if not _shutil.which("gcc"):
        pytest.skip("no gcc")
    libs = sorted(
        _glob.glob("/usr/lib/*/libtiff.so*")
        + _glob.glob("/usr/lib/libtiff.so*")
    )
    if not libs:
        pytest.skip("no libtiff")
    exe = tmp_path_factory.mktemp("tiffref") / "tiff_ref_helper"
    import os as _os

    src = _os.path.join(_os.path.dirname(__file__), "tiff_ref_helper.c")
    r = subprocess.run(
        ["gcc", "-O2", "-o", str(exe), src, libs[0]], capture_output=True
    )
    if r.returncode != 0:
        pytest.skip(f"libtiff link failed: {r.stderr.decode()[:200]}")
    return str(exe)


def test_decode_tiff_libtiff_cross_check(tiff_ref_helper, tmp_path):
    """Bidirectional cross-check against REAL libtiff: (a) libtiff-
    encoded streams (none/LZW/LZW+predictor/PackBits, gray and RGB,
    multi-strip) decode to the exact source samples; (b) libtiff
    reads back our renderer's TIFFs sample-identical."""
    import subprocess

    from pg_cjk_parser_spark.ops.multimodal import (
        _luma,
        _render_tiff,
        decode_image,
    )

    rng = np.random.default_rng(7)
    f = str(tmp_path / "t.tif")

    # (a) libtiff encoder -> our decoder
    for spp, comp, pred in (
        (1, 1, 1), (3, 1, 1),
        (1, 5, 1), (3, 5, 1), (1, 5, 2), (3, 5, 2),
        (1, 8, 1), (3, 8, 1), (3, 8, 2),  # deflate (+predictor)
        (1, 32773, 1), (3, 32773, 1),
    ):
        w, h = 23, 14
        px = rng.integers(0, 256, (h, w, spp), dtype=np.uint8)
        p = subprocess.run(
            [tiff_ref_helper, "encode", f, str(w), str(h), str(spp),
             str(comp), str(pred)],
            input=px.tobytes(),
            capture_output=True,
        )
        assert p.returncode == 0, (spp, comp, pred, p.stderr)
        img = decode_image(open(f, "rb").read())
        want = _luma(px) if spp == 3 else px[..., 0]
        assert np.array_equal(img, want), (spp, comp, pred)

    # also a low-entropy image (long runs exercise deep LZW tables)
    tiles = np.repeat(np.repeat(
        rng.integers(0, 4, (4, 6), dtype=np.uint8) * 80, 8, 0), 8, 1)
    p = subprocess.run(
        [tiff_ref_helper, "encode", f, "48", "32", "1", "5", "1"],
        input=tiles.tobytes(),
        capture_output=True,
    )
    assert p.returncode == 0, p.stderr
    assert np.array_equal(decode_image(open(f, "rb").read()), tiles)

    # (b) our renderer -> libtiff
    for kw in (dict(rgb=False), dict(packbits=True), dict(big_endian=True),
               dict(rows_per_strip=3)):
        data = _render_tiff(17, 11, 5, **kw)
        open(f, "wb").write(data)
        p = subprocess.run(
            [tiff_ref_helper, "decode", f], capture_output=True
        )
        assert p.returncode == 0, (kw, p.stderr)
        hdr, raw = p.stdout.split(b"\n", 1)
        w, h, spp = map(int, hdr.split())
        assert (w, h) == (17, 11), kw
        ref = np.frombuffer(raw, np.uint8, h * w * spp).reshape(h, w, spp)
        want = _luma(ref) if spp == 3 else ref[..., 0]
        assert np.array_equal(decode_image(data), want), kw


def test_tiff_lzw_contracts():
    """LZW stream contracts: truncated stream, code-beyond-table, and
    bad first code all raise ValueError; deferred clears reset the
    table mid-stream."""
    from pg_cjk_parser_spark.ops.multimodal import _tiff_lzw_decode

    def pack_msb(codes, widths):
        acc = nb = 0
        out = bytearray()
        for c, w in zip(codes, widths):
            acc = (acc << w) | c
            nb += w
            while nb >= 8:
                nb -= 8
                out.append((acc >> nb) & 0xFF)
        if nb:
            out.append((acc << (8 - nb)) & 0xFF)
        return bytes(out)

    # Clear, 'A', 'B', Clear, 'C', EOI -> b'ABC' (mid-stream reset)
    s = pack_msb([256, 65, 66, 256, 67, 257], [9] * 6)
    assert _tiff_lzw_decode(s, 3) == b"ABC"
    # KwKwK: Clear, 'A', 258 (= 'AA'), EOI
    s = pack_msb([256, 65, 258, 257], [9] * 4)
    assert _tiff_lzw_decode(s, 3) == b"AAA"
    with pytest.raises(ValueError, match="beyond table"):
        _tiff_lzw_decode(pack_msb([256, 65, 300, 257], [9] * 4), 5)
    with pytest.raises(ValueError, match="first"):
        _tiff_lzw_decode(pack_msb([256, 300, 257], [9] * 3), 2)
    with pytest.raises(ValueError, match="truncated"):
        _tiff_lzw_decode(pack_msb([256, 65], [9, 9]), 10)


@pytest.fixture(scope="session")
def webp_ref_helper(tmp_path_factory):
    """Compile the libwebp reference helper (hand-declared public-ABI
    prototypes linked against the system libwebp.so.N); skip when gcc
    or the library is unavailable."""
    import glob as _glob
    import shutil as _shutil
    import subprocess

    if not _shutil.which("gcc"):
        pytest.skip("no gcc")
    libs = sorted(
        _glob.glob("/usr/lib/*/libwebp.so*")
        + _glob.glob("/usr/lib/libwebp.so*")
    )
    if not libs:
        pytest.skip("no libwebp")
    exe = tmp_path_factory.mktemp("webpref") / "webp_ref_helper"
    import os as _os

    src = _os.path.join(_os.path.dirname(__file__), "webp_ref_helper.c")
    r = subprocess.run(
        ["gcc", "-O2", "-o", str(exe), src, libs[0]], capture_output=True
    )
    if r.returncode != 0:
        pytest.skip(f"libwebp link failed: {r.stderr.decode()[:200]}")
    return str(exe)


def test_decode_webp_libwebp_cross_check(webp_ref_helper):
    """VP8L decode against REAL libwebp-lossless-encoded streams:
    every image class the encoder's transform chooser reaches
    (palette incl. sub-byte bundling, predictor+cross-color,
    subtract-green, LZ77 over the 2D distance map, color cache,
    multi-group meta-huffman).  The referee is libwebp's own decode
    (default lossless encoding may rewrite RGB under alpha=0, so the
    source array is not the ground truth)."""
    import subprocess

    from pg_cjk_parser_spark.ops.multimodal import _luma, decode_image

    def enc(rgba):
        h, w = rgba.shape[:2]
        p = subprocess.run(
            [webp_ref_helper, "encode", str(w), str(h)],
            input=rgba.tobytes(),
            capture_output=True,
        )
        assert p.returncode == 0, p.stderr
        return p.stdout

    def refdec(webp):
        q = subprocess.run(
            [webp_ref_helper, "decode"], input=webp, capture_output=True
        )
        assert q.returncode == 0, q.stderr
        hdr, raw = q.stdout.split(b"\n", 1)
        w, h = map(int, hdr.split())
        return np.frombuffer(raw, np.uint8, h * w * 4).reshape(h, w, 4)

    def check(rgba, label):
        webp = enc(rgba)
        want = _luma(refdec(webp)[..., :3])
        got = decode_image(webp)
        assert np.array_equal(got, want), label

    rng = np.random.default_rng(7)
    solid = np.zeros((10, 12, 4), np.uint8)
    solid[...] = [10, 200, 30, 255]
    check(solid, "solid")

    # the shape that exposed the Select-predictor bug during
    # development: 3 meta-huffman groups + 1-bit color cache +
    # predictor/cross-color over a smooth/noisy split
    yy, xx = np.mgrid[0:120, 0:160]
    photo = np.zeros((120, 160, 4), np.uint8)
    photo[..., 0] = (xx * 2 + yy + rng.integers(0, 32, (120, 160))) % 256
    photo[..., 1] = (xx + yy * 3 + rng.integers(0, 16, (120, 160))) % 256
    photo[..., 2] = (
        (xx * xx // 64 + yy) // 2 + rng.integers(0, 8, (120, 160))
    ) % 256
    photo[..., 3] = 255
    photo[60:, :, :3] = rng.integers(0, 256, (60, 160, 3))
    check(photo, "meta-huffman mixed")

    # structured fuzz over the encoder's transform space
    for i in range(15):
        r = np.random.default_rng(100 + i)
        h, w = int(r.integers(5, 70)), int(r.integers(5, 90))
        kind = i % 5
        im = np.zeros((h, w, 4), np.uint8)
        im[..., 3] = 255
        if kind == 0:  # full noise + alpha noise
            im[..., :3] = r.integers(0, 256, (h, w, 3))
            im[..., 3] = r.integers(0, 256, (h, w))
        elif kind == 1:  # small palettes (bundling paths)
            cols = r.integers(0, 256, (int(r.integers(2, 17)), 3))
            im[..., :3] = cols[r.integers(0, len(cols), (h, w))]
        elif kind == 2:  # gradients (predictor/cross-color)
            y2, x2 = np.mgrid[0:h, 0:w]
            for c in range(3):
                im[..., c] = (
                    x2 * int(r.integers(1, 5)) + y2 * int(r.integers(1, 5))
                    + r.integers(0, 12, (h, w))
                ) % 256
        elif kind == 3:  # tiled (LZ77 distance codes)
            th, tw = int(r.integers(2, 9)), int(r.integers(2, 9))
            tile = r.integers(0, 256, (th, tw, 3))
            im[..., :3] = np.tile(
                tile, (h // th + 1, w // tw + 1, 1)
            )[:h, :w]
        else:  # repeated rows (vertical distances)
            rows = r.integers(0, 256, (4, w, 3))
            im[..., :3] = rows[r.integers(0, 4, h)]
        check(im, f"fuzz{i}")


def test_decode_webp_contracts():
    """Lossy VP8 raises NotImplementedError; malformed VP8L payloads
    raise ValueError."""
    from pg_cjk_parser_spark.ops.multimodal import decode_image

    def riff(fourcc, payload):
        chunk = fourcc + len(payload).to_bytes(4, "little") + payload
        body = b"WEBP" + chunk
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    with pytest.raises(NotImplementedError, match="lossy"):
        decode_image(riff(b"VP8 ", b"\x00" * 20))
    with pytest.raises(NotImplementedError, match="animated"):
        decode_image(riff(b"ANIM", b"\x00" * 6))
    with pytest.raises(ValueError, match="signature"):
        decode_image(riff(b"VP8L", b"\x00" * 8))
    with pytest.raises(ValueError, match="truncated"):
        decode_image(riff(b"VP8L", b"\x2f\x10\x00"))  # header cut short
    with pytest.raises(ValueError):  # no VP8L chunk at all
        decode_image(riff(b"ALPH", b"\x00" * 4))
    # absurd dims: 16383x16383 > 67 MP bound (14-bit max each)
    hdr = 0x3FFF | (0x3FFF << 14)
    payload = b"\x2f" + hdr.to_bytes(4, "little")
    with pytest.raises(ValueError, match="megapixel"):
        decode_image(riff(b"VP8L", payload))


def test_render_webp_minimal_encoder(webp_ref_helper):
    """The hand-built VP8L streams from _render_webp are REAL webp:
    accepted by libwebp and decoded identically by both decoders."""
    import subprocess

    from pg_cjk_parser_spark.ops.multimodal import (
        _luma,
        _render_webp,
        decode_image,
    )

    for w, h, seed in ((19, 13, 42), (16, 12, 7), (33, 21, 3)):
        webp = _render_webp(w, h, seed)
        mine = decode_image(webp)
        q = subprocess.run(
            [webp_ref_helper, "decode"], input=webp, capture_output=True
        )
        assert q.returncode == 0, q.stderr
        hdr, raw = q.stdout.split(b"\n", 1)
        rw, rh = map(int, hdr.split())
        assert (rw, rh) == (w, h)
        ref = np.frombuffer(raw, np.uint8, h * w * 4).reshape(h, w, 4)
        assert np.array_equal(mine, _luma(ref[..., :3]))
        assert len(np.unique(mine)) == 2  # really two-color
    assert _render_webp(19, 13, 42) == _render_webp(19, 13, 42)
