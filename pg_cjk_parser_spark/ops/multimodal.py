"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are treated as ``binary`` columns with metadata
structs; the Spark-side plumbing (schemas, Arrow batch shapes,
partition-friendly mapInPandas transforms) is real and tested, while
actual media codecs are stubbed: this container has no image/audio
libraries, so decode is a clearly-marked deterministic fake behind
``use_fake_decoder`` and raises ``NotImplementedError`` otherwise.

``html_to_text`` is fully real: it extracts indexable text from HTML
bytes with the tokenizer kernel (tags stripped, <script>/<style>
bodies suppressed), i.e. the same byte-identical extraction the
full-text pipeline guarantees per url.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..kernel.fsm import SPACE_T, TAG_T
from ..kernel.tokenizer import tokenize

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "sample_rate int, n_frames int"
)


def html_to_text(docs: DataFrame, html_col: str = "html", out_col: str = "text_extracted") -> DataFrame:
    """Extract visible text from HTML bytes (tags/script/style dropped)."""

    def gen(batches):
        for pdf in batches:
            outs = []
            for raw in pdf[html_col].tolist():
                if raw is None:
                    outs.append(None)
                    continue
                s = bytes(raw).decode("utf-8", "replace")
                outs.append(_visible_text(s))
            pdf = pdf.copy()
            pdf[out_col] = outs
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    ) + f", {out_col} string"
    return docs.mapInPandas(gen, schema)


def _visible_text(s: str) -> str:
    """Byte-faithful visible text: the source minus tag spans and
    script/style bodies.  Token spans are merged (CJK 2-grams, url and
    hyphenated-word composites overlap their parts) so nothing is
    duplicated; inter-word blanks survive verbatim."""
    segs: list[list[int]] = []
    skip = False
    for st, ln, tt in tokenize(s):
        if tt == TAG_T:
            tl = s[st : st + ln].lower()
            if tl.startswith(("<script", "<style")):
                skip = True
            elif tl.startswith(("</script", "</style")):
                skip = False
            continue
        if skip or ln == 0:
            continue
        end = st + ln
        if segs and st <= segs[-1][1]:
            if end > segs[-1][1]:
                segs[-1][1] = end
        else:
            segs.append([st, end])
    return "".join(s[a:b] for a, b in segs).strip()


def _fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decoder: derives a (h, w) uint8 'image' from
    the payload digest so downstream plumbing is testable offline."""
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def image_features(
    media: DataFrame,
    use_fake_decoder: bool = False,
    resize_to: tuple[int, int] = (8, 8),
) -> DataFrame:
    """Decode -> resize -> mean/std + tiny thumbnail-hash features.

    Arrow-batched mapInPandas over binary payloads; the decode step is
    a deterministic fake (or NotImplementedError) - the real codec is
    the only missing piece, the distributed plumbing is complete.
    """

    rh, rw = resize_to

    def gen(batches):
        for pdf in batches:
            ids, means, stds, phash = [], [], [], []
            for mid, kind, payload, w, h in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"],
                pdf["width"], pdf["height"],
            ):
                if kind != "image":
                    continue
                if not use_fake_decoder:
                    raise NotImplementedError(
                        "real image codecs unavailable in this environment; "
                        "pass use_fake_decoder=True for the deterministic stub"
                    )
                img = _fake_decode_image(bytes(payload), int(w), int(h))
                # box-resample resize to (rh, rw)
                ys = np.linspace(0, img.shape[0], rh + 1).astype(int)
                xs = np.linspace(0, img.shape[1], rw + 1).astype(int)
                small = np.array(
                    [
                        [
                            img[ys[i]: max(ys[i + 1], ys[i] + 1),
                                xs[j]: max(xs[j + 1], xs[j] + 1)].mean()
                            for j in range(rw)
                        ]
                        for i in range(rh)
                    ]
                )
                bits = (small > small.mean()).flatten()
                ph = int(
                    (bits.astype(np.uint64) << np.arange(bits.size, dtype=np.uint64)).sum()
                )
                ids.append(mid)
                means.append(float(img.mean()))
                stds.append(float(img.std()))
                phash.append(ph - (1 << 64) if ph >= (1 << 63) else ph)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "mean_intensity": pd.Series(means, dtype="float64"),
                    "std_intensity": pd.Series(stds, dtype="float64"),
                    "phash": pd.Series(phash, dtype="int64"),
                }
            )

    return media.mapInPandas(
        gen,
        "media_id long, mean_intensity double, std_intensity double, phash long",
    )


def audio_features(
    media: DataFrame,
    use_fake_decoder: bool = False,
    frame_ms: int = 25,
) -> DataFrame:
    """Decode -> per-clip loudness/zero-crossing features for audio
    rows: (media_id, duration_s, rms, zcr).  Same contract as
    image_features: Arrow-batched mapInPandas plumbing is real, the
    PCM decode is a deterministic fake (or NotImplementedError) since
    this environment ships no audio codecs."""

    def gen(batches):
        for pdf in batches:
            ids, durs, rmss, zcrs = [], [], [], []
            for mid, kind, payload, sr in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"],
                pdf["sample_rate"],
            ):
                if kind != "audio":
                    continue
                if not use_fake_decoder:
                    raise NotImplementedError(
                        "real audio codecs unavailable in this environment; "
                        "pass use_fake_decoder=True for the deterministic stub"
                    )
                sr = int(sr) or 16000
                seed = int.from_bytes(bytes(payload)[:8].ljust(8, b"\0"), "little")
                rng = np.random.default_rng(seed ^ 0xA0D10)
                n_samples = sr // 4 + (seed % sr)  # 0.25-1.25 s fake clip
                pcm = rng.integers(
                    -(1 << 15), 1 << 15, size=n_samples, dtype=np.int32
                ).astype(np.float64) / (1 << 15)
                ids.append(mid)
                durs.append(n_samples / sr)
                rmss.append(float(np.sqrt(np.mean(pcm * pcm))))
                zcrs.append(
                    float((np.signbit(pcm[1:]) != np.signbit(pcm[:-1])).mean())
                )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "duration_s": pd.Series(durs, dtype="float64"),
                    "rms": pd.Series(rmss, dtype="float64"),
                    "zcr": pd.Series(zcrs, dtype="float64"),
                }
            )

    return media.mapInPandas(
        gen, "media_id long, duration_s double, rms double, zcr double"
    )


def frame_sample(
    media: DataFrame, every_n: int = 10, use_fake_decoder: bool = False
) -> DataFrame:
    """Sample every-nth frame index from video rows (metadata-driven;
    frame decode itself is the stubbed step)."""
    v = media.where(F.col("kind") == "video")
    if not use_fake_decoder:
        # plumbing-only path: emit the frame indices to be decoded
        return v.select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    raise NotImplementedError("no video codec in this environment")


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table in MEDIA_SCHEMA shape."""
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].tolist()
            rows = []
            for i in ids:
                kind = ("image", "audio", "video")[i % 3]
                payload = (i * 2654435761 + seed).to_bytes(8, "little") * 4
                rows.append(
                    (
                        i, kind, payload,
                        32 + (i % 32), 32 + (i % 16),
                        16000 if kind == "audio" else 0,
                        120 if kind == "video" else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "width", "height",
                    "sample_rate", "n_frames",
                ],
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)
