"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed via Arrow-batched ``mapInPandas``.

Decode backends, in order: Pillow when importable (full format
coverage; absent in this container), the vendored pure-stdlib codecs —
``minipng`` (8-bit grayscale PNG), ``miniwav`` (16-bit PCM WAV),
``minivid`` (8-bit grayscale raw-frame video) — each a REAL
pixel/sample decode exercised in CI, and the deterministic
``fake=True`` stub for everything else (``fake=False`` on an
undecodable payload raises ``NotImplementedError`` so a silent
fallback can't masquerade as a real decode; general-format video
decode would need ffmpeg/PyAV behind the same row contracts).

Scale notes: binary payloads should be size-capped per row group
(``spark.sql.files.maxPartitionBytes``) so a partition of blobs fits
executor memory; feature extraction is embarrassingly parallel map-only.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal column bundle: payload + typed metadata
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("mime", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def _fake_feature(payload: bytes) -> list:
    """Deterministic fake featurizer: sha256 of the payload's hex encoding
    → FEATURE_DIM floats. Hashing the hex string (rather than the raw
    bytes) keeps the stub reproducible from any engine whose sha256 only
    accepts text (the DuckDB oracle re-derives these features in SQL)."""
    digest = hashlib.sha256((payload or b"").hex().encode()).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def _try_pil():
    try:
        from PIL import Image  # noqa: F401
        return Image
    except ImportError:
        return None


def _pil_feature(payload: bytes) -> list:
    """Real decode path (used when Pillow is importable): decode, convert
    to grayscale, resize to 4×4 mean-pooled pixels → FEATURE_DIM floats
    in [0, 1]. Deterministic for a given image."""
    import io

    Image = _try_pil()
    img = Image.open(io.BytesIO(payload)).convert("L")
    side = 4  # 4×4 = FEATURE_DIM
    # BOX resampling = area mean — matches the minipng mean_pool
    # backend, so the same image featurizes identically with or
    # without Pillow installed (bicubic default diverged)
    img = img.resize((side, side), resample=Image.Resampling.BOX)
    return [p / 255.0 for p in list(img.getdata())][:FEATURE_DIM]


def _mini_feature(payload: bytes) -> list:
    """Real decode without Pillow, for the 8-bit grayscale PNG subset:
    vendored pure-stdlib codec (minipng) + 4×4 mean-pool."""
    from . import minipng

    w, h, px = minipng.decode_gray(payload)
    return minipng.mean_pool(px, w, h, 4)[:FEATURE_DIM]


def decode_image(payload: bytes, fake: bool = False):
    """Decode an image payload to a FEATURE_DIM feature vector.

    Uses Pillow when importable (optional dependency — absent in this
    container); without Pillow, 8-bit grayscale PNGs still decode for
    real via the vendored pure-stdlib codec (``minipng``). Anything
    else: ``fake=True`` selects the deterministic stub, ``fake=False``
    raises so a silent fallback can't masquerade as a real decode."""
    if fake:
        return _fake_feature(payload)
    if _try_pil() is not None:
        return _pil_feature(payload)
    if payload is not None and bytes(payload[:8]) == b"\x89PNG\r\n\x1a\n":
        return _mini_feature(payload)
    raise NotImplementedError(
        "image decode requires Pillow for non-PNG payloads "
        "(pip install pillow); pass fake=True for the deterministic stub"
    )


def extract_features(df, fake: bool = True):
    """``mapInPandas`` feature extraction over media rows.

    Arrow-batched: each pandas batch holds whole payloads; the UDF is the
    only Python hop in the pipeline (unavoidable for codec work).

    With ``fake=False`` a payload the real decode stack rejects
    (non-PNG without Pillow, corrupt stream) yields a NULL feature row
    — the same junk→NULL contract as :func:`audio_features`, so mixed
    corpora are filterable downstream instead of failing the job on the
    first bad blob. ``decode_image`` itself still raises, so single-
    payload callers keep the honest no-codec error.
    """

    def _extract(batches):
        for pdf in batches:
            out = pdf[["media_id", "mime"]].copy()
            out["n_bytes"] = pdf["payload"].map(
                lambda p: len(p) if p is not None else 0
            )

            def _decode(p):
                if fake:
                    return decode_image(p, fake=True)
                try:
                    return decode_image(p, fake=False)
                except Exception:
                    return None

            out["feature"] = pdf["payload"].map(_decode)
            yield out

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def resize_images(df, width, height, fake=True):
    """``mapInPandas`` image resize: decode → resize → re-encode per
    payload, Arrow-batched (the standard multimodal preprocessing hop).

    With Pillow importable and ``fake=False`` the pixels are really
    resampled and re-encoded as PNG; the ``fake`` path passes the
    payload through and rewrites only the metadata, keeping the
    Spark-side plumbing (schema, batch shape, partition sizing)
    identical so pipelines are testable without codec libs."""

    def _resize(batches):
        import pandas as pd

        for pdf in batches:
            out = pdf[["media_id", "mime"]].copy()
            if fake:
                out["payload"] = pdf["payload"]
            elif _try_pil() is not None:
                import io

                Image = _try_pil()

                def _do(p):
                    img = Image.open(io.BytesIO(p)).resize((width, height))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    return buf.getvalue()

                out["payload"] = pdf["payload"].map(_do)
            else:
                # no Pillow: real resample for the grayscale-PNG subset
                # via the vendored codec; anything else raises
                from . import minipng

                def _do_mini(p):
                    if bytes(p[:8]) != minipng.SIGNATURE:
                        raise NotImplementedError(
                            "image resize requires Pillow for non-PNG "
                            "payloads; pass fake=True for the "
                            "metadata-only stub"
                        )
                    w, h, px = minipng.decode_gray(p)
                    return minipng.encode_gray(
                        minipng.resize_nearest(px, w, h, width, height),
                        width, height,
                    )

                out["payload"] = pdf["payload"].map(_do_mini)
            out["width"] = width
            out["height"] = height
            yield pd.DataFrame(
                out, columns=["media_id", "payload", "mime", "width",
                              "height"]
            )

    return df.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def frame_sample(df, every_ms=1000):
    """Video frame sampling PLAN from declared metadata: explode sample
    timestamps per media row without touching the payload — the
    zero-decode shape for scheduling/estimating frame work. One row per
    (media, frame_ts). For payloads in the vendored MVID format,
    :func:`video_frame_features` runs the REAL decode counterpart."""
    import math as _math

    # same contract as video_frame_features: every_ms=0 would divide
    # to NULL inside the plan and silently emit ZERO rows per media
    if not (_math.isfinite(every_ms) and every_ms >= 1.0):
        raise ValueError(
            "every_ms must be a finite number >= 1.0 (milliseconds), "
            "got %r" % (every_ms,))
    n_frames = (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast(
        "int"
    )
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
        ).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)


VIDEO_FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("fps", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_ts_ms", T.DoubleType()),
    T.StructField("brightness", T.DoubleType()),
    T.StructField("motion", T.DoubleType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def video_frame_features(df, every_ms=1000, payload_col="payload",
                         id_col="media_id"):
    """REAL video frame sampling + decode over MVID payloads (the
    vendored :mod:`minivid` codec) — the decode counterpart of
    :func:`frame_sample`'s metadata-only plan, completing the
    image/audio/video decode matrix with real pixels on all three.

    Per payload: decode once inside one Arrow-batched ``mapInPandas``
    hop, then emit one row per SAMPLED frame — sample timestamps are
    ``k * every_ms`` and each maps to ``frame_idx = floor(ts * fps /
    1000)``, stopping at the stream's end. Each sampled frame yields
    mean brightness in [0, 1], motion (mean |Δpixel| vs the PREVIOUS
    sampled frame, NULL for the first — the cheap scene-change /
    static-clip signal), and a 4×4 mean-pooled FEATURE_DIM vector (the
    same pooling as the image path, so image and video features share
    an embedding space for cross-modal dedup). Non-MVID / truncated
    payloads yield a single NULL row (the junk→NULL contract of
    :func:`audio_features` / :func:`extract_features`).

    An empty-but-valid stream (``n_frames=0``) yields one row with the
    header metadata and NULL frame fields — the media_id never
    silently vanishes (the audio path's empty-payload precedent).

    Scale: map-only; per-task memory is one Arrow batch of payloads
    plus one decoded frame list. Real deployments swap the codec call
    for ffmpeg/PyAV behind the same row contract."""
    import numpy as np
    import pandas as pd

    from . import minipng, minivid

    import math as _math

    # finite AND >= 1ms: NaN/0/negative fail the comparison; inf would
    # make ts = 0*inf = NaN inside the executor loop (opaque task
    # failure); a denormal-small positive needs ~duration/every_ms
    # iterations per payload — the same effective hang as the fps=0
    # shape this contract exists to refuse. Sampling finer than 1 ms
    # (>1000 samples/s) is out of contract.
    if not (_math.isfinite(every_ms) and every_ms >= 1.0):
        raise ValueError(
            "every_ms must be a finite number >= 1.0 (milliseconds), "
            "got %r" % (every_ms,))

    def _extract(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    w, h, fps, frames = minivid.decode_gray_video(
                        bytes(payload) if payload is not None else b""
                    )
                except (ValueError, TypeError):
                    rows.append((int(mid), None, None, None, None,
                                 None, None, None, None, None))
                    continue
                if not frames:
                    rows.append((int(mid), w, h, fps, 0, None,
                                 None, None, None, None))
                    continue
                prev = None
                k = 0
                while True:
                    ts = float(k * every_ms)
                    fi = int(ts * fps // 1000)
                    if fi >= len(frames):
                        break
                    px = np.frombuffer(frames[fi], dtype=np.uint8)
                    bright = float(px.mean() / 255.0) if len(px) else 0.0
                    motion = None
                    if prev is not None:
                        motion = float(np.abs(
                            px.astype(np.int16) - prev.astype(np.int16)
                        ).mean() / 255.0)
                    feat = minipng.mean_pool(
                        frames[fi], w, h, 4)[:FEATURE_DIM]
                    rows.append((int(mid), w, h, fps, len(frames), fi,
                                 ts, bright, motion,
                                 [float(v) for v in feat]))
                    prev = px
                    k += 1
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_FRAME_SCHEMA]
            )

    return df.mapInPandas(_extract, schema=VIDEO_FRAME_SCHEMA)


#: make_fake_video geometry/rate
FAKE_VIDEO_SIDE = 16
FAKE_VIDEO_FPS = 4


def fake_video_pixels(i, f, side=FAKE_VIDEO_SIDE):
    """Deterministic per-frame gradient pixels for fake-video row ``i``
    frame ``f`` — the closed-form spec an independent oracle can
    recompute (the video twin of :func:`fake_media_pixels`; the ``f``
    term makes consecutive frames differ, so motion is non-zero)."""
    return bytes(
        (13 * i + 5 * x + 7 * y + 11 * f + ((x * y) >> 2)) % 256
        for y in range(side) for x in range(side)
    )


def make_fake_video(spark, n=40, seed=42):
    """Deterministic synthetic video table: REAL MVID payloads
    (vendored minivid codec) with a closed-form per-frame gradient
    spec — ``n_frames = 4 + (i % 5)`` at ``FAKE_VIDEO_FPS``; every 7th
    row a non-video payload for the junk→NULL contract."""
    from . import minivid

    rows = []
    for i in range(n):
        if i % 7 == 3:
            payload = hashlib.sha256(b"vjunk-%d-%d" % (seed, i)).digest()
            rows.append((i, bytearray(payload), "application/junk",
                         None, None, None))
            continue
        side, fps = FAKE_VIDEO_SIDE, FAKE_VIDEO_FPS
        n_frames = 4 + (i % 5)
        frames = [fake_video_pixels(i, f) for f in range(n_frames)]
        payload = minivid.encode_gray_video(frames, side, side, fps)
        rows.append((i, bytearray(payload), "video/x-mvid", side, side,
                     1000 * n_frames // fps))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


#: make_fake_media image geometry (square)
FAKE_MEDIA_SIDE = 32


def fake_media_pixels(i, side=FAKE_MEDIA_SIDE):
    """Deterministic gradient pixels for fake-media row ``i`` — the
    closed-form spec an independent oracle can recompute (the image
    twin of make_fake_audio's sine formulas)."""
    return bytes(
        (13 * i + 5 * x + 7 * y + ((x * y) >> 2)) % 256
        for y in range(side) for x in range(side)
    )


def make_fake_media(spark, n=100, seed=42):
    """Deterministic synthetic media table: REAL 8-bit grayscale PNG
    payloads (vendored minipng codec) with a closed-form gradient
    pixel spec, plus every 7th row a non-image payload to exercise the
    junk→NULL contract — the image twin of :func:`make_fake_audio`
    (which got this real-payload upgrade in r7; this caught up in
    r8)."""
    from . import minipng

    rows = []
    for i in range(n):
        if i % 7 == 3:
            payload = hashlib.sha256(b"junk-%d-%d" % (seed, i)).digest()
            rows.append((i, bytearray(payload), "application/junk",
                         None, None, None))
            continue
        side = FAKE_MEDIA_SIDE
        payload = minipng.encode_gray(fake_media_pixels(i), side, side)
        rows.append((i, bytearray(payload), "image/png", side, side,
                     1000 * (i % 7)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_neardup_pairs(df, threshold=0.99, n_planes=8, seed=42,
                        fake=True):
    """Near-duplicate media detection: decode → feature vector →
    banded hyperplane-LSH cosine pairs — the image-dedup step of a
    multimodal pipeline, composed from the existing pieces
    (extract_features + dedup.embedding_dedup_pairs), so the pair
    search never materializes the O(n²) space and the only Python is
    the Arrow-batched codec hop.

    Returns (id_a, id_b, cos_sim) over media_id."""
    from .dedup import embedding_dedup_pairs

    feats = extract_features(df, fake=fake).select(
        "media_id", F.col("feature").cast("array<float>").alias("feature")
    )
    return embedding_dedup_pairs(
        feats, vec_col="feature", id_col="media_id", dim=FEATURE_DIM,
        threshold=threshold, n_planes=n_planes, seed=seed,
    )


AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("duration_ms", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.DoubleType()),
    T.StructField("zcr", T.DoubleType()),
    T.StructField("frame_rms", T.ArrayType(T.DoubleType())),
])


def audio_features(df, frame_ms=25, payload_col="payload",
                   id_col="media_id"):
    """REAL audio feature extraction over 16-bit PCM WAV payloads —
    the audio leg of the multimodal family, decoded by the vendored
    :mod:`miniwav` codec (no external audio libs needed) and reduced
    with numpy inside one Arrow-batched ``mapInPandas`` hop.

    Per payload: sample_rate / n_channels / duration_ms from the
    header, global RMS and peak (float samples normalized to [-1, 1]),
    zero-crossing rate (per mono-mixed sample), and the per-frame RMS
    envelope at ``frame_ms`` — the standard inputs to silence
    trimming, loudness filtering and energy-based segmentation in a
    speech-data pipeline. Non-WAV / non-PCM payloads yield a NULL
    feature row (same contract as the image path's honest
    NotImplementedError: a silent fake can't masquerade as a decode —
    here the nulls are filterable downstream).

    Scale: map-only; per-task memory is one Arrow batch of payloads
    plus one decoded copy.
    """
    import numpy as np
    import pandas as pd

    from . import miniwav

    hop = None  # frames are non-overlapping at frame_ms

    def _extract(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    samples, rate, nch = miniwav.decode_pcm16(
                        bytes(payload)
                    )
                except (ValueError, TypeError):
                    rows.append((int(mid), None, None, None, None,
                                 None, None, None))
                    continue
                x = np.asarray(samples, dtype=np.float64) / 32768.0
                if nch > 1:
                    x = x.reshape(-1, nch).mean(axis=1)
                n = len(x)
                dur = 1000.0 * n / rate if rate else 0.0
                rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
                peak = float(np.max(np.abs(x))) if n else 0.0
                zcr = (
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    if n > 1 else 0.0
                )
                flen = max(1, int(rate * frame_ms / 1000)) if rate else 1
                nf = n // flen
                fr = (
                    np.sqrt(
                        (x[: nf * flen].reshape(nf, flen) ** 2).mean(axis=1)
                    ).tolist()
                    if nf else []
                )
                rows.append((int(mid), int(rate), int(nch), dur, rms,
                             peak, zcr, fr))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA]
            )

    return df.mapInPandas(_extract, schema=AUDIO_FEATURE_SCHEMA)


def make_fake_audio(spark, n=50, seed=42, rate=8000):
    """Deterministic synthetic WAV table for tests: sine tones of
    varying frequency/amplitude/length (REAL PCM payloads via
    miniwav), with every 7th row a non-audio payload to exercise the
    NULL contract."""
    import math

    from . import miniwav

    rows = []
    for i in range(n):
        if i % 7 == 3:
            rows.append((i, bytearray(b"not a wav"), "application/junk",
                         None, None, None))
            continue
        freq = 200 + 50 * (i % 8)
        amp = 0.1 + 0.05 * (i % 5)
        n_samp = rate // 4 + 100 * (i % 3)
        samples = [
            int(32767 * amp * math.sin(2 * math.pi * freq * t / rate))
            for t in range(n_samp)
        ]
        payload = miniwav.encode_pcm16(samples, rate)
        rows.append((i, bytearray(payload), "audio/wav", None, None,
                     int(1000 * n_samp / rate)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
