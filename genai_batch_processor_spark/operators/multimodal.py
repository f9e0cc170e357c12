"""Multimodal (image/audio/video) column operators (north-star, §2.D).

Media travel as opaque ``binary`` columns with a typed metadata struct —
never as Python objects. Reference analog: the base64 data-URI image
pipeline in ``examples/openai/run_visual_exam.py:42-49,93-104`` (operator
#42/#43); here generalized to a column-level toolkit plus a distributed
decode/feature boundary.

The decode/resize/frame-sample stages run as Arrow-batched
``mapInPandas`` because real codecs need Python libs (PIL/av). This
container has none, so ``decode_image_stub`` is a clearly-marked
deterministic fake behind the SAME plumbing (schema, batching,
partitioning) a real decoder would use — swap ``_decode_bytes`` for a
PIL call and nothing else changes. ``require_real_codecs()`` raises
NotImplementedError to mark the boundary.

Scale notes:
- binary payloads dominate row size: keep them OUT of shuffles — derive
  features first (mapInPandas on the scan partitioning, no shuffle),
  then drop/park the bytes before any wide stage.
- `binaryFile` source caps at spark.sql.files.maxPartitionBytes per
  partition; for many small files use `recursiveFileLookup` + AQE
  coalescing.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha", T.StringType()),
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 8


def media_metadata(data: Column, media_type: str, mime: str) -> Column:
    """Typed metadata struct for a binary media column (JVM-side)."""
    return F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(mime).alias("mime"),
        F.length(data).cast("long").alias("n_bytes"),
        F.sha2(data, 256).alias("sha"),
    )


def data_uri(data: Column, mime: str = "image/png") -> Column:
    """base64 data-URI from binary (operator #42, run_visual_exam.py:42-49)."""
    return F.concat(F.lit(f"data:{mime};base64,"), F.base64(data))


def require_real_codecs(kind: str = "image") -> None:
    """Assert the real decode path for ``kind`` (image/audio/video) is
    runnable here; raises NotImplementedError naming the missing
    library otherwise. The dispatchers (``decode_image``,
    ``window_audio``) fall back to the deterministic stubs, which
    exercise identical Spark plumbing."""
    if not codec_support().get(kind, False):
        lib = {
            "image": "Pillow",
            "image_full": "Pillow",
            "video": "PyAV",
        }.get(kind, kind)
        raise NotImplementedError(
            f"real {kind} decoding requires {lib}, absent from this "
            "environment — use the stub path (deterministic fake) which "
            "exercises identical Spark plumbing"
        )


def _decode_bytes(b: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decode: md5-derived pseudo-dimensions and a
    FEATURE_DIM float vector. Replace with PIL for real images."""
    h = hashlib.md5(b if b else b"\x00").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feature = [round(x / 255.0, 6) for x in h[2 : 2 + FEATURE_DIM]]
    return width, height, feature


def decode_image_stub(
    df: DataFrame, id_col: str = "doc_id", data_col: str = "data"
) -> DataFrame:
    """Distributed decode/feature-extract over binary image columns.

    Arrow-batched mapInPandas on the scan partitioning (no shuffle); the
    per-batch loop is exactly where PIL decode + resize would run."""
    id_name, data_name = id_col, data_col

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_bytes(b) for b in pdf[data_name]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name].astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf[data_name]],
                    "feature": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, data_col).mapInPandas(decode, IMAGE_FEATURES)


def fake_image_bytes(text: Column, n: int = 24) -> Column:
    """Deterministic stand-in for real image payloads in fixtures: the
    utf-8 bytes of a text prefix (parity-checkable via encode/to_base64)."""
    return F.encode(F.substring(text, 1, n), "utf-8")


VIDEO_FRAMES = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_fp", T.LongType()),
    ]
)

MAX_FRAMES = 4


def sample_video_frames(
    df: DataFrame, id_col: str = "doc_id", data_col: str = "data"
) -> DataFrame:
    """Distributed frame sampling over binary video columns: one input
    row fans out to N frame rows — the 1→many Arrow boundary a real
    ``av``-based keyframe sampler uses (yield more rows than you read).

    The stub derives a deterministic frame count (1..MAX_FRAMES) and a
    per-frame 60-bit fingerprint from an md5 chain over the payload, so
    the whole fan-out is REPLAYABLE in ANSI SQL — the oracle proves the
    Spark plumbing (batch iteration, fan-out schema, scan partitioning,
    no shuffle) delivers exactly the declared rows. Swap the md5 chain
    for real frame decode + a feature net and nothing else changes.
    """
    id_name, data_name = id_col, data_col

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, idxs, fps = [], [], []
        for pdf in batches:
            for rid, b in zip(pdf[id_name], pdf[data_name]):
                digest = hashlib.md5(b if b else b"\x00").hexdigest()
                n_frames = 1 + int(digest[:2], 16) % MAX_FRAMES
                for i in range(n_frames):
                    sig = hashlib.md5(f"{digest}-{i}".encode()).hexdigest()
                    ids.append(int(rid))
                    idxs.append(i)
                    fps.append(int(sig[:15], 16))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_fp": fps}
            )
            ids, idxs, fps = [], [], []

    return df.select(id_col, data_col).mapInPandas(sample, VIDEO_FRAMES)


AUDIO_WINDOWS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("win_idx", T.IntegerType()),
        T.StructField("win_fp", T.LongType()),
        T.StructField("level_milli", T.IntegerType()),
    ]
)

MAX_WINDOWS = 6


def window_audio_stub(
    df: DataFrame, id_col: str = "doc_id", data_col: str = "data"
) -> DataFrame:
    """Distributed audio windowing over binary audio columns: one clip
    fans out to N fixed-length analysis windows — the 1→many Arrow
    boundary a real resample + RMS/spectrogram stage (librosa/av) uses.

    Stub semantics mirror :func:`sample_video_frames`: a deterministic
    window count (1..MAX_WINDOWS, from a different digest offset than
    the video sampler so the two fan-outs decorrelate on the same
    payload), a 60-bit per-window fingerprint, and an integer
    pseudo-level (fp mod 1000 — integers only, so no float formatting
    ever crosses the oracle boundary). Swap the md5 chain for real
    decode + windowed RMS and the plumbing is unchanged.
    """
    id_name, data_name = id_col, data_col

    def window(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, idxs, fps, lvls = [], [], [], []
        for pdf in batches:
            for rid, b in zip(pdf[id_name], pdf[data_name]):
                digest = hashlib.md5(b if b else b"\x00").hexdigest()
                n_windows = 1 + int(digest[2:4], 16) % MAX_WINDOWS
                for i in range(n_windows):
                    sig = hashlib.md5(f"{digest}@{i}".encode()).hexdigest()
                    fp = int(sig[:15], 16)
                    ids.append(int(rid))
                    idxs.append(i)
                    fps.append(fp)
                    lvls.append(fp % 1000)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "win_idx": idxs,
                    "win_fp": fps,
                    "level_milli": lvls,
                }
            )
            ids, idxs, fps, lvls = [], [], [], []

    return df.select(id_col, data_col).mapInPandas(window, AUDIO_WINDOWS)


# -- optional real-codec seam ---------------------------------------------
#
# The stubs above are oracle-paired and always available; when a real
# codec library IS importable the dispatchers below route to a genuine
# decode over the SAME Spark plumbing (schema, Arrow batching, scan
# partitioning). Reference analog: examples/openai/run_visual_exam.py:
# 42-49 decodes real PNGs — a user pointing that flow at real media
# gets real features wherever the library exists, the deterministic
# fake only as an explicit fallback.


def _has_module(name: str) -> bool:
    import importlib.util

    try:
        return importlib.util.find_spec(name) is not None
    except (ImportError, ValueError):
        return False


def codec_support() -> dict[str, bool]:
    """Which real decode paths this environment can run. ``audio`` is
    always true (uncompressed WAV decodes with stdlib ``wave``) and
    ``image`` is, since round 5, also always true for PNG payloads —
    the vendored pure-stdlib decoder (``functions/png.py``) covers
    them; non-PNG image formats still need Pillow (``image_full``)."""
    return {
        "image": True,  # PNG always; Pillow extends to JPEG/GIF/...
        "image_full": _has_module("PIL"),
        "audio": True,
        "video": _has_module("av"),
    }


def _strip_features(rgb) -> list[float]:
    """The engine-owned feature definition shared by every real image
    decode source: integer ITU-R 601 luminance, FEATURE_DIM vertical
    column strips, box mean per strip, /255 rounded to 6 dp. Defined
    HERE (not borrowed from a library's resampler) so the vector is
    bit-identical whether the pixels came from the vendored PNG
    decoder or Pillow."""
    import numpy as np

    px = rgb.astype(np.int64)
    lum = (
        px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114
    ) // 1000
    w = lum.shape[1]
    if w < FEATURE_DIM:
        # narrower than the strip count: array_split would yield empty
        # strips (NaN means) — sample the nearest column instead, so a
        # 1-px tracker still gets a finite, deterministic vector
        cols = (np.arange(FEATURE_DIM) * w) // FEATURE_DIM
        return [
            round(float(lum[:, c].mean()) / 255.0, 6) for c in cols
        ]
    return [
        round(float(s.mean()) / 255.0, 6)
        for s in np.array_split(lum, FEATURE_DIM, axis=1)
    ]


def decode_image_real(
    df: DataFrame, id_col: str = "doc_id", data_col: str = "data"
) -> DataFrame:
    """Real image decode: true width/height plus the FEATURE_DIM
    luminance strip feature (:func:`_strip_features` — a stand-in for
    any thumbnail/embedding stage). In-scope PNG payloads (8-bit,
    non-interlaced — every fixture and most real screenshots) decode
    through the vendored pure-stdlib decoder (``functions/png.py``) —
    even when Pillow is importable, so their features never depend on
    the environment; out-of-scope PNGs (16-bit, Adam7) and other
    formats decode via Pillow when present.
    Same IMAGE_FEATURES schema and narrow mapInPandas plan as the
    stub; fails fast on the driver when the payloads need Pillow and
    it is absent (one bounded probe row), and imports executor-side
    inside the batch loop."""
    if (
        not _has_module("PIL")
        and not df.isStreaming
        and not _payload_matches(df, data_col, _is_png_magic)
    ):
        raise NotImplementedError(
            "decode_image_real requires Pillow for non-PNG payloads; "
            "this environment ships without it — PNG decodes via the "
            "vendored codec, and decode_image(codec='stub') runs the "
            "same plumbing with a deterministic fake"
        )
    id_name, data_name = id_col, data_col

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import zlib

        from genai_batch_processor_spark.functions import png as _png

        for pdf in batches:
            ids, ws, hs, ns, feats = [], [], [], [], []
            for rid, b in zip(pdf[id_name], pdf[data_name]):
                raw = bytes(b) if b is not None else b""
                rgb = None
                if raw[:4] == b"\x89PNG":
                    try:
                        w, h, rgb = _png.decode_png(raw)
                    except (
                        _png.PngFormatError,
                        zlib.error,  # corrupt IDAT stream
                        struct.error,  # truncated IHDR/chunk header
                        IndexError,  # palette index beyond PLTE
                    ):
                        # out of the vendored decoder's scope (16-bit,
                        # interlaced, ...) OR a malformed payload: fall
                        # through to Pillow per png.py's contract rather
                        # than crash the executor on a raw codec error
                        rgb = None
                if rgb is None:
                    try:
                        from PIL import Image
                    except ImportError as e:
                        raise NotImplementedError(
                            "payload needs Pillow (non-PNG format, or "
                            "a PNG outside the vendored decoder's "
                            "8-bit non-interlaced scope)"
                        ) from e
                    import numpy as np

                    with Image.open(io.BytesIO(raw)) as img:
                        w, h = img.width, img.height
                        rgb = np.asarray(img.convert("RGB"))
                ws.append(w)
                hs.append(h)
                feats.append(_strip_features(rgb))
                ids.append(int(rid))
                ns.append(len(raw))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": ws,
                    "height": hs,
                    "n_bytes": ns,
                    "feature": feats,
                }
            )

    return df.select(id_col, data_col).mapInPandas(decode, IMAGE_FEATURES)


# Magic-byte matchers for formats the real decoders can actually
# parse. RIFF is a container shared by WAV and WebP — the fourcc at
# bytes 8..12 disambiguates (routing WebP bytes into wave.open, or
# WebP images past a non-image gate, would be wrong both ways).


def _is_image_magic(head: bytes) -> bool:
    return head.startswith(
        (b"\x89PNG", b"\xff\xd8\xff", b"GIF8", b"BM",
         b"II*\x00", b"MM\x00*")  # TIFF, both endiannesses
    ) or (head[:4] == b"RIFF" and head[8:12] == b"WEBP")


def _is_png_magic(head: bytes) -> bool:
    return head.startswith(b"\x89PNG")


def _is_wav_magic(head: bytes) -> bool:
    return head[:4] == b"RIFF" and head[8:12] == b"WAVE"


def _payload_matches(df: DataFrame, data_col: str, is_magic) -> bool:
    """Driver-side 1-row probe: does the first non-null payload carry
    the real-format magic? Bounded (limit rides into the plan) — the
    same class of probe the stream source uses for its schema. A
    relation of stub/fixture bytes routes to the stub even when the
    real library is importable. CONTRACT: the probe samples ONE row
    with no ordering, so a relation MIXING real and fake formats must
    pass an explicit codec (dispatch would otherwise follow whichever
    row the scan yields first); it is also an eager driver action, so
    streaming DataFrames must pass an explicit codec (the dispatchers
    raise)."""
    rows = (
        df.select(data_col)
        .filter(F.col(data_col).isNotNull())
        .limit(1)
        .collect()
    )
    if not rows or rows[0][0] is None:
        return False
    return is_magic(bytes(rows[0][0])[:16])


def decode_image(
    df: DataFrame,
    id_col: str = "doc_id",
    data_col: str = "data",
    codec: str = "auto",
) -> DataFrame:
    """Image decode dispatcher: ``auto`` takes the real path when the
    payloads carry a real image magic the environment can decode —
    PNG always (vendored codec), JPEG/GIF/BMP/TIFF/WebP only when
    Pillow is importable; fixture fake bytes (or a format with no
    decoder here) route to the deterministic stub. ``real``/``stub``
    force a path; see _payload_matches for auto's mixed-format and
    streaming contract."""
    if codec == "auto":
        if df.isStreaming:
            raise ValueError(
                "codec='auto' probes a payload row, which a streaming "
                "DataFrame cannot serve — pass codec='real' or 'stub'"
            )
        decodable = _payload_matches(
            df,
            data_col,
            (
                _is_image_magic
                if codec_support()["image_full"]
                else _is_png_magic
            ),
        )
        codec = "real" if decodable else "stub"
    if codec == "stub":
        return decode_image_stub(df, id_col, data_col)
    if codec == "real":
        return decode_image_real(df, id_col, data_col)
    raise ValueError(f"codec must be auto|real|stub, got {codec!r}")


AUDIO_WINDOW_SAMPLES = 1024


def window_audio_real(
    df: DataFrame, id_col: str = "doc_id", data_col: str = "data"
) -> DataFrame:
    """Real audio windowing for WAV payloads via stdlib ``wave``: each
    clip decodes to 16-bit PCM and fans out to fixed
    AUDIO_WINDOW_SAMPLES-sample windows with a true RMS level
    (level_milli = RMS/full-scale × 1000) and an md5 fingerprint of the
    window's raw bytes. Same AUDIO_WINDOWS schema and 1→many Arrow
    boundary as the stub — and genuinely runnable with no third-party
    codec, so the real path is TESTED, not just stubbed."""
    id_name, data_name = id_col, data_col

    def window(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            ids, idxs, fps, lvls = [], [], [], []
            for rid, b in zip(pdf[id_name], pdf[data_name]):
                raw = bytes(b) if b is not None else b""
                if not raw:  # empty/NULL payload → zero windows
                    continue
                with wave.open(io.BytesIO(raw)) as w:
                    if w.getsampwidth() != 2:
                        raise ValueError(
                            "window_audio_real expects 16-bit PCM WAV"
                        )
                    if w.getnchannels() != 1:
                        # stereo frames would interleave L/R samples
                        # into one RMS and mis-size every window —
                        # refuse loudly, like the sampwidth check
                        raise ValueError(
                            "window_audio_real expects mono WAV; "
                            f"got {w.getnchannels()} channels"
                        )
                    pcm = w.readframes(w.getnframes())
                n = len(pcm) // 2
                # vectorized RMS: the per-sample Python loop was the
                # decode hot path (round-4 verdict follow-up); one
                # frombuffer + per-window mean-of-squares replaces it
                samples = np.frombuffer(pcm, dtype="<i2", count=n)
                step = AUDIO_WINDOW_SAMPLES
                n_win = (n + step - 1) // step
                sq = samples.astype(np.float64) ** 2
                for k in range(n_win):
                    win = sq[k * step : (k + 1) * step]
                    chunk = pcm[2 * k * step : 2 * (k + 1) * step]
                    rms = float(win.mean()) ** 0.5
                    fp = int(hashlib.md5(chunk).hexdigest()[:15], 16)
                    ids.append(int(rid))
                    idxs.append(k)
                    fps.append(fp)
                    lvls.append(int(round(rms / 32768.0 * 1000)))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "win_idx": idxs,
                    "win_fp": fps,
                    "level_milli": lvls,
                }
            )

    return df.select(id_col, data_col).mapInPandas(window, AUDIO_WINDOWS)


def window_audio(
    df: DataFrame,
    id_col: str = "doc_id",
    data_col: str = "data",
    codec: str = "auto",
) -> DataFrame:
    """Audio windowing dispatcher. ``auto`` takes the real WAV path
    only when the payloads actually carry the RIFF/WAVE magic (stdlib
    wave always imports, but fixture fake bytes — or a WebP, which is
    also RIFF — would crash the parser); anything else routes to the
    deterministic stub. See _payload_matches for auto's mixed-format
    and streaming contract."""
    if codec == "auto":
        if df.isStreaming:
            raise ValueError(
                "codec='auto' probes a payload row, which a streaming "
                "DataFrame cannot serve — pass codec='real' or 'stub'"
            )
        codec = (
            "real"
            if _payload_matches(df, data_col, _is_wav_magic)
            else "stub"
        )
    if codec == "stub":
        return window_audio_stub(df, id_col, data_col)
    if codec == "real":
        return window_audio_real(df, id_col, data_col)
    raise ValueError(f"codec must be auto|real|stub, got {codec!r}")


def _is_video_magic(head: bytes) -> bool:
    """Container sniff for the three containers the real sampler
    handles: ISO-BMFF/MP4 (``ftyp`` at offset 4), Matroska/WebM
    (EBML magic), AVI (``RIFF....AVI ``)."""
    return (
        (len(head) >= 8 and head[4:8] == b"ftyp")
        or head.startswith(b"\x1a\x45\xdf\xa3")
        or (len(head) >= 12 and head[:4] == b"RIFF" and head[8:12] == b"AVI ")
    )


def sample_video_frames_real(
    df: DataFrame,
    id_col: str = "doc_id",
    data_col: str = "data",
    max_frames: int = MAX_FRAMES,
) -> DataFrame:
    """Real KEYFRAME sampling via PyAV over binary video payloads —
    same ``VIDEO_FRAMES`` schema and 1→many Arrow boundary as the
    stub, so callers swap freely. Per clip: up to ``max_frames``
    I-frames (``skip_frame='NONKEY'`` makes the demuxer drop non-key
    packets BEFORE decode — the cheap way to sample a long clip; a
    full decode of a 2-hour video to keep 4 frames would be the
    decode-everything anti-pattern), each emitted as
    (doc_id, frame_idx, frame_fp) where ``frame_fp`` is a 60-bit md5
    of the decoded frame's raw RGB bytes — content-addressed, so a
    container remux keeps fingerprints and a pixel re-encode changes
    them. Empty/NULL payloads and audio-only containers yield zero
    rows (mirroring the audio path's empty-payload contract).

    Import-gated: without PyAV (this sandbox) it raises and
    :func:`sample_video_frames` (deterministic stub, oracle-checked)
    runs the identical plumbing; :func:`video_frames_dispatch` routes
    automatically."""
    if not _has_module("av"):
        raise NotImplementedError(
            "sample_video_frames_real requires PyAV; this environment "
            "ships without it — sample_video_frames (deterministic "
            "stub) runs the same plumbing"
        )
    id_name, data_name = id_col, data_col

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from _sample_video_batches(
            batches, id_name, data_name, max_frames
        )

    return df.select(id_col, data_col).mapInPandas(sample, VIDEO_FRAMES)


def _sample_video_batches(
    batches: Iterator[pd.DataFrame],
    id_name: str,
    data_name: str,
    max_frames: int,
) -> Iterator[pd.DataFrame]:
    """The worker-side body of :func:`sample_video_frames_real`,
    module-level so its loop logic (keyframe cap, NONKEY demux hint,
    empty/audio-only skips, RGB content fingerprinting, 1→many
    fan-out) is unit-testable with a faked ``av`` module — PyAV has
    never been importable in this sandbox, and an untested loop inside
    a closure is exactly where a real deployment would find the first
    bug. ``import av`` stays INSIDE (resolved per worker process, and
    per call under the test's fake)."""
    import io

    import av

    for pdf in batches:
        ids, idxs, fps = [], [], []
        for rid, b in zip(pdf[id_name], pdf[data_name]):
            raw = bytes(b) if b is not None else b""
            if not raw:
                continue
            with av.open(io.BytesIO(raw)) as container:
                streams = [
                    s for s in container.streams if s.type == "video"
                ]
                if not streams:
                    continue
                stream = streams[0]
                stream.codec_context.skip_frame = "NONKEY"
                k = 0
                for frame in container.decode(stream):
                    if k >= max_frames:
                        break
                    rgb = frame.to_ndarray(format="rgb24")
                    fp = int(
                        hashlib.md5(rgb.tobytes()).hexdigest()[:15], 16
                    )
                    ids.append(int(rid))
                    idxs.append(k)
                    fps.append(fp)
                    k += 1
        yield pd.DataFrame(
            {"doc_id": ids, "frame_idx": idxs, "frame_fp": fps}
        )


def video_frames_dispatch(
    df: DataFrame,
    id_col: str = "doc_id",
    data_col: str = "data",
    codec: str = "auto",
) -> DataFrame:
    """Video-frame dispatcher, mirroring :func:`window_audio`: ``auto``
    takes the real PyAV path only when PyAV imports AND the payloads
    carry a real container magic (fixture fake bytes would crash the
    demuxer); anything else routes to the deterministic stub."""
    if codec == "auto":
        if df.isStreaming:
            raise ValueError(
                "codec='auto' probes a payload row, which a streaming "
                "DataFrame cannot serve — pass codec='real' or 'stub'"
            )
        codec = (
            "real"
            if _has_module("av")
            and _payload_matches(df, data_col, _is_video_magic)
            else "stub"
        )
    if codec == "stub":
        return sample_video_frames(df, id_col, data_col)
    if codec == "real":
        return sample_video_frames_real(df, id_col, data_col)
    raise ValueError(f"codec must be auto|real|stub, got {codec!r}")


def sql_image_features(text_expr: str, n: int = 24) -> str:
    """DuckDB twin of fake_image_bytes → decode_image_stub: replays the
    md5-derived pseudo-decode over the same utf-8 prefix bytes, so the
    Arrow-batched Python boundary is held to an exact oracle. The
    feature vector is emitted as a scaled-integer join (floats never
    cross the engine boundary as formatted strings)."""
    # _decode_bytes hashes b"\x00" for empty/NULL payloads (and an
    # empty prefix byte-length is 0) — mirror both so an empty or NULL
    # document can't split the engines.
    raw = f"substr({text_expr}, 1, {n})"
    prefix = f"coalesce({raw}, '')"
    h = f"md5(CASE WHEN {prefix} = '' THEN chr(0) ELSE {prefix} END)"
    byte = lambda i: f"(('0x' || substr({h}, {2 * i + 1}, 2))::INT)"  # noqa: E731
    feat = ", ".join(
        f"CAST(round({byte(i)} / 255.0, 6) * 1000000 AS BIGINT)"
        for i in range(2, 2 + FEATURE_DIM)
    )
    return f"""
        SELECT doc_id,
               CAST(64 + {byte(0)} % 192 AS INT) AS width,
               CAST(64 + {byte(1)} % 192 AS INT) AS height,
               CAST(strlen({prefix}) AS BIGINT) AS n_bytes,
               array_to_string([{feat}], '-') AS feature6
        FROM documents
    """
