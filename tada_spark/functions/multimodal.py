"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Decode status by modality: AUDIO is REAL for PCM WAV (wav_audio_decoder,
stdlib wave + numpy — no external libs); IMAGE is REAL for PNG
(png_image_decoder, stdlib zlib + numpy — all five scanline filters,
gray/RGB/alpha color types) AND for JPEG — baseline SOF0 since round
8 and progressive SOF2 (spectral selection + successive
approximation) since round 9, grayscale and 4:2:0/4:4:4 YCbCr color
(functions/jpeg.jpeg_decode — pure stdlib Huffman + numpy IDCT), with
the PIL twin (pil_image_decoder) still wired for the long-tail JPEG
feature range (arithmetic coding, exotic sampling, 12-bit) the moment
an environment has Pillow;
compressed audio/video need ffmpeg/torchaudio and stay stubbed. Everything
Spark-side is real and tested either way: schemas, Arrow batch shapes,
mapInPandas partition flow, metadata propagation. The decoder parameter
is the ONLY swap point, pinned by the swap-contract tests (schema +
plan shape + drop policy identical across decoders).

Design for 100 TB of media:
  * binary payloads stay columnar (parquet BINARY); metadata (width,
    codec, duration) travels as sibling typed columns so filters prune
    BEFORE any decode.
  * decode/feature-extract runs in mapInPandas — Arrow batches, one
    Python worker per core, no per-row pickling.
  * never collect payloads to the driver.
  * corrupt bytes NEVER kill a task: the public decode entry points
    are wrapped by functions/decode_guard.corrupt_input_guard, which
    normalizes low-level stdlib/numpy failures (struct.error,
    zlib.error, wave.Error, IndexError …) into the documented
    ValueError so the adapters' drop policy applies uniformly
    (fuzz-pinned by tests/test_decode_fuzz.py).
  * nor do decompression bombs: header dimensions are capped at
    jpeg.MAX_DECODE_PIXELS before any allocation, and the PNG inflate
    is bounded at the exact filtered byte count the header implies —
    a 1.5 MB payload claiming a 12 GiB image refuses instead of
    OOM-killing the executor.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tada_spark.functions.decode_guard import corrupt_input_guard

#: Schema for a decoded-image feature batch.
IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)

#: Adam7 pass geometry (x-start, y-start, x-step, y-step), PNG spec §8.2.
_ADAM7_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def _decode_image_stub(payload: bytes) -> tuple[int, int, float]:
    """STUB — deterministic fake decoder.

    A real deployment replaces this with PIL/turbojpeg. The fake derives
    (width, height, mean_luma) from the payload bytes so tests are
    deterministic and the full distributed pipeline is exercised.
    """
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    w = 16 + payload[0] % 64
    h = 16 + (payload[-1] if len(payload) > 1 else payload[0]) % 64
    luma = (sum(payload[:64]) / min(len(payload), 64)) / 255.0
    return w, h, luma


def image_features(
    df: DataFrame, *, id_col: str = "media_id", payload_col: str = "payload", decoder=None
) -> DataFrame:
    """Decode + feature-extract images via mapInPandas (Arrow batches).

    Input: df[id_col: long, payload_col: binary, ...]. Output:
    IMAGE_FEATURES_SCHEMA. Rows with undecodable payloads are dropped
    (null-skipping, matching the engine's null discipline).

    ``decoder(payload) -> (width, height, mean_luma)`` is the ONLY swap
    point between the container stub and a real PIL/turbojpeg decode —
    everything else (schema, Arrow batching, partitioning, error-drop
    policy) is the production pipeline; the contract test pins this.
    """
    decode = decoder or _decode_image_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "n_bytes": [], "mean_luma": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    n_bytes = len(payload)  # None payload ⇒ undecodable
                    w, h, luma = decode(payload)
                except Exception:
                    continue
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(n_bytes)
                out["mean_luma"].append(luma)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, *, every_n: int = 30, id_col: str = "media_id") -> DataFrame:
    """Video frame-sampling *plan*: explode frame indices from metadata
    (n_frames column) without decoding — decode happens downstream on
    the sampled (media_id, frame_idx) pairs only. This is the pruning
    step that makes 100 TB video tractable."""
    # n_frames == 0 (corrupt/empty media) ⇒ no frames: sequence(0, -1, +30)
    # would raise 'Illegal sequence boundaries'; explode of NULL drops the row
    idxs = F.when(
        F.col("n_frames") >= 1,
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)),
    )
    return df.select(id_col, F.explode(idxs).alias("frame_idx"))


def _decode_audio_stub(payload: bytes) -> tuple[int, float, float]:
    """STUB — deterministic fake audio decoder (real: ffmpeg/torchaudio).

    Derives (sample_rate, duration_s, rms) from the payload bytes so the
    distributed pipeline is exercised end-to-end and test-checkable.
    """
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")

    # half-up rounding (SQL ROUND semantics; python round() is half-even)
    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    sample_rate = 8000 + (payload[0] % 3) * 4000
    duration_s = r6(len(payload) / sample_rate)
    head = payload[:64]
    rms = r6((sum((b / 255.0) ** 2 for b in head) / len(head)) ** 0.5)
    return sample_rate, duration_s, rms


@corrupt_input_guard("WAV")
def wav_audio_decoder(payload: bytes) -> tuple[int, float, float]:
    """REAL audio decoder for PCM WAV — stdlib ``wave`` + numpy, no
    external libraries. Pass as ``audio_features(..., decoder=
    wav_audio_decoder)`` when payloads are RIFF/WAV; compressed formats
    (mp3/ogg/flac) still need ffmpeg/torchaudio and keep the stub in
    this container. Returns (sample_rate, duration_s, rms) with the same
    half-up 6-dp rounding as the stub so either decoder satisfies the
    swap contract."""
    import io
    import wave

    import numpy as np

    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        nch = w.getnchannels()
        raw = w.readframes(n)
    if nch != 1:
        # interleaved multi-channel would silently blend channels into
        # one RMS; refuse (drop policy) like the unsupported-width path
        raise ValueError(f"unsupported channel count {nch} (mono PCM only)")
    if len(raw) != n * width * nch:
        # a forged/corrupt data-chunk size would otherwise report the
        # HEADER's duration over the ACTUAL samples' rms — silently
        # inconsistent features; refuse (drop policy)
        raise ValueError("WAV data shorter than the declared frame count")
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned, offset-128
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    if samples.size == 0 or sr <= 0:
        raise ValueError("no samples")

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    rms = float(np.sqrt(np.mean(samples**2)))
    return sr, r6(n / sr), r6(rms)


def pil_image_decoder(payload: bytes) -> tuple[int, int, float]:
    """REAL image decoder via PIL — raises ImportError in this container
    (no PIL; documented constraint). Wired so the moment the environment
    gains Pillow, ``image_features(..., decoder=pil_image_decoder)`` is
    the production path; the swap-contract test exercises it when the
    import succeeds and skips otherwise."""
    import io

    from PIL import Image  # noqa: F401 — the one non-baked dependency

    img = Image.open(io.BytesIO(bytes(payload)))
    w, h = img.size
    hist = img.convert("L").histogram()
    total = sum(hist)
    mean_luma = (sum(i * c for i, c in enumerate(hist)) / total / 255.0) if total else 0.0
    return w, h, mean_luma


def audio_features(
    df: DataFrame, *, id_col: str = "media_id", payload_col: str = "payload", decoder=None
) -> DataFrame:
    """Decode + feature-extract audio via mapInPandas (Arrow batches).

    Input: df[id_col: long, payload_col: binary]. Output:
    AUDIO_FEATURES_SCHEMA. Undecodable payloads are dropped.

    ``decoder(payload) -> (sample_rate, duration_s, rms)`` is the only
    stub/real swap point (real: ffmpeg/torchaudio); the surrounding
    pipeline is production code.
    """
    decode = decoder or _decode_audio_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "sample_rate": [], "duration_s": [], "rms": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    sr, dur, rms = decode(payload)
                except Exception:
                    continue
                out["media_id"].append(mid)
                out["sample_rate"].append(sr)
                out["duration_s"].append(dur)
                out["rms"].append(rms)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


@corrupt_input_guard("PNG")
def png_decode_pixels(payload: bytes):
    """REAL PNG decode to the raw pixel array — stdlib ``zlib`` +
    ``struct`` + numpy, no external libraries. Handles 8-bit-depth
    PNGs in all five standard scanline filters
    (None/Sub/Up/Average/Paeth), color types 0 (gray), 2 (RGB),
    3 (palette — mapped through PLTE to RGB, since round 9),
    4 (gray+alpha), 6 (RGBA), and BOTH interlace modes — progressive
    Adam7 streams de-filter each of the seven sub-images independently
    and interleave back (round 9); 16-bit depth raises (drop policy,
    like unsupported PCM widths). Returns an int64 ndarray of shape
    (h, w, channels) — the decode half every pixel operator
    (features, resize) builds on."""
    import struct
    import zlib

    import numpy as np

    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    b = bytes(payload)
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, meta, palette = 8, bytearray(), None, None
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data)
            meta = (w, h, depth, color, interlace)
        elif ctype == b"PLTE":
            if length % 3 or length == 0:
                raise ValueError("malformed PLTE chunk")
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if meta is None:
        raise ValueError("no IHDR")
    w, h, depth, color, interlace = meta
    if depth != 8 or interlace not in (0, 1) or color not in (0, 2, 3, 4, 6):
        raise ValueError(f"unsupported PNG (depth={depth} color={color} interlace={interlace})")
    if color == 3 and palette is None:
        raise ValueError("palette PNG without PLTE chunk")
    from tada_spark.functions.jpeg import MAX_DECODE_PIXELS

    if w * h > MAX_DECODE_PIXELS:
        # decompression-bomb guard, BEFORE the inflate: zeros compress
        # ~1000:1, so a 1.5 MB payload can claim a 12 GiB image — the
        # cap turns that into the contract ValueError (drop policy)
        # instead of a task-killing MemoryError
        raise ValueError(
            f"image {w}x{h} exceeds MAX_DECODE_PIXELS "
            f"({MAX_DECODE_PIXELS}) — decompression-bomb guard"
        )
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    # The filtered byte count is fully determined by the header, so the
    # inflate is BOUNDED at exactly that size — an oversized zlib
    # stream under an honest IHDR (the other bomb shape) surfaces as
    # the same trailing-data ValueError the unbounded decode gave,
    # without ever materializing the excess.
    if interlace == 0:
        expected = h * (w * ch + 1)
    else:
        expected = sum(
            ph * (pw * ch + 1)
            for x0, y0, dx, dy in _ADAM7_PASSES
            for pw, ph in (((w - x0 + dx - 1) // dx, (h - y0 + dy - 1) // dy),)
            if pw > 0 and ph > 0
        )
    dobj = zlib.decompressobj()
    raw = dobj.decompress(bytes(idat), expected)
    if dobj.decompress(dobj.unconsumed_tail, 1):
        raise ValueError("trailing image data")

    def unfilter(offset: int, pw: int, ph: int) -> tuple[np.ndarray, int]:
        """De-filter one image (a whole non-interlaced frame, or one
        Adam7 pass): ph scanlines of pw pixels, each prefixed by its
        filter-type byte; the prev-row predictor resets at the top."""
        stride = pw * ch
        if len(raw) < offset + ph * (stride + 1):
            raise ValueError("truncated image data")
        prev = np.zeros(stride, dtype=np.int64)
        rows = []
        for y in range(ph):
            base = offset + y * (stride + 1)
            ft = raw[base]
            line = np.frombuffer(raw, np.uint8, stride, base + 1).astype(np.int64)
            if ft == 0:
                rec = line
            elif ft == 2:  # Up — vectorized
                rec = (line + prev) & 255
            elif ft in (1, 3, 4):  # Sub / Average / Paeth need the left pixel
                rec = np.zeros(stride, dtype=np.int64)
                for x in range(stride):
                    a = rec[x - ch] if x >= ch else 0  # left
                    bb = prev[x]  # up
                    if ft == 1:
                        pred = a
                    elif ft == 3:
                        pred = (a + bb) // 2
                    else:
                        c = prev[x - ch] if x >= ch else 0  # up-left
                        p = a + bb - c
                        pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                        pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                    rec[x] = (line[x] + pred) & 255
            else:
                raise ValueError(f"bad filter type {ft}")
            rows.append(rec)
            prev = rec
        img = np.stack(rows).reshape(ph, pw, ch) if ph else \
            np.zeros((0, pw, ch), dtype=np.int64)
        return img, offset + ph * (stride + 1)

    if interlace == 0:
        px, end = unfilter(0, w, h)
        if end != len(raw):
            raise ValueError("trailing image data")
    else:  # Adam7: seven sub-images, each filtered independently
        px = np.zeros((h, w, ch), dtype=np.int64)
        off = 0
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass for small images
            sub, off = unfilter(off, pw, ph)
            px[y0::dy, x0::dx] = sub
        if off != len(raw):
            raise ValueError("trailing image data")
    if color == 3:  # indexed: map through the PLTE to RGB
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        return palette[idx].astype(np.int64)
    return px


def png_image_decoder(payload: bytes) -> tuple[int, int, float]:
    """(width, height, mean_luma) features from a REAL PNG decode
    (png_decode_pixels — the image twin of wav_audio_decoder). Luma
    uses the ITU-R 601 integer weights (299R + 587G + 114B)/1000 and
    mean_luma is floor-half-up rounded at 6 dp — one exact integer sum
    then one double division, so an analytic oracle reproduces it
    bit-for-bit."""
    import numpy as np

    px = png_decode_pixels(payload)
    h, w, ch = px.shape
    color = {1: 0, 3: 2, 2: 4, 4: 6}[ch]
    if color == 0:
        luma_milli = px[:, :, 0].astype(np.int64) * 1000  # gray: weight 1000/1000
    elif color == 4:
        luma_milli = px[:, :, 0].astype(np.int64) * 1000  # gray+alpha: ignore alpha
    else:  # RGB / RGBA: ITU-R 601 integer weights
        luma_milli = (
            299 * px[:, :, 0].astype(np.int64)
            + 587 * px[:, :, 1].astype(np.int64)
            + 114 * px[:, :, 2].astype(np.int64)
        )
    total = int(luma_milli.sum())  # exact integer

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    return w, h, r6(total / (w * h * 1000 * 255))


def encode_png_gray8(width: int, height: int, pixel_fn, *, filter_type: int = 0) -> bytes:
    """Minimal REAL PNG encoder (grayscale, 8-bit, non-interlaced) —
    stdlib only; used to build deterministic test payloads whose decoded
    features an analytic oracle can reproduce. ``pixel_fn(x, y) -> int``
    gives the 0..255 value; ``filter_type`` 0 (None) or 2 (Up) selects
    the per-scanline filter so round-trip tests can cover the filtered
    decode paths with hand-checkable algebra. Chunks carry valid CRCs —
    any standards-compliant reader accepts the output."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    rows = [[pixel_fn(x, y) & 255 for x in range(width)] for y in range(height)]
    raw = bytearray()
    for y, row in enumerate(rows):
        raw.append(filter_type)
        if filter_type == 0:
            raw += bytes(row)
        elif filter_type == 2:  # Up: store row - previous row (mod 256)
            prev = rows[y - 1] if y > 0 else [0] * width
            raw += bytes((v - p) & 255 for v, p in zip(row, prev))
        else:
            raise ValueError("encoder supports filter types 0 and 2")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def resize_area_gray8(px2d, factor: int):
    """REAL image resize: exact area-average downsample of a grayscale
    pixel matrix by an integer ``factor`` — each output pixel is
    floor(sum of factor² input pixels / factor²), pure integer
    arithmetic, so an analytic oracle replicates the thumbnail
    bit-for-bit (the bilinear/Lanczos production kernels swap in here
    exactly like ffmpeg swaps into wav_audio_decoder). Input dims must
    be divisible by ``factor`` (caller crops first — a partial edge
    block has no exact integer semantics)."""
    import numpy as np

    h, w = px2d.shape
    if h % factor or w % factor:
        raise ValueError(f"dims ({h},{w}) not divisible by factor {factor}")
    a = np.asarray(px2d, dtype=np.int64).reshape(h // factor, factor, w // factor, factor)
    return a.sum(axis=(1, 3)) // (factor * factor)


def image_resize_features(
    df: DataFrame,
    *,
    factor: int = 4,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Distributed thumbnail pipeline over (id, PNG payload) rows:
    REAL decode (png_decode_pixels) → exact area resize → REAL
    re-encode (encode_png_gray8) with an in-plan decode-back identity
    assertion (corrupted round-trips RAISE, the jsonl-golden
    discipline) → emit (id, out_w, out_h, pix_sum) where pix_sum is
    the exact integer sum of thumbnail pixels — the analytic,
    oracle-checkable digest of the resized image. Arrow-batched
    mapInPandas; payloads never touch the driver."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("out_w", T.IntegerType()),
            T.StructField("out_h", T.IntegerType()),
            T.StructField("pix_sum", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, sums = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                px = png_decode_pixels(bytes(payload))
                if px.shape[2] != 1:
                    raise ValueError("resize demo expects grayscale PNGs")
                thumb = resize_area_gray8(px[:, :, 0], factor)
                th, tw = thumb.shape
                # re-encode the thumbnail with the REAL encoder and
                # decode it back: the round-trip must be the identity
                back = png_decode_pixels(
                    encode_png_gray8(tw, th, lambda x, y, t=thumb: int(t[y, x]))
                )[:, :, 0]
                if not np.array_equal(back, thumb):
                    raise AssertionError("PNG round-trip broke on resized thumbnail")
                ids.append(int(mid))
                ws.append(tw)
                hs.append(th)
                sums.append(int(thumb.sum()))
            yield pd.DataFrame(
                {id_col: ids, "out_w": ws, "out_h": hs, "pix_sum": sums}
            )

    return df.mapInPandas(run, schema=out_schema)


@corrupt_input_guard("WAV")
def wav_pcm_samples(payload: bytes):
    """Raw-sample PCM WAV decode (mono 16/8-bit, stdlib wave + numpy):
    returns (sample_rate, float64 samples in [-1, 1)). The sample-level
    sibling of wav_audio_decoder for operators that transform audio
    (downsample, trim, window) rather than just summarize it; same
    refuse-don't-blend policy for multi-channel and exotic widths."""
    import io
    import wave

    import numpy as np

    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        nch = w.getnchannels()
        raw = w.readframes(n)
    if nch != 1:
        raise ValueError(f"unsupported channel count {nch} (mono PCM only)")
    if len(raw) != n * width * nch:
        # same header/data consistency refusal as wav_audio_decoder
        raise ValueError("WAV data shorter than the declared frame count")
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    if samples.size == 0 or sr <= 0:
        raise ValueError("no samples")
    return sr, samples


def audio_downsample(
    df: DataFrame,
    *,
    factor: int = 2,
    id_col: str = "media_id",
    payload_col: str = "payload",
    samples_decoder=None,
) -> DataFrame:
    """Integer-factor audio decimation with block averaging — a REAL
    sample-level transform (not a metadata summary): decode PCM,
    average each consecutive ``factor`` samples (anti-alias boxcar),
    emit the downsampled stream's (sample_rate_out, n_out, rms_out).
    A partial tail block is dropped; payloads whose rate or length
    can't support the factor are dropped like undecodable ones.

    Exactness: 16-bit samples are k/2^15; a factor-2 block mean is
    (k1+k2)/2^16 — exactly representable — and every square has an
    integer numerator below 2^53, so the RMS sum is exact in ANY
    summation order and the final sqrt + floor-e6 rounding are
    bit-identical across engines (the wav_decode_real argument).

    100 TB shape: mapInPandas over Arrow batches — payloads stream
    through executors and are never collected; one narrow output row
    per clip. ``samples_decoder(payload) -> (sr, np.ndarray)`` is the
    stub/real swap point (default: the real wav_pcm_samples)."""
    import numpy as np

    decode = samples_decoder or wav_pcm_samples
    if factor < 1:
        raise ValueError("factor must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "sample_rate_out": [], "n_out": [], "rms_out": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    sr, s = decode(payload)
                    m = s.size // factor
                    if m == 0 or sr < factor:
                        raise ValueError("too short for factor")
                    blocks = s[: m * factor].reshape(m, factor).mean(axis=1)
                    rms = float(np.sqrt(np.mean(blocks**2)))
                except Exception:
                    continue
                out["media_id"].append(mid)
                out["sample_rate_out"].append(sr // factor)
                out["n_out"].append(m)
                out["rms_out"].append(math.floor(rms * 1e6 + 0.5) / 1e6)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        run, schema="media_id long, sample_rate_out int, n_out long, rms_out double"
    )


def image_dhash(px, *, grid_w: int = 9, grid_h: int = 7) -> int:
    """Perceptual difference-hash of a decoded pixel array (Krawetz's
    dHash): area-average the luma plane onto a grid_w×grid_h grid, then
    emit one bit per horizontal neighbor pair — 1 iff the left cell is
    brighter. Robust to uniform brightness shifts and to resizing (the
    properties that make it the standard cheap image near-dup key).

    Exactness: cell averages are RATIONALS (integer sum / count);
    comparing avg_l > avg_r via the integer cross-product
    s_l·c_r > s_r·c_l keeps every bit exact — no float division — so a
    SQL oracle reproduces the hash bit for bit. (grid_w-1)·grid_h bits
    pack little-endian into one BIGINT; the default 8×7 = 56 bits stays
    clear of int64 sign territory."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    if w < grid_w or h < grid_h:
        raise ValueError(f"image {w}x{h} smaller than dhash grid {grid_w}x{grid_h}")
    if px.ndim == 3:  # luma via the same ITU-R 601 integer weights as png_image_decoder
        ch = px.shape[2]
        if ch in (1, 2):
            luma = px[:, :, 0].astype(np.int64)
        else:
            luma = (
                299 * px[:, :, 0].astype(np.int64)
                + 587 * px[:, :, 1].astype(np.int64)
                + 114 * px[:, :, 2].astype(np.int64)
            )
    else:
        luma = px.astype(np.int64)
    tx = (np.arange(w) * grid_w) // w
    ty = (np.arange(h) * grid_h) // h
    flat = (ty[:, None] * grid_w + tx[None, :]).ravel()
    cnts = np.bincount(flat, minlength=grid_w * grid_h).astype(np.int64)
    sums = np.zeros(grid_w * grid_h, dtype=np.int64)
    np.add.at(sums, flat, luma.ravel())  # exact integer cell sums
    s = sums.reshape(grid_h, grid_w)
    c = cnts.reshape(grid_h, grid_w)
    dh = 0
    for j in range(grid_h):
        for i in range(grid_w - 1):
            if int(s[j, i]) * int(c[j, i + 1]) > int(s[j, i + 1]) * int(c[j, i]):
                dh |= 1 << (j * (grid_w - 1) + i)
    return dh


def image_dhash_features(
    df: DataFrame,
    *,
    pixels_decoder=png_decode_pixels,
    grid_w: int = 9,
    grid_h: int = 7,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Arrow-batched dHash over binary image payloads: decode → grid
    area-average → 56-bit hash per image. Undecodable payloads are
    dropped (the corpus-prep drop policy, same as image_features).
    Downstream exact near-dup grouping is a plain groupBy(dhash) — the
    whole pipeline shuffles only (id, int64) pairs, never pixels."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    px = pixels_decoder(bytes(payload))
                except Exception:  # drop policy: skip undecodable payloads
                    continue
                ids.append(mid)
                hashes.append(image_dhash(px, grid_w=grid_w, grid_h=grid_h))
            yield pd.DataFrame({id_col: ids, "dhash": pd.array(hashes, dtype="int64")})

    return df.mapInPandas(run, schema=f"{id_col} long, dhash long")


def audio_frame_energies(
    df: DataFrame,
    *,
    frame: int = 16,
    id_col: str = "media_id",
    payload_col: str = "payload",
    samples_decoder=None,
) -> DataFrame:
    """Frame-level energy extraction over binary audio payloads: REAL
    PCM decode (wav_pcm_samples) in mapInPandas, then per non-
    overlapping ``frame``-sample window the EXACT integer energy
    Σ k² of the recovered int16 samples (k = round(sample·32768) —
    lossless for PCM16, so no float leaves the Python boundary). A
    trailing partial frame is dropped (pinned convention). Undecodable
    payloads drop (the corpus-prep policy).

    Output (media_id, frame_idx, energy) — the substrate for VAD,
    silence trimming, clipping detection; everything downstream is JVM
    window algebra, never Python."""
    import numpy as np
    import pandas as pd

    decode = samples_decoder or wav_pcm_samples

    def run(batches):
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "energy": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    _sr, samples = decode(payload)
                except Exception:
                    continue
                k = np.rint(samples * 32768.0).astype(np.int64)
                nf = k.size // frame
                if nf == 0:
                    continue
                e = (k[: nf * frame].reshape(nf, frame) ** 2).sum(axis=1)
                out["media_id"].extend([int(mid)] * nf)
                out["frame_idx"].extend(range(nf))
                out["energy"].extend(int(x) for x in e)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        run, schema="media_id long, frame_idx long, energy long"
    )


def vad_segments(
    energies: DataFrame,
    *,
    threshold: int,
    id_col: str = "media_id",
) -> DataFrame:
    """Voice-activity summary from frame energies: voiced = energy ≥
    threshold (exact integer compare); consecutive voiced frames merge
    into segments via the gaps-and-islands device (segment starts where
    a voiced frame follows a non-voiced one, running-sum numbering).
    Emits per media: (n_frames, n_voiced, n_segments, longest_run).

    100 TB shape: one shuffle on the media key, then a SINGLE
    downstream path — (media, segment, voiced) group counts fold to the
    per-media summary in one more (already reduced) aggregate. The
    input lineage is consumed exactly once: a totals-vs-runs join would
    re-evaluate an expensive upstream (e.g. the real decode) twice."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy("frame_idx")
    voiced = F.col("energy") >= F.lit(int(threshold))
    start = voiced & ~F.coalesce(F.lag(voiced).over(w), F.lit(False))
    seg = F.sum(F.when(start, 1).otherwise(0)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = energies.select(
        id_col,
        voiced.alias("__v__"),
        seg.alias("__seg__"),
    )
    groups = marked.groupBy(id_col, "__seg__", "__v__").agg(
        F.count(F.lit(1)).alias("__cnt__")
    )
    return groups.groupBy(id_col).agg(
        F.sum("__cnt__").alias("n_frames"),
        F.coalesce(F.sum(F.when(F.col("__v__"), F.col("__cnt__"))), F.lit(0)).alias("n_voiced"),
        F.count(F.when(F.col("__v__"), F.lit(1))).alias("n_segments"),
        F.coalesce(F.max(F.when(F.col("__v__"), F.col("__cnt__"))), F.lit(0)).alias("longest_run"),
    )
