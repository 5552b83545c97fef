"""Corrupt-input fuzz sweep over the binary decoders.

Contract under test (decode_guard.py): every public decode entry point
— jpeg_decode/jpeg_decode_gray, png_decode_pixels, wav_audio_decoder,
wav_pcm_samples — either decodes or raises ValueError, for ANY bytes.
Before the guard landed, this exact sweep leaked 4,500+ IndexError /
KeyError / OverflowError / struct.error / zlib.error / wave.Error /
EOFError exceptions from the stdlib primitives the decoders build on;
at 100 TB those would surface as task failures instead of the
documented drop-policy skip.

The sweep is deterministic (seeded rng, fixed payloads) so it is a
regression test, not a flaky fuzzer: truncations at EVERY byte offset,
seeded random byte flips, and magic-prefixed random garbage.
"""

from __future__ import annotations

import io
import random
import wave

import numpy as np
import pytest

from tada_spark.functions.jpeg import (
    encode_jpeg_color420,
    encode_jpeg_gray,
    encode_jpeg_progressive,
    jpeg_decode,
)
from tada_spark.functions.multimodal import (
    encode_png_gray8,
    png_decode_pixels,
    wav_audio_decoder,
    wav_pcm_samples,
)


def _img(h: int = 16, w: int = 24) -> np.ndarray:
    y, x = np.indices((h, w))
    return ((x * 7 + y * 13) % 256).astype(np.uint8)


def _wav_payload() -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(bytes(range(200)))
    return buf.getvalue()


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    c = ctype + data
    return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))


_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_palette_payload() -> bytes:
    import struct
    import zlib

    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, size=(17, 3), dtype=np.uint8)
    idx = rng.integers(0, 17, size=(9, 13), dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(9))
    ihdr = struct.pack(">IIBBBBB", 13, 9, 8, 3, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"PLTE", pal.tobytes())
            + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b""))


def _png_adam7_payload() -> bytes:
    import struct
    import zlib

    img = _img(17, 23)[:, :, None]
    out = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        for y in range(sub.shape[0]):
            out += b"\x00" + sub[y].tobytes()
    ihdr = struct.pack(">IIBBBBB", 23, 17, 8, 0, 0, 0, 1)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
            + _png_chunk(b"IEND", b""))


def _targets():
    img = _img()
    cb = ((_img()[::2, ::2].astype(int) + 40) % 256).astype(np.uint8)
    cr = ((_img()[::2, ::2].astype(int) + 80) % 256).astype(np.uint8)
    return [
        ("jpeg_baseline", jpeg_decode, encode_jpeg_gray(img)),
        ("jpeg_progressive", jpeg_decode, encode_jpeg_progressive(img)),
        ("jpeg_color420", jpeg_decode, encode_jpeg_color420(img, cb, cr)),
        ("png", png_decode_pixels, encode_png_gray8(24, 16, lambda x, y: (x * 7 + y * 13) % 256)),
        ("png_palette", png_decode_pixels, _png_palette_payload()),
        ("png_adam7", png_decode_pixels, _png_adam7_payload()),
        ("wav_features", wav_audio_decoder, _wav_payload()),
        ("wav_samples", wav_pcm_samples, _wav_payload()),
    ]


def _expect_decode_or_valueerror(name, fn, payload):
    try:
        fn(payload)
    except ValueError:
        pass  # the one permitted failure mode
    # anything else propagates and fails the test with its own traceback


@pytest.mark.parametrize("name,fn,payload", _targets(), ids=lambda t: t if isinstance(t, str) else "")
def test_base_payloads_decode(name, fn, payload):
    # the sweep's pass criterion is decode-or-ValueError, so the
    # unmutated baselines must actually DECODE or the mutations below
    # pass vacuously
    assert fn(payload) is not None


@pytest.mark.parametrize("name,fn,payload", _targets(), ids=lambda t: t if isinstance(t, str) else "")
def test_truncation_at_every_offset(name, fn, payload):
    for i in range(len(payload)):
        _expect_decode_or_valueerror(name, fn, payload[:i])


@pytest.mark.parametrize("name,fn,payload", _targets(), ids=lambda t: t if isinstance(t, str) else "")
def test_seeded_byte_flips(name, fn, payload):
    rng = random.Random(42)
    for _ in range(400):
        b = bytearray(payload)
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        _expect_decode_or_valueerror(name, fn, bytes(b))


@pytest.mark.parametrize("name,fn,payload", _targets(), ids=lambda t: t if isinstance(t, str) else "")
def test_magic_prefixed_garbage(name, fn, payload):
    rng = random.Random(7)
    for _ in range(200):
        junk = payload[:4] + bytes(rng.randrange(256) for _ in range(rng.randrange(200)))
        _expect_decode_or_valueerror(name, fn, junk)


def test_guard_chains_original_exception():
    # A short header read hits struct.error inside; the guard must
    # surface ValueError with the original chained as __cause__.
    payload = encode_png_gray8(8, 8, lambda x, y: x)[:20]
    with pytest.raises(ValueError) as ei:
        png_decode_pixels(payload)
    assert ei.value.__cause__ is not None or "PNG" in str(ei.value) or "trunc" in str(ei.value)


def test_guard_passes_refusals_through_verbatim():
    # Deliberate refusals keep their specific messages (not rewrapped).
    stereo = io.BytesIO()
    with wave.open(stereo, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(bytes(range(200)))
    with pytest.raises(ValueError, match="mono PCM only"):
        wav_audio_decoder(stereo.getvalue())


def test_guard_does_not_mask_programming_errors():
    # TypeError (a caller bug, not corrupt data) must NOT become ValueError.
    with pytest.raises(TypeError):
        jpeg_decode(None)


def test_guard_exception_taxonomy():
    # MemoryError = environment, RecursionError/NotImplementedError =
    # programming bugs: all must propagate so the drop policy stays a
    # deterministic function of the payload. Bare RuntimeError is the
    # stdlib wave reader's corrupt-chunk signal and must rewrap.
    from tada_spark.functions.decode_guard import corrupt_input_guard

    def raiser(exc):
        @corrupt_input_guard("TEST")
        def f(_payload):
            raise exc

        return f

    for exc in (MemoryError("oom"), RecursionError("deep"), NotImplementedError("todo")):
        with pytest.raises(type(exc)):
            raiser(exc)(b"x")
    with pytest.raises(ValueError, match="corrupt TEST payload"):
        raiser(RuntimeError())(b"x")


def test_wave_bare_runtimeerror_rewraps_end_to_end():
    # CPython's wave.initfp raises bare (unsubclassed) RuntimeError on
    # this malformed chunk-size mutation (found by the seeded sweep,
    # verified raw against the stdlib); the boundary must present the
    # documented ValueError instead.
    import contextlib

    base = bytearray(_wav_payload())
    base[17], base[172] = 34, 120
    payload = bytes(base)
    raw_types = set()
    with contextlib.suppress(Exception):
        try:
            with wave.open(io.BytesIO(payload), "rb") as r:
                r.readframes(r.getnframes())
        except BaseException as e:  # record what the stdlib really raises
            raw_types.add(type(e))
            raise
    if raw_types == {RuntimeError}:  # stdlib behavior may vary by version
        with pytest.raises(ValueError, match="corrupt WAV payload"):
            wav_audio_decoder(payload)
    else:  # other versions may signal differently; contract still holds
        _expect_decode_or_valueerror("wav", wav_audio_decoder, payload)


def _png_raw(w, h, idat_raw):
    import struct
    import zlib

    def chunk(ctype, data):
        c = ctype + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(idat_raw)) + chunk(b"IEND", b""))


def test_png_dimension_bomb_refused_before_inflate():
    # 40000x40000 of zeros compresses ~1000:1 — a 1.5 MB payload that
    # claimed a 12 GiB image and killed the task with MemoryError
    # before the MAX_DECODE_PIXELS guard existed.
    w = h = 40_000
    payload = _png_raw(w, h, (b"\x00" + bytes(w)) * h)
    assert len(payload) < 4_000_000
    with pytest.raises(ValueError, match="decompression-bomb"):
        png_decode_pixels(payload)


def test_png_oversized_stream_under_honest_header_is_trailing_data():
    # honest 4x3 header, but the zlib stream inflates to 100k rows: the
    # bounded inflate must stop at the expected byte count and refuse,
    # never materialize the excess.
    payload = _png_raw(4, 3, (b"\x00" + bytes(4)) * 100_000)
    with pytest.raises(ValueError, match="trailing image data"):
        png_decode_pixels(payload)


def test_jpeg_sof_dimension_bomb_refused_before_allocation():
    from tada_spark.functions.jpeg import MAX_DECODE_PIXELS, encode_jpeg_gray

    base = bytearray(encode_jpeg_gray(_img(8, 8)))
    sof = base.find(b"\xff\xc0")
    assert sof > 0
    # SOF0 body: len(2) precision(1) h(2) w(2) ... — forge 65535x65535
    base[sof + 5:sof + 9] = b"\xff\xff\xff\xff"
    assert 65535 * 65535 > MAX_DECODE_PIXELS
    with pytest.raises(ValueError, match="decompression-bomb"):
        jpeg_decode(bytes(base))


def test_wav_forged_data_size_refused_not_misreported():
    # A forged data-chunk size used to yield duration_s from the HEADER
    # (5.0 s) over the ACTUAL 100 frames' rms — silently inconsistent
    # features. Both entry points must refuse instead.
    import struct

    b = bytearray(_wav_payload())
    i = bytes(b).find(b"data")
    b[i + 4:i + 8] = struct.pack("<I", 80_000)  # claim 40k frames
    for fn in (wav_audio_decoder, wav_pcm_samples):
        with pytest.raises(ValueError, match="declared frame count"):
            fn(bytes(b))


def test_progressive_encoder_rejects_lone_chroma_plane():
    from tada_spark.functions.jpeg import encode_jpeg_progressive

    img = _img(16, 16)
    half = img[::2, ::2]
    with pytest.raises(ValueError, match="both-or-neither"):
        encode_jpeg_progressive(img, half, None)
    with pytest.raises(ValueError, match="both-or-neither"):
        encode_jpeg_progressive(img, None, half)


# ---- arithmetic / lossless / extended-precision JPEG refusals (r10) --
# The decoder supports baseline (SOF0) + progressive (SOF2) Huffman —
# ~95%+ of real corpora (SCALE.md). Everything else must REFUSE with
# the documented ValueError (never mis-decode, never crash with a
# non-contract exception), so a real-corpus sweep records a drop
# reason for the ~0% tail: SOF9-11 arithmetic coding (patent-era
# non-adoption), SOF3/7 lossless, SOF5/6 differential sequential,
# SOF13-15 differential arithmetic, and 12-bit sample precision.

_UNSUPPORTED_SOF = [0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]


@pytest.mark.parametrize("sof", _UNSUPPORTED_SOF, ids=lambda m: f"SOF_0x{m:02X}")
def test_arithmetic_and_lossless_frames_refused(sof):
    base = bytearray(encode_jpeg_gray(_img(8, 8)))
    off = base.find(b"\xff\xc0")
    assert off > 0
    base[off + 1] = sof
    with pytest.raises(ValueError, match="non-baseline frame marker"):
        jpeg_decode(bytes(base))


def test_arithmetic_frame_with_dac_segment_refused():
    # a real SOF9 file carries a DAC (0xFFCC) conditioning-table
    # segment; inserting one before the (rewritten) frame marker must
    # not confuse the parser — the refusal still fires at the frame
    base = bytearray(encode_jpeg_gray(_img(8, 8)))
    off = base.find(b"\xff\xc0")
    base[off + 1] = 0xC9
    dac = b"\xff\xcc\x00\x04\x00\x10"  # marker, len=4, Tb=0, Cs=0x10
    payload = bytes(base[:off]) + dac + bytes(base[off:])
    with pytest.raises(ValueError, match="non-baseline frame marker"):
        jpeg_decode(payload)


def test_twelve_bit_precision_refused():
    base = bytearray(encode_jpeg_gray(_img(8, 8)))
    off = base.find(b"\xff\xc0")
    base[off + 4] = 12  # SOF body: len(2) precision(1) — forge 12-bit
    with pytest.raises(ValueError):
        jpeg_decode(bytes(base))


def test_refusals_survive_mutation_sweep():
    # the progressive fuzz discipline applied to the refusal path:
    # truncating an arithmetic-coded payload at every offset must still
    # produce only the contract failure mode (ValueError), never a
    # mis-decode into pixels or a non-contract exception
    base = bytearray(encode_jpeg_gray(_img(8, 8)))
    off = base.find(b"\xff\xc0")
    base[off + 1] = 0xC9
    payload = bytes(base)
    for cut in range(2, len(payload), 7):
        try:
            out = jpeg_decode(payload[:cut])
        except ValueError:
            continue
        raise AssertionError(f"truncation at {cut} decoded: {type(out)}")
