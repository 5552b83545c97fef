"""Corrupt-input normalization for the binary decoders.

Every public decode entry point (JPEG, PNG, WAV) documents one error
contract: out-of-scope or corrupt input raises ``ValueError``; the
Spark adapters' drop policy then skips the row. The decoders enforce
that contract at every *anticipated* failure site, but a fuzz sweep
(tests/test_decode_fuzz.py — truncations at every offset, random byte
flips, magic-prefixed garbage) showed mutated payloads can still reach
stdlib/numpy primitives first and leak their native exceptions:
``struct.error`` from a short header read, ``zlib.error`` from a
corrupted IDAT stream, ``wave.Error``/``EOFError`` from a mangled RIFF
chunk, ``IndexError``/``KeyError``/``OverflowError`` from
flipped-Huffman-bit arithmetic in the JPEG entropy loops.

At 100 TB one corrupt object per billion is a certainty, so the
boundary itself guarantees the contract: :func:`corrupt_input_guard`
wraps the public decode functions and converts those low-level
exception types into ``ValueError`` (chained, so the original
traceback survives for debugging). ``ValueError`` raised inside —
including every deliberate refusal message — passes through untouched,
and nothing about the success path changes. Genuine programming errors
(TypeError, AttributeError, AssertionError …) still propagate: the
guard enumerates decode-failure types rather than catching Exception.
"""

from __future__ import annotations

import functools
import struct
import wave
import zlib
from collections.abc import Callable

#: Exception types a mutated payload can provoke from the stdlib/numpy
#: primitives the decoders are built on. Deliberately NOT here:
#: MemoryError (a valid payload on a memory-tight executor is not
#: corrupt — rewrapping it would make the drop policy nondeterministic
#: across runs) and RuntimeError subclasses like RecursionError /
#: NotImplementedError (genuine programming errors must fail loudly).
#: Bare RuntimeError IS a corrupt-input signal — CPython's ``wave``
#: reader raises it unsubclassed on malformed RIFF chunk sizes
#: (wave.py initfp, verified on 3.11) — so the handler admits it by
#: exact type only.
_CORRUPT_PAYLOAD_ERRORS: tuple[type[BaseException], ...] = (
    IndexError,
    KeyError,
    OverflowError,
    EOFError,
    struct.error,
    zlib.error,
    wave.Error,
)


def corrupt_input_guard(fmt: str) -> Callable:
    """Decorator: re-raise low-level decode failures as ``ValueError``.

    ``fmt`` names the container format for the message ("JPEG", "PNG",
    "WAV"). ValueError (the contract type) passes through unchanged.
    """

    def deco(fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except ValueError:
                raise
            except RuntimeError as e:
                if type(e) is not RuntimeError:  # RecursionError etc.
                    raise
                raise ValueError(
                    f"corrupt {fmt} payload ({type(e).__name__}: {e})"
                ) from e
            except _CORRUPT_PAYLOAD_ERRORS as e:
                raise ValueError(
                    f"corrupt {fmt} payload ({type(e).__name__}: {e})"
                ) from e

        return wrapped

    return deco
