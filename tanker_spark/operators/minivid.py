"""Minimal pure-stdlib video codec: 8-bit grayscale raw frames.

The video twin of :mod:`minipng` / :mod:`miniwav` — exists so the
video decode path is REAL (frames in, pixels out) even in environments
without ffmpeg/PyAV: this container ships no video libs, and a decode
path that only ever runs its stub is untested plumbing (the same
honesty rule that got images real payloads in r8 and audio in r7).

Layout (little-endian)::

    b"MVID" | version u8 (=1) | flags u8 (bit0: zlib) |
    width u16 | height u16 | fps u16 | n_frames u32 |
    frame data: n_frames * width * height bytes of row-major 8-bit
    grayscale, concatenated in frame order (zlib-compressed as one
    stream when bit0 is set)

This is deliberately a CONTAINER-plus-raw-frames format, not a real
inter-frame codec: the point is exercising the Spark-side plumbing —
schema, Arrow batching, per-frame fan-out, junk→NULL — against real
pixel math, with the encoder/decoder small enough to verify by eye.
Real deployments swap :func:`decode_gray_video` for an ffmpeg/PyAV
call behind the same signature.
"""

from __future__ import annotations

import struct
import zlib

MAGIC = b"MVID"
_HDR = "<4sBBHHHI"
_HDR_LEN = struct.calcsize(_HDR)

#: Per-payload decoded-size ceiling (256 MB). The header alone can
#: declare n_frames*width*height ≈ 2^64 bytes, and the zlib branch
#: would otherwise happily expand a small crafted payload toward it —
#: one adversarial row must cost a ValueError (→ the junk→NULL row),
#: never an executor-killing allocation. Real clips at this codec's
#: subset (8-bit grayscale) sit far below; deployments that swap in
#: ffmpeg inherit its own bounds instead.
MAX_DECODED_BYTES = 1 << 28


def encode_gray_video(frames, width: int, height: int, fps: int,
                      compress: bool = True) -> bytes:
    """Row-major 8-bit grayscale ``frames`` (iterable of ``bytes`` of
    length width*height) → MVID payload."""
    frames = [bytes(f) for f in frames]
    for name, val, hi in (("width", width, 0xFFFF),
                          ("height", height, 0xFFFF),
                          ("fps", fps, 0xFFFF)):
        if not 1 <= int(val) <= hi:
            raise ValueError("%s must be in [1, %d], got %r"
                             % (name, hi, val))
    if len(frames) > 0xFFFFFFFF:
        raise ValueError("too many frames: %d" % len(frames))
    for i, f in enumerate(frames):
        if len(f) != width * height:
            raise ValueError(
                "frame %d is %d bytes, want width*height=%d"
                % (i, len(f), width * height)
            )
    blob = b"".join(frames)
    flags = 1 if compress else 0
    if compress:
        blob = zlib.compress(blob)
    return struct.pack(
        _HDR, MAGIC, 1, flags, width, height, fps, len(frames)
    ) + blob


def decode_gray_video(payload: bytes):
    """MVID payload → ``(width, height, fps, frames)`` with ``frames``
    a list of ``bytes`` (row-major 8-bit grayscale). Raises ValueError
    on anything that is not a well-formed MVID stream — including a
    frame blob whose length disagrees with the header (a truncated
    file must hit the junk→NULL path, never decode fewer frames;
    the same rule miniwav adopted in r8)."""
    payload = bytes(payload or b"")
    if len(payload) < _HDR_LEN or payload[:4] != MAGIC:
        raise ValueError("not an MVID payload")
    magic, version, flags, width, height, fps, n_frames = struct.unpack(
        _HDR, payload[:_HDR_LEN]
    )
    if version != 1:
        raise ValueError("unsupported MVID version %d" % version)
    # The encoder rejects these at write time; a payload carrying them
    # is crafted or corrupt. fps=0 in particular once spun
    # video_frame_features' sampling loop forever (frame_idx = ts*0
    # never advances) — decode must refuse what encode refuses.
    if fps == 0 or width == 0 or height == 0:
        raise ValueError(
            "degenerate MVID header: width=%d height=%d fps=%d"
            % (width, height, fps)
        )
    want = n_frames * width * height
    if want > MAX_DECODED_BYTES:
        raise ValueError(
            "MVID header declares %d decoded bytes (%d frames of "
            "%dx%d), over the %d-byte per-payload ceiling"
            % (want, n_frames, width, height, MAX_DECODED_BYTES)
        )
    blob = payload[_HDR_LEN:]
    if flags & 1:
        try:
            # bound the expansion BEFORE trusting the stream: a zlib
            # bomb must not out-allocate the header's (already capped)
            # declared size. +1 so an over-long stream is detectable
            # as a length mismatch below instead of a silent clamp.
            obj = zlib.decompressobj()
            blob = obj.decompress(blob, want + 1)
            if obj.unused_data or obj.unconsumed_tail:
                raise ValueError(
                    "over-long MVID frame stream: data beyond the "
                    "declared %d bytes" % want)
        except zlib.error as exc:
            raise ValueError("corrupt MVID frame stream: %s" % exc)
    if len(blob) != want:
        raise ValueError(
            "MVID frame stream length mismatch: header declares %d "
            "bytes (%d frames of %dx%d), got %d"
            % (want, n_frames, width, height, len(blob))
        )
    fsz = width * height
    frames = [blob[i * fsz:(i + 1) * fsz] for i in range(n_frames)]
    return width, height, fps, frames
