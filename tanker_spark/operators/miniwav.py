"""Minimal pure-stdlib WAV codec: 16-bit PCM, mono or stereo.

The audio twin of :mod:`minipng` — exists so the audio decode path is
REAL (samples in, samples out) even in environments without soundfile/
librosa: this container ships no audio libs, and a decode path that
only ever runs its stub is untested plumbing. 16-bit PCM WAV is just a
RIFF header in front of little-endian int16 frames, so a conformant
subset codec is ~60 lines and numpy consumes the samples directly.

Writer: canonical 44-byte RIFF/fmt/data layout. Decoder: walks the
chunk list (ignoring LIST/fact/etc.), so files from any conformant
encoder decode as long as they are 16-bit integer PCM.
"""

from __future__ import annotations

import struct

#: Per-payload decoded-size ceiling on the data chunk (256 MB of PCM
#: bytes). The decoder expands int16 frames ~14× into Python int
#: objects in a list — one adversarial row with a huge data chunk must
#: cost a ValueError (→ the consumer's junk→NULL row), never a
#: multi-GB executor allocation. Same rule as minipng/minivid.
MAX_DECODED_BYTES = 1 << 28


def encode_pcm16(samples, sample_rate: int, n_channels: int = 1) -> bytes:
    """Interleaved int16 samples → WAV bytes."""
    if n_channels not in (1, 2):
        raise ValueError("n_channels must be 1 or 2")
    if not 1 <= int(sample_rate) <= 0xFFFFFFFF:
        # struct would reject out-of-u32 rates with struct.error; 0 is
        # in-range but degenerate (duration/frame math divides by it)
        raise ValueError("sample_rate must be in [1, 2^32-1], got %r"
                         % (sample_rate,))
    if len(samples) % n_channels:
        raise ValueError("sample count not a multiple of channels")
    data = struct.pack("<%dh" % len(samples), *samples)
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate,
        n_channels * 2, 16,
    )
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_pcm16(payload: bytes):
    """WAV bytes → (samples, sample_rate, n_channels); samples are the
    interleaved int16 frames as a python list. Raises ValueError on
    anything that is not 16-bit integer PCM."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        if pos + 8 + size > len(payload):
            # a declared chunk size past the payload end means a
            # truncated/corrupt file — raise so it hits the documented
            # junk→NULL path instead of silently decoding fewer
            # samples (whose duration/RMS would quietly reflect the
            # truncation; r8 ADVICE fix)
            raise ValueError(
                "truncated %r chunk: declares %d bytes, %d remain"
                % (tag, size, len(payload) - pos - 8)
            )
        body = payload[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            if len(body) < 16:
                # struct.error is not ValueError — a short fmt chunk
                # must still land in the junk→NULL contract
                raise ValueError("corrupt fmt chunk: %d bytes"
                                 % len(body))
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate = fmt[0], fmt[1], fmt[2]
    bits = fmt[5]
    if audio_format != 1 or bits != 16:
        raise ValueError(
            "only 16-bit integer PCM supported (format %d, %d bits)"
            % (audio_format, bits)
        )
    # the consumers' numpy math trusts these: nch outside (1, 2) makes
    # the stereo mixdown reshape throw OUTSIDE the junk→NULL try, and
    # rate=0 is degenerate (duration/frame-length divide by it)
    if n_channels not in (1, 2):
        raise ValueError("n_channels must be 1 or 2, got %d"
                         % n_channels)
    if sample_rate == 0:
        raise ValueError("sample_rate 0 is degenerate")
    if len(data) % 2:
        # int16 PCM cannot have an odd byte count — a silent //2 would
        # decode a truncated tail sample away (the r8 truncation rule)
        raise ValueError("odd data chunk length %d for 16-bit PCM"
                         % len(data))
    if len(data) > MAX_DECODED_BYTES:
        raise ValueError(
            "data chunk is %d bytes, over the %d-byte per-payload "
            "ceiling (the int16 unpack expands ~14x into Python "
            "objects)" % (len(data), MAX_DECODED_BYTES))
    n = len(data) // 2
    if n % n_channels:
        # stereo frames are sample PAIRS; an unpaired tail would make
        # the consumer's channel-mixdown reshape throw outside its
        # junk→NULL try
        raise ValueError("sample count %d not a multiple of %d channels"
                         % (n, n_channels))
    samples = list(struct.unpack("<%dh" % n, data[:n * 2]))
    return samples, sample_rate, n_channels
