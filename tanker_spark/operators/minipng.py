"""Minimal pure-stdlib PNG codec: 8-bit grayscale, non-interlaced.

Exists so the multimodal decode path is REAL (pixels in, pixels out)
even in environments without Pillow — the container this engine ships
in has no image libs, and a decode path that only ever runs its stub is
untested plumbing. Pillow remains the preferred backend when importable
(`multimodal._try_pil`); this module is the fallback for the PNG subset
it covers and the generator used by the test suite.

Writer: filter 0 rows + zlib. Decoder: handles all five PNG row filters
(spec §9: none/sub/up/average/paeth), so images from any conformant
encoder decode correctly as long as they are 8-bit grayscale.
"""

from __future__ import annotations

import struct
import zlib

SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: Per-payload decoded-size ceiling (256 MB of filtered rows). The
#: IHDR alone can declare ~2^64 pixels and the IDAT stream is zlib —
#: a small crafted payload must cost a ValueError (→ the consumer's
#: junk→NULL row), never an executor-killing allocation or a
#: billion-iteration filter loop. Same rule as minivid.
MAX_DECODED_BYTES = 1 << 28


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_gray(pixels, width: int, height: int) -> bytes:
    """Row-major 8-bit grayscale pixels → PNG bytes."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    raw = b"".join(
        b"\x00" + bytes(pixels[y * width:(y + 1) * width])
        for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def decode_gray(data: bytes):
    """PNG bytes → (width, height, row-major pixel bytes).

    Only 8-bit grayscale (color type 0), non-interlaced — the subset
    ``encode_gray`` emits. Anything else raises ``NotImplementedError``
    so a silent wrong decode can't masquerade as a real one."""
    if bytes(data[:8]) != SIGNATURE:
        raise ValueError("not a PNG payload")
    pos, w, h, idat = 8, None, None, b""
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            if len(chunk) != 13:
                # struct.error is not ValueError — a short IHDR must
                # still land in the junk→NULL contract
                raise ValueError("corrupt PNG: IHDR is %d bytes"
                                 % len(chunk))
            w, h, depth, ctype, _comp, _filt, inter = struct.unpack(
                ">IIBBBBB", chunk)
            if depth != 8 or ctype != 0 or inter != 0:
                raise NotImplementedError(
                    "minipng decodes only 8-bit non-interlaced grayscale "
                    "(got depth=%d colortype=%d interlace=%d) — install "
                    "Pillow for full decode" % (depth, ctype, inter)
                )
            if w == 0 or h == 0:
                # w=0 with a u32 h is a billion-row no-op filter loop —
                # an effective hang on one adversarial row
                raise ValueError("degenerate PNG dimensions %dx%d"
                                 % (w, h))
            if h * (w + 1) > MAX_DECODED_BYTES:
                raise ValueError(
                    "PNG declares %dx%d (%d filtered bytes), over the "
                    "%d-byte per-payload ceiling"
                    % (w, h, h * (w + 1), MAX_DECODED_BYTES)
                )
        elif tag == b"IDAT":
            idat += bytes(chunk)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    want = h * (w + 1)  # h filter bytes + h*w pixels
    try:
        # bounded expansion: the cap is known from the (validated)
        # header, so a zlib bomb can never out-allocate it
        raw = zlib.decompressobj().decompress(idat, want + 1)
    except zlib.error as exc:
        raise ValueError("corrupt PNG IDAT stream: %s" % exc)
    if len(raw) != want:
        raise ValueError(
            "PNG pixel stream is %d bytes, want %d for %dx%d"
            % (len(raw), want, w, h)
        )
    out = bytearray(w * h)
    prev = bytearray(w)
    p = 0
    for y in range(h):
        f = raw[p]
        row = bytearray(raw[p + 1:p + 1 + w])
        p += 1 + w
        if f == 1:  # sub
            for x in range(1, w):
                row[x] = (row[x] + row[x - 1]) & 255
        elif f == 2:  # up
            for x in range(w):
                row[x] = (row[x] + prev[x]) & 255
        elif f == 3:  # average
            for x in range(w):
                left = row[x - 1] if x else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 255
        elif f == 4:  # paeth
            for x in range(w):
                a = row[x - 1] if x else 0
                b = prev[x]
                c = prev[x - 1] if x else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pr = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
                row[x] = (row[x] + pr) & 255
        elif f != 0:
            raise ValueError("unknown PNG filter %d" % f)
        out[y * w:(y + 1) * w] = row
        prev = row
    return w, h, bytes(out)


def mean_pool(pixels: bytes, w: int, h: int, side: int):
    """Box mean-pool to ``side×side`` floats in [0, 1] (row-major)."""
    feats = []
    for by in range(side):
        y0, y1 = by * h // side, max(by * h // side + 1, (by + 1) * h // side)
        for bx in range(side):
            x0 = bx * w // side
            x1 = max(x0 + 1, (bx + 1) * w // side)
            s = n = 0
            for y in range(y0, y1):
                base = y * w
                for x in range(x0, x1):
                    s += pixels[base + x]
                    n += 1
            feats.append(s / n / 255.0)
    return feats


def resize_nearest(pixels: bytes, w: int, h: int, nw: int, nh: int) -> bytes:
    """Nearest-neighbor resample, row-major grayscale."""
    out = bytearray(nw * nh)
    for y in range(nh):
        sy = y * h // nh
        base = sy * w
        obase = y * nw
        for x in range(nw):
            out[obase + x] = pixels[base + x * w // nw]
    return bytes(out)
