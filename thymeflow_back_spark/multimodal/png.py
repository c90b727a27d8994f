"""Pure-stdlib PNG codec: zlib inflate + scanline filter reconstruction in
numpy. No external image library — this is the "real decode" path for the
multimodal operators in a runtime without PIL/ffmpeg.

Decoder scope (raises ``ValueError`` outside it): 8-bit samples,
color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
interlace method 0. Output is always HxWx3 uint8 RGB (alpha dropped,
palette resolved). The encoder writes 8-bit RGB, filter 0, one IDAT —
enough to round-trip test vectors and synthesize fixtures.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(data: bytes):
    pos = 8
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("PNG: truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("PNG: truncated chunk body")
        yield ctype, body
        pos += 12 + length  # header + body + CRC


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering → (height, stride) uint8 matrix."""
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG: decompressed size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=row_start + 1)
        if ftype == 0:  # None
            recon = line.copy()
        elif ftype == 1:  # Sub — prefix sum per bpp lane, mod 256
            recon = (
                np.cumsum(line.reshape(-1, bpp), axis=0, dtype=np.uint32) % 256
            ).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            recon = line + prev
        elif ftype == 3:  # Average — sequential along the row
            recon = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(recon[x - bpp]) if x >= bpp else 0
                recon[x] = (int(line[x]) + (left + int(prev[x])) // 2) % 256
        elif ftype == 4:  # Paeth — sequential along the row
            recon = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(recon[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                ul = int(prev[x - bpp]) if x >= bpp else 0
                recon[x] = (int(line[x]) + _paeth(left, up, ul)) % 256
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = recon
        prev = recon
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → HxWx3 uint8 RGB array. Malformed input of any kind
    raises ValueError (the module contract) — zlib/struct/indexing errors
    from damaged streams are wrapped, never leaked."""
    try:
        return _decode_png(data)
    except ValueError:
        raise
    except (zlib.error, struct.error, IndexError, OverflowError) as e:
        raise ValueError(f"PNG: malformed stream ({e})") from e


def _decode_png(data: bytes) -> np.ndarray:
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("PNG: bad signature")
    width = height = None
    bit_depth = color_type = interlace = None
    palette: np.ndarray | None = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"PNG: unsupported bit depth {bit_depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"PNG: unsupported color type {color_type}")
    if interlace != 0:
        raise ValueError("PNG: interlaced images are not supported")
    channels = _CHANNELS[color_type]
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    mat = _unfilter(raw, height, stride, channels).reshape(height, width, channels)
    if color_type == 2:
        return mat
    if color_type == 6:
        return mat[:, :, :3].copy()
    if color_type == 0:
        return np.repeat(mat, 3, axis=2)
    if color_type == 4:
        return np.repeat(mat[:, :, :1], 3, axis=2)
    # color_type == 3: palette lookup
    if palette is None:
        raise ValueError("PNG: palette image without PLTE")
    return palette[mat[:, :, 0]]


def encode_png(img: np.ndarray, compress_level: int = 6) -> bytes:
    """HxWx3 uint8 RGB array → PNG bytes (filter 0, single IDAT)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_png expects an HxWx3 array")
    height, width = img.shape[:2]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(height))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, compress_level))
        + chunk(b"IEND", b"")
    )
