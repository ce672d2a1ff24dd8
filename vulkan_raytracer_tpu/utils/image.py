"""Image I/O: PNG read/write, Radiance HDR read/write, texture decode.

Replaces the reference's stb_image/stb_image_write usage (image.cpp:21-58
loads glTF textures; the skybox HDR loads via the same path,
raytracer.cpp:57).  Pure Python + zlib + NumPy — no external deps.

Notes on parity: the reference creates textures as UNORM (not SRGB) formats
(image.cpp:44-51), i.e. 8-bit texel values are used linearly without gamma
decode; ``load_texture`` reproduces that (value/255).  The reference has no
image *writer* at all — its only sink is the swapchain (SURVEY.md §5); the
PNG writer here is the new headless output path.
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def write_png(path: str | Path, rgb: np.ndarray) -> None:
    """Write an (H, W, 3|4) uint8 (or float in [0,1]) array as PNG."""
    arr = np.asarray(rgb)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None].repeat(3, axis=2)
    h, w, c = arr.shape
    colour_type = {1: 0, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, colour_type, 0, 0, 0)
    payload = (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    Path(path).write_bytes(payload)


def read_png(data: bytes) -> np.ndarray:
    """Decode an 8/16-bit non-interlaced PNG to (H, W, C) uint8/uint16."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG file")
    pos = 8
    idat = b""
    ihdr = None
    palette = None
    trns = None
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _, _, interlace = ihdr
    if interlace:
        raise ValueError("interlaced PNG not supported")
    if depth not in (8, 16):
        raise ValueError(f"PNG bit depth {depth} not supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    bpp = channels * depth // 8
    stride = w * bpp
    raw = zlib.decompress(idat)
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    off = 0
    for y in range(h):
        ftype = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1).copy()
        off += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            line = (line.astype(np.int32) + prev) .astype(np.uint8)
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need sequential bytes
            # The left neighbour `a` must come from the RECONSTRUCTED row
            # (`la`), never the raw filtered bytes; pixels are processed in
            # bpp-wide groups so the x-bpp dependency is honoured while the
            # bytes within one pixel decode vectorised.
            la = np.zeros(stride, np.uint8)
            lf = line.astype(np.int32)
            pv = prev.astype(np.int32)
            for x in range(0, stride, bpp):
                a = la[x - bpp : x].astype(np.int32) if x >= bpp else 0
                b = pv[x : x + bpp]
                if ftype == 1:
                    v = lf[x : x + bpp] + a
                elif ftype == 3:
                    v = lf[x : x + bpp] + ((a + b) >> 1)
                else:
                    c = pv[x - bpp : x] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                    )
                    v = lf[x : x + bpp] + pred
                la[x : x + bpp] = (v & 0xFF).astype(np.uint8)
            line = la
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = line
        prev = line
    if depth == 16:
        arr = out.reshape(h, w, channels, 2)
        img = (arr[..., 0].astype(np.uint16) << 8) | arr[..., 1]
    else:
        img = out.reshape(h, w, channels)
    if ctype == 3:  # palette
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        rgb = palette[img[..., 0]]
        if trns is not None:
            a = np.full(img.shape[:2], 255, np.uint8)
            n = min(len(trns), palette.shape[0])
            lut = np.full(palette.shape[0], 255, np.uint8)
            lut[:n] = trns[:n]
            a = lut[img[..., 0]]
            return np.dstack([rgb, a])
        return rgb
    return img


# ---------------------------------------------------------------------------
# Radiance HDR (.hdr RGBE) — the skybox format (main.cpp:138)
# ---------------------------------------------------------------------------


def read_hdr(path: str | Path) -> np.ndarray:
    """Decode a Radiance RGBE file to (H, W, 3) float32 linear radiance."""
    data = Path(path).read_bytes()
    pos = data.index(b"\n\n") + 2 if b"\n\n" in data else 0
    header, rest = data.split(b"\n\n", 1) if b"\n\n" in data else (b"", data)
    if b"-Y" not in rest[:40]:
        raise ValueError("unsupported HDR layout")
    nl = rest.index(b"\n")
    dims = rest[:nl].split()
    h, w = int(dims[1]), int(dims[3])
    payload = rest[nl + 1 :]
    rgbe = np.zeros((h, w, 4), np.uint8)
    off = 0
    for y in range(h):
        if (
            off + 4 <= len(payload)
            and payload[off] == 2
            and payload[off + 1] == 2
            and ((payload[off + 2] << 8) | payload[off + 3]) == w
        ):
            off += 4  # new RLE: 4 component planes per scanline
            for c in range(4):
                x = 0
                while x < w:
                    count = payload[off]
                    off += 1
                    if count > 128:  # run
                        rgbe[y, x : x + count - 128, c] = payload[off]
                        off += 1
                        x += count - 128
                    else:  # literal
                        rgbe[y, x : x + count, c] = np.frombuffer(
                            payload, np.uint8, count, off
                        )
                        off += count
                        x += count
        else:  # flat scanline, or old-style RLE (r=g=b=1 repeat records)
            row = np.frombuffer(payload, np.uint8, min(w * 4, len(payload) - off), off)
            px = row[: (len(row) // 4) * 4].reshape(-1, 4)
            has_old_rle = bool(
                np.any((px[:, 0] == 1) & (px[:, 1] == 1) & (px[:, 2] == 1))
            )
            if not has_old_rle and len(row) == w * 4:
                rgbe[y] = row.reshape(w, 4)
                off += w * 4
            else:
                # sequential decode: (1,1,1,n) repeats the previous pixel n
                # times, with n left-shifted 8 bits per consecutive record
                x = 0
                shift = 0
                while x < w:
                    r, g, b, e = payload[off : off + 4]
                    off += 4
                    if r == 1 and g == 1 and b == 1:
                        count = e << (8 * shift)
                        if x == 0 and y == 0:
                            raise ValueError("HDR old-RLE repeat with no prior pixel")
                        prev_px = rgbe[y, x - 1] if x > 0 else rgbe[y - 1, w - 1]
                        rgbe[y, x : x + count] = prev_px
                        x += count
                        shift += 1
                    else:
                        rgbe[y, x] = (r, g, b, e)
                        x += 1
                        shift = 0
    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp > 0, np.ldexp(1.0, exp - 136), 0.0).astype(np.float32)
    return rgbe[..., :3].astype(np.float32) * scale[..., None]


def write_hdr(path: str | Path, rgb: np.ndarray) -> None:
    """Encode (H, W, 3) float32 as a flat (non-RLE) Radiance file."""
    rgb = np.asarray(rgb, np.float32)
    h, w, _ = rgb.shape
    maxc = rgb.max(axis=-1)
    _, e = np.frexp(maxc)  # maxc = f * 2^e, f in [0.5, 1)
    nz = maxc > 1e-32
    scale = np.where(nz, np.ldexp(np.float32(256.0), -e), 0.0).astype(np.float32)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.minimum(rgb * scale[..., None], 255.0).astype(np.uint8)
    rgbe[..., 3] = np.where(nz, e + 128, 0).astype(np.uint8)
    header = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + f"-Y {h} +X {w}\n".encode()
    Path(path).write_bytes(header + rgbe.tobytes())


# ---------------------------------------------------------------------------
# Texture decode entry points (stb_image analogue, image.cpp:21-43)
# ---------------------------------------------------------------------------


def decode_texture(data: bytes) -> np.ndarray:
    """Decode an encoded image to (H, W, 4) float32 in [0, 1] (UNORM)."""
    if data[:8] == _PNG_MAGIC:
        img = read_png(data)
    elif data[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        img = decode_jpeg(data)
    else:
        raise ValueError("unrecognised image format")
    if img.dtype == np.uint16:
        img = (img >> 8).astype(np.uint8)
    img = img.astype(np.float32) / 255.0
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    out = np.ones((h, w, 4), np.float32)
    if c == 1:
        out[..., :3] = img.reshape(h, w, 1)
    elif c == 2:
        out[..., :3] = img[..., :1]
        out[..., 3] = img[..., 1]
    else:
        out[..., :c] = img[..., :4]
    return out


def load_texture(path: str | Path) -> np.ndarray:
    path = Path(path)
    if path.suffix.lower() == ".hdr":
        rgb = read_hdr(path)
        return np.dstack([rgb, np.ones(rgb.shape[:2], np.float32)])
    return decode_texture(path.read_bytes())
