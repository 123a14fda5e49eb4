"""Image IO.

The equivalent of the reference's image loading/saving
(yocto_sceneio.cpp:516-1001, which wraps stb_image/tinyexr/an internal PFM
codec): PNG/JPG/TGA/BMP via Pillow, plus native codecs for Radiance HDR
(RGBE), PFM, and a minimal scanline EXR reader/writer (uncompressed + ZIP,
enough for golden corpus interchange).

Conventions match the reference: LDR images are sRGB-encoded bytes, HDR
formats are linear float; `load_image` returns (pixels [H,W,4] f32,
linear flag) where LDR content is converted to float in [0,1] sRGB.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np


def is_hdr_filename(path: str) -> bool:
    ext = os.path.splitext(path)[1].lower()
    return ext in (".hdr", ".exr", ".pfm")


def is_ldr_filename(path: str) -> bool:
    ext = os.path.splitext(path)[1].lower()
    return ext in (".png", ".jpg", ".jpeg", ".tga", ".bmp")


# ----------------------------------------------------------------------------
# Radiance HDR (RGBE)
# ----------------------------------------------------------------------------

def load_hdr(path: str) -> np.ndarray:
    """Read a Radiance .hdr (RGBE, RLE or flat) -> [H,W,4] f32 linear."""
    with open(path, "rb") as f:
        data = f.read()
    # header
    pos = 0
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError(f"{path}: not a Radiance HDR file")
    while True:
        eol = data.index(b"\n", pos)
        line = data[pos:eol]
        pos = eol + 1
        if line == b"":
            break
    eol = data.index(b"\n", pos)
    dims = data[pos:eol].split()
    pos = eol + 1
    if dims[0] != b"-Y" or dims[2] != b"+X":
        raise ValueError(f"{path}: unsupported HDR orientation {dims}")
    height = int(dims[1])
    width = int(dims[3])

    rgbe = np.zeros((height, width, 4), np.uint8)
    buf = np.frombuffer(data, np.uint8, offset=pos)
    bpos = 0
    for y in range(height):
        if width < 8 or width > 0x7FFF or buf[bpos] != 2 or buf[bpos + 1] != 2:
            # flat (possibly old-style RLE, not handled) scanline
            row = buf[bpos:bpos + width * 4].reshape(width, 4)
            rgbe[y] = row
            bpos += width * 4
            continue
        scan_w = (int(buf[bpos + 2]) << 8) | int(buf[bpos + 3])
        if scan_w != width:
            raise ValueError(f"{path}: scanline width mismatch")
        bpos += 4
        for c in range(4):
            x = 0
            while x < width:
                count = int(buf[bpos])
                bpos += 1
                if count > 128:  # run
                    rgbe[y, x:x + count - 128, c] = buf[bpos]
                    bpos += 1
                    x += count - 128
                else:  # literal
                    rgbe[y, x:x + count, c] = buf[bpos:bpos + count]
                    bpos += count
                    x += count
    exp = rgbe[..., 3].astype(np.int32)
    scale = np.ldexp(1.0, exp - 136).astype(np.float32)  # 2^(e-128-8)
    rgb = rgbe[..., :3].astype(np.float32) * scale[..., None]
    rgb[exp == 0] = 0.0
    out = np.concatenate(
        [rgb, np.ones((height, width, 1), np.float32)], axis=2)
    return out


def save_hdr(path: str, pixels: np.ndarray) -> None:
    """Write a Radiance .hdr (flat RGBE scanlines)."""
    px = np.asarray(pixels, np.float32)
    if px.ndim != 3:
        raise ValueError("expected [H,W,C] image")
    rgb = px[..., :3]
    h, w, _ = rgb.shape
    maxc = rgb.max(axis=2)
    with np.errstate(divide="ignore"):
        exp = np.where(maxc > 1e-32, np.floor(np.log2(maxc)) + 1, 0)
    scale = np.where(maxc > 1e-32, np.ldexp(1.0, (-exp + 8).astype(np.int32)),
                     0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(rgb * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(maxc > 1e-32, exp + 128, 0).astype(np.uint8)
    header = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" \
        + f"-Y {h} +X {w}\n".encode()
    with open(path, "wb") as f:
        f.write(header)
        f.write(rgbe.tobytes())


# ----------------------------------------------------------------------------
# PFM
# ----------------------------------------------------------------------------

def load_pfm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic not in (b"PF", b"Pf"):
            raise ValueError(f"{path}: not a PFM file")
        dims = f.readline().split()
        width, height = int(dims[0]), int(dims[1])
        scale = float(f.readline().strip())
        nchan = 3 if magic == b"PF" else 1
        count = width * height * nchan
        dt = "<f4" if scale < 0 else ">f4"
        data = np.frombuffer(f.read(count * 4), dt).astype(np.float32)
    img = data.reshape(height, width, nchan)[::-1]  # PFM is bottom-up
    if abs(scale) != 1.0:
        img = img * abs(scale)
    if nchan == 1:
        img = np.repeat(img, 3, axis=2)
    return np.concatenate(
        [img, np.ones((height, width, 1), np.float32)], axis=2)


def save_pfm(path: str, pixels: np.ndarray) -> None:
    px = np.asarray(pixels, np.float32)[..., :3]
    h, w, _ = px.shape
    with open(path, "wb") as f:
        f.write(b"PF\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1\n")
        f.write(px[::-1].astype("<f4").tobytes())


# ----------------------------------------------------------------------------
# Minimal EXR (scanline, half/float, NONE or ZIP compression)
# ----------------------------------------------------------------------------

def load_exr(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"\x76\x2f\x31\x01":
        raise ValueError(f"{path}: not an EXR file")
    pos = 8
    channels = []
    comp = 0
    dw = None
    while True:
        end = data.index(b"\0", pos)
        name = data[pos:end].decode()
        pos = end + 1
        if name == "":
            break
        end = data.index(b"\0", pos)
        pos = end + 1
        size = struct.unpack_from("<i", data, pos)[0]
        pos += 4
        val = data[pos:pos + size]
        pos += size
        if name == "channels":
            cpos = 0
            while val[cpos] != 0:
                cend = val.index(b"\0", cpos)
                cname = val[cpos:cend].decode()
                ptype = struct.unpack_from("<i", val, cend + 1)[0]
                channels.append((cname, ptype))
                cpos = cend + 1 + 16
        elif name == "compression":
            comp = val[0]
        elif name == "dataWindow":
            dw = struct.unpack("<4i", val)
    if dw is None:
        raise ValueError(f"{path}: missing dataWindow")
    width = dw[2] - dw[0] + 1
    height = dw[3] - dw[1] + 1
    if comp not in (0, 3):  # NONE, ZIP
        raise ValueError(f"{path}: unsupported EXR compression {comp}")
    nch = len(channels)
    dtype_sizes = {0: 4, 1: 2, 2: 4}  # UINT, HALF, FLOAT
    # scanline offsets table
    block_lines = 1 if comp == 0 else 16
    nblocks = (height + block_lines - 1) // block_lines
    offsets = struct.unpack_from(f"<{nblocks}Q", data, pos)
    img = np.zeros((height, width, nch), np.float32)
    chan_sorted = sorted(range(nch), key=lambda i: channels[i][0])
    for bi, off in enumerate(offsets):
        y0 = struct.unpack_from("<i", data, off)[0] - dw[1]
        sz = struct.unpack_from("<i", data, off + 4)[0]
        raw = data[off + 8: off + 8 + sz]
        nlines = min(block_lines, height - y0)
        expect = sum(dtype_sizes[t] for _, t in channels) * width * nlines
        if comp == 3 and sz < expect:
            raw = zlib.decompress(raw)
            b = np.frombuffer(raw, np.uint8).astype(np.int16)
            # EXR zip predictor + deinterleave
            d = b.copy()
            for i in range(1, len(d)):
                d[i] = (d[i - 1] + d[i] - 128) & 0xFF
            half = (len(d) + 1) // 2
            out = np.zeros(len(d), np.uint8)
            out[0::2] = d[:half].astype(np.uint8)
            out[1::2] = d[half:half + len(d) // 2].astype(np.uint8)
            raw = out.tobytes()
        rpos = 0
        for line in range(nlines):
            for ci in chan_sorted:
                cname, ptype = channels[ci]
                n = width * dtype_sizes[ptype]
                seg = raw[rpos:rpos + n]
                rpos += n
                if ptype == 1:
                    vals = np.frombuffer(seg, np.float16).astype(np.float32)
                elif ptype == 2:
                    vals = np.frombuffer(seg, "<f4")
                else:
                    vals = np.frombuffer(seg, "<u4").astype(np.float32)
                img[y0 + line, :, ci] = vals
    # map channels to RGBA
    names = [c[0] for c in channels]
    out = np.ones((height, width, 4), np.float32)
    for tgt, letter in enumerate("RGBA"):
        if letter in names:
            out[..., tgt] = img[..., names.index(letter)]
        elif letter != "A" and "Y" in names:
            out[..., tgt] = img[..., names.index("Y")]
    return out


def save_exr(path: str, pixels: np.ndarray) -> None:
    """Write an uncompressed float scanline EXR with RGBA channels."""
    px = np.asarray(pixels, np.float32)
    h, w = px.shape[:2]
    if px.shape[2] == 3:
        px = np.concatenate([px, np.ones((h, w, 1), np.float32)], axis=2)
    names = ["A", "B", "G", "R"]  # alphabetical, as EXR requires
    src = {"R": px[..., 0], "G": px[..., 1], "B": px[..., 2],
           "A": px[..., 3]}

    def attr(name, typ, val):
        return name.encode() + b"\0" + typ.encode() + b"\0" \
            + struct.pack("<i", len(val)) + val

    chans = b""
    for n in names:
        chans += n.encode() + b"\0" + struct.pack("<i", 2) \
            + b"\0\0\0\0" + struct.pack("<ii", 1, 1)
    chans += b"\0"
    header = b"\x76\x2f\x31\x01" + struct.pack("<i", 2)
    header += attr("channels", "chlist", chans)
    header += attr("compression", "compression", b"\0")
    header += attr("dataWindow", "box2i", struct.pack("<4i", 0, 0,
                                                      w - 1, h - 1))
    header += attr("displayWindow", "box2i", struct.pack("<4i", 0, 0,
                                                         w - 1, h - 1))
    header += attr("lineOrder", "lineOrder", b"\0")
    header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0))
    header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\0"
    table_off = len(header) + 8 * h
    line_size = 8 + 4 * 4 * w
    offsets = struct.pack(f"<{h}Q", *[table_off + i * line_size
                                      for i in range(h)])
    with open(path, "wb") as f:
        f.write(header)
        f.write(offsets)
        for y in range(h):
            f.write(struct.pack("<ii", y, 4 * 4 * w))
            for n in names:
                f.write(src[n][y].astype("<f4").tobytes())


# ----------------------------------------------------------------------------
# Unified load/save (yocto_sceneio.h:240-253 equivalents)
# ----------------------------------------------------------------------------

def load_image(path: str):
    """-> (pixels [H,W,4] f32, linear: bool). LDR decoded to [0,1] sRGB."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".hdr":
        return load_hdr(path), True
    if ext == ".pfm":
        return load_pfm(path), True
    if ext == ".exr":
        return load_exr(path), True
    if ext in (".png", ".jpg", ".jpeg", ".tga", ".bmp"):
        from PIL import Image
        with Image.open(path) as im:
            im = im.convert("RGBA")
            arr = np.asarray(im, np.uint8).astype(np.float32) / 255.0
        return arr, False
    raise ValueError(f"unsupported image format {ext}")


def load_image_bytes(path: str):
    """-> (pixelsf or None, pixelsb or None, linear) keeping LDR as bytes."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".hdr", ".pfm", ".exr"):
        px, _ = load_image(path)
        return px, None, True
    if ext in (".png", ".jpg", ".jpeg", ".tga", ".bmp"):
        from PIL import Image
        with Image.open(path) as im:
            im = im.convert("RGBA")
            arr = np.asarray(im, np.uint8)
        return None, arr, False
    raise ValueError(f"unsupported image format {ext}")


def save_image(path: str, pixels: np.ndarray, linear: bool = None) -> None:
    """Save; HDR formats take linear data, LDR formats sRGB [0,1] floats.

    If `linear` is given and mismatches the target format, converts with the
    reference's srgb curve (yocto_sceneio.cpp convention).
    """
    from ..ops import color as C
    import jax.numpy as jnp

    px = np.asarray(pixels, np.float32)
    if px.ndim == 3 and px.shape[2] == 3:
        px = np.concatenate(
            [px, np.ones(px.shape[:2] + (1,), np.float32)], axis=2)
    ext = os.path.splitext(path)[1].lower()
    if ext in (".hdr", ".pfm", ".exr"):
        if linear is False:
            px = np.asarray(C.srgb_to_rgb(jnp.asarray(px)))
        if ext == ".hdr":
            save_hdr(path, px)
        elif ext == ".pfm":
            save_pfm(path, px)
        else:
            save_exr(path, px)
    elif ext in (".png", ".jpg", ".jpeg", ".tga", ".bmp"):
        if linear is True:
            px = np.asarray(C.rgb_to_srgb(jnp.asarray(px)))
        arr = np.clip(px * 256.0, 0, 255).astype(np.uint8)
        from PIL import Image
        im = Image.fromarray(arr, "RGBA")
        if ext in (".jpg", ".jpeg"):
            im = im.convert("RGB")
        im.save(path)
    else:
        raise ValueError(f"unsupported image format {ext}")


def image_difference(a: np.ndarray, b: np.ndarray):
    """Absolute difference image + max stat (yocto_image.cpp:256
    equivalent)."""
    if a.shape != b.shape:
        raise ValueError("image sizes differ")
    diff = np.abs(a - b)
    return diff, float(diff.max())
