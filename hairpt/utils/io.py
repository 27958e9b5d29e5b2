"""Image / array IO.

Covers the reference's film output formats that matter headless:
PNG (ldrfilm, src/films/ldrfilm.cpp), .npy (the fork's mfilm cnpy addition,
src/films/mfilm.cpp:347), PFM (hdrfilm), and Radiance RGBE .hdr *input*
(the teapot scene's envmap texture). EXR is written as 32-bit float PFM +
npy instead of OpenEXR (no OpenEXR binding in this environment).
"""
from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# Radiance RGBE (.hdr) reader — used by envmap emitters
# ---------------------------------------------------------------------------

def read_hdr(path: str) -> np.ndarray:
    """Read a Radiance RGBE file → float32 [H, W, 3] linear RGB."""
    with open(path, "rb") as f:
        data = f.read()
    # header
    end = data.find(b"\n\n")
    if end < 0:
        raise ValueError("invalid hdr header")
    header = data[:end].decode("latin1")
    if "-Y" in data[end + 2:end + 100].decode("latin1"):
        dim_line_end = data.find(b"\n", end + 2)
        dims = data[end + 2:dim_line_end].decode("latin1").split()
    else:
        raise ValueError("unsupported hdr layout")
    # format: -Y H +X W
    H = int(dims[1]); W = int(dims[3])
    pos = dim_line_end + 1
    img = np.zeros((H, W, 4), np.uint8)
    for y in range(H):
        # check for new-style RLE scanline
        if pos + 4 <= len(data) and data[pos] == 2 and data[pos + 1] == 2 \
                and (data[pos + 2] << 8 | data[pos + 3]) == W:
            pos += 4
            row = np.zeros((4, W), np.uint8)
            for c in range(4):
                x = 0
                while x < W:
                    cnt = data[pos]; pos += 1
                    if cnt > 128:  # run
                        row[c, x:x + cnt - 128] = data[pos]
                        pos += 1
                        x += cnt - 128
                    else:          # literal
                        row[c, x:x + cnt] = np.frombuffer(
                            data[pos:pos + cnt], np.uint8)
                        pos += cnt
                        x += cnt
            img[y] = row.T
        else:  # flat RGBE pixels
            row = np.frombuffer(data[pos:pos + 4 * W], np.uint8).reshape(W, 4)
            img[y] = row
            pos += 4 * W
    rgbe = img.astype(np.float32)
    exp = np.ldexp(1.0, img[..., 3].astype(np.int32) - 136)  # 128 + 8
    rgb = rgbe[..., :3] * exp[..., None]
    rgb[img[..., 3] == 0] = 0.0
    return rgb.astype(np.float32)


def annotate_image(img: np.ndarray, labels, subst: dict | None = None,
                   banner: bool = False) -> np.ndarray:
    """Draw label[] annotations + the banner overlay onto a gamma-encoded
    float [0,1] image (reference: src/films/annotations.h + banner.h —
    the reference blits a bitmap font; we draw with PIL's built-in font).

    labels: iterable of (x, y, text); `$source['key']` placeholders are
    substituted from `subst` (keys like "scene.renderTime",
    "sampler.sampleCount" — the useful subset of the reference grammar).
    """
    import re as _re
    from PIL import Image, ImageDraw
    u8 = np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    pil = Image.fromarray(u8, mode="RGB")
    draw = ImageDraw.Draw(pil)

    def _subst(text: str) -> str:
        def repl(m):
            key = f"{m.group(1)}.{m.group(2)}"
            v = (subst or {}).get(key, "")
            return f"{v:.2f}" if isinstance(v, float) else str(v)
        return _re.sub(r"\$(\w+)\[\s*'([^']+)'\s*\]", repl, text)

    for x, y, text in labels or ():
        draw.text((int(x), int(y)), _subst(str(text)), fill=(255, 255, 255))
    if banner:
        tag = "hairpt"
        tw = draw.textlength(tag)
        draw.text((pil.width - tw - 4, pil.height - 14), tag,
                  fill=(160, 160, 160))
    return np.asarray(pil, np.float32) / 255.0


def read_png(path: str) -> np.ndarray:
    """PNG → float32 [H, W, 3] in [0, 1] (gamma-encoded values as stored;
    reference: src/libcore/bitmap.cpp PNG loader)."""
    from PIL import Image
    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return img


def read_image(path: str) -> np.ndarray:
    """Load any supported bitmap (reference: Bitmap ctor dispatch,
    src/libcore/bitmap.cpp — EXR/PNG/JPEG/HDR/PFM/BMP/TGA). LDR formats
    return gamma-encoded [0,1] floats; HDR formats return linear."""
    ext = path.rsplit(".", 1)[-1].lower()
    if ext == "hdr":
        return read_hdr(path)
    if ext == "pfm":
        return read_pfm(path)
    if ext == "exr":
        from . import exr as exr_mod
        return exr_mod.read_exr(path)
    if ext == "npy":
        return np.load(path).astype(np.float32)
    if ext in ("png", "jpg", "jpeg", "bmp", "tga"):
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGB"),
                          np.float32) / 255.0
    raise ValueError(f"unsupported image format: {path}")


# ---------------------------------------------------------------------------
# writers
# ---------------------------------------------------------------------------

def write_jpg(path: str, img: np.ndarray, quality: int = 95):
    """JPEG writer (reference ldrfilm jpg output, bitmap.cpp)."""
    from PIL import Image
    if img.dtype != np.uint8:
        img = np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(img, mode="RGB").save(path, quality=quality)


def write_bmp(path: str, img: np.ndarray):
    from PIL import Image
    if img.dtype != np.uint8:
        img = np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(img, mode="RGB").save(path)


def write_tga(path: str, img: np.ndarray):
    from PIL import Image
    if img.dtype != np.uint8:
        img = np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(img, mode="RGB").save(path)


def write_png(path: str, img: np.ndarray):
    """img: float [H, W, 3] in [0, 1] (already gamma encoded) or uint8."""
    from PIL import Image
    if img.dtype != np.uint8:
        img = np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(img, mode="RGB").save(path)


def write_npy(path: str, img: np.ndarray):
    np.save(path, np.asarray(img, np.float32))


def write_pfm(path: str, img: np.ndarray):
    """Portable FloatMap, float32 RGB (reference: hdrfilm PFM output)."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(b"PF\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")  # little endian
        f.write(np.flipud(img).astype("<f4").tobytes())


def read_pfm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        assert f.readline().strip() == b"PF"
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(f.read(), "<f4" if scale < 0 else ">f4")
    return np.flipud(data.reshape(h, w, 3)).copy()


def tonemap_srgb(img: np.ndarray, gamma: float = 2.2) -> np.ndarray:
    return np.clip(np.asarray(img), 0.0, 1.0) ** (1.0 / gamma)
