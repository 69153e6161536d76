"""Minimal self-contained OpenEXR scanline reader/writer.

The reference dumps HDR artifacts as ``.exr`` (envmap save,
modules/integral_equirect.py:362-371; HDR dataset loading,
dataLoader/blender.py exr branch) via the OpenEXR/imageio bindings. This
image has no EXR-capable library, so this module implements the small slice
of the format those paths need, from the OpenEXR 2.0 spec:

- single-part scanline images, FLOAT or HALF channels;
- NONE, ZIPS (1-line) and ZIP (16-line) compression (zlib + the EXR
  byte-reorder/delta predictor, ImfZip.cpp semantics);
- writes FLOAT + ZIPS by default.

PIZ/B44/DWA compressed files are rejected with a clear error.
"""
import struct
import zlib
from pathlib import Path

import numpy as np

_MAGIC = 20000630
_PIX_UINT, _PIX_HALF, _PIX_FLOAT = 0, 1, 2
_COMP_NONE, _COMP_RLE, _COMP_ZIPS, _COMP_ZIP = 0, 1, 2, 3
_LINES_PER_CHUNK = {_COMP_NONE: 1, _COMP_ZIPS: 1, _COMP_ZIP: 16}


def _predictor_encode(raw: bytes) -> bytes:
    """EXR zip pre-filter: de-interleave into two halves, then byte delta."""
    b = np.frombuffer(raw, np.uint8)
    half = (len(b) + 1) // 2
    reordered = np.empty_like(b)
    reordered[:half] = b[0::2]
    reordered[half:] = b[1::2]
    s = reordered.astype(np.int16)
    d = s.copy()
    d[1:] = (s[1:] - s[:-1] + 128) & 0xFF
    return d.astype(np.uint8).tobytes()


def _predictor_decode(data: bytes) -> bytes:
    d = np.frombuffer(data, np.uint8).astype(np.int64)
    d[1:] -= 128
    s = np.mod(np.cumsum(d), 256).astype(np.uint8)
    half = (len(s) + 1) // 2
    out = np.empty_like(s)
    out[0::2] = s[:half]
    out[1::2] = s[half:]
    return out.tobytes()


def _attr(name: str, typ: str, data: bytes) -> bytes:
    return (name.encode() + b"\0" + typ.encode() + b"\0"
            + struct.pack("<i", len(data)) + data)


def write_exr(path, img, compression: str = "zips"):
    """img: (H, W) or (H, W, C) float array, C in {1, 3, 4}. Channels are
    written as Y / BGR / ABGR (alphabetical, per spec)."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    H, W, C = img.shape
    names = {1: ["Y"], 3: ["B", "G", "R"], 4: ["A", "B", "G", "R"]}[C]
    # channel name -> source plane (RGB order in the input array)
    src = {1: {"Y": 0}, 3: {"R": 0, "G": 1, "B": 2},
           4: {"R": 0, "G": 1, "B": 2, "A": 3}}[C]
    comp = {"none": _COMP_NONE, "zips": _COMP_ZIPS, "zip": _COMP_ZIP}[
        compression]
    lpc = _LINES_PER_CHUNK[comp]

    chl = b""
    for n in names:
        chl += (n.encode() + b"\0" + struct.pack("<i", _PIX_FLOAT)
                + struct.pack("<i", 0) + struct.pack("<ii", 1, 1))
    chl += b"\0"
    box = struct.pack("<iiii", 0, 0, W - 1, H - 1)
    header = (
        _attr("channels", "chlist", chl)
        + _attr("compression", "compression", bytes([comp]))
        + _attr("dataWindow", "box2i", box)
        + _attr("displayWindow", "box2i", box)
        + _attr("lineOrder", "lineOrder", b"\0")
        + _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
        + _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
        + _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
        + b"\0")

    n_chunks = (H + lpc - 1) // lpc
    chunks = []
    for ci in range(n_chunks):
        y0 = ci * lpc
        rows = []
        for y in range(y0, min(y0 + lpc, H)):
            for n in names:
                rows.append(img[y, :, src[n]].astype("<f4").tobytes())
        raw = b"".join(rows)
        if comp == _COMP_NONE:
            data = raw
        else:
            packed = zlib.compress(_predictor_encode(raw))
            data = packed if len(packed) < len(raw) else raw
        chunks.append(struct.pack("<ii", y0, len(data)) + data)

    preamble = struct.pack("<ii", _MAGIC, 2) + header
    table_pos = len(preamble)
    offset = table_pos + 8 * n_chunks
    offsets = []
    for c in chunks:
        offsets.append(offset)
        offset += len(c)
    with open(path, "wb") as f:
        f.write(preamble)
        for o in offsets:
            f.write(struct.pack("<Q", o))
        for c in chunks:
            f.write(c)


def _read_attrs(f):
    attrs = {}
    while True:
        name = b""
        while True:
            c = f.read(1)
            if c in (b"\0", b""):
                break
            name += c
        if not name:
            return attrs
        typ = b""
        while True:
            c = f.read(1)
            if c == b"\0":
                break
            typ += c
        size = struct.unpack("<i", f.read(4))[0]
        attrs[name.decode()] = (typ.decode(), f.read(size))


def _parse_channels(data: bytes):
    chans, i = [], 0
    while data[i] != 0:
        j = data.index(0, i)
        name = data[i:j].decode()
        pix = struct.unpack("<i", data[j + 1:j + 5])[0]
        chans.append((name, pix))
        i = j + 1 + 16
    return chans  # already alphabetical in well-formed files


def read_exr(path):
    """Returns (H, W, C) float32. 3/4-channel files come back RGB(A).

    NONE/ZIPS/ZIP scanline files decode in pure python; anything else
    (DWA/PIZ/...) routes through the native OpenEXR bridge
    (native/exrio.cpp) when available."""
    try:
        return _read_exr_py(path)
    except ValueError as e:
        if "unsupported" not in str(e):
            raise
        from ..native import exr_read_native

        im = exr_read_native(path)
        if im is None:
            raise
        return im


def _read_exr_py(path):
    with open(path, "rb") as f:
        magic, version = struct.unpack("<ii", f.read(8))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an EXR file")
        if version & 0x200:
            raise ValueError(f"{path}: multi-part EXR unsupported")
        attrs = _read_attrs(f)
        chans = _parse_channels(attrs["channels"][1])
        comp = attrs["compression"][1][0]
        if comp not in _LINES_PER_CHUNK:
            raise ValueError(
                f"{path}: compression {comp} unsupported "
                "(only NONE/ZIPS/ZIP)")
        xm, ym, xM, yM = struct.unpack("<iiii", attrs["dataWindow"][1])
        W, H = xM - xm + 1, yM - ym + 1
        lpc = _LINES_PER_CHUNK[comp]
        n_chunks = (H + lpc - 1) // lpc
        f.read(8 * n_chunks)  # offset table (chunks follow in order)

        dtypes = {_PIX_HALF: np.dtype("<f2"), _PIX_FLOAT: np.dtype("<f4"),
                  _PIX_UINT: np.dtype("<u4")}
        out = {n: np.empty((H, W), np.float32) for n, _ in chans}
        bytes_per_line = sum(dtypes[p].itemsize for _, p in chans) * W
        for _ in range(n_chunks):
            y, size = struct.unpack("<ii", f.read(8))
            y -= ym
            data = f.read(size)
            n_lines = min(lpc, H - y)
            raw_size = bytes_per_line * n_lines
            if comp != _COMP_NONE and size != raw_size:
                data = _predictor_decode(zlib.decompress(data))
            pos = 0
            for dy in range(n_lines):
                for n, p in chans:
                    dt = dtypes[p]
                    row = np.frombuffer(data, dt, W, pos)
                    out[n][y + dy] = row.astype(np.float32)
                    pos += dt.itemsize * W
    names = [n for n, _ in chans]
    if set(names) >= {"R", "G", "B"}:
        order = ["R", "G", "B"] + (["A"] if "A" in names else [])
    else:
        order = names
    return np.stack([out[n] for n in order], axis=-1)


def imread_any(path):
    """Read .exr via this module, everything else via imageio (float [0,1])."""
    path = Path(path)
    if path.suffix.lower() == ".exr":
        return read_exr(path)
    import imageio.v2 as imageio

    img = imageio.imread(path)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    elif img.dtype == np.uint16:
        img = img.astype(np.float32) / 65535.0
    return np.asarray(img, np.float32)
