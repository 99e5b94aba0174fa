"""Pure-numpy multimodal codecs: BMP (24-bit BI_RGB), WAV (PCM16 mono) and
Y4M (YUV4MPEG2 4:2:0 video).

All three formats are fully specified by fixed-layout headers + raw sample
data, so they decode exactly with numpy + struct — no external codec
library.  These are the REAL decode paths for mm_image_pipeline /
mm_audio_pipeline / mm_video_frames: executors receive opaque ``binary``
payloads and produce typed features.  Swapping in JPEG/FLAC/H.264 in
production changes only these functions (plus a library import); the Spark
plumbing is format-agnostic.

Encoders exist to synthesize deterministic fixture payloads from the
documents table (the container ships no media files); they are also what
the byte-exact round-trip gates in tests/test_ml_quality.py check.
"""

from __future__ import annotations

import struct

import numpy as np

# -- BMP ---------------------------------------------------------------------

_BMP_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res, res, offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")


def encode_bmp(img: np.ndarray) -> bytes:
    """RGB uint8 (H, W, 3) -> 24-bit uncompressed BMP bytes."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected uint8 (H, W, 3) RGB array")
    h, w = img.shape[:2]
    row_len = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.zeros((h, row_len), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    off = _BMP_FILE_HDR.size + _BMP_INFO_HDR.size
    file_hdr = _BMP_FILE_HDR.pack(b"BM", off + len(data), 0, 0, off)
    info_hdr = _BMP_INFO_HDR.pack(
        _BMP_INFO_HDR.size, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> RGB uint8 (H, W, 3)."""
    magic, _, _, _, off = _BMP_FILE_HDR.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (hdr_size, w, h, planes, bpp, comp, *_rest) = _BMP_INFO_HDR.unpack_from(
        payload, _BMP_FILE_HDR.size
    )
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} compression={comp}")
    flip = h > 0  # positive height = bottom-up rows
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * row_len, offset=off)
    img = rows.reshape(h, row_len)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
    return (img[::-1] if flip else img).copy()


# -- WAV ---------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM16 bytes."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("expected 1-D int16 samples")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 mono bytes -> (sample_rate, int16 samples)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, body
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: fmt={audio_fmt} ch={channels} bits={bits}"
                )
        elif cid == b"data":
            samples = np.frombuffer(payload, dtype="<i2", count=clen // 2, offset=body)
        pos = body + clen + (clen & 1)  # chunks pad to even length
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples.copy()


# -- Y4M (YUV4MPEG2, 4:2:0 planar) -------------------------------------------


def encode_y4m(
    y: np.ndarray, u: np.ndarray, v: np.ndarray, fps: tuple[int, int] = (25, 1)
) -> bytes:
    """Planar 4:2:0 frames -> YUV4MPEG2 bytes.

    ``y``: uint8 (N, H, W); ``u``/``v``: uint8 (N, H//2, W//2).
    """
    if y.dtype != np.uint8 or y.ndim != 3:
        raise ValueError("expected uint8 (N, H, W) luma")
    n, h, w = y.shape
    if u.shape != (n, h // 2, w // 2) or v.shape != u.shape:
        raise ValueError("chroma planes must be (N, H//2, W//2)")
    if h % 2 or w % 2:
        raise ValueError("4:2:0 needs even dimensions")
    hdr = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C420\n".encode()
    out = [hdr]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(y[i].tobytes())
        out.append(u[i].tobytes())
        out.append(v[i].tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes):
    """YUV4MPEG2 bytes -> (w, h, (fps_n, fps_d), y, u, v) with the same
    array shapes ``encode_y4m`` takes."""
    nl = payload.index(b"\n")
    fields = payload[:nl].decode().split(" ")
    if fields[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    fps = (25, 1)
    for f in fields[1:]:
        if f.startswith("W"):
            w = int(f[1:])
        elif f.startswith("H"):
            h = int(f[1:])
        elif f.startswith("F"):
            a, b = f[1:].split(":")
            fps = (int(a), int(b))
        elif f.startswith("C") and f != "C420":
            raise ValueError(f"unsupported chroma mode {f}")
    if not w or not h:
        raise ValueError("missing W/H in stream header")
    y_len, c_len = h * w, (h // 2) * (w // 2)
    frame_len = y_len + 2 * c_len
    ys, us, vs = [], [], []
    pos = nl + 1
    while pos < len(payload):
        f_nl = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed FRAME marker")
        pos = f_nl + 1
        raw = np.frombuffer(payload, dtype=np.uint8, count=frame_len, offset=pos)
        ys.append(raw[:y_len].reshape(h, w))
        us.append(raw[y_len : y_len + c_len].reshape(h // 2, w // 2))
        vs.append(raw[y_len + c_len :].reshape(h // 2, w // 2))
        pos += frame_len
    return w, h, fps, np.stack(ys), np.stack(us), np.stack(vs)
