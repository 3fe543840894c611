"""Stdlib AVI (RIFF) video codec: build and parse real AVI containers
with uncompressed 24-bit DIB frames — pure ``struct``, no ffmpeg.

Completes the multimodal decode set (imagehdr/pixeldec for images,
audiohdr for audio): ``multimodal_video_frames`` previously sampled a
FAKE fixed-64-byte-frame layout; with this module the committed
fixture holds real AVI files (tools/gen_video_fixture.py) and the
Spark side walks the actual RIFF chunk tree — LIST hdrl → avih for
geometry/timing, LIST movi → '00db' chunks for frame placement — then
pixel-decodes each sampled frame (bottom-up BGR DIB rows, the BMP
layout). Public basis: the Microsoft AVI RIFF spec; the reference repo
has no video path (north-star scope).

Parser contract: ``parse_avi(data)`` returns
``(width, height, usec_per_frame, frames)`` where ``frames`` is a list
of ``(byte_offset, size, compressed)`` into ``data`` for each stored
frame — ``compressed`` is True for '00dc' chunks (MJPEG et al.) and
False for uncompressed '00db' DIB frames, so decoders dispatch on the
container's own chunk fourcc, never by sniffing frame bytes — or
``None`` when the payload is not a parseable AVI.
"""

from __future__ import annotations

import struct

from .imagehdr import dib_pattern_rows, pattern_byte  # noqa: F401 — pattern_byte re-exported for tests/generators


def parse_avi(data: bytes):
    """(width, height, usec_per_frame,
    [(frame_offset, size, compressed), ...]) or ``None``. Offsets point
    at the frame's bytes inside ``data``; ``compressed`` reflects the
    chunk fourcc ('00dc' vs '00db'). Only STREAM-0 video chunks count
    as frames — the stream the avih geometry and frame count
    describe."""
    try:
        return _parse_avi(data)
    except (IndexError, struct.error):
        # Truncated/corrupt container (size fields past the buffer):
        # the contract is None, never an exception.
        return None


def _parse_avi(data: bytes):
    if not isinstance(data, (bytes, bytearray, memoryview)):
        return None
    data = bytes(data)
    if len(data) < 24 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        return None
    geom = None  # (width, height, usec_per_frame)
    frames: list[tuple[int, int, bool]] = []
    i, n = 12, len(data)
    while i + 8 <= n:
        cid = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        body_at = i + 8
        if cid == b"LIST" and size >= 4:
            ltype = data[body_at : body_at + 4]
            if ltype == b"hdrl":
                # First subchunk must be avih (56-byte main header).
                j = body_at + 4
                while j + 8 <= body_at + size:
                    scid = data[j : j + 4]
                    (ssize,) = struct.unpack("<I", data[j + 4 : j + 8])
                    if scid == b"avih" and ssize >= 40:
                        usec, _rate, _pad, _flags = struct.unpack(
                            "<IIII", data[j + 8 : j + 24]
                        )
                        width, height = struct.unpack(
                            "<II", data[j + 40 : j + 48]
                        )
                        geom = (width, height, usec)
                        break
                    j += 8 + ssize + (ssize & 1)
            elif ltype == b"movi":
                j = body_at + 4
                end = min(body_at + size, n)  # clamp to real buffer
                while j + 8 <= end:
                    scid = data[j : j + 4]
                    (ssize,) = struct.unpack("<I", data[j + 4 : j + 8])
                    # Stream-0 video chunks only: uncompressed ('db')
                    # or compressed ('dc') frames. Other streams
                    # ('01wb' audio, '01db' a second video stream)
                    # must not pollute the frame list the avih
                    # geometry/count describes.
                    if scid[:2] == b"00" and scid[2:4] in (b"db", b"dc"):
                        frames.append((j + 8, ssize, scid[2:4] == b"dc"))
                    j += 8 + ssize + (ssize & 1)
        i += 8 + size + (size & 1)
    if geom is None or not frames:
        return None
    width, height, usec = geom
    if width == 0 or height == 0 or usec == 0:
        return None
    return width, height, usec, frames


def decode_frame_pixels(
    frame: bytes, width: int, height: int, compressed: bool | None = None
) -> bytes:
    """RGB pixel bytes of one video frame. Two payload layouts:

    - uncompressed DIB ('00db' chunks): bottom-up BGR rows padded to 4
      bytes — the BMP pixel-array layout without the file headers;
    - MJPEG ('00dc' chunks): each frame is a complete baseline JPEG,
      decoded by jpegdec and composed here — the motion-JPEG layout,
      the most common compressed AVI payload.

    ``compressed`` is the chunk-fourcc flag parse_avi records — the
    authoritative dispatch (a DIB frame whose bottom-left pixel is
    BGR (255, 216, *) begins FF D8, so byte sniffing would misroute
    it); ``None`` falls back to the SOI sniff for direct callers.

    Raises ValueError for truncated frames, undecodable JPEG variants,
    or a JPEG whose dimensions disagree with the container header."""
    import numpy as np

    if compressed is None:
        compressed = frame[:2] == b"\xff\xd8"
    if compressed:  # MJPEG: a complete JPEG per frame
        from .jpegdec import decode_jpeg_pixels

        jw, jh, ch, px = decode_jpeg_pixels(frame)
        if (jw, jh) != (width, height):
            raise ValueError(
                f"MJPEG frame is {jw}x{jh}, container says {width}x{height}"
            )
        if ch == 3:
            return px
        if ch == 1:  # grayscale frame: replicate to the RGB contract
            arr = np.frombuffer(px, np.uint8).reshape(height, width, 1)
            return np.repeat(arr, 3, axis=2).tobytes()
        raise ValueError(f"unsupported MJPEG component count {ch}")
    stride = (width * 3 + 3) & ~3
    if len(frame) < stride * height:
        raise ValueError("truncated DIB frame")
    rows = np.frombuffer(frame[: stride * height], np.uint8).reshape(height, stride)
    img = rows[:, : width * 3].reshape(height, width, 3)[::-1]  # bottom-up
    return img[:, :, ::-1].tobytes()  # BGR -> RGB


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def build_frame(width: int, height: int, frame_idx: int, base: int) -> bytes:
    """One DIB frame (bottom-up BGR, 4-byte row padding) carrying the
    ``pattern_byte`` ramp keyed by ``base + 29*frame_idx`` — the exact
    BMP pixel-array serialization, via the shared helper."""
    return dib_pattern_rows(width, height, (base + 29 * frame_idx) % 256)


def build_mjpeg_frame(width: int, height: int, frame_idx: int, base: int) -> bytes:
    """One complete baseline JPEG frame (imagehdr.build_jpeg: real
    Huffman-coded DC-only blocks, exactly decodable) carrying the JPEG
    block pattern keyed by ``(base + 29*frame_idx) % 256`` — the same
    per-frame key schedule as the DIB frames."""
    from .imagehdr import build_jpeg

    return build_jpeg(width, height, 3, pattern=(base + 29 * frame_idx) % 256)


def build_avi(
    width: int,
    height: int,
    n_frames: int,
    usec_per_frame: int,
    base: int,
    codec: str = "dib",
):
    """(payload, frame_offsets): a fully valid AVI with ``n_frames``
    pattern frames — uncompressed DIB ('00db' chunks, codec='dib') or
    motion-JPEG ('00dc' chunks of complete baseline JPEGs,
    codec='mjpg', fccHandler/biCompression 'MJPG'). ``frame_offsets``
    records, from the builder's own serialization arithmetic (NOT by
    re-parsing), where each frame's bytes start in ``payload`` — the
    encode-time record the fixture oracle reads."""
    if codec not in ("dib", "mjpg"):
        raise ValueError(f"codec must be 'dib' or 'mjpg', got {codec!r}")
    if codec == "mjpg":
        frame_bytes = [
            build_mjpeg_frame(width, height, f, base) for f in range(n_frames)
        ]
        # biCompression 'MJPG' as a little-endian fourcc
        fcc, compression, chunk_id = b"MJPG", 0x47504A4D, b"00dc"
    else:
        frame_bytes = [build_frame(width, height, f, base) for f in range(n_frames)]
        fcc, compression, chunk_id = b"DIB ", 0, b"00db"
    buf_size = max(len(fb) for fb in frame_bytes)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec_per_frame,
        buf_size * 1_000_000 // max(usec_per_frame, 1),
        0,
        0x10,  # AVIF_HASINDEX
        n_frames,
        0,
        1,
        buf_size,
        width,
        height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + fcc
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, usec_per_frame, 1_000_000, 0, n_frames, buf_size, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, compression, buf_size, 2835, 2835, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = bytearray()
    movi_rel: list[int] = []  # frame offsets relative to movi body start
    sizes: list[int] = []
    for fb in frame_bytes:
        movi_rel.append(len(movi_body) + 8)  # past the chunk header
        sizes.append(len(fb))
        movi_body += _chunk(chunk_id, fb)
    movi = _list(b"movi", bytes(movi_body))
    idx1 = b"".join(
        chunk_id + struct.pack("<III", 0x10, 4 + rel - 8, size)
        for rel, size in zip(movi_rel, sizes)
    )
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    payload = b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
    # Absolute frame offsets: RIFF header (12) + hdrl + LIST header of
    # movi (8) + 'movi' type tag (4) + relative offset within the body.
    movi_body_abs = 12 + len(hdrl) + 8 + 4
    offsets = [movi_body_abs + rel for rel in movi_rel]
    for off in offsets:  # builder self-check: offsets index real chunks
        assert payload[off - 8 : off - 4] == chunk_id, off
    return payload, offsets
