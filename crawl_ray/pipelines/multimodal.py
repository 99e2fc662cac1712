"""Multimodal columns: REAL binary payloads, REAL pure-Python decode.

Images/audio/video are opaque ``binary`` columns with typed metadata.
The payload stage synthesizes genuine files in formats the Python
stdlib can both write and decode — PNG (zlib stored-block IDAT), BMP
(BITMAPINFOHEADER), WAV (8-bit PCM) and Y4M (YUV4MPEG2 frame stream) —
with dimensions/pixel values that are arithmetic functions of
``doc_id``, so every decode output is recomputable in the DuckDB
oracle.  The decode stages parse the actual bytes (signature checks,
header fields, zlib inflate, frame demux): a broken encoder OR decoder
breaks the oracle hash.

Stage shape is the 100-TB one: decode/resize/sample run as actor-pool
``map_batches`` with small batches (fat payloads × batch × concurrency
must fit worker heaps); formats outside the stdlib (JPEG, H.264, …)
raise ``ValueError`` — the extension point where a real deployment
plugs PIL/ffmpeg into ``__init__``.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

__all__ = [
    "payload_table",
    "payload_stats",
    "DecodeImageActor",
    "DecodeAudioActor",
    "decode_images",
    "decode_audio",
    "resize_images",
    "sample_frames",
    "media_params",
]

_KINDS = ["image/png", "image/bmp", "audio/wav", "video/y4m"]


def media_params(doc_id: int) -> dict:
    """Arithmetic media parameters per doc — the contract the DuckDB
    oracle recomputes (keep in sync with the SQL in __ray_entry__)."""
    return {
        "kind": doc_id % 4,
        "media_type": _KINDS[doc_id % 4],
        "iw": 4 + (doc_id % 29),
        "ih": 4 + (doc_id % 23),
        "vw": 4 + 2 * (doc_id % 14),  # y4m dims even (4:2:0 chroma)
        "vh": 4 + 2 * (doc_id % 10),
        "pv": 32 + (doc_id * 31) % 95,  # ASCII-range pixel byte
        "ns": 64 + (doc_id % 191),  # wav samples
        "nf": 3 + (doc_id % 5),  # y4m frames
    }


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data))
    )


def _png_bytes(w: int, h: int, v: int) -> bytes:
    """Valid 8-bit RGB PNG, solid color v, zlib level 0 (stored blocks
    ⇒ closed-form size: 57 + h·(1+3w) + 11 bytes)."""
    raw = (b"\x00" + bytes([v]) * (3 * w)) * h
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(raw, 0))
        + _png_chunk(b"IEND", b"")
    )


def _bmp_bytes(w: int, h: int, v: int) -> bytes:
    """Valid 24-bit BI_RGB BMP, solid color v (54 + h·rowsize bytes)."""
    row = ((3 * w + 3) // 4) * 4
    size = 54 + h * row
    header = (
        b"BM" + struct.pack("<IHHI", size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, h * row, 2835, 2835, 0, 0)
    )
    line = bytes([v]) * (3 * w) + b"\x00" * (row - 3 * w)
    return header + line * h


def _wav_bytes(n_samples: int, v: int) -> bytes:
    """Valid 8-bit PCM mono WAV at 8 kHz (44 + n_samples bytes)."""
    return (
        b"RIFF" + struct.pack("<I", 36 + n_samples) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", n_samples)
        + bytes([v]) * n_samples
    )


def _y4m_frame_value(doc_id: int, f: int) -> int:
    return 32 + (doc_id * 31 + f * 7) % 95


def _y4m_bytes(doc_id: int, w: int, h: int, n_frames: int) -> bytes:
    """Valid YUV4MPEG2 stream (4:2:0 planar): header + n_frames ×
    (b"FRAME\\n" + w·h·3/2 bytes)."""
    frame_size = (w * h * 3) // 2
    out = [f"YUV4MPEG2 W{w} H{h} F25:1\n".encode()]
    for f in range(n_frames):
        out.append(b"FRAME\n")
        out.append(bytes([_y4m_frame_value(doc_id, f)]) * frame_size)
    return b"".join(out)


def payload_table(sf_dir: str):
    """Deterministic multimodal payload table: (doc_id, media_type,
    payload) with REAL file bytes per row."""

    def to_payload(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        payloads, types = [], []
        for doc_id in ids.tolist():
            p = media_params(doc_id)
            kind = p["kind"]
            if kind == 0:
                payloads.append(_png_bytes(p["iw"], p["ih"], p["pv"]))
            elif kind == 1:
                payloads.append(_bmp_bytes(p["iw"], p["ih"], p["pv"]))
            elif kind == 2:
                payloads.append(_wav_bytes(p["ns"], p["pv"]))
            else:
                payloads.append(
                    _y4m_bytes(doc_id, p["vw"], p["vh"], p["nf"])
                )
            types.append(p["media_type"])
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "media_type": pa.array(types, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(to_payload, batch_format="pyarrow", zero_copy_batch=True)


def payload_stats(sf_dir: str):
    """Byte-size + type stats per payload (closed-form SQL oracle)."""

    def stats(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "media_type": batch.column("media_type"),
                "n_bytes": pc.binary_length(batch.column("payload")).cast(pa.int64()),
            }
        )

    return payload_table(sf_dir).map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    )


def _decode_image(media_type: str, data: bytes) -> tuple[int, int, np.ndarray]:
    """Parse real image bytes → (width, height, flat RGB pixel array).
    Stdlib-only PNG/BMP decoders; other codecs raise (the PIL/cv2
    extension point)."""
    if media_type == "image/png":
        if data[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("bad PNG signature")
        w, h, depth, ctype = struct.unpack(">IIBB", data[16:26])
        if depth != 8 or ctype != 2:
            raise ValueError(f"unsupported PNG layout {depth}/{ctype}")
        # walk chunks, inflate IDAT, strip per-row filter bytes
        pos, idat = 8, []
        while pos < len(data):
            (length,) = struct.unpack(">I", data[pos:pos + 4])
            tag = data[pos + 4:pos + 8]
            if tag == b"IDAT":
                idat.append(data[pos + 8:pos + 8 + length])
            pos += 12 + length
        raw = zlib.decompress(b"".join(idat))
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + 3 * w)
        if rows[:, 0].any():
            raise ValueError("unsupported PNG row filter")
        return w, h, rows[:, 1:].reshape(-1)
    if media_type == "image/bmp":
        if data[:2] != b"BM":
            raise ValueError("bad BMP signature")
        offset, = struct.unpack("<I", data[10:14])
        w, h = struct.unpack("<ii", data[18:26])
        bpp, = struct.unpack("<H", data[28:30])
        if bpp != 24:
            raise ValueError(f"unsupported BMP bpp {bpp}")
        row = ((3 * w + 3) // 4) * 4
        px = np.frombuffer(
            data[offset:offset + h * row], dtype=np.uint8
        ).reshape(h, row)[:, : 3 * w]
        return w, h, px[::-1].reshape(-1)  # BMP rows are bottom-up
    raise ValueError(f"no stdlib decoder for {media_type}")


class DecodeImageActor:
    """Actor-pool decode stage (ST6 shape): per-actor state in
    ``__init__`` (a real deployment loads PIL/cv2 here), real
    pure-Python decode per batch in ``__call__``."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        ws, hs, means = [], [], []
        for mt, data in zip(types, payloads):
            w, h, px = _decode_image(mt, data)
            ws.append(w)
            hs.append(h)
            means.append(int(px.mean()) if len(px) else 0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(types, pa.string()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "mean_px": pa.array(means, pa.int64()),
            }
        )


class DecodeAudioActor:
    """Actor-pool audio decode stage: parse real RIFF/WAVE bytes
    (fmt + data chunk walk, 8-bit PCM) → sample rate, sample count,
    duration, mean amplitude.  Same ST6 shape as ``DecodeImageActor``
    (a real deployment loads soundfile/ffmpeg in ``__init__``)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rates, counts, durs, means = [], [], [], []
        for data in payloads:
            if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
                raise ValueError("bad WAV signature")
            pos, rate, bits, samples = 12, None, None, None
            while pos + 8 <= len(data):
                tag = data[pos:pos + 4]
                (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
                body = data[pos + 8:pos + 8 + length]
                if tag == b"fmt ":
                    _, ch, rate, _, _, bits = struct.unpack(
                        "<HHIIHH", body[:16]
                    )
                    if ch != 1 or bits != 8:
                        raise ValueError(f"unsupported WAV layout {ch}ch/{bits}bit")
                elif tag == b"data":
                    samples = np.frombuffer(body, dtype=np.uint8)
                pos += 8 + length + (length & 1)
            if rate is None or samples is None:
                raise ValueError("WAV missing fmt/data chunk")
            rates.append(rate)
            counts.append(len(samples))
            durs.append(len(samples) * 1000 // rate)
            means.append(int(samples.mean()) if len(samples) else 0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sample_rate": pa.array(rates, pa.int64()),
                "n_samples": pa.array(counts, pa.int64()),
                "duration_ms": pa.array(durs, pa.int64()),
                "mean_amp": pa.array(means, pa.int64()),
            }
        )


def _filter_media(sf_dir: str, prefix: str):
    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.starts_with(batch.column("media_type"), prefix)
        )

    return payload_table(sf_dir).map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    )


def _images_only(sf_dir: str):
    return _filter_media(sf_dir, "image/")


def decode_images(sf_dir: str, concurrency: int = 2, batch_size: int = 64):
    """Decode stage: real header+pixel parse of every image payload
    (small batches: payload bytes × batch_size × concurrency must fit
    worker heaps)."""
    return _images_only(sf_dir).map_batches(
        DecodeImageActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


def decode_audio(sf_dir: str, concurrency: int = 2, batch_size: int = 64):
    """Audio decode stage over the WAV payloads (actor pool, small
    batches — payload bytes × batch_size × concurrency bound heap)."""
    return _filter_media(sf_dir, "audio/").map_batches(
        DecodeAudioActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


class ResizeImageActor:
    """Resize stage: decode, nearest-neighbor subsample into a bounded
    box, emit scaled dims + the resized image's mean pixel."""

    def __init__(self, max_side: int = 16) -> None:
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.max_side
        ids = batch.column("doc_id").to_pylist()
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        ws, hs, means = [], [], []
        for mt, data in zip(types, payloads):
            w, h, px = _decode_image(mt, data)
            img = px.reshape(h, w, 3)
            side = max(w, h)
            if side > m:
                nw = max(1, (w * m) // side)
                nh = max(1, (h * m) // side)
                ys = (np.arange(nh) * h) // nh
                xs = (np.arange(nw) * w) // nw
                img = img[ys][:, xs]
            else:
                nw, nh = w, h
            ws.append(nw)
            hs.append(nh)
            means.append(int(img.mean()))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "mean_px": pa.array(means, pa.int64()),
            }
        )


def resize_images(sf_dir: str, max_side: int = 16, concurrency: int = 2,
                  batch_size: int = 64):
    return _images_only(sf_dir).map_batches(
        ResizeImageActor,
        fn_constructor_kwargs={"max_side": max_side},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


class FrameSampler:
    """Video frame-sampling stage: demux the real Y4M stream, sample
    ``n_out`` frames evenly, fingerprint each frame's raw bytes.  The
    one-to-many flat_map shape inside a vectorized map_batches."""

    def __init__(self, n_out: int = 4) -> None:
        self.n_out = n_out

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_doc, out_i, out_idx, out_md5 = [], [], [], []
        for doc_id, data in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            header, _, body = data.partition(b"\n")
            if not header.startswith(b"YUV4MPEG2"):
                raise ValueError("bad Y4M signature")
            fields = {f[0]: f[1:] for f in header.decode().split(" ")[1:] if f}
            w, h = int(fields["W"]), int(fields["H"])
            frame_size = (w * h * 3) // 2
            frames = []
            pos = 0
            while pos < len(body):
                if body[pos:pos + 6] != b"FRAME\n":
                    raise ValueError("bad Y4M frame marker")
                frames.append(body[pos + 6:pos + 6 + frame_size])
                pos += 6 + frame_size
            n_f = len(frames)
            for i in range(self.n_out):
                # n_out == 1 → the middle frame (the even-spacing
                # formula divides by n_out - 1)
                idx = (
                    (n_f - 1) // 2 if self.n_out == 1
                    else (i * (n_f - 1)) // (self.n_out - 1)
                )
                out_doc.append(int(doc_id))
                out_i.append(i)
                out_idx.append(idx)
                out_md5.append(hashlib.md5(frames[idx]).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "sample_i": pa.array(out_i, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int64()),
                "frame_md5": pa.array(out_md5, pa.string()),
            }
        )


def sample_frames(sf_dir: str, n_out: int = 4, concurrency: int = 2,
                  batch_size: int = 32):
    return _filter_media(sf_dir, "video/").map_batches(
        FrameSampler,
        fn_constructor_kwargs={"n_out": n_out},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )
