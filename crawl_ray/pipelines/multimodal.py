"""Multimodal column plumbing (SURVEY-mandated training-data ops).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The decode libraries are not available in this container, so the decode
kernels are STUBS behind ``try``-imports / deterministic fakes — but the
Ray-side plumbing is real and tested: schema, actor-pool stage shape,
small batch sizes for fat payloads, and typed metadata output layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from crawl_ray.urlnorm import fnv1a64, fnv1a64_batch

__all__ = [
    "payload_table",
    "payload_stats",
    "DecodeImageActor",
    "decode_images",
    "resize_images",
    "sample_frames",
]


def payload_table(sf_dir: str):
    """Derive a deterministic binary-payload table from documents (the
    stand-in for an image/audio column): payload = utf-8 text bytes,
    media_type cycles by content hash."""
    types = ["image/png", "image/jpeg", "audio/wav"]

    def to_payload(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        hashes = fnv1a64_batch(texts)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "payload": pa.array([t.encode() for t in texts], pa.binary()),
                "media_type": pa.array(
                    [types[h % 3] for h in hashes.tolist()], pa.string()
                ),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(to_payload, batch_format="pyarrow", zero_copy_batch=True)


def payload_stats(sf_dir: str):
    """Byte-size stats per payload (SQL-checkable plumbing proof)."""

    def stats(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bytes": pc.binary_length(batch.column("payload")).cast(pa.int64()),
            }
        )

    return payload_table(sf_dir).map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    )


class DecodeImageActor:
    """Actor-pool decode stage: real plumbing, stubbed codec.

    ``__init__`` is where a real build loads the codec / model ONCE per
    actor; ``__call__`` decodes a small batch (fat payloads → small
    ``batch_size``).  Without PIL/cv2 a deterministic fake produces the
    (height, width, feature-hash) a real decoder would."""

    def __init__(self) -> None:
        try:  # pragma: no cover - not installed in this container
            import PIL.Image  # noqa: F401

            self._real = True
        except ImportError:
            self._real = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        if self._real:  # pragma: no cover
            raise NotImplementedError("real decode path requires PIL; stubbed here")
        heights, widths, feats = [], [], []
        for p in payloads:
            h = fnv1a64(p)
            heights.append(16 + h % 240)
            widths.append(16 + (h >> 8) % 320)
            feats.append(h & 0xFFFFFFFF)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "height": pa.array(heights, pa.int32()),
                "width": pa.array(widths, pa.int32()),
                "feature_hash": pa.array(np.array(feats, dtype=np.uint64), pa.uint64()),
            }
        )


def decode_images(sf_dir: str, concurrency: int = 2, batch_size: int = 64):
    """The actor-pool decode pipeline (small batches: payload bytes ×
    batch_size × concurrency must fit worker heaps)."""
    return payload_table(sf_dir).map_batches(
        DecodeImageActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


class ResizeImageActor:
    """Resize stage (stubbed codec, real plumbing): decode → scale to a
    bounded box, emit the scaled dims + a thumbnail content hash.  A
    real build holds the codec per actor and operates on decoded pixel
    buffers; the deterministic fake derives the same output layout."""

    def __init__(self, max_side: int = 64) -> None:
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        hs, ws, th = [], [], []
        for p in payloads:
            h64 = fnv1a64(p)
            h, w = 16 + h64 % 240, 16 + (h64 >> 8) % 320
            scale = min(1.0, self.max_side / max(h, w))
            hs.append(max(1, int(h * scale)))
            ws.append(max(1, int(w * scale)))
            th.append(fnv1a64(p + b"|thumb") & 0xFFFFFFFF)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "height": pa.array(hs, pa.int32()),
                "width": pa.array(ws, pa.int32()),
                "thumb_hash": pa.array(np.array(th, dtype=np.uint64), pa.uint64()),
            }
        )


def resize_images(sf_dir: str, max_side: int = 64, concurrency: int = 2,
                  batch_size: int = 64):
    return payload_table(sf_dir).map_batches(
        ResizeImageActor,
        fn_constructor_kwargs={"max_side": max_side},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


def sample_frames(sf_dir: str, n_frames: int = 4, concurrency: int = 2,
                  batch_size: int = 32):
    """Frame-sampling stage (video analog): each payload expands to
    ``n_frames`` rows (frame_idx, frame_hash) — the one-to-many
    ``flat_map`` shape inside a vectorized ``map_batches`` (output rows
    ≠ input rows is fine for Ray Data).  Stubbed decoder, real layout."""

    class FrameSampler:
        def __call__(self, batch: pa.Table) -> pa.Table:
            payloads = batch.column("payload").to_pylist()
            doc_ids = batch.column("doc_id").to_pylist()
            out_doc, out_idx, out_hash = [], [], []
            for doc_id, p in zip(doc_ids, payloads):
                for k in range(n_frames):
                    out_doc.append(int(doc_id))
                    out_idx.append(k)
                    out_hash.append(fnv1a64(p + b"|frame|%d" % k))
            return pa.table(
                {
                    "doc_id": pa.array(out_doc, pa.int64()),
                    "frame_idx": pa.array(out_idx, pa.int32()),
                    "frame_hash": pa.array(
                        np.array(out_hash, dtype=np.uint64), pa.uint64()
                    ),
                }
            )

    return payload_table(sf_dir).map_batches(
        FrameSampler,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )
