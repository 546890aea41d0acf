"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/featurized by actor-pool stages.

The reference has no binary media, but its stateful model stage
(ONNX session per worker, fupi/embedders.py:35-63) is exactly the
shape a decode/feature stage takes at 100 TB: heavy state in actor
``__init__``, small batches of large binary rows, Arrow-native binary
columns end to end (never pandas — object dtype would copy).

The actual image/audio codecs are not in this container, so the
decode kernel is STUBBED: ``DecodeStub`` raises ``NotImplementedError``
when ``real=True`` and otherwise computes a deterministic fake
"feature" (sha256 + size) so the Ray plumbing — schema, batch sizing,
actor signature, output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

PAYLOAD_SCHEMA_COLS = ("payload", "mime", "n_bytes")


def attach_payload(batch: pa.Table, text_col: str = "text", mime: str = "application/octet-stream") -> pa.Table:
    """Materialize an opaque binary column (utf-8 bytes of the text —
    a deterministic stand-in for image/audio bytes) with typed
    metadata, the layout a multimodal table would store at rest."""
    payload = pa.array([(t or "").encode("utf-8") for t in batch[text_col].to_pylist()], pa.binary())
    n = pa.array([len(p) for p in payload.to_pylist()], pa.int64())
    batch = batch.append_column("payload", payload)
    batch = batch.append_column("mime", pa.array([mime] * batch.num_rows, pa.string()))
    return batch.append_column("n_bytes", n)


class DecodeStub:
    """Actor-pool decode/featurize stage.

    ``__init__`` is where a real codec/model would load once per actor
    (the reference's load-once pattern, SURVEY.md §2.3 T1); here it
    only checks availability. ``__call__`` is Arrow-binary in /
    Arrow out; with ``real=False`` the "feature" is sha256 of the
    payload (deterministic, duckdb-reproducible) plus the byte size.
    """

    def __init__(self, real: bool = False):
        self.real = real
        if real:
            try:
                import PIL  # noqa: F401  (not in this container)
            except ImportError as e:
                raise NotImplementedError(
                    "real decode requires an image codec (PIL/libvips); "
                    "not available in this environment — run with real=False"
                ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real:
            raise NotImplementedError("real decode path is stubbed in this environment")
        payloads = batch["payload"].to_pylist()
        digest = [hashlib.sha256(p or b"").hexdigest() for p in payloads]
        sizes = np.array([len(p or b"") for p in payloads], dtype=np.int64)
        batch = batch.append_column("feat_sha256", pa.array(digest, pa.string()))
        return batch.append_column("feat_bytes", pa.array(sizes))


class ResizeStub:
    """Actor-pool resize stage (image thumbnailing shape): real codecs
    absent, so the kernel is deterministic byte truncation to the
    target budget — the Ray plumbing (actor pool, byte-bounded
    batches, binary in/out) is the real pattern. Emits the "resized"
    payload digest + sizes, never the decoded pixels."""

    def __init__(self, target_bytes: int = 256, real: bool = False):
        self.target = target_bytes
        if real:
            raise NotImplementedError(
                "real resize requires an image codec; not in this environment"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        resized = [(p or b"")[: self.target] for p in payloads]
        batch = batch.append_column(
            "resized_sha256",
            pa.array([hashlib.sha256(r).hexdigest() for r in resized], pa.string()),
        )
        return batch.append_column(
            "resized_bytes", pa.array([len(r) for r in resized], pa.int64())
        )


class FrameSampleStage:
    """Actor-pool frame-sampling stage (video shape): flat-map one
    binary payload row into up to ``max_frames`` frame rows, each a
    ``frame_len``-byte slice every ``stride`` bytes. With a real codec
    this is keyframe extraction; the slicing stand-in keeps the
    explode-with-binary plumbing (schema, per-frame rows, byte-bounded
    batches) real and oracle-checkable (sha256 per frame)."""

    def __init__(self, frame_len: int = 32, stride: int = 64, max_frames: int = 8,
                 id_col: str = "doc_id", real: bool = False):
        self.frame_len, self.stride, self.max_frames = frame_len, stride, max_frames
        self.id_col = id_col
        if real:
            raise NotImplementedError(
                "real frame sampling requires a video codec; not in this environment"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        take_idx, frame_idx, digests = [], [], []
        for i, p in enumerate(payloads):
            p = p or b""
            for j in range(self.max_frames):
                start = j * self.stride
                if start >= len(p):
                    break
                frame = p[start : start + self.frame_len]
                take_idx.append(i)
                frame_idx.append(j)
                digests.append(hashlib.sha256(frame).hexdigest())
        return pa.table(
            {
                self.id_col: batch[self.id_col].take(pa.array(take_idx, pa.int64())),
                "frame_idx": pa.array(frame_idx, pa.int64()),
                "frame_sha256": pa.array(digests, pa.string()),
            }
        )


def featurize_payloads(
    ds: ray.data.Dataset,
    batch_size: int = 64,
    concurrency: int | tuple = (1, 4),
) -> ray.data.Dataset:
    """Decode/featurize pipeline: small batches (large binary rows ⇒
    batch bytes, not row count, bound the working set) through the
    actor pool."""
    return ds.map_batches(
        DecodeStub,
        fn_constructor_kwargs=dict(real=False),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )
