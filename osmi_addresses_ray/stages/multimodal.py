"""Multimodal (image/audio/video) column plumbing — actor-pool stages.

Media payloads ride in the interleaved docs as ``media`` spans whose
``media_ref`` points at an opaque binary store. The engine treats them as
``binary`` columns with typed metadata; the Ray-side plumbing (schemas,
batch sizing, actor signatures, output layout) is real and tested, while the
codec itself is a deterministic STUB (no image/audio libraries in this
container): ``DecodeStub`` derives a fake feature vector from the bytes.
Swap ``_decode`` for a real decoder (PIL/torchaudio/ffmpeg) on a cluster
image that has one — everything else stays.

Batch-size note: media rows are wide; callers should pass small
``batch_size`` (e.g. 64) so batch × concurrency fits worker heaps
(SURVEY §"Memory-aware").
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("payload", pa.binary()),
        pa.field("media_kind", pa.string()),
    ]
)

MEDIA_FEATURE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("feature", pa.list_(pa.float32())),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
    ]
)


def extract_media_refs(docs_ds):
    """docs → one row per media span (doc_id, media_ref, fake payload bytes).

    The payload here is a deterministic stand-in derived from the ref (the
    sandbox has no binary store); on a real deployment this stage is a
    ``read_binary_files``-style fetch keyed by media_ref.
    """

    def f(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        offs = np.asarray(spans.offsets)
        parent = np.repeat(np.arange(t.num_rows), np.diff(offs))
        import pyarrow.compute as pc

        is_media = pc.equal(flat.field("kind"), "media").to_numpy(zero_copy_only=False)
        refs = flat.field("media_ref").to_numpy(zero_copy_only=False)[is_media]
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)[parent[is_media]]
        payloads = [hashlib.sha256(r.encode()).digest() * 4 for r in refs]
        return pa.Table.from_arrays(
            [
                pa.array(doc_ids, pa.string()),
                pa.array(refs, pa.string()),
                pa.array(payloads, pa.binary()),
                pa.array(["image"] * len(refs), pa.string()),
            ],
            schema=MEDIA_SCHEMA,
        )

    return docs_ds.map_batches(f, batch_format="pyarrow")


class DecodeStub:
    """Actor-pool decode/feature-extract stage.

    __init__ is where a real build loads the codec/model ONCE per actor;
    the stub "decodes" by hashing bytes into a deterministic 16-dim feature
    and fake dimensions. Raises NotImplementedError for non-image kinds to
    make the stub boundary explicit.
    """

    FEATURE_DIM = 16

    def __init__(self):
        self._ready = True  # real impl: self.model = load_model(...)

    def _decode(self, payload: bytes, kind: str) -> tuple[np.ndarray, int, int]:
        if kind != "image":
            raise NotImplementedError(f"decode for media kind {kind!r} is stubbed")
        h = np.frombuffer(hashlib.sha256(payload).digest(), dtype=np.uint8)
        feat = (h[: self.FEATURE_DIM].astype(np.float32) / 255.0) * 2.0 - 1.0
        width = int(64 + h[16] % 64)
        height = int(64 + h[17] % 64)
        return feat, width, height

    def __call__(self, t: pa.Table) -> pa.Table:
        feats, ws, hs = [], [], []
        payloads = t["payload"].to_pylist()
        kinds = t["media_kind"].to_pylist()
        for p, k in zip(payloads, kinds):
            f, w, h = self._decode(p, k)
            feats.append(f)
            ws.append(w)
            hs.append(h)
        return pa.Table.from_arrays(
            [
                t["doc_id"].combine_chunks(),
                t["media_ref"].combine_chunks(),
                pa.array(feats, pa.list_(pa.float32())),
                pa.array(ws, pa.int32()),
                pa.array(hs, pa.int32()),
            ],
            schema=MEDIA_FEATURE_SCHEMA,
        )


def media_features(docs_ds, *, concurrency=(1, 4), batch_size: int = 64):
    """docs → media feature table (the full multimodal plumbing path)."""
    media = extract_media_refs(docs_ds)
    return media.map_batches(
        DecodeStub,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
