"""Multimodal (image/audio/video) column plumbing — actor-pool stages.

Media payloads ride in the interleaved docs as ``media`` spans whose
``media_ref`` points at an opaque binary store. The engine treats them as
``binary`` columns with typed metadata. The decode boundary is REAL for
uncompressed image formats: the actor pool parses actual P6-PPM / 24-bit-BMP
bytes into pixel arrays with pure-numpy codecs (``media_codecs``) and
derives features from real pixels. Compressed codecs (JPEG/PNG) and
non-image kinds (audio/video) stay behind an explicit NotImplementedError —
swap a PIL/torchaudio decoder into ``MediaDecoder._decode`` on a cluster
image that has one; everything else (schema, batch sizing, actor
signatures, output layout) stays.

The binary store itself does not exist in the sandbox, so the fetch stage
synthesizes deterministic ENCODED image bytes per ref
(``media_codecs.synthesize_media_payload``); on a real deployment that
stage is a ``read_binary_files``-style fetch keyed by media_ref.

Batch-size note: media rows are wide; callers should pass small
``batch_size`` (e.g. 64) so batch × concurrency fits worker heaps
(SURVEY §"Memory-aware").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osmi_addresses_ray.stages.media_codecs import (
    decode_image,
    grid_features,
    sniff_format,
    synthesize_media_payload,
)

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
    """docs → one row per media span (doc_id, media_ref, encoded payload).

    The payload is a deterministic stand-in fetched from the fake store
    (real PPM/BMP bytes); on a real deployment this stage is a
    ``read_binary_files``-style fetch keyed by media_ref. Thin wrapper over
    the store-parameterized extractor shared with the audio/video stages.
    """
    return _extract_refs_with_store(docs_ds, synthesize_media_payload, "image")


class MediaDecoder:
    """Actor-pool decode/feature-extract stage.

    __init__ is where a real build loads codecs/models ONCE per actor; here
    it binds the pure-numpy decoder table. ``_decode`` REALLY parses the
    payload bytes (PPM/BMP header + raster) into an (H, W, 3) pixel array
    and computes a 16-dim grid-of-grayscale-means feature from the real
    pixels; width/height come from the parsed header. Non-image kinds and
    unrecognized codecs raise NotImplementedError to keep the unsupported
    boundary explicit (SURVEY §multimodal: stub ONLY what the sandbox
    lacks).
    """

    FEATURE_DIM = 16

    def __init__(self, extra_codecs=None):
        # extra_codecs is the documented compressed-codec swap seam:
        # {fmt_name: (magic_prefix: bytes, decode_fn: bytes -> (H, W, 3)
        # uint8)} — e.g. {"jpeg": (b"\xff\xd8", pil_jpeg_decode)} on a
        # cluster image with PIL. It rides to each actor through
        # map_batches(..., fn_constructor_kwargs=...), so no module-level
        # mutable registry has to survive worker re-import; the stage code
        # and output schema are untouched by a codec swap
        # (tests/test_media_codecs.py::test_decoder_injection proves it).
        self._decode_image = decode_image
        self._extra = dict(extra_codecs or {})

    def _decode(self, payload: bytes, kind: str) -> tuple[np.ndarray, int, int]:
        if kind != "image":
            raise NotImplementedError(f"decode for media kind {kind!r} is stubbed")
        for magic, fn in self._extra.values():
            if payload[: len(magic)] == magic:
                img = np.asarray(fn(payload), dtype=np.uint8)
                feat = grid_features(img)
                return feat, int(img.shape[1]), int(img.shape[0])
        if sniff_format(payload) is None:
            raise NotImplementedError(
                f"no codec for image payload (magic {payload[:2]!r}); "
                "compressed formats need a library this image lacks"
            )
        img = self._decode_image(payload)
        feat = grid_features(img)
        return feat, int(img.shape[1]), int(img.shape[0])

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


# Back-compat name from rounds 1-2 (when the decode was a hash stub).
DecodeStub = MediaDecoder


def media_features(
    docs_ds, *, concurrency=(1, 4), batch_size: int = 64, extra_codecs=None
):
    """docs → media feature table (the full multimodal plumbing path).

    ``extra_codecs`` injects compressed-format decoders into each actor
    (see ``MediaDecoder.__init__``) without touching the stage wiring."""
    media = extract_media_refs(docs_ds)
    kwargs = (
        {"fn_constructor_kwargs": {"extra_codecs": extra_codecs}}
        if extra_codecs else {}
    )
    return media.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        **kwargs,
    )


MEDIA_RESIZE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("src_width", pa.int32()),
        pa.field("src_height", pa.int32()),
        pa.field("out_width", pa.int32()),
        pa.field("out_height", pa.int32()),
        pa.field("px_sum", pa.int64()),
        pa.field("px_fold", pa.int64()),
    ]
)


class MediaResizer:
    """Actor-pool resize stage: decode → nearest-neighbor downscale.

    The index map is pure integer math — src row of out row i is
    ``(i*H)//out_h`` (likewise columns) — so the resampled raster is
    bit-deterministic and oracle-checkable without any float resampling
    spec. Output carries integer summaries of the REAL resized pixels
    (sum + a position-weighted fold mod 999999937) rather than the raster
    itself, keeping the driver compare payload tiny; a production sink
    would re-encode ``self._encode(resized)`` back to the media store
    (the encoder exists — media_codecs.encode_ppm — it's just not a
    hash-comparable column).
    """

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self._decode_image = decode_image
        self.out_w = int(out_w)
        self.out_h = int(out_h)

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        ri = (np.arange(self.out_h, dtype=np.int64) * h) // self.out_h
        ci = (np.arange(self.out_w, dtype=np.int64) * w) // self.out_w
        return img[ri][:, ci]

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {k: [] for k in MEDIA_RESIZE_SCHEMA.names}
        for doc_id, ref, payload, kind in zip(
            t["doc_id"].to_pylist(),
            t["media_ref"].to_pylist(),
            t["payload"].to_pylist(),
            t["media_kind"].to_pylist(),
        ):
            if kind != "image" or sniff_format(payload) is None:
                raise NotImplementedError(f"resize for {kind!r} payload is stubbed")
            img = self._decode_image(payload)
            out = self._resize(img)
            flat = out.astype(np.uint64).ravel()
            rows["doc_id"].append(doc_id)
            rows["media_ref"].append(ref)
            rows["src_width"].append(img.shape[1])
            rows["src_height"].append(img.shape[0])
            rows["out_width"].append(self.out_w)
            rows["out_height"].append(self.out_h)
            rows["px_sum"].append(int(flat.sum()))
            rows["px_fold"].append(
                int(((np.arange(1, len(flat) + 1, dtype=np.uint64) * flat).sum()) % 999999937)
            )
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in MEDIA_RESIZE_SCHEMA],
            schema=MEDIA_RESIZE_SCHEMA,
        )


def media_resize(docs_ds, *, out_w: int = 16, out_h: int = 16, concurrency=(1, 4),
                 batch_size: int = 64):
    """docs → integer-summarized nearest-neighbor thumbnails (actor pool)."""
    media = extract_media_refs(docs_ds)
    return media.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


MEDIA_AUDIO_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("sample_rate", pa.int32()),
        pa.field("n_samples", pa.int64()),
        pa.field("sum_sq", pa.int64()),
        pa.field("peak", pa.int64()),
    ]
)

MEDIA_FRAMES_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("n_frames", pa.int32()),
        pa.field("n_sampled", pa.int32()),
        pa.field("px_sum", pa.int64()),
        pa.field("px_fold", pa.int64()),
    ]
)


class AudioFeatures:
    """Actor-pool REAL audio decode: RIFF/WAVE PCM16 parse (no codec library
    required) → exact integer features (energy = Σs², peak = max|s| — int64
    so the oracle compare has no float surface). Compressed codecs raise
    NotImplementedError, same boundary contract as the image decoder."""

    def __init__(self):
        from osmi_addresses_ray.stages.media_codecs import decode_wav

        self._decode = decode_wav

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {k: [] for k in MEDIA_AUDIO_SCHEMA.names}
        for doc_id, ref, payload in zip(
            t["doc_id"].to_pylist(), t["media_ref"].to_pylist(), t["payload"].to_pylist()
        ):
            if payload[:4] != b"RIFF":
                raise NotImplementedError(
                    f"no codec for audio payload (magic {payload[:4]!r})"
                )
            samples, rate = self._decode(payload)
            s = samples.astype(np.int64)
            rows["doc_id"].append(doc_id)
            rows["media_ref"].append(ref)
            rows["sample_rate"].append(rate)
            rows["n_samples"].append(len(s))
            rows["sum_sq"].append(int((s * s).sum()))
            rows["peak"].append(int(np.abs(s).max()) if len(s) else 0)
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in MEDIA_AUDIO_SCHEMA],
            schema=MEDIA_AUDIO_SCHEMA,
        )


MEDIA_AUDIO_WIN_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("n_windows", pa.int64()),
        pa.field("n_low", pa.int64()),
        pa.field("min_energy", pa.int64()),
        pa.field("min_window", pa.int64()),
        pa.field("max_energy", pa.int64()),
    ]
)


class AudioWindows:
    """Actor-pool windowed audio energy profile over REAL decoded PCM16 —
    the voice-activity-detection primitive: the clip splits into
    ``win``-sample windows (floor(n/win); a trailing partial window is
    dropped), each window's energy is the exact int64 Σs², and the profile
    reports the count below ``thr`` (low-activity windows), the quietest
    window (FIRST argmin on ties) and the min/max energies. No float
    surface; window energy ≤ 256·32768² < 2⁴⁸."""

    WIN = 256
    THR = 92_000_000_000  # ≈ the expectation for full-scale uniform content

    def __init__(self):
        from osmi_addresses_ray.stages.media_codecs import decode_wav

        self._decode = decode_wav

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {k: [] for k in MEDIA_AUDIO_WIN_SCHEMA.names}
        for doc_id, ref, payload in zip(
            t["doc_id"].to_pylist(), t["media_ref"].to_pylist(), t["payload"].to_pylist()
        ):
            if payload[:4] != b"RIFF":
                raise NotImplementedError(
                    f"no codec for audio payload (magic {payload[:4]!r})"
                )
            samples, _rate = self._decode(payload)
            s = samples.astype(np.int64)
            nw = len(s) // self.WIN
            rows["doc_id"].append(doc_id)
            rows["media_ref"].append(ref)
            rows["n_windows"].append(nw)
            if nw == 0:
                rows["n_low"].append(0)
                rows["min_energy"].append(0)
                rows["min_window"].append(-1)
                rows["max_energy"].append(0)
                continue
            w = s[: nw * self.WIN].reshape(nw, self.WIN)
            e = (w * w).sum(axis=1)
            rows["n_low"].append(int((e < self.THR).sum()))
            rows["min_energy"].append(int(e.min()))
            rows["min_window"].append(int(e.argmin()))  # first argmin (np rule)
            rows["max_energy"].append(int(e.max()))
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in MEDIA_AUDIO_WIN_SCHEMA],
            schema=MEDIA_AUDIO_WIN_SCHEMA,
        )


class FrameSampler:
    """Actor-pool video frame sampling: parse the frame-stack container,
    keep every ``stride``-th frame, emit integer summaries of the REAL
    sampled pixels (the resize-stage contract, per frame-sampled raster)."""

    def __init__(self, stride: int = 2):
        from osmi_addresses_ray.stages.media_codecs import decode_frame_stack

        self._decode = decode_frame_stack
        self.stride = int(stride)

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {k: [] for k in MEDIA_FRAMES_SCHEMA.names}
        for doc_id, ref, payload in zip(
            t["doc_id"].to_pylist(), t["media_ref"].to_pylist(), t["payload"].to_pylist()
        ):
            frames = self._decode(payload)
            sampled = frames[:: self.stride]
            flat = sampled.astype(np.uint64).ravel()
            rows["doc_id"].append(doc_id)
            rows["media_ref"].append(ref)
            rows["n_frames"].append(frames.shape[0])
            rows["n_sampled"].append(sampled.shape[0])
            rows["px_sum"].append(int(flat.sum()))
            rows["px_fold"].append(
                int(((np.arange(1, len(flat) + 1, dtype=np.uint64) * flat).sum()) % 999999937)
            )
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in MEDIA_FRAMES_SCHEMA],
            schema=MEDIA_FRAMES_SCHEMA,
        )


def _extract_refs_with_store(docs_ds, synthesize, kind: str):
    """extract_media_refs with a different fake-store fetch (audio/video
    renditions keyed by the same media_ref)."""

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        offs = np.asarray(spans.offsets)
        parent = np.repeat(np.arange(t.num_rows), np.diff(offs))
        is_media = pc.equal(flat.field("kind"), "media").to_numpy(zero_copy_only=False)
        refs = flat.field("media_ref").to_numpy(zero_copy_only=False)[is_media]
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)[parent[is_media]]
        payloads = [synthesize(r) for r in refs]
        return pa.Table.from_arrays(
            [
                pa.array(doc_ids, pa.string()),
                pa.array(refs, pa.string()),
                pa.array(payloads, pa.binary()),
                pa.array([kind] * len(refs), pa.string()),
            ],
            schema=MEDIA_SCHEMA,
        )

    return docs_ds.map_batches(f, batch_format="pyarrow")


def audio_features(docs_ds, *, concurrency=(1, 4), batch_size: int = 64):
    from osmi_addresses_ray.stages.media_codecs import synthesize_audio_payload

    media = _extract_refs_with_store(docs_ds, synthesize_audio_payload, "audio")
    return media.map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


def audio_windows(docs_ds, *, concurrency=(1, 4), batch_size: int = 64):
    from osmi_addresses_ray.stages.media_codecs import synthesize_audio_payload

    media = _extract_refs_with_store(docs_ds, synthesize_audio_payload, "audio")
    return media.map_batches(
        AudioWindows, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


def video_frame_sample(docs_ds, *, stride: int = 2, concurrency=(1, 4), batch_size: int = 64):
    from osmi_addresses_ray.stages.media_codecs import synthesize_video_payload

    media = _extract_refs_with_store(docs_ds, synthesize_video_payload, "video")
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


MEDIA_HIST_SCHEMA = pa.schema(
    [pa.field("doc_id", pa.string()), pa.field("media_ref", pa.string())]
    + [pa.field(f"{ch}{b}", pa.int64()) for ch in "rgb" for b in range(4)]
)


class ColorHistogram:
    """Actor-pool per-channel color histogram over REAL decoded pixels:
    4 intensity buckets per channel (value >> 6), exact integer counts.
    The downstream use is corpus-level color profiling / near-black or
    blown-out frame filtering; counts are exact so the oracle recomputes
    them from the synthesized pixels, bypassing the codecs entirely."""

    def __init__(self):
        self._decode_image = decode_image

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {f.name: [] for f in MEDIA_HIST_SCHEMA}
        for doc_id, ref, payload, kind in zip(
            t["doc_id"].to_pylist(),
            t["media_ref"].to_pylist(),
            t["payload"].to_pylist(),
            t["media_kind"].to_pylist(),
        ):
            if kind != "image" or sniff_format(payload) is None:
                raise NotImplementedError(f"histogram for {kind!r} payload is stubbed")
            img = self._decode_image(payload)
            rows["doc_id"].append(doc_id)
            rows["media_ref"].append(ref)
            for c, ch in enumerate("rgb"):
                hist = np.bincount(img[:, :, c].ravel() >> 6, minlength=4)
                for b in range(4):
                    rows[f"{ch}{b}"].append(int(hist[b]))
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in MEDIA_HIST_SCHEMA],
            schema=MEDIA_HIST_SCHEMA,
        )


def media_histogram(docs_ds, *, concurrency=(1, 4), batch_size: int = 64):
    """docs → exact per-image color histograms (actor pool over real decode)."""
    media = extract_media_refs(docs_ds)
    return media.map_batches(
        ColorHistogram, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


MEDIA_CUTS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("n_frames", pa.int32()),
        pa.field("n_cuts", pa.int32()),
        pa.field("max_dist", pa.int64()),
        pa.field("sum_dist", pa.int64()),
    ]
)


class SceneCutDetector:
    """Actor-pool shot-boundary detection: decode the frame stack, build a
    4-bin-per-channel color histogram per frame, and flag a CUT between
    adjacent frames whose L1 histogram distance exceeds ``threshold`` — the
    classic histogram-difference shot detector. Exact integers end to end
    (counts and |Δ| sums), so the independent oracle compares without a
    float surface. The default threshold (15) sits at the median adjacent-
    frame distance of the synthetic store, so the gate genuinely splits the
    corpus; on real footage it would be calibrated per format."""

    def __init__(self, bins: int = 4, threshold: int = 15):
        from osmi_addresses_ray.stages.media_codecs import decode_frame_stack

        self._decode = decode_frame_stack
        self.bins = int(bins)
        self.threshold = int(threshold)

    def __call__(self, t: pa.Table) -> pa.Table:
        shift = 8 - self.bins.bit_length() + 1  # 4 bins -> shift 6
        nb = self.bins
        rows = {k: [] for k in MEDIA_CUTS_SCHEMA.names}
        for doc_id, ref, payload in zip(
            t["doc_id"].to_pylist(), t["media_ref"].to_pylist(), t["payload"].to_pylist()
        ):
            frames = self._decode(payload)  # (T, H, W, 3) uint8
            tt, h, w, _ = frames.shape
            binned = (frames.astype(np.int64) >> shift).reshape(tt, h * w, 3)
            ch = np.arange(3, dtype=np.int64)[None, None, :]
            flat = (binned + ch * nb).reshape(tt, -1)  # bin ids 0..3*nb-1
            hists = np.zeros((tt, 3 * nb), dtype=np.int64)
            for i in range(tt):
                hists[i] = np.bincount(flat[i], minlength=3 * nb)
            d = np.abs(np.diff(hists, axis=0)).sum(axis=1) if tt > 1 else np.zeros(0, np.int64)
            thr = self.threshold
            rows["doc_id"].append(doc_id)
            rows["media_ref"].append(ref)
            rows["n_frames"].append(tt)
            rows["n_cuts"].append(int((d > thr).sum()))
            rows["max_dist"].append(int(d.max()) if len(d) else 0)
            rows["sum_dist"].append(int(d.sum()))
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in MEDIA_CUTS_SCHEMA],
            schema=MEDIA_CUTS_SCHEMA,
        )


def video_scene_cuts(docs_ds, *, concurrency=(1, 4), batch_size: int = 64):
    from osmi_addresses_ray.stages.media_codecs import synthesize_video_payload

    media = _extract_refs_with_store(docs_ds, synthesize_video_payload, "video")
    return media.map_batches(
        SceneCutDetector,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


MEDIA_DHASH_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("dhash", pa.int64()),
    ]
)


class DHasher:
    """Actor-pool perceptual dHash: decode the image, reduce to an 8×9 grid
    of grayscale cell SUMS (integer box partition — row block i covers
    [i·h//8, (i+1)·h//8)), and set bit (i,j) when cell (i,j) is brighter
    than its right neighbor. Cells differ in area, so the brightness
    comparison is the exact integer cross-multiplication
    S(i,j)·A(i,j+1) > S(i,j+1)·A(i,j) — no float surface anywhere, and the
    64-bit hash is bit-identical to the scalar oracle. The hash keys
    embedding-free image near-dup grouping downstream (equal dhash ⇒ same
    visual structure)."""

    def __init__(self):
        from osmi_addresses_ray.stages.media_codecs import decode_image

        self._decode = decode_image

    @staticmethod
    def _dhash(img: np.ndarray) -> int:
        g = img.astype(np.int64).sum(axis=2)  # grayscale proxy: r+g+b, exact
        h, w = g.shape
        rb = (np.arange(9, dtype=np.int64) * h) // 8
        cb = (np.arange(10, dtype=np.int64) * w) // 9
        # per-cell sums via 2-D prefix sums (vectorized, exact int64)
        ps = np.zeros((h + 1, w + 1), np.int64)
        np.cumsum(np.cumsum(g, axis=0), axis=1, out=ps[1:, 1:])
        S = ps[rb[:, None], cb[None, :]]
        cell = S[1:, 1:] - S[:-1, 1:] - S[1:, :-1] + S[:-1, :-1]  # (8, 9)
        area = (rb[1:] - rb[:-1])[:, None] * (cb[1:] - cb[:-1])[None, :]
        left, right = cell[:, :-1], cell[:, 1:]
        bits = (left * area[:, 1:] > right * area[:, :-1]).ravel()
        return int(np.packbits(bits).view(">u8")[0].astype(np.uint64).view(np.int64))

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {k: [] for k in MEDIA_DHASH_SCHEMA.names}
        for doc_id, ref, payload in zip(
            t["doc_id"].to_pylist(), t["media_ref"].to_pylist(), t["payload"].to_pylist()
        ):
            rows["doc_id"].append(doc_id)
            rows["media_ref"].append(ref)
            rows["dhash"].append(self._dhash(self._decode(payload)))
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in MEDIA_DHASH_SCHEMA],
            schema=MEDIA_DHASH_SCHEMA,
        )


def media_dhash(docs_ds, *, concurrency=(1, 4), batch_size: int = 64):
    media = extract_media_refs(docs_ds)
    return media.map_batches(
        DHasher, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


MEDIA_SOBEL_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("n_interior", pa.int64()),
        pa.field("n_edges", pa.int64()),
        pa.field("max_mag2", pa.int64()),
        pa.field("sum_mag2", pa.int64()),
    ]
)


class SobelEdges:
    """Actor-pool Sobel edge statistics over REAL decoded pixels: the 3×3
    integer Sobel gradient pair (gx, gy) on the r+g+b grayscale proxy,
    magnitude² = gx²+gy² per interior pixel — all int64, no float surface,
    so the vectorized slice arithmetic here is bit-identical to the scalar
    per-pixel-loop oracle. Per image: interior pixel count, count of pixels
    with mag² > THR2 (the edge-density signal a media-quality filter keys
    on), max and sum of mag². Bound: mag² ≤ 2·(4·765)² < 1.9e7 per pixel,
    ×1024 interior pixels < 2e10 — comfortably int64."""

    THR2 = 1_000_000

    def __init__(self):
        from osmi_addresses_ray.stages.media_codecs import decode_image

        self._decode = decode_image

    @staticmethod
    def _stats(img: np.ndarray) -> tuple[int, int, int, int]:
        g = img.astype(np.int64).sum(axis=2)
        h, w = g.shape
        if h < 3 or w < 3:
            return 0, 0, 0, 0
        gx = (
            (g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:])
            - (g[:-2, :-2] + 2 * g[1:-1, :-2] + g[2:, :-2])
        )
        gy = (
            (g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:])
            - (g[:-2, :-2] + 2 * g[:-2, 1:-1] + g[:-2, 2:])
        )
        mag2 = gx * gx + gy * gy
        return (
            int(mag2.size),
            int((mag2 > SobelEdges.THR2).sum()),
            int(mag2.max()),
            int(mag2.sum()),
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {k: [] for k in MEDIA_SOBEL_SCHEMA.names}
        for doc_id, ref, payload in zip(
            t["doc_id"].to_pylist(), t["media_ref"].to_pylist(), t["payload"].to_pylist()
        ):
            n_int, n_edges, mx, sm = self._stats(self._decode(payload))
            rows["doc_id"].append(doc_id)
            rows["media_ref"].append(ref)
            rows["n_interior"].append(n_int)
            rows["n_edges"].append(n_edges)
            rows["max_mag2"].append(mx)
            rows["sum_mag2"].append(sm)
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in MEDIA_SOBEL_SCHEMA],
            schema=MEDIA_SOBEL_SCHEMA,
        )


def media_sobel(docs_ds, *, concurrency=(1, 4), batch_size: int = 64):
    media = extract_media_refs(docs_ds)
    return media.map_batches(
        SobelEdges, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


MEDIA_RESAMPLE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("n_in", pa.int64()),
        pa.field("n_out", pa.int64()),
        pa.field("sum_sq_out", pa.int64()),
        pa.field("peak_out", pa.int64()),
    ]
)


class AudioResampler:
    """Actor-pool 2:1 PCM decimation: decode RIFF/WAVE PCM16, average each
    adjacent sample pair with FLOOR division ((s₀+s₁) >> 1 semantics for
    negatives too — numpy/python // agree, and the scalar oracle restates
    it), drop a trailing odd sample. Output integer summaries of the REAL
    resampled signal (energy, peak) — exact end to end. Rational-ratio
    resampling beyond 2:1 swaps the index map; the stage contract (decode →
    integer DSP → summary columns) is the reusable part."""

    def __init__(self):
        from osmi_addresses_ray.stages.media_codecs import decode_wav

        self._decode = decode_wav

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {k: [] for k in MEDIA_RESAMPLE_SCHEMA.names}
        for doc_id, ref, payload in zip(
            t["doc_id"].to_pylist(), t["media_ref"].to_pylist(), t["payload"].to_pylist()
        ):
            s, _rate = self._decode(payload)
            s = s.astype(np.int64)
            n = len(s) - (len(s) % 2)
            out = (s[:n:2] + s[1:n:2]) // 2
            rows["doc_id"].append(doc_id)
            rows["media_ref"].append(ref)
            rows["n_in"].append(len(s))
            rows["n_out"].append(len(out))
            rows["sum_sq_out"].append(int((out * out).sum()))
            rows["peak_out"].append(int(np.abs(out).max()) if len(out) else 0)
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in MEDIA_RESAMPLE_SCHEMA],
            schema=MEDIA_RESAMPLE_SCHEMA,
        )


def media_resample_audio(docs_ds, *, concurrency=(1, 4), batch_size: int = 64):
    from osmi_addresses_ray.stages.media_codecs import synthesize_audio_payload

    media = _extract_refs_with_store(docs_ds, synthesize_audio_payload, "audio")
    return media.map_batches(
        AudioResampler, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


# --- autocorrelation pitch over real decoded PCM16 ---------------------------

MEDIA_PITCH_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("n_samples", pa.int64()),
        pa.field("sample_rate", pa.int64()),
        pa.field("r0", pa.int64()),
        pa.field("best_lag", pa.int64()),
        pa.field("r_best", pa.int64()),
        pa.field("voiced", pa.int64()),
    ]
)


class AudioPitch:
    """Actor-pool autocorrelation pitch detection over REAL decoded PCM16 —
    the fundamental-frequency primitive (speech/music triage). Fixed-window
    spec so every lag sees the same left window: with W = n − LAG_MAX,
    r(lag) = Σ_{i<W} s[i]·s[i+lag] for lag ∈ [LAG_MIN, LAG_MAX];
    best_lag = FIRST argmax (np rule), r0 = Σ s² over the whole clip,
    voiced ⇔ 4·r_best > r0 (normalized autocorr > 0.25, exact integer
    cross-multiplication — no float surface anywhere). Clips with n ≤
    LAG_MAX emit the sentinel (best_lag −1, r_best 0, voiced 0).

    The per-clip lag sweep is ONE int64 matmul over a stride-tricks view
    (numpy integer matmul is exact), not a per-lag Python loop."""

    LAG_MIN = 32
    LAG_MAX = 160

    def __init__(self):
        from osmi_addresses_ray.stages.media_codecs import decode_wav

        self._decode = decode_wav
        self._lags = np.arange(self.LAG_MIN, self.LAG_MAX + 1)

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {k: [] for k in MEDIA_PITCH_SCHEMA.names}
        for doc_id, ref, payload in zip(
            t["doc_id"].to_pylist(), t["media_ref"].to_pylist(), t["payload"].to_pylist()
        ):
            if payload[:4] != b"RIFF":
                raise NotImplementedError(
                    f"no codec for audio payload (magic {payload[:4]!r})"
                )
            samples, rate = self._decode(payload)
            s = samples.astype(np.int64)
            n = len(s)
            rows["doc_id"].append(doc_id)
            rows["media_ref"].append(ref)
            rows["n_samples"].append(n)
            rows["sample_rate"].append(int(rate))
            r0 = int((s * s).sum())
            rows["r0"].append(r0)
            w = n - self.LAG_MAX
            if w <= 0:
                rows["best_lag"].append(-1)
                rows["r_best"].append(0)
                rows["voiced"].append(0)
                continue
            # (n_lags, W) strided view of the right windows × left window
            win = np.lib.stride_tricks.sliding_window_view(s, w)[self._lags]
            r = win @ s[:w]
            k = int(np.argmax(r))  # first argmax on ties
            r_best = int(r[k])
            rows["best_lag"].append(int(self._lags[k]))
            rows["r_best"].append(r_best)
            rows["voiced"].append(1 if 4 * r_best > r0 else 0)
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in MEDIA_PITCH_SCHEMA],
            schema=MEDIA_PITCH_SCHEMA,
        )


def audio_pitch(docs_ds, *, concurrency=(1, 4), batch_size: int = 64):
    from osmi_addresses_ray.stages.media_codecs import synthesize_audio_payload

    media = _extract_refs_with_store(docs_ds, synthesize_audio_payload, "audio")
    return media.map_batches(
        AudioPitch, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


# --- audio onset detection over windowed energies -----------------------------

MEDIA_ONSET_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("n_windows", pa.int64()),
        pa.field("n_onsets", pa.int64()),
        pa.field("first_onset", pa.int64()),
        pa.field("max_jump_num", pa.int64()),
        pa.field("max_jump_den", pa.int64()),
    ]
)


class AudioOnsets:
    """Actor-pool onset detection over REAL decoded PCM16 — the
    attack/transient primitive (beat tracking, speech burst segmentation):
    window energies e[i] (the AudioWindows spec: 256-sample windows,
    trailing partial dropped), onset at window i ≥ 1 iff e[i] > RATIO·
    e[i-1] AND e[i] ≥ E_MIN — both exact integer comparisons, no float.
    The sharpest jump is reported as the RATIONAL pair (e[i], e[i-1]) of
    the onset maximizing e[i]·e[j-1] cross-multiplied comparison, ties to
    the earliest window; no-onset clips emit the (-1, 0, 0) sentinel."""

    WIN = 256
    RATIO = 4
    E_MIN = 50_000_000_000

    def __init__(self):
        from osmi_addresses_ray.stages.media_codecs import decode_wav

        self._decode = decode_wav

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {k: [] for k in MEDIA_ONSET_SCHEMA.names}
        for doc_id, ref, payload in zip(
            t["doc_id"].to_pylist(), t["media_ref"].to_pylist(), t["payload"].to_pylist()
        ):
            if payload[:4] != b"RIFF":
                raise NotImplementedError(
                    f"no codec for audio payload (magic {payload[:4]!r})"
                )
            samples, _rate = self._decode(payload)
            s = samples.astype(np.int64)
            nw = len(s) // self.WIN
            rows["doc_id"].append(doc_id)
            rows["media_ref"].append(ref)
            rows["n_windows"].append(nw)
            if nw < 2:
                rows["n_onsets"].append(0)
                rows["first_onset"].append(-1)
                rows["max_jump_num"].append(0)
                rows["max_jump_den"].append(0)
                continue
            e = (s[: nw * self.WIN].reshape(nw, self.WIN) ** 2).sum(axis=1)
            cur, prev = e[1:], e[:-1]
            hit = (cur > self.RATIO * prev) & (cur >= self.E_MIN)
            idx = np.flatnonzero(hit) + 1
            rows["n_onsets"].append(len(idx))
            if len(idx) == 0:
                rows["first_onset"].append(-1)
                rows["max_jump_num"].append(0)
                rows["max_jump_den"].append(0)
                continue
            rows["first_onset"].append(int(idx[0]))
            # sharpest jump by cross-multiplied ratio compare, first on ties
            best = idx[0]
            for i in idx[1:]:
                # e[i]/e[i-1] > e[best]/e[best-1]  <=>  cross products
                if int(e[i]) * int(e[best - 1]) > int(e[best]) * int(e[i - 1]):
                    best = i
            rows["max_jump_num"].append(int(e[best]))
            rows["max_jump_den"].append(int(e[best - 1]))
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in MEDIA_ONSET_SCHEMA],
            schema=MEDIA_ONSET_SCHEMA,
        )


def audio_onsets(docs_ds, *, concurrency=(1, 4), batch_size: int = 64):
    from osmi_addresses_ray.stages.media_codecs import synthesize_audio_payload

    media = _extract_refs_with_store(docs_ds, synthesize_audio_payload, "audio")
    return media.map_batches(
        AudioOnsets, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


# --- per-image connected-component (blob) labeling -----------------------------

MEDIA_BLOB_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("n_fg", pa.int64()),
        pa.field("n_blobs", pa.int64()),
        pa.field("largest_size", pa.int64()),
        pa.field("largest_anchor", pa.int64()),
    ]
)


class ImageBlobs:
    """Actor-pool connected-component labeling over REAL decoded pixels —
    the blob/region primitive (object counting, mask sanity checks):
    foreground = (r+g+b ≥ THR), 4-connectivity components. Per image:
    foreground pixel count, blob count, the largest blob's size and its
    ANCHOR (minimum row-major pixel index — the deterministic tie-break:
    equal sizes resolve to the blob whose anchor is smallest). Adjacency
    pairs come from two vectorized boolean shifts (right/down neighbors);
    only the union-find over ≤ h·w nodes is scalar — bounded by the image,
    never the batch."""

    THR = 384  # half of the 0..765 r+g+b range

    def __init__(self):
        from osmi_addresses_ray.stages.media_codecs import decode_image

        self._decode = decode_image

    @staticmethod
    def _label(fg: np.ndarray) -> tuple[int, int, int, int]:
        n_fg = int(fg.sum())
        if n_fg == 0:
            return 0, 0, 0, -1
        h, w = fg.shape
        idx = np.arange(h * w).reshape(h, w)
        right = fg[:, :-1] & fg[:, 1:]
        down = fg[:-1, :] & fg[1:, :]
        pairs = np.concatenate(
            [
                np.stack([idx[:, :-1][right], idx[:, 1:][right]], axis=1),
                np.stack([idx[:-1, :][down], idx[1:, :][down]], axis=1),
            ]
        )
        parent = {}

        def find(a: int) -> int:
            r = a
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(a, a) != a:
                parent[a], a = r, parent[a]
            return r

        for a, b in pairs:
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                # union by MIN root: every blob's root IS its anchor
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        roots: dict[int, int] = {}
        for p in idx[fg]:
            roots[find(int(p))] = roots.get(find(int(p)), 0) + 1
        n_blobs = len(roots)
        largest = max(roots.items(), key=lambda kv: (kv[1], -kv[0]))
        return n_fg, n_blobs, largest[1], largest[0]

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {k: [] for k in MEDIA_BLOB_SCHEMA.names}
        for doc_id, ref, payload in zip(
            t["doc_id"].to_pylist(), t["media_ref"].to_pylist(), t["payload"].to_pylist()
        ):
            img = self._decode(payload)
            fg = img.astype(np.int64).sum(axis=2) >= self.THR
            n_fg, n_blobs, size, anchor = self._label(fg)
            rows["doc_id"].append(doc_id)
            rows["media_ref"].append(ref)
            rows["n_fg"].append(n_fg)
            rows["n_blobs"].append(n_blobs)
            rows["largest_size"].append(size)
            rows["largest_anchor"].append(anchor)
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in MEDIA_BLOB_SCHEMA],
            schema=MEDIA_BLOB_SCHEMA,
        )


def media_blobs(docs_ds, *, concurrency=(1, 4), batch_size: int = 64):
    media = extract_media_refs(docs_ds)
    return media.map_batches(
        ImageBlobs, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


# --- quadtree uniformity decomposition ----------------------------------------

MEDIA_QUAD_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("n_leaves", pa.int64()),
        pa.field("max_depth", pa.int64()),
        pa.field("n_px_leaves", pa.int64()),
        pa.field("largest_uniform_area", pa.int64()),
    ]
)


class ImageQuadtree:
    """Actor-pool quadtree uniformity decomposition over REAL decoded
    pixels — the structure/compressibility signal (flat posters decompose
    in a few large leaves, textured photos go to pixel depth): recursively
    split the r+g+b grayscale until a region's max−min ≤ THR. Split rule:
    h2 = h//2, w2 = w//2; both dims > 1 → 4 quads, a 1-pixel-high/wide
    strip splits in 2 along its long axis. Per image: leaf count, max
    depth (root = 0), count of 1×1 leaves, and the largest area among
    leaves that are uniform with area > 1 (0 when decomposition bottoms
    out everywhere). Exact integers; recursion depth ≤ log2(32) + 1."""

    THR = 60

    def __init__(self):
        from osmi_addresses_ray.stages.media_codecs import decode_image

        self._decode = decode_image

    @classmethod
    def _decompose(cls, g: np.ndarray) -> tuple[int, int, int, int]:
        n_leaves = max_depth = n_px = big_uni = 0

        def rec(y0: int, y1: int, x0: int, x1: int, depth: int) -> None:
            nonlocal n_leaves, max_depth, n_px, big_uni
            r = g[y0:y1, x0:x1]
            h, w = y1 - y0, x1 - x0
            uniform = int(r.max()) - int(r.min()) <= cls.THR
            if uniform or (h == 1 and w == 1):
                n_leaves += 1
                max_depth = max(max_depth, depth)
                if h == 1 and w == 1:
                    n_px += 1
                elif uniform:
                    big_uni = max(big_uni, h * w)
                return
            ym, xm = y0 + h // 2, x0 + w // 2
            if h > 1 and w > 1:
                rec(y0, ym, x0, xm, depth + 1)
                rec(y0, ym, xm, x1, depth + 1)
                rec(ym, y1, x0, xm, depth + 1)
                rec(ym, y1, xm, x1, depth + 1)
            elif h == 1:
                rec(y0, y1, x0, xm, depth + 1)
                rec(y0, y1, xm, x1, depth + 1)
            else:
                rec(y0, ym, x0, x1, depth + 1)
                rec(ym, y1, x0, x1, depth + 1)

        rec(0, g.shape[0], 0, g.shape[1], 0)
        return n_leaves, max_depth, n_px, big_uni

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {k: [] for k in MEDIA_QUAD_SCHEMA.names}
        for doc_id, ref, payload in zip(
            t["doc_id"].to_pylist(), t["media_ref"].to_pylist(), t["payload"].to_pylist()
        ):
            img = self._decode(payload)
            g = img.astype(np.int64).sum(axis=2)
            n_leaves, max_depth, n_px, big_uni = self._decompose(g)
            rows["doc_id"].append(doc_id)
            rows["media_ref"].append(ref)
            rows["n_leaves"].append(n_leaves)
            rows["max_depth"].append(max_depth)
            rows["n_px_leaves"].append(n_px)
            rows["largest_uniform_area"].append(big_uni)
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in MEDIA_QUAD_SCHEMA],
            schema=MEDIA_QUAD_SCHEMA,
        )


def media_quadtree(docs_ds, *, concurrency=(1, 4), batch_size: int = 64):
    media = extract_media_refs(docs_ds)
    return media.map_batches(
        ImageQuadtree, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


MEDIA_ORIENT_SCHEMA = pa.schema(
    [pa.field("doc_id", pa.string()), pa.field("media_ref", pa.string()),
     pa.field("n_edge", pa.int64())]
    + [pa.field(f"o{i}", pa.int64()) for i in range(8)]
)


class ImageOrientHist:
    """Actor-pool edge-orientation histogram (HOG-lite) over REAL decoded
    pixels: the 3×3 integer Sobel gradients of ``SobelEdges``, restricted
    to edge pixels (mag² > the same THR2), binned into 8 compass octants
    by a sign/|gx|-vs-|gy| compare ladder — NO trigonometry, so the engine
    and the scalar oracle replay bit-identical integer tests. Ladder (ax =
    |gx|, ay = |gy|): gy≥0 half → gx>0: 0 if ax>ay else 1; gx==0: 2;
    gx<0: 3 if ax>ay else 2. gy<0 half → gx<0: 4 if ax>ay else 5;
    gx==0: 6; gx>0: 7 if ax>ay else 6. The texture-direction signature
    behind orientation-aware quality filters and near-dup features."""

    def __init__(self):
        from osmi_addresses_ray.stages.media_codecs import decode_image

        self._decode = decode_image

    @staticmethod
    def _hist(img: np.ndarray) -> tuple[int, list[int]]:
        g = img.astype(np.int64).sum(axis=2)
        h, w = g.shape
        if h < 3 or w < 3:
            return 0, [0] * 8
        gx = (
            (g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:])
            - (g[:-2, :-2] + 2 * g[1:-1, :-2] + g[2:, :-2])
        )
        gy = (
            (g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:])
            - (g[:-2, :-2] + 2 * g[:-2, 1:-1] + g[:-2, 2:])
        )
        edge = (gx * gx + gy * gy) > SobelEdges.THR2
        ex, ey = gx[edge], gy[edge]
        ax, ay = np.abs(ex), np.abs(ey)
        big = ax > ay
        top = np.where(
            ex > 0, np.where(big, 0, 1),
            np.where(ex == 0, 2, np.where(big, 3, 2)),
        )
        bot = np.where(
            ex < 0, np.where(big, 4, 5),
            np.where(ex == 0, 6, np.where(big, 7, 6)),
        )
        o = np.where(ey >= 0, top, bot)
        return int(edge.sum()), np.bincount(o, minlength=8).astype(int).tolist()

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {k: [] for k in MEDIA_ORIENT_SCHEMA.names}
        for doc_id, ref, payload in zip(
            t["doc_id"].to_pylist(), t["media_ref"].to_pylist(), t["payload"].to_pylist()
        ):
            n_edge, hist = self._hist(self._decode(payload))
            rows["doc_id"].append(doc_id)
            rows["media_ref"].append(ref)
            rows["n_edge"].append(n_edge)
            for i in range(8):
                rows[f"o{i}"].append(hist[i])
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in MEDIA_ORIENT_SCHEMA],
            schema=MEDIA_ORIENT_SCHEMA,
        )


def media_orient_hist(docs_ds, *, concurrency=(1, 4), batch_size: int = 64):
    media = extract_media_refs(docs_ds)
    return media.map_batches(
        ImageOrientHist, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


MEDIA_MOTION_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("n_pairs", pa.int32()),
        pa.field("n_blocks", pa.int64()),
        pa.field("sum_motion", pa.int64()),
        pa.field("n_moving", pa.int64()),
        pa.field("sum_improve", pa.int64()),
        pa.field("max_improve", pa.int64()),
    ]
)


class MotionEstimator:
    """Actor-pool block-matching motion estimation over the frame stack:
    for every consecutive frame pair and every aligned 8x8 block of the
    CURRENT frame, exhaustive +-2 search in the PREVIOUS frame for the
    displacement minimizing integer SAD over r+g+b grayscale.

    Exact-integer spec (the scalar oracle mirrors it):
      - gray = r + g + b (int, no division)
      - candidates scan dy then dx, each -2..2 ascending; strictly-smaller
        SAD wins, so the lexicographically smallest (dy, dx) takes ties
      - out-of-bounds candidates are invalid for that block (realized here
        as a +2^20-per-pixel sentinel border, unreachable by any in-bounds
        SAD <= 64*765; (0,0) is always in bounds)
      - improvement of a block = SAD(0,0) - SAD(best) >= 0

    Vectorization: the 25-candidate loop runs whole-array ops over ALL
    (pair, block) cells at once — no per-block or per-pixel Python. One
    payload is the parallelism grain (actor pool over docs)."""

    def __init__(self, block: int = 8, search: int = 2):
        from osmi_addresses_ray.stages.media_codecs import decode_frame_stack

        self._decode = decode_frame_stack
        self.block = int(block)
        self.search = int(search)

    def _motion(self, frames: np.ndarray):
        B, S = self.block, self.search
        tt, h, w, _ = frames.shape
        gray = frames.astype(np.int64).sum(axis=3)  # (T, H, W)
        nby, nbx = h // B, w // B
        if tt < 2 or nby == 0 or nbx == 0:
            return 0, 0, 0, 0, 0, 0
        cur = gray[1:]   # (P, H, W)
        prev = gray[:-1]
        P = tt - 1
        pad = np.full((P, h + 2 * S, w + 2 * S), np.int64(1) << 20, dtype=np.int64)
        pad[:, S : S + h, S : S + w] = prev
        # current blocks: (P, nby, nbx, B, B)
        cb = cur[:, : nby * B, : nbx * B].reshape(P, nby, B, nbx, B).swapaxes(2, 3)
        best = None
        best_dy = best_dx = None
        sad00 = None
        for dy in range(-S, S + 1):
            for dx in range(-S, S + 1):
                ref = pad[:, S + dy : S + dy + nby * B, S + dx : S + dx + nbx * B]
                rb = ref.reshape(P, nby, B, nbx, B).swapaxes(2, 3)
                sad = np.abs(rb - cb).sum(axis=(3, 4))  # (P, nby, nbx)
                if dy == 0 and dx == 0:
                    sad00 = sad
                if best is None:
                    best = sad.copy()
                    best_dy = np.full(sad.shape, dy, np.int64)
                    best_dx = np.full(sad.shape, dx, np.int64)
                else:
                    m = sad < best
                    best[m] = sad[m]
                    best_dy[m] = dy
                    best_dx[m] = dx
        improve = sad00 - best
        motion = np.abs(best_dy) + np.abs(best_dx)
        moving = (best_dy != 0) | (best_dx != 0)
        return (
            P,
            int(P * nby * nbx),
            int(motion.sum()),
            int(moving.sum()),
            int(improve.sum()),
            int(improve.max()),
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {k: [] for k in MEDIA_MOTION_SCHEMA.names}
        for doc_id, ref, payload in zip(
            t["doc_id"].to_pylist(), t["media_ref"].to_pylist(), t["payload"].to_pylist()
        ):
            p, nb, sm, nm, si, mi = self._motion(self._decode(payload))
            rows["doc_id"].append(doc_id)
            rows["media_ref"].append(ref)
            rows["n_pairs"].append(p)
            rows["n_blocks"].append(nb)
            rows["sum_motion"].append(sm)
            rows["n_moving"].append(nm)
            rows["sum_improve"].append(si)
            rows["max_improve"].append(mi)
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in MEDIA_MOTION_SCHEMA],
            schema=MEDIA_MOTION_SCHEMA,
        )


def media_motion(docs_ds, *, concurrency=(1, 4), batch_size: int = 64):
    from osmi_addresses_ray.stages.media_codecs import synthesize_video_payload

    media = _extract_refs_with_store(docs_ds, synthesize_video_payload, "video")
    return media.map_batches(
        MotionEstimator,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


MEDIA_ZCR_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("n_windows", pa.int64()),
        pa.field("total_zc", pa.int64()),
        pa.field("max_zcr", pa.int64()),
        pa.field("max_zcr_window", pa.int64()),
        pa.field("n_voiced", pa.int64()),
    ]
)


class AudioZCR:
    """Actor-pool zero-crossing-rate profile over real decoded PCM16 — the
    voiced/unvoiced discriminator that pairs with the energy VAD: per
    256-sample window, the count of sign transitions ((s[i-1] >= 0) !=
    (s[i] >= 0), the boundary sample BETWEEN windows belongs to the later
    window), the loudest-crossing window (FIRST argmax on ties) and the
    count of VOICED windows — high energy (>= AudioWindows.THR) with low
    zcr (< 64: periodic content crosses far less than noise). Every
    quantity is an exact integer."""

    WIN = 256
    ZCR_VOICED = 64
    THR = 92_000_000_000

    def __init__(self):
        from osmi_addresses_ray.stages.media_codecs import decode_wav

        self._decode = decode_wav

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {k: [] for k in MEDIA_ZCR_SCHEMA.names}
        for doc_id, ref, payload in zip(
            t["doc_id"].to_pylist(), t["media_ref"].to_pylist(), t["payload"].to_pylist()
        ):
            if payload[:4] != b"RIFF":
                raise NotImplementedError(
                    f"no codec for audio payload (magic {payload[:4]!r})"
                )
            samples, _rate = self._decode(payload)
            s = samples.astype(np.int64)
            nw = len(s) // self.WIN
            rows["doc_id"].append(doc_id)
            rows["media_ref"].append(ref)
            rows["n_windows"].append(nw)
            if nw == 0:
                rows["total_zc"].append(0)
                rows["max_zcr"].append(0)
                rows["max_zcr_window"].append(-1)
                rows["n_voiced"].append(0)
                continue
            s = s[: nw * self.WIN]
            nn = s >= 0
            flips = (nn[1:] != nn[:-1]).astype(np.int64)
            # transition i-1 -> i belongs to the window of sample i
            owner = np.arange(1, len(s), dtype=np.int64) // self.WIN
            zcr = np.bincount(owner, flips, minlength=nw).astype(np.int64)
            w = s.reshape(nw, self.WIN)
            e = (w * w).sum(axis=1)
            voiced = (e >= self.THR) & (zcr < self.ZCR_VOICED)
            rows["total_zc"].append(int(zcr.sum()))
            rows["max_zcr"].append(int(zcr.max()))
            rows["max_zcr_window"].append(int(zcr.argmax()))
            rows["n_voiced"].append(int(voiced.sum()))
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in MEDIA_ZCR_SCHEMA],
            schema=MEDIA_ZCR_SCHEMA,
        )


def audio_zcr(docs_ds, *, concurrency=(1, 4), batch_size: int = 64):
    from osmi_addresses_ray.stages.media_codecs import synthesize_audio_payload

    media = _extract_refs_with_store(docs_ds, synthesize_audio_payload, "audio")
    return media.map_batches(
        AudioZCR, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


# --- dHash near-dup image pairs (banding over DHasher hashes) -----------------


# near-dup corpus spec (the oracle reimplements it independently): base
# images are the fake store's full-entropy pixels; every 3rd base gets a
# "/v" variant (red MSB flipped on a 2×2 corner patch -> a few corner
# blocks' means move, Hamming typically 0-3), every 5th an identical "/d"
# duplicate (Hamming 0); distinct full-entropy bases land ~32 bits apart,
# far above any sane threshold.
def dhash_corpus_refs(n_imgs: int) -> list[str]:
    refs = [f"img://dhash/{i}" for i in range(n_imgs)]
    refs += [f"img://dhash/{i}/v" for i in range(0, n_imgs, 3)]
    refs += [f"img://dhash/{i}/d" for i in range(0, n_imgs, 5)]
    return refs


def synth_dhash_payload(ref: str) -> bytes:
    """Deterministic encoded bytes for a dhash-corpus ref. The codec choice
    keys on the FULL ref, so a duplicate may ship as BMP while its base is
    PPM — byte-different payloads, pixel-identical decode."""
    import hashlib

    from osmi_addresses_ray.stages.media_codecs import (
        encode_bmp,
        encode_ppm,
        synthesize_pixels,
    )

    base = ref[:-2] if ref.endswith(("/v", "/d")) else ref
    img = synthesize_pixels(base).copy()
    if ref.endswith("/v"):
        img[:2, :2, 0] ^= 0x80  # flip the red MSB on a 2×2 corner patch
    d = hashlib.sha256(ref.encode()).digest()
    return encode_bmp(img) if d[0] % 3 == 0 else encode_ppm(img)


_DHASH_PAIR_SCHEMA = pa.schema(
    [("ref_a", pa.string()), ("ref_b", pa.string()), ("ham", pa.int64())]
)
_DHASH_BUCKET_CAP = 4096


def dhash_pairs(
    n_imgs: int = 120, *, max_ham: int = 3, num_parts: int = 8,
    concurrency=(1, 4),
) -> pd.DataFrame:
    """Near-duplicate image pairs by dHash banding: all unordered ref pairs
    with Hamming(dhash_a, dhash_b) ≤ ``max_ham`` over the planted-variant
    corpus — the image twin of MinHash-LSH dedup. Exactness: 4 bands of 16
    bits pigeonhole-guarantee that any pair at Hamming ≤ 3 agrees on ≥1
    whole band, so banding loses NOTHING at this threshold (unlike MinHash
    this is exact, not probabilistic).

    Shape: actor-pool decode+hash (one hash per ref), then each hash emits
    4 (band, band_value) rows into ONE exchange; per bucket a vectorized
    all-pairs XOR+popcount verifies the true distance, and a pair is
    emitted only from its FIRST agreeing band (lower-band equality check on
    the two hashes — exactly-once without a second dedup exchange). Buckets
    above ``_DHASH_BUCKET_CAP`` raise (identical-image floods at corpus
    scale are an upstream exact-dedup problem, not an LSH one).
    """
    import ray.data as rd

    from ..ops import direct_partitioned_map
    from ..pipelines.dedup import _popcount64

    refs = dhash_corpus_refs(n_imgs)
    ds = rd.from_arrow(pa.table({"media_ref": pa.array(refs, pa.string())}))
    ds = ds.repartition(max(2, num_parts))

    class _HashFromStore(DHasher):
        def __call__(self, t: pa.Table) -> pa.Table:
            payloads = [synth_dhash_payload(r) for r in t["media_ref"].to_pylist()]
            hashes = [self._dhash(self._decode(p)) for p in payloads]
            return pa.table({
                "media_ref": t["media_ref"].combine_chunks(),
                "dhash": pa.array(hashes, pa.int64()),
            })

    hashed = ds.map_batches(
        _HashFromStore, batch_format="pyarrow", batch_size=64,
        concurrency=concurrency,
    )

    band_schema = pa.schema(
        [("band", pa.int64()), ("bval", pa.int64()),
         ("media_ref", pa.string()), ("dhash", pa.int64())]
    )

    def to_bands(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return band_schema.empty_table()
        h = t["dhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        refs_np = np.asarray(t["media_ref"].to_pylist(), dtype=object)
        bands = np.repeat(np.arange(4, dtype=np.int64), len(h))
        vals = np.concatenate(
            [((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
             for b in range(4)]
        )
        return pa.table({
            "band": pa.array(bands),
            "bval": pa.array(vals),
            "media_ref": pa.array(np.tile(refs_np, 4), pa.string()),
            "dhash": pa.array(np.tile(t["dhash"].to_numpy(zero_copy_only=False), 4)),
        })

    def bucket_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _DHASH_PAIR_SCHEMA.empty_table()
        df = t.to_pandas()
        out_a, out_b, out_h = [], [], []
        for (band, _), g in df.groupby(["band", "bval"], sort=False):
            if len(g) < 2:
                continue
            if len(g) > _DHASH_BUCKET_CAP:
                raise RuntimeError(
                    f"dhash bucket over cap ({len(g)}): run exact dedup first"
                )
            r = g["media_ref"].to_numpy(dtype=object)
            hv = g["dhash"].to_numpy().view(np.uint64)
            li, ri = np.triu_indices(len(g), k=1)
            ham = _popcount64(hv[li] ^ hv[ri])
            keep = ham <= max_ham
            if int(band) > 0 and keep.any():
                # first-agreeing-band rule: drop pairs a lower band already saw
                xa, xb = hv[li[keep]], hv[ri[keep]]
                lower_eq = np.zeros(keep.sum(), bool)
                for b in range(int(band)):
                    sh = np.uint64(16 * b)
                    lower_eq |= ((xa >> sh) & np.uint64(0xFFFF)) == (
                        (xb >> sh) & np.uint64(0xFFFF))
                k2 = np.flatnonzero(keep)[~lower_eq]
            else:
                k2 = np.flatnonzero(keep)
            for i in k2:
                a, b_ = r[li[i]], r[ri[i]]
                if b_ < a:
                    a, b_ = b_, a
                out_a.append(a); out_b.append(b_); out_h.append(int(ham[i]))
        return pa.table({
            "ref_a": pa.array(out_a, pa.string()),
            "ref_b": pa.array(out_b, pa.string()),
            "ham": pa.array(out_h, pa.int64()),
        })

    parts = direct_partitioned_map(
        hashed, ["band", "bval"], num_parts, bucket_pairs, band_schema,
        pre=to_bands,
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "ref_a": pd.Series([], dtype=object),
            "ref_b": pd.Series([], dtype=object),
            "ham": pd.Series([], dtype="int64"),
        })
    return (
        parts.astype({"ham": "int64"})
        .sort_values(["ref_a", "ref_b"])
        .reset_index(drop=True)
    )


# --- histogram equalization ---------------------------------------------------

MEDIA_HISTEQ_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("n_pix", pa.int64()),
        pa.field("lo", pa.int64()),
        pa.field("hi", pa.int64()),
        pa.field("sum_eq", pa.int64()),
        pa.field("n_levels", pa.int64()),
    ]
)


class ImageHistEq:
    """Actor-pool histogram equalization over REAL decoded pixels — the
    classic contrast-normalization preprocessing step. Luma g = r+g+b
    (0..765); with cdf over the 766-level histogram and c0 = cdf at the
    darkest OCCUPIED level, every pixel maps to

        eq(v) = (cdf(v) − c0) · 765 // (n_pix − c0)      (exact floor)

    and a CONSTANT image (n_pix == c0) maps to all-zeros by definition.
    Output per image: n_pix, lo/hi (min/max equalized value), sum_eq
    (Σ equalized — the brightness checksum) and n_levels (distinct equalized
    values — the contrast-stretch signal). All exact integers; the whole map
    is a 766-entry LUT, so per-image work is one bincount + one cumsum, no
    per-pixel Python."""

    def __init__(self):
        from osmi_addresses_ray.stages.media_codecs import decode_image

        self._decode = decode_image

    @staticmethod
    def _stats(img: np.ndarray) -> tuple[int, int, int, int, int]:
        g = img.astype(np.int64).sum(axis=2).ravel()
        n = g.size
        hist = np.bincount(g, minlength=766)
        cdf = np.cumsum(hist)
        occupied = hist > 0
        c0 = int(cdf[np.flatnonzero(occupied)[0]])
        if n == c0:
            return n, 0, 0, 0, 1
        lut = (cdf - c0) * 765 // (n - c0)
        live = lut[occupied]
        sum_eq = int((hist[occupied] * live).sum())
        return (
            n, int(live.min()), int(live.max()), sum_eq,
            int(np.unique(live).size),
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {k: [] for k in MEDIA_HISTEQ_SCHEMA.names}
        for doc_id, ref, payload in zip(
            t["doc_id"].to_pylist(), t["media_ref"].to_pylist(), t["payload"].to_pylist()
        ):
            n, lo, hi, sum_eq, n_levels = self._stats(self._decode(payload))
            rows["doc_id"].append(doc_id)
            rows["media_ref"].append(ref)
            rows["n_pix"].append(n)
            rows["lo"].append(lo)
            rows["hi"].append(hi)
            rows["sum_eq"].append(sum_eq)
            rows["n_levels"].append(n_levels)
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in MEDIA_HISTEQ_SCHEMA],
            schema=MEDIA_HISTEQ_SCHEMA,
        )


def media_hist_eq(docs_ds, *, concurrency=(1, 4), batch_size: int = 64):
    media = extract_media_refs(docs_ds)
    return media.map_batches(
        ImageHistEq, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


# --- fixed-palette color quantization -------------------------------------------

MEDIA_PALETTE_SCHEMA = pa.schema(
    [pa.field("doc_id", pa.string()), pa.field("media_ref", pa.string()),
     pa.field("dominant", pa.int64())]
    + [pa.field(f"c{i}", pa.int64()) for i in range(8)]
)


class ImagePalette:
    """Actor-pool color quantization against the fixed 8-corner RGB palette
    (index bit layout: bit0 = r ≥ 128, bit1 = g ≥ 128, bit2 = b ≥ 128 —
    exactly the L1-nearest cube corner; 255 being odd means no pixel is ever
    equidistant, so the assignment needs no tie rule). Output per image: the
    8 palette counts plus the dominant index (ties to the SMALLEST index) —
    the palette signature behind dedup prefilters and color-based sharding."""

    def __init__(self):
        from osmi_addresses_ray.stages.media_codecs import decode_image

        self._decode = decode_image

    @staticmethod
    def _hist(img: np.ndarray) -> tuple[int, list[int]]:
        bits = (img.astype(np.int64) >= 128)
        idx = bits[..., 0] + 2 * bits[..., 1] + 4 * bits[..., 2]
        h = np.bincount(idx.ravel(), minlength=8)
        return int(np.argmax(h)), h.astype(int).tolist()

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {k: [] for k in MEDIA_PALETTE_SCHEMA.names}
        for doc_id, ref, payload in zip(
            t["doc_id"].to_pylist(), t["media_ref"].to_pylist(), t["payload"].to_pylist()
        ):
            dom, h = self._hist(self._decode(payload))
            rows["doc_id"].append(doc_id)
            rows["media_ref"].append(ref)
            rows["dominant"].append(dom)
            for i in range(8):
                rows[f"c{i}"].append(h[i])
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in MEDIA_PALETTE_SCHEMA],
            schema=MEDIA_PALETTE_SCHEMA,
        )


def media_palette(docs_ds, *, concurrency=(1, 4), batch_size: int = 64):
    media = extract_media_refs(docs_ds)
    return media.map_batches(
        ImagePalette, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


# --- Otsu thresholding ----------------------------------------------------------

MEDIA_OTSU_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("thr", pa.int64()),
        pa.field("n_fg", pa.int64()),
        pa.field("sum_fg", pa.int64()),
    ]
)


class ImageOtsu:
    """Actor-pool Otsu thresholding (Otsu 1979) over REAL decoded pixels —
    the automatic binarization step behind document/figure segmentation.
    Luma g = r+g+b (0..765); the threshold t* maximizes the between-class
    variance, compared as the EXACT rational

        score(t) = (N·S_t − w_t·S)² / (w_t · (N − w_t))

    (w_t, S_t = count/sum of luma ≤ t; N, S the totals) via python-int
    cross-multiplication — no float division anywhere, ties to the SMALLEST
    t. Foreground = luma > t*. Output per image: t*, foreground pixel count
    and foreground luma sum. Degenerate constant images emit t* = the single
    level, n_fg = 0."""

    def __init__(self):
        from osmi_addresses_ray.stages.media_codecs import decode_image

        self._decode = decode_image

    @staticmethod
    def _otsu(img: np.ndarray) -> tuple[int, int, int]:
        g = img.astype(np.int64).sum(axis=2).ravel()
        hist = np.bincount(g, minlength=766)
        n = int(g.size)
        s = int(g.astype(np.int64).sum())
        w = np.cumsum(hist)          # w_t, int64
        st = np.cumsum(hist * np.arange(766, dtype=np.int64))  # S_t
        best_t = -1
        best_num = -1   # score numerator (python int)
        best_den = 1
        for t in range(766):
            wt = int(w[t])
            if wt == 0 or wt == n:
                continue
            num = (n * int(st[t]) - wt * s) ** 2
            den = wt * (n - wt)
            # score(t) > best  ⇔  num·best_den > best_num·den (exact)
            if num * best_den > best_num * den:
                best_t, best_num, best_den = t, num, den
        if best_t < 0:  # constant image: every split is empty on one side
            lvl = int(g[0]) if n else 0
            return lvl, 0, 0
        fg = g > best_t
        return best_t, int(fg.sum()), int(g[fg].sum())

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {k: [] for k in MEDIA_OTSU_SCHEMA.names}
        for doc_id, ref, payload in zip(
            t["doc_id"].to_pylist(), t["media_ref"].to_pylist(), t["payload"].to_pylist()
        ):
            thr, n_fg, sum_fg = self._otsu(self._decode(payload))
            rows["doc_id"].append(doc_id)
            rows["media_ref"].append(ref)
            rows["thr"].append(thr)
            rows["n_fg"].append(n_fg)
            rows["sum_fg"].append(sum_fg)
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in MEDIA_OTSU_SCHEMA],
            schema=MEDIA_OTSU_SCHEMA,
        )


def media_otsu(docs_ds, *, concurrency=(1, 4), batch_size: int = 64):
    media = extract_media_refs(docs_ds)
    return media.map_batches(
        ImageOtsu, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def image_dup_clusters(n_imgs: int = 120, *, num_parts: int = 8) -> pd.DataFrame:
    """Near-duplicate image CLUSTERS: the verified dHash pairs
    (``dhash_pairs``) closed under transitivity by the distributed
    star-contraction connected components — the grouping step that turns
    pairwise matches into keep-one-per-cluster dedup decisions (the image
    twin of ``dedup_clusters``). Output one row per image appearing in ≥1
    pair: (ref, cluster, csize) with cluster = the lexicographically
    smallest ref in its component.

    Shape: pair generation is the banded dHash exchange; components run on
    the PAIR list only (O(log² n) node-keyed exchanges via
    ``dedup.connected_components``); the ref↔dense-id dictionary is built
    from the pair set (already ≪ corpus) — never from the image corpus.
    """
    import pandas as pd
    import ray.data as rd

    from osmi_addresses_ray.pipelines.dedup import connected_components

    pairs = dhash_pairs(n_imgs, num_parts=num_parts)
    empty = pd.DataFrame({
        "ref": pd.Series([], dtype=object),
        "cluster": pd.Series([], dtype=object),
        "csize": pd.Series([], dtype="int64"),
    })
    if pairs.empty:
        return empty
    refs = np.array(sorted(set(pairs["ref_a"]) | set(pairs["ref_b"])), dtype=object)
    idx = {r: i for i, r in enumerate(refs)}
    edges = rd.from_arrow(pa.table({
        "u": pa.array([idx[r] for r in pairs["ref_a"]], pa.int64()),
        "v": pa.array([idx[r] for r in pairs["ref_b"]], pa.int64()),
    })).repartition(max(2, num_parts // 2))
    stars = connected_components(edges, num_parts=num_parts).to_pandas()
    # stars: (u=node, v=component min) for every non-root node
    comp = np.arange(len(refs), dtype=np.int64)
    comp[stars["u"].to_numpy(np.int64)] = stars["v"].to_numpy(np.int64)
    sizes = np.bincount(comp, minlength=len(refs))
    out = pd.DataFrame({
        "ref": refs,
        "cluster": refs[comp],
        "csize": sizes[comp].astype(np.int64),
    })
    return out.sort_values(["cluster", "ref"]).reset_index(drop=True)


# --- crest factor (peak-to-RMS) audit --------------------------------------------

MEDIA_CREST_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("n_samples", pa.int64()),
        pa.field("peak2", pa.int64()),
        pa.field("energy", pa.int64()),
        pa.field("peaky", pa.int64()),
    ]
)


class AudioCrest:
    """Actor-pool crest-factor (peak-to-RMS) audit over real decoded PCM16 —
    the dynamic-range/clipping screen of audio QA. Exact integers only:
    peak² = max s², energy = Σ s², and the classification crest² ≥ 4
    (crest factor ≥ 2, i.e. peak ≥ 2·RMS) decided by the cross-
    multiplication peak²·N ≥ 4·energy — no sqrt, no division. Output per
    clip: (n_samples, peak2, energy, peaky)."""

    def __init__(self):
        from osmi_addresses_ray.stages.media_codecs import decode_wav

        self._decode = decode_wav

    @staticmethod
    def _stats(s: np.ndarray) -> tuple[int, int, int, int]:
        n = int(s.size)
        if n == 0:
            return 0, 0, 0, 0
        sq = s.astype(np.int64) ** 2
        peak2 = int(sq.max())
        energy = int(sq.sum())
        peaky = 1 if peak2 * n >= 4 * energy else 0
        return n, peak2, energy, peaky

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = {k: [] for k in MEDIA_CREST_SCHEMA.names}
        for doc_id, ref, payload in zip(
            t["doc_id"].to_pylist(), t["media_ref"].to_pylist(), t["payload"].to_pylist()
        ):
            samples, _rate = self._decode(payload)
            n, peak2, energy, peaky = self._stats(samples)
            rows["doc_id"].append(doc_id)
            rows["media_ref"].append(ref)
            rows["n_samples"].append(n)
            rows["peak2"].append(peak2)
            rows["energy"].append(energy)
            rows["peaky"].append(peaky)
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in MEDIA_CREST_SCHEMA],
            schema=MEDIA_CREST_SCHEMA,
        )


def media_crest(docs_ds, *, concurrency=(1, 4), batch_size: int = 64):
    from osmi_addresses_ray.stages.media_codecs import synthesize_audio_payload

    media = _extract_refs_with_store(docs_ds, synthesize_audio_payload, "audio")
    return media.map_batches(
        AudioCrest, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )
