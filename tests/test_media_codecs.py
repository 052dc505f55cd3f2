"""Pure-numpy PPM/BMP codecs + the real decode boundary in the media stage."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import pandas as pd
import pytest

from osmi_addresses_ray.stages.media_codecs import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    grid_features,
    sniff_format,
    synthesize_media_payload,
    synthesize_pixels,
)


def _rand_img(h, w, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("h,w", [(1, 1), (8, 8), (13, 17), (5, 6), (9, 10)])
def test_ppm_round_trip(h, w):
    img = _rand_img(h, w, h * 100 + w)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


@pytest.mark.parametrize("h,w", [(1, 1), (8, 8), (13, 17), (5, 6), (9, 10)])
def test_bmp_round_trip(h, w):
    # widths 17, 6, 10 give row strides that need 4-byte padding
    img = _rand_img(h, w, h * 100 + w)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_ppm_golden_bytes_with_comments():
    # hand-built header: comments + arbitrary whitespace are legal netpbm
    raster = bytes(range(2 * 2 * 3))
    data = b"P6 # a comment\n# another\n 2\t2 # dims\n255\n" + raster
    img = decode_ppm(data)
    assert img.shape == (2, 2, 3)
    assert img.tobytes() == raster
    # pixel (row 0, col 1) is bytes 3..5
    assert list(img[0, 1]) == [3, 4, 5]


def test_bmp_golden_bytes_bottom_up_bgr_padding():
    # 2x2 image, w*3=6 -> row stride 8 (2 pad bytes); bottom-up, BGR
    # pixels: (0,0)=RGB(1,2,3) (0,1)=(4,5,6) / (1,0)=(7,8,9) (1,1)=(10,11,12)
    row_bottom = bytes([9, 8, 7, 12, 11, 10, 0, 0])  # image row 1 first
    row_top = bytes([3, 2, 1, 6, 5, 4, 0, 0])
    raster = row_bottom + row_top
    fh = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    ih = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(raster), 0, 0, 0, 0)
    img = decode_bmp(fh + ih + raster)
    assert img.shape == (2, 2, 3)
    assert list(img[0, 0]) == [1, 2, 3]
    assert list(img[1, 1]) == [10, 11, 12]


def test_bmp_top_down_negative_height():
    img = _rand_img(4, 3, 7)
    data = bytearray(encode_bmp(img))
    # flip to top-down: negate biHeight and reorder raster rows
    (h,) = struct.unpack_from("<i", data, 22)
    struct.pack_into("<i", data, 22, -h)
    row = (3 * 3 + 3) & ~3
    raster = bytes(data[54:])
    flipped = b"".join(raster[i * row : (i + 1) * row] for i in range(h - 1, -1, -1))
    assert np.array_equal(decode_bmp(bytes(data[:54]) + flipped), img)


def test_codec_error_cases():
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")  # P5 is grayscale, unsupported
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n255\n\x00\x00")  # truncated raster
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + b"\x00" * 60)
    img = _rand_img(2, 2, 1)
    data = bytearray(encode_bmp(img))
    struct.pack_into("<H", data, 28, 8)  # bpp=8
    with pytest.raises(ValueError):
        decode_bmp(bytes(data))
    assert sniff_format(b"\xff\xd8\xff") is None  # JPEG magic → no codec


def test_synthesized_payloads_cover_all_formats():
    fmts = {sniff_format(synthesize_media_payload(f"img://fixture/{i}")) for i in range(30)}
    assert fmts == {"ppm", "bmp", "png"}
    # decode recovers exactly the spec'd pixels for all three formats
    for i in range(30):
        ref = f"img://fixture/{i}"
        assert np.array_equal(decode_image(synthesize_media_payload(ref)), synthesize_pixels(ref))


def test_synthesized_dims_follow_sha_spec():
    for i in range(10):
        ref = f"img://fixture/{i}"
        d = hashlib.sha256(ref.encode()).digest()
        img = synthesize_pixels(ref)
        assert img.shape == (8 + d[2] % 25, 8 + d[1] % 25, 3)


def test_grid_features_real_pixels():
    # constant image → every cell mean is the constant
    img = np.full((8, 8, 3), 255, dtype=np.uint8)
    assert np.allclose(grid_features(img), 1.0)
    img = np.zeros((9, 13, 3), dtype=np.uint8)
    assert np.allclose(grid_features(img), -1.0)
    # top half black, bottom half white → first 8 cells -1, last 8 cells +1
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[4:] = 255
    f = grid_features(img)
    assert np.allclose(f[:8], -1.0) and np.allclose(f[8:], 1.0)


def test_media_resizer_nearest_neighbor_spec():
    from osmi_addresses_ray.stages.multimodal import MediaResizer

    r = MediaResizer(out_w=2, out_h=2)
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = r._resize(img)
    assert out.shape == (2, 2, 3)
    # rows picked: (0*4)//2=0, (1*4)//2=2; cols: (0*6)//2=0, (1*6)//2=3
    assert np.array_equal(out[0, 0], img[0, 0])
    assert np.array_equal(out[0, 1], img[0, 3])
    assert np.array_equal(out[1, 0], img[2, 0])
    assert np.array_equal(out[1, 1], img[2, 3])


def test_media_resize_pipeline_matches_oracle():
    from osmi_addresses_ray.oracle.layers import oracle_media_resize
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import media_resize

    got = (
        media_resize(fixture_docs(8))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    want = oracle_media_resize(fixture_table(8))
    pd.testing.assert_frame_equal(got, want)


def test_wav_roundtrip_and_chunk_walk():
    from osmi_addresses_ray.stages.media_codecs import (
        decode_wav,
        encode_wav,
        synthesize_audio_payload,
        synthesize_audio_samples,
    )

    s = synthesize_audio_samples("m/abc")
    dec, rate = decode_wav(synthesize_audio_payload("m/abc"))
    assert rate == 16000 and np.array_equal(s, dec)
    # extra chunk between fmt and data must be skipped (RIFF word alignment)
    raw = encode_wav(s)
    extra = b"LIST" + (7).to_bytes(4, "little") + b"1234567"  # odd size -> pad
    patched = raw[:36] + extra + b"\x00" + raw[36:]
    import struct

    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    dec2, _ = decode_wav(patched)
    assert np.array_equal(s, dec2)
    with pytest.raises(ValueError):
        decode_wav(b"nope" + raw[4:])


def test_frame_stack_roundtrip_and_sampling():
    from osmi_addresses_ray.stages.media_codecs import (
        decode_frame_stack,
        synthesize_video_frames,
        synthesize_video_payload,
    )
    from osmi_addresses_ray.stages.multimodal import FrameSampler

    f = synthesize_video_frames("m/xyz")
    assert np.array_equal(f, decode_frame_stack(synthesize_video_payload("m/xyz")))
    with pytest.raises(ValueError):
        decode_frame_stack(b"XXXX" + b"\x00" * 32)
    s = FrameSampler(stride=3)
    import pyarrow as pa

    t = pa.table(
        {
            "doc_id": ["d"],
            "media_ref": ["m/xyz"],
            "payload": [synthesize_video_payload("m/xyz")],
            "media_kind": ["video"],
        }
    )
    out = s(t).to_pandas().iloc[0]
    assert out["n_frames"] == f.shape[0]
    assert out["n_sampled"] == len(f[::3])
    assert out["px_sum"] == int(f[::3].astype(np.uint64).sum())


def test_scene_cut_detector_known_cut():
    """Black->white frame pair is a cut (L1 = 6hw >> 15); identical pair is not."""
    import numpy as np
    import pyarrow as pa

    from osmi_addresses_ray.stages.media_codecs import encode_frame_stack
    from osmi_addresses_ray.stages.multimodal import SceneCutDetector

    h = w = 8
    black = np.zeros((h, w, 3), np.uint8)
    white = np.full((h, w, 3), 255, np.uint8)
    cut = encode_frame_stack(np.stack([black, white, white]))
    flat = encode_frame_stack(np.stack([black, black]))
    t = pa.table(
        {
            "doc_id": pa.array(["d1", "d2"], pa.string()),
            "media_ref": pa.array(["a", "b"], pa.string()),
            "payload": pa.array([cut, flat], pa.binary()),
            "kind": pa.array(["video", "video"], pa.string()),
        }
    )
    out = SceneCutDetector()(t).to_pydict()
    assert out["n_cuts"] == [1, 0]
    assert out["max_dist"][0] == 6 * h * w  # every pixel moves bin 0 -> 3, x3 ch
    assert out["sum_dist"][1] == 0


def test_dhash_gradients_and_area_exactness():
    import numpy as np

    from osmi_addresses_ray.stages.multimodal import DHasher

    # brightness strictly decreasing left->right: every left cell brighter -> all 64 bits set
    w, h = 18, 16
    col = np.linspace(255, 0, w).astype(np.uint8)
    img = np.repeat(np.repeat(col[None, :, None], h, axis=0), 3, axis=2)
    assert DHasher._dhash(img) == -1  # 0xFFFF... as int64
    # increasing: no bit set
    img2 = img[:, ::-1]
    assert DHasher._dhash(img2) == 0
    # uneven dims (w not divisible by 9): equal-brightness image -> ties -> 0,
    # proving the cross-multiplied area comparison doesn't bias uneven cells
    flat = np.full((11, 13, 3), 77, np.uint8)
    assert DHasher._dhash(flat) == 0


def test_sobel_edges_known_patterns():
    import numpy as np

    from osmi_addresses_ray.stages.multimodal import SobelEdges

    # flat image: every gradient is zero
    flat = np.full((8, 8, 3), 50, np.uint8)
    n_int, n_edges, mx, sm = SobelEdges._stats(flat)
    assert (n_int, n_edges, mx, sm) == (36, 0, 0, 0)
    # vertical step edge at x=4: interior pixels adjacent to the step see
    # gx = ±4·Δg (Sobel column weight sum 1+2+1), Δg = 3·200 (r+g+b)
    step = np.zeros((8, 8, 3), np.uint8)
    step[:, 4:, :] = 200
    n_int, n_edges, mx, sm = SobelEdges._stats(step)
    assert mx == (4 * 600) ** 2
    assert n_edges == 12  # columns x=3,4 of the 6-wide interior, 6 rows each
    # sub-3x3 image: no interior
    assert SobelEdges._stats(np.zeros((2, 5, 3), np.uint8)) == (0, 0, 0, 0)


def test_sobel_engine_matches_scalar_oracle_on_synth_refs():
    import numpy as np

    from osmi_addresses_ray.oracle.layers import _oracle_media_pixels
    from osmi_addresses_ray.stages.media_codecs import (
        decode_image,
        synthesize_media_payload,
    )
    from osmi_addresses_ray.stages.multimodal import SobelEdges

    thr2 = SobelEdges.THR2
    for ref in ["m:1", "m:2", "m:xyz"]:
        img = decode_image(synthesize_media_payload(ref))
        fast = SobelEdges._stats(img)
        # scalar recomputation over the independently declared pixel spec
        pix = _oracle_media_pixels(ref)
        assert np.array_equal(img, pix)
        h, w = pix.shape[:2]
        g = [[int(pix[y, x, 0]) + int(pix[y, x, 1]) + int(pix[y, x, 2]) for x in range(w)] for y in range(h)]
        n_int = n_edges = mx = sm = 0
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                gx = (g[y-1][x+1] + 2*g[y][x+1] + g[y+1][x+1]
                      - g[y-1][x-1] - 2*g[y][x-1] - g[y+1][x-1])
                gy = (g[y+1][x-1] + 2*g[y+1][x] + g[y+1][x+1]
                      - g[y-1][x-1] - 2*g[y-1][x] - g[y-1][x+1])
                m2 = gx * gx + gy * gy
                n_int += 1
                n_edges += m2 > thr2
                mx = max(mx, m2)
                sm += m2
        assert fast == (n_int, n_edges, mx, sm)
        assert 0 < n_edges < n_int  # threshold splits real pixel content


def test_audio_windows_planted_silence():
    """A clip with a genuinely silent middle window must report it as the
    quietest, and the window split must drop the trailing partial."""
    import numpy as np
    import pyarrow as pa

    from osmi_addresses_ray.stages.media_codecs import encode_wav
    from osmi_addresses_ray.stages.multimodal import AudioWindows

    w = AudioWindows.WIN
    loud = np.full(w, 30000, np.int16)
    silent = np.zeros(w, np.int16)
    tail = np.full(w // 2, 100, np.int16)  # partial window: dropped
    clip = np.concatenate([loud, silent, loud, tail])
    t = pa.table(
        {
            "doc_id": pa.array(["d"], pa.string()),
            "media_ref": pa.array(["a"], pa.string()),
            "payload": pa.array([encode_wav(clip, 16000)], pa.binary()),
            "kind": pa.array(["audio"], pa.string()),
        }
    )
    out = AudioWindows()(t).to_pydict()
    assert out["n_windows"] == [3]
    assert out["min_energy"] == [0] and out["min_window"] == [1]
    assert out["max_energy"] == [w * 30000 * 30000]
    assert out["n_low"] == [1]  # only the silent window is below THR


def test_audio_pitch_planted_period():
    """A period-64 square wave must peak the autocorrelation at lag 64
    (and its harmonic 128 ties EQUAL — first argmax keeps 64) and pass the
    voiced gate; uncorrelated noise must not. A short clip (n <= LAG_MAX)
    takes the sentinel path."""
    import numpy as np
    import pyarrow as pa

    from osmi_addresses_ray.stages.media_codecs import encode_wav
    from osmi_addresses_ray.stages.multimodal import AudioPitch

    period = 64
    n = 2048
    sq = np.where((np.arange(n) // (period // 2)) % 2 == 0, 20000, -20000).astype(
        np.int16
    )
    rng = np.random.default_rng(3)
    noise = rng.integers(-20000, 20000, n).astype(np.int16)
    short = np.ones(100, np.int16)
    t = pa.table(
        {
            "doc_id": pa.array(["d1", "d2", "d3"], pa.string()),
            "media_ref": pa.array(["sq", "nz", "sh"], pa.string()),
            "payload": pa.array(
                [encode_wav(sq), encode_wav(noise), encode_wav(short)], pa.binary()
            ),
            "kind": pa.array(["audio"] * 3, pa.string()),
        }
    )
    out = AudioPitch()(t).to_pydict()
    got = {r: (bl, v) for r, bl, v in zip(
        out["media_ref"], out["best_lag"], out["voiced"])}
    assert got["sq"] == (64, 1)
    assert got["nz"][1] == 0  # noise never clears 0.25 normalized autocorr
    assert got["sh"] == (-1, 0)
    assert out["sample_rate"] == [16000] * 3


def test_audio_onsets_planted_attacks():
    """Silence -> loud is an onset only when it clears BOTH the 4x ratio
    and the absolute floor; a louder second attack wins max_jump by
    cross-multiplied rational compare; silence -> moderate (from e=0)
    reports the infinite-jump (num, 0) pair."""
    import numpy as np
    import pyarrow as pa

    from osmi_addresses_ray.stages.media_codecs import encode_wav
    from osmi_addresses_ray.stages.multimodal import AudioOnsets

    w = AudioOnsets.WIN
    quiet = np.full(w, 4000, np.int16)    # e = 256*16e6 = 4.096e9 < E_MIN
    mid = np.full(w, 16000, np.int16)     # e = 6.55e10 >= E_MIN, ratio 16
    loud = np.full(w, 32000, np.int16)    # e = 2.62e11, ratio vs quiet = 64
    # windows: quiet, mid (onset, ratio 16), mid (no), quiet (no, drop),
    # loud (onset, ratio 64 -> the max jump), loud (no)
    clip = np.concatenate([quiet, mid, mid, quiet, loud, loud])
    t = pa.table(
        {
            "doc_id": pa.array(["d", "z"], pa.string()),
            "media_ref": pa.array(["a", "b"], pa.string()),
            "payload": pa.array(
                [encode_wav(clip), encode_wav(np.concatenate([np.zeros(w, np.int16), mid]))],
                pa.binary(),
            ),
            "kind": pa.array(["audio", "audio"], pa.string()),
        }
    )
    out = AudioOnsets()(t).to_pydict()
    e_quiet, e_mid, e_loud = (
        int(w * 4000**2), int(w * 16000**2), int(w * 32000**2))
    i = out["media_ref"].index("a")
    assert out["n_onsets"][i] == 2 and out["first_onset"][i] == 1
    assert (out["max_jump_num"][i], out["max_jump_den"][i]) == (e_loud, e_quiet)
    j = out["media_ref"].index("b")
    assert out["n_onsets"][j] == 1 and out["first_onset"][j] == 1
    assert (out["max_jump_num"][j], out["max_jump_den"][j]) == (e_mid, 0)


def test_image_blobs_planted_shapes():
    """Two separated squares, an L-shape diagonal-touch case (diagonals do
    NOT connect under 4-connectivity), size tie broken by smallest anchor,
    and an all-background image hitting the sentinel."""
    import numpy as np

    from osmi_addresses_ray.stages.multimodal import ImageBlobs

    # 6x6: 2x2 blob at (0,0); 2x2 blob at (3,3); diagonal pixel at (2,2)
    # touches the first square only diagonally -> its own blob
    fg = np.zeros((6, 6), bool)
    fg[0:2, 0:2] = True
    fg[3:5, 3:5] = True
    fg[2, 2] = True
    n_fg, n_blobs, size, anchor = ImageBlobs._label(fg)
    assert (n_fg, n_blobs) == (9, 3)
    # the two 2x2 squares tie at size 4 -> the (0,0)-anchored one wins
    assert (size, anchor) == (4, 0)
    # empty
    assert ImageBlobs._label(np.zeros((3, 3), bool)) == (0, 0, 0, -1)
    # single full row: one blob anchored at 0
    row = np.zeros((1, 5), bool)
    row[0, :] = True
    assert ImageBlobs._label(row) == (5, 1, 5, 0)


def test_quadtree_planted_structure():
    """A flat image is ONE leaf at depth 0; a 4x4 with one hot quadrant
    splits once into 4 leaves; a 1-wide strip splits along its long axis;
    a checkerboard bottoms out at pixel leaves."""
    import numpy as np

    from osmi_addresses_ray.stages.multimodal import ImageQuadtree

    dec = ImageQuadtree._decompose
    flat = np.zeros((8, 8), np.int64)
    assert dec(flat) == (1, 0, 0, 64)
    # one 2x2 hot corner: root splits; 3 flat quads + hot quad flat itself
    # (hot quad is uniform 700s) -> 4 leaves depth 1, largest area 4
    q = np.zeros((4, 4), np.int64)
    q[:2, :2] = 700
    assert dec(q) == (4, 1, 0, 4)
    # checkerboard alternating 0/700: every split still mixed until 1x1
    cb = np.fromfunction(lambda y, x: ((y + x) % 2) * 700, (4, 4), dtype=np.int64)
    n_leaves, max_depth, n_px, big = dec(cb.astype(np.int64))
    assert (n_leaves, n_px, big) == (16, 16, 0) and max_depth == 2
    # 1x4 strip, half dark half bright: splits in 2, both halves uniform
    strip = np.array([[0, 0, 700, 700]], np.int64)
    assert dec(strip) == (2, 1, 0, 2)


def test_orient_hist_planted_directions():
    """Planted step edges land in the expected octants: a vertical edge
    (bright right) is pure gx>0 -> o0; bright-top horizontal is gy<0 ->
    o6; a 45-degree diagonal has ax==ay -> the not-strictly-greater bin."""
    import numpy as np

    from osmi_addresses_ray.stages.multimodal import ImageOrientHist

    def img_from_gray(g):
        a = np.asarray(g, np.uint8)
        return np.repeat(a[:, :, None], 3, axis=2)

    # vertical edge: left dark, right bright -> gx > 0, gy = 0 -> octant 0
    v = np.zeros((8, 8), np.uint8)
    v[:, 4:] = 255
    n, h = ImageOrientHist._hist(img_from_gray(v))
    assert n > 0 and h[0] == n and sum(h) == n

    # horizontal edge, bright TOP: gy (down-positive) < 0, gx = 0 -> o6
    hz = np.zeros((8, 8), np.uint8)
    hz[:4, :] = 255
    n2, h2 = ImageOrientHist._hist(img_from_gray(hz))
    assert n2 > 0 and h2[6] == n2

    # anti-diagonal step (bright where x >= y): gradient points up-right,
    # |gx| == |gy| on the clean diagonal -> ties go to the ax<=ay bins
    dg = np.fromfunction(lambda y, x: (x >= y) * 255, (10, 10)).astype(np.uint8)
    n3, h3 = ImageOrientHist._hist(img_from_gray(dg))
    assert n3 > 0 and h3[7] + h3[6] == n3 and h3[0] == 0


def test_motion_planted_shift():
    """Frame 1 = frame 0 shifted DOWN by 1 and RIGHT by 2: every interior
    block's best vector is (-1, -2); static pair reports zero motion."""
    from osmi_addresses_ray.stages.multimodal import MotionEstimator

    rng = np.random.default_rng(11)
    h, w = 16, 24
    f0 = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    f1 = np.zeros_like(f0)
    f1[1:, 2:] = f0[:-1, :-2]  # cur[y, x] = prev[y-1, x-2]
    frames = np.stack([f0, f1])
    est = MotionEstimator()
    p, nb, sm, nm, si, mi = est._motion(frames)
    assert p == 1 and nb == (h // 8) * (w // 8) == 6
    # all 6 blocks: search window covers (-1, -2) except blocks whose
    # shifted region leaves the frame — here every block at by>=0: y0-1>=0
    # fails for by=0... the top-left region comes from zeros, but SAD at
    # (-1,-2) is 0 for blocks with y0>=1 and x0>=2. Top row blocks (y0=0):
    # candidate (-1,*) is out of bounds; their best is whatever minimizes
    # SAD. Assert instead on the bottom row, via full-frame recompute:
    gray0 = f0.astype(np.int64).sum(axis=2)
    gray1 = f1.astype(np.int64).sum(axis=2)
    # block (1, 1): y0=8, x0=8 -> SAD at (-1,-2) must be 0, so it moved
    assert np.array_equal(gray1[8:16, 8:16], gray0[7:15, 6:14])
    assert nm >= 3 and sm >= 3 * 3  # bottom-row blocks all report |dy|+|dx|=3
    assert si > 0 and mi > 0

    static = np.stack([f0, f0])
    p2, nb2, sm2, nm2, si2, mi2 = est._motion(static)
    assert (sm2, nm2, si2, mi2) == (0, 0, 0, 0)


def test_motion_oracle_parity_small():
    """Vectorized estimator == scalar oracle loops on real synthetic refs."""
    import pyarrow as pa

    from osmi_addresses_ray.oracle.layers import oracle_media_motion
    from osmi_addresses_ray.stages.media_codecs import (
        synthesize_video_frames,
        synthesize_video_payload,
    )
    from osmi_addresses_ray.stages.multimodal import MotionEstimator

    est = MotionEstimator()
    docs = pa.table(
        {
            "doc_id": ["d1", "d2"],
            "spans": [
                [{"kind": "media", "media_ref": "img:7"}],
                [{"kind": "media", "media_ref": "img:19"}],
            ],
        }
    )
    want = oracle_media_motion(docs)
    for i, ref in enumerate(["img:7", "img:19"]):
        frames = synthesize_video_frames(ref)
        got = est._motion(frames)
        row = want.iloc[i]
        assert got == (
            row["n_pairs"], row["n_blocks"], row["sum_motion"],
            row["n_moving"], row["sum_improve"], row["max_improve"],
        ), ref


def test_zcr_planted_square_and_noise():
    """Planted signals: a period-64 square wave has exactly 8 crossings per
    256-window (voiced); alternating-sign noise crosses every sample
    (unvoiced by zcr); silence has zero crossings and zero energy."""
    from osmi_addresses_ray.stages.multimodal import AudioZCR
    from osmi_addresses_ray.stages.media_codecs import encode_wav

    sq = np.tile(np.r_[np.full(32, 20000, np.int16), np.full(32, -20000, np.int16)], 16)
    alt = np.where(np.arange(1024) % 2 == 0, 15000, -15000).astype(np.int16)
    silent = np.zeros(512, np.int16)
    z = AudioZCR()
    t = pa.table(
        {
            "doc_id": ["a", "b", "c"],
            "media_ref": ["r1", "r2", "r3"],
            "payload": [encode_wav(sq), encode_wav(alt), encode_wav(silent)],
        }
    )
    out = z(t).to_pydict()
    # square: 2 crossings per 64-sample period -> 8 per 256-window, 4 windows
    assert out["n_windows"][0] == 4 and out["max_zcr"][0] == 8
    assert out["total_zc"][0] == 31  # 8+8+8+8 minus the absent transition at i=0
    assert out["n_voiced"][0] == 4   # loud + low zcr
    # alternating: every sample flips -> zcr 255/256 per window, unvoiced
    assert out["max_zcr"][1] == 256 or out["max_zcr"][1] == 255
    assert out["n_voiced"][1] == 0
    # silence: s >= 0 everywhere -> no flips, no energy
    assert out["total_zc"][2] == 0 and out["n_voiced"][2] == 0


def test_dhash_pairs_planted_corpus(ray_session):
    """Engine banding pairs == independent O(n²) oracle sweep; duplicates
    land at Hamming 0 and every planted duplicate pair is found (pigeonhole
    exactness at ham ≤ 3 — banding may NOT lose pairs)."""
    from osmi_addresses_ray.oracle.layers import oracle_dhash_pairs
    from osmi_addresses_ray.stages.multimodal import dhash_pairs

    e = dhash_pairs(30, num_parts=3)
    o = oracle_dhash_pairs(30)
    pd.testing.assert_frame_equal(e, o)
    # every /d duplicate pair present at ham 0
    got = set(zip(e["ref_a"], e["ref_b"]))
    for i in range(0, 30, 5):
        a, b = f"img://dhash/{i}", f"img://dhash/{i}/d"
        assert (a, b) in got
        row = e[(e["ref_a"] == a) & (e["ref_b"] == b)]
        assert row["ham"].iloc[0] == 0


def test_dhash_pairs_partition_invariance(ray_session):
    from osmi_addresses_ray.stages.multimodal import dhash_pairs

    a = dhash_pairs(45, num_parts=1)
    b = dhash_pairs(45, num_parts=7)
    pd.testing.assert_frame_equal(a, b)


def test_dhash_payload_codec_split_decodes_identically():
    """A /d duplicate may ship under a different codec than its base —
    byte-different payloads, pixel-identical decode."""
    from osmi_addresses_ray.stages.media_codecs import decode_image
    from osmi_addresses_ray.stages.multimodal import dhash_corpus_refs, synth_dhash_payload

    import numpy as np

    found_split = False
    for i in range(0, 60, 5):
        base, dup = f"img://dhash/{i}", f"img://dhash/{i}/d"
        pb, pd_ = synth_dhash_payload(base), synth_dhash_payload(dup)
        assert np.array_equal(decode_image(pb), decode_image(pd_))
        if pb[:2] != pd_[:2]:
            found_split = True
    assert found_split


# --- histogram equalization -----------------------------------------------------


def test_hist_eq_planted_gradient():
    """4 luma levels with known cdf: levels 0,3,6,9 each ×1 pixel on a 2×2
    image -> c0=1, n=4, eq = (cdf-1)*765//3 = 0, 255, 510, 765."""
    from osmi_addresses_ray.stages.multimodal import ImageHistEq

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, 1] = (1, 1, 1)
    img[1, 0] = (2, 2, 2)
    img[1, 1] = (3, 3, 3)
    n, lo, hi, sum_eq, n_levels = ImageHistEq._stats(img)
    assert (n, lo, hi) == (4, 0, 765)
    assert sum_eq == 0 + 255 + 510 + 765
    assert n_levels == 4


def test_hist_eq_constant_image_all_zero():
    from osmi_addresses_ray.stages.multimodal import ImageHistEq

    img = np.full((3, 5, 3), 77, dtype=np.uint8)
    assert ImageHistEq._stats(img) == (15, 0, 0, 0, 1)


def test_hist_eq_matches_scalar_oracle_on_fixture(ray_session):
    from osmi_addresses_ray.oracle.layers import oracle_media_hist_eq
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import media_hist_eq

    got = (
        media_hist_eq(fixture_docs(6))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    want = oracle_media_hist_eq(fixture_table(6))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# --- palette quantization ---------------------------------------------------------


def test_palette_bit_layout_and_dominant():
    from osmi_addresses_ray.stages.multimodal import ImagePalette

    img = np.zeros((1, 4, 3), dtype=np.uint8)
    img[0, 0] = (200, 10, 10)    # r bit only -> index 1
    img[0, 1] = (10, 200, 10)    # g bit -> index 2
    img[0, 2] = (10, 10, 200)    # b bit -> index 4
    img[0, 3] = (128, 128, 128)  # all bits at the threshold -> index 7
    dom, h = ImagePalette._hist(img)
    assert h == [0, 1, 1, 0, 1, 0, 0, 1]
    assert dom == 1  # four-way tie at count 1 -> smallest index with max


def test_palette_threshold_127_vs_128():
    from osmi_addresses_ray.stages.multimodal import ImagePalette

    img = np.zeros((1, 2, 3), dtype=np.uint8)
    img[0, 0] = (127, 0, 0)  # nearer 0 -> index 0
    img[0, 1] = (128, 0, 0)  # nearer 255 -> index 1
    _, h = ImagePalette._hist(img)
    assert h[0] == 1 and h[1] == 1


# --- Otsu thresholding -------------------------------------------------------------


def test_otsu_bimodal_split():
    """Half the pixels at luma 30, half at 600: Otsu must split between the
    modes and report exactly the bright half as foreground."""
    from osmi_addresses_ray.stages.multimodal import ImageOtsu

    img = np.zeros((2, 4, 3), dtype=np.uint8)
    img[:, 2:] = 200  # luma 600 on the right half, 0 on the left
    img[:, :2, 0] = 30  # left half luma 30
    thr, n_fg, sum_fg = ImageOtsu._otsu(img)
    assert 30 <= thr < 600
    assert n_fg == 4 and sum_fg == 4 * 600


def test_otsu_constant_image():
    from osmi_addresses_ray.stages.multimodal import ImageOtsu

    img = np.full((3, 3, 3), 50, dtype=np.uint8)
    assert ImageOtsu._otsu(img) == (150, 0, 0)


def test_otsu_matches_fraction_oracle_random():
    from fractions import Fraction

    from osmi_addresses_ray.stages.multimodal import ImageOtsu

    rng = np.random.RandomState(9)
    for _ in range(20):
        img = rng.randint(0, 256, size=(6, 7, 3)).astype(np.uint8)
        thr, n_fg, sum_fg = ImageOtsu._otsu(img)
        g = img.astype(np.int64).sum(axis=2).ravel()
        n, s = len(g), int(g.sum())
        best_t, best = -1, Fraction(-1)
        for t in range(766):
            wt = int((g <= t).sum())
            if wt in (0, n):
                continue
            st = int(g[g <= t].sum())
            score = Fraction((n * st - wt * s) ** 2, wt * (n - wt))
            if score > best:
                best_t, best = t, score
        assert thr == best_t
        assert n_fg == int((g > best_t).sum())
        assert sum_fg == int(g[g > best_t].sum())


# --- image near-dup clusters --------------------------------------------------------


def test_image_dup_clusters_match_union_find(ray_session):
    from osmi_addresses_ray.oracle.layers import oracle_image_dup_clusters
    from osmi_addresses_ray.stages.multimodal import image_dup_clusters

    got = image_dup_clusters(45, num_parts=4)
    want = oracle_image_dup_clusters(45)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the planted corpus guarantees /d exact duplicates cluster with their base
    assert (got[got["ref"].str.endswith("/d")]["csize"] >= 2).all()
    # cluster label is the smallest member and sizes agree within a cluster
    for _, grp in got.groupby("cluster"):
        assert grp["cluster"].iloc[0] == grp["ref"].min()
        assert grp["csize"].nunique() == 1 and grp["csize"].iloc[0] == len(grp)


# --- crest factor ------------------------------------------------------------------


def test_crest_classification_boundary():
    from osmi_addresses_ray.stages.multimodal import AudioCrest

    # constant amplitude: peak² · n == energy -> crest² = 1 < 4 -> not peaky
    s = np.full(100, 1000, dtype=np.int64)
    n, peak2, energy, peaky = AudioCrest._stats(s)
    assert (n, peak2, energy, peaky) == (100, 10**6, 100 * 10**6, 0)
    # one spike in silence: peak²·n >> 4·energy -> peaky
    s2 = np.zeros(100, dtype=np.int64)
    s2[50] = 30000
    n2, p2, e2, k2 = AudioCrest._stats(s2)
    assert (p2, e2, k2) == (9 * 10**8, 9 * 10**8, 1)
    # exact boundary: peak²·n == 4·energy counts as peaky (>=)
    s3 = np.array([2, 1, 1, 1, 1, 1, 0], dtype=np.int64)  # p2=4,n=7,e=9
    # 4*7=28 >= 36? no -> craft exact: s=[2,0,0,0]: 4*4 = 16 >= 16 ✓
    s4 = np.array([2, 0, 0, 0], dtype=np.int64)
    assert AudioCrest._stats(s4)[3] == 1
    assert AudioCrest._stats(s3)[3] == 0


# --- compressed-codec injection seam ----------------------------------------


def test_decoder_injection(ray_session):
    """A third-party compressed-format decoder drops into the actor-pool
    decode stage through fn_constructor_kwargs alone — no stage or schema
    change (VERDICT r3 next-round task #6). Without the injection the same
    payload raises NotImplementedError, proving the boundary is real."""
    import pyarrow as pa
    import ray.data as rd

    from osmi_addresses_ray.stages.multimodal import (
        MEDIA_FEATURE_SCHEMA,
        MediaDecoder,
    )

    def _mock_jpeg_decode(data: bytes):
        # fake 'JPEG': magic FF D8, then 1-byte h, 1-byte w, then raw RGB.
        # Defined as a closure so cloudpickle ships it BY VALUE — a
        # test-module top-level function would pickle by reference and the
        # worker can't import the tests package
        h, w = data[2], data[3]
        return np.frombuffer(data[4 : 4 + h * w * 3], np.uint8).reshape(h, w, 3)

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    payload = b"\xff\xd8" + bytes([5, 4]) + img.tobytes()
    media = rd.from_arrow(
        pa.table(
            {
                "doc_id": ["d1"],
                "media_ref": ["m1"],
                "payload": pa.array([payload], pa.binary()),
                "media_kind": ["image"],
            }
        )
    )
    # boundary: no codec for the JPEG magic without injection (checked on
    # the decoder directly — routing the failure through an actor pool
    # only exercises Ray's actor-retry loop, not the seam)
    with pytest.raises(NotImplementedError, match="no codec"):
        MediaDecoder()._decode(payload, "image")
    # injection: same stage, same schema, decoder shipped to the actor
    out = media.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        concurrency=1,
        fn_constructor_kwargs={
            "extra_codecs": {"jpeg": (b"\xff\xd8", _mock_jpeg_decode)}
        },
    ).take_batch(10, batch_format="pyarrow")
    assert out.schema.equals(MEDIA_FEATURE_SCHEMA)
    assert out["width"][0].as_py() == 4 and out["height"][0].as_py() == 5
    from osmi_addresses_ray.stages.media_codecs import grid_features

    np.testing.assert_allclose(
        np.asarray(out["feature"][0].as_py(), np.float32),
        grid_features(img),
        rtol=0,
        atol=0,
    )


# --- PNG (zlib deflate) ------------------------------------------------------


def _rand_arr(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def test_png_roundtrip_every_filter_and_color_type():
    from osmi_addresses_ray.stages.media_codecs import decode_png, encode_png

    for seed, shape in enumerate([(9, 13), (9, 13, 3), (9, 13, 4), (1, 1, 3), (3, 1, 3)]):
        img = _rand_arr(shape, seed)
        for ft in range(5):
            got = decode_png(encode_png(img, filter_type=ft))
            want = img[:, :, 0] if (img.ndim == 3 and img.shape[2] == 1) else img
            assert np.array_equal(got, want), (shape, ft)


def test_png_gray_and_rgba_normalize_to_rgb():
    from osmi_addresses_ray.stages.media_codecs import encode_png

    gray = _rand_arr((6, 7), 42)
    rgb = decode_image(encode_png(gray, filter_type=2))
    assert rgb.shape == (6, 7, 3)
    assert np.array_equal(rgb[:, :, 0], gray) and np.array_equal(rgb[:, :, 2], gray)
    rgba = _rand_arr((6, 7, 4), 43)
    out = decode_image(encode_png(rgba, filter_type=4))
    assert np.array_equal(out, rgba[:, :, :3])


def test_png_rejects_corruption_and_unsupported():
    import struct as _struct

    from osmi_addresses_ray.stages.media_codecs import decode_png, encode_png

    img = _rand_arr((5, 4, 3), 1)
    good = encode_png(img)
    # flip one IDAT byte -> CRC mismatch
    bad = bytearray(good)
    idat_at = good.index(b"IDAT")
    bad[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # truncated chunk
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_png(good[:30])
    # not a PNG
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM" + good)
    # 16-bit depth rejected explicitly
    ihdr = _struct.pack(">IIBBBBB", 4, 5, 16, 2, 0, 0, 0)
    import zlib as _zlib

    def chunk(typ, payload):
        return (
            _struct.pack(">I", len(payload)) + typ + payload
            + _struct.pack(">I", _zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    deep = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _zlib.compress(b"\x00" * (5 * (1 + 4 * 6))))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported PNG variant"):
        decode_png(deep)


def test_png_multiple_idat_chunks():
    import struct as _struct
    import zlib as _zlib

    from osmi_addresses_ray.stages.media_codecs import decode_png, encode_png

    img = _rand_arr((8, 8, 3), 9)
    good = encode_png(img, filter_type=1)
    # split the single IDAT into two chunks (decoders must concat streams)
    sig_end = 8
    (ihdr_len,) = _struct.unpack_from(">I", good, sig_end)
    ihdr_block = good[sig_end : sig_end + 12 + ihdr_len]
    idat_at = sig_end + 12 + ihdr_len
    (idat_len,) = _struct.unpack_from(">I", good, idat_at)
    idat = good[idat_at + 8 : idat_at + 8 + idat_len]
    half = len(idat) // 2

    def chunk(typ, payload):
        return (
            _struct.pack(">I", len(payload)) + typ + payload
            + _struct.pack(">I", _zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    rebuilt = (
        good[:sig_end] + ihdr_block + chunk(b"IDAT", idat[:half])
        + chunk(b"IDAT", idat[half:]) + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(rebuilt), img)


def test_media_features_over_png_payloads(ray_session):
    """End-to-end: refs whose synthesized payload is PNG decode through the
    actor-pool stage and match the pixel-level (codec-independent) path."""
    from osmi_addresses_ray.stages.media_codecs import grid_features
    from osmi_addresses_ray.stages.multimodal import MediaDecoder

    dec = MediaDecoder()
    n_png = 0
    for i in range(60):
        ref = f"img://png_probe/{i}"
        payload = synthesize_media_payload(ref)
        if sniff_format(payload) != "png":
            continue
        n_png += 1
        feat, w, h = dec._decode(payload, "image")
        px = synthesize_pixels(ref)
        assert (w, h) == (px.shape[1], px.shape[0])
        assert np.array_equal(feat, grid_features(px))
    assert n_png >= 10  # ~1/3 of 60
