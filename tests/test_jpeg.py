"""Baseline JPEG codec (kernel/jpeg.py) + native decode routing.

The encoder writes its quant/Huffman tables into the stream and the
decoder reads tables from the stream, so round-trip fidelity is
self-contained — no imaging library anywhere. Reference semantics:
ITU-T T.81 baseline sequential process (public spec).
"""

import numpy as np
import pytest

from edspdf_spark.kernel.jpeg import decode_jpeg, encode_jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10.0 * np.log10(255.0**2 / mse)


def _smooth_rgb(h, w, seed=7):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, (h, w, 3)).astype(np.float64)
    for _ in range(4):
        a[1:-1, 1:-1] = (
            a[:-2, 1:-1] + a[2:, 1:-1] + a[1:-1, :-2] + a[1:-1, 2:]
        ) / 4.0
    return a.astype(np.uint8)


class TestRoundTrip:
    def test_gray_gradient(self):
        h, w = 48, 64
        img = (np.add.outer(np.arange(h) * 3, np.arange(w) * 2) % 256).astype(
            np.uint8
        )
        out = decode_jpeg(encode_jpeg(img, quality=90))
        assert out.shape == (h, w)
        assert out.dtype == np.uint8
        assert _psnr(img, out) > 40.0

    def test_rgb_smooth(self):
        img = _smooth_rgb(37, 53)  # non-multiple-of-8 dims exercise padding
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == (37, 53, 3)
        assert _psnr(img, out) > 30.0

    def test_flat_image_is_near_exact(self):
        img = np.full((16, 24, 3), 130, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=85))
        assert int(np.max(np.abs(out.astype(int) - 130))) <= 2

    def test_quality_monotone(self):
        img = _smooth_rgb(40, 40, seed=3)
        lo = decode_jpeg(encode_jpeg(img, quality=20))
        hi = decode_jpeg(encode_jpeg(img, quality=95))
        assert _psnr(img, hi) > _psnr(img, lo)

    def test_restart_markers(self):
        img = _smooth_rgb(32, 48, seed=11)
        plain = decode_jpeg(encode_jpeg(img, quality=90))
        rst = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=2))
        # restart markers change the byte stream, not the decoded pixels
        assert np.array_equal(plain, rst)

    def test_single_block(self):
        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == (8, 8)
        assert _psnr(img, out) > 35.0

    def test_deterministic_bytes(self):
        img = _smooth_rgb(24, 24, seed=5)
        assert encode_jpeg(img, quality=80) == encode_jpeg(img, quality=80)


class TestErrors:
    def test_not_a_jpeg(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"\x89PNG\r\n\x1a\nnope")

    def test_truncated_raises_valueerror(self):
        jb = encode_jpeg(_smooth_rgb(16, 16), quality=80)
        for cut in (4, 30, 100, len(jb) - 3):
            with pytest.raises(ValueError):
                decode_jpeg(jb[:cut])

    def test_progressive_rejected(self):
        # flip the SOF0 marker (FFC0) to SOF2 (FFC2) — decoder must refuse
        jb = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
        i = jb.find(b"\xff\xc0")
        jb[i + 1] = 0xC2
        with pytest.raises(ValueError, match="baseline"):
            decode_jpeg(bytes(jb))

    def test_encoder_input_validation(self):
        with pytest.raises(ValueError):
            encode_jpeg(np.zeros((4, 4), dtype=np.float32))
        with pytest.raises(ValueError):
            encode_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))
        with pytest.raises(ValueError):
            encode_jpeg(np.zeros((0, 4), dtype=np.uint8))


class TestSparkRouting:
    def test_decode_image_pixels_native_jpeg(self, spark):
        from edspdf_spark.functions.multimodal import decode_image_pixels

        img = _smooth_rgb(24, 32, seed=9)
        jb = encode_jpeg(img, quality=92)
        rows = [("a", bytearray(jb)), ("b", bytearray(jb[:40])), ("c", None)]
        df = spark.createDataFrame(rows, "doc_id string, media binary")
        out = {
            r["doc_id"]: r
            for r in decode_image_pixels(df, "media").collect()
        }
        good = out["a"]
        assert good["codec"] == "jpeg"
        assert (good["px_h"], good["px_w"], good["px_c"]) == (24, 32, 3)
        arr = np.frombuffer(bytes(good["pixels"]), dtype=np.uint8).reshape(
            24, 32, 3
        )
        assert _psnr(img, arr) > 30.0
        # truncated JPEG: identified, not decoded, partition survives
        assert out["b"]["codec"] == "jpeg"
        assert out["b"]["pixels"] is None
        assert out["c"]["codec"] == "unknown"


class TestFuzz:
    def test_random_garbage_after_soi_never_raises_non_valueerror(self):
        # poison-pill contract: any malformed stream must surface as
        # ValueError (the routing signal), never an arbitrary exception
        import numpy as np

        rng = np.random.default_rng(123)
        for trial in range(200):
            blob = b"\xff\xd8" + bytes(
                rng.integers(0, 256, int(rng.integers(0, 400))).tolist()
            )
            try:
                out = decode_jpeg(blob)
                assert out.dtype == np.uint8  # decoded something plausible
            except ValueError:
                pass

    def test_bit_flips_in_valid_stream_stay_valueerror_or_decode(self):
        import numpy as np

        img = _smooth_rgb(16, 16, seed=2)
        jb = bytearray(encode_jpeg(img, quality=80))
        rng = np.random.default_rng(7)
        for trial in range(150):
            mutated = bytearray(jb)
            for _ in range(int(rng.integers(1, 4))):
                pos = int(rng.integers(2, len(jb)))
                mutated[pos] ^= 1 << int(rng.integers(0, 8))
            try:
                out = decode_jpeg(bytes(mutated))
                assert out.dtype == np.uint8
            except ValueError:
                pass

    def test_roundtrip_property_random_sizes(self):
        import numpy as np

        rng = np.random.default_rng(99)
        for trial in range(12):
            h = int(rng.integers(1, 40))
            w = int(rng.integers(1, 40))
            c = int(rng.choice([1, 3]))
            img = np.full((h, w, c) if c == 3 else (h, w), int(rng.integers(0, 256)), dtype=np.uint8)
            out = decode_jpeg(encode_jpeg(img, quality=90))
            assert out.shape[:2] == (h, w)
            # flat images survive near-exactly at any size incl. 1xN edges
            assert int(np.max(np.abs(out.astype(int) - int(img.flat[0])))) <= 3


class TestHostileHeaders:
    """Untrusted-crawl guards: forged headers must raise ValueError
    cheaply, never allocate decode-sized buffers or return wrong pixels."""

    def _patch_sof_dims(self, jb: bytes, h: int, w: int) -> bytes:
        import struct

        i = jb.find(b"\xff\xc0")
        assert i >= 0
        return jb[: i + 5] + struct.pack(">HH", h, w) + jb[i + 9 :]

    def test_multi_scan_non_interleaved_raises(self):
        # splice a 1-component SOS in front of a 3-component frame's scan:
        # decoding only the Y scan would silently return grayscale
        jb = encode_jpeg(_smooth_rgb(16, 16), quality=85)
        i = jb.find(b"\xff\xda")
        assert i >= 0
        ns = jb[i + 4]
        assert ns == 3
        comp_id = jb[i + 5]
        one_scan = bytes([0xFF, 0xDA, 0x00, 0x08, 0x01, comp_id, 0x00, 0x00, 0x3F, 0x00])
        seglen = int.from_bytes(jb[i + 2 : i + 4], "big")
        patched = jb[:i] + one_scan + jb[i + 2 + seglen :]
        with pytest.raises(ValueError, match="non-interleaved"):
            decode_jpeg(patched)

    def test_giant_declared_dims_raise_before_allocation(self):
        jb = encode_jpeg(np.zeros((8, 8), dtype=np.uint8), quality=80)
        with pytest.raises(ValueError, match="pixel cap"):
            decode_jpeg(self._patch_sof_dims(jb, 60000, 60000))

    def test_dims_disproportionate_to_entropy_data_raise(self):
        # under the pixel cap, but a 16x16 image's entropy bytes cannot
        # possibly carry 4000x4000 worth of blocks
        jb = encode_jpeg(np.zeros((16, 16), dtype=np.uint8), quality=80)
        with pytest.raises(ValueError, match="entropy data too short"):
            decode_jpeg(self._patch_sof_dims(jb, 4000, 4000))
