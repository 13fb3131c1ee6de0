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

    def test_unsupported_processes_rejected(self):
        # arithmetic-coded (SOF9) and lossless (SOF3) must refuse; a
        # baseline stream relabeled SOF2 fails progressive scan checks
        # (its SOS carries Se=63 on a multi-component scan)
        for sof in (0xC9, 0xC3, 0xCA):
            jb = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
            i = jb.find(b"\xff\xc0")
            jb[i + 1] = sof
            with pytest.raises(ValueError, match="baseline and progressive"):
                decode_jpeg(bytes(jb))
        jb = bytearray(encode_jpeg(_smooth_rgb(8, 8)))
        i = jb.find(b"\xff\xc0")
        jb[i + 1] = 0xC2
        with pytest.raises(ValueError):
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


class TestProgressive:
    """T.81 Annex G progressive path. A progressive file encodes the SAME
    quantized coefficients as its baseline twin, so decoded pixels must be
    bitwise identical — the round-trip identity asserted throughout."""

    def test_gray_matches_baseline_twin(self):
        from edspdf_spark.kernel.jpeg import encode_jpeg_progressive

        img = np.clip(
            np.add.outer(np.arange(24) * 8, np.arange(40) * 3), 0, 255
        ).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=80))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=80))
        assert np.array_equal(base, prog)

    def test_rgb_matches_baseline_twin(self):
        from edspdf_spark.kernel.jpeg import encode_jpeg_progressive

        img = _smooth_rgb(33, 47, seed=3)
        base = decode_jpeg(encode_jpeg(img, quality=85))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=85))
        assert np.array_equal(base, prog)

    def test_spectral_selection_only_script(self):
        from edspdf_spark.kernel.jpeg import encode_jpeg_progressive

        img = _smooth_rgb(16, 24, seed=9)
        script = [("all", 0, 0, 0, 0), ("each", 1, 20, 0, 0), ("each", 21, 63, 0, 0)]
        base = decode_jpeg(encode_jpeg(img, quality=90))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=90, script=script))
        assert np.array_equal(base, prog)

    def test_eobrun_batching_on_flat_image(self):
        from edspdf_spark.kernel.jpeg import encode_jpeg_progressive

        # flat image → all-zero AC bands → long EOB runs across blocks
        img = np.full((64, 64), 130, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=75))
        jb = encode_jpeg_progressive(img, quality=75)
        assert np.array_equal(base, decode_jpeg(jb))

    def test_restart_markers_in_progressive_scans(self):
        from edspdf_spark.kernel.jpeg import encode_jpeg_progressive

        img = _smooth_rgb(32, 32, seed=5)
        base = decode_jpeg(encode_jpeg(img, quality=85))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=85, restart_interval=3)
        )
        assert np.array_equal(base, prog)

    def test_subsampled_420_scripts_agree(self):
        from edspdf_spark.kernel.jpeg import encode_jpeg_progressive

        # 4:2:0 exercises the non-interleaved grid stride (padded row
        # stride != component block width). Two structurally different
        # scan scripts carry identical coefficients → identical pixels.
        img = _smooth_rgb(35, 53, seed=11)
        a = decode_jpeg(encode_jpeg_progressive(img, quality=85, subsample=True))
        script = [("all", 0, 0, 0, 0), ("each", 1, 63, 0, 0)]
        b = decode_jpeg(
            encode_jpeg_progressive(img, quality=85, subsample=True, script=script)
        )
        assert a.shape == img.shape
        assert np.array_equal(a, b)
        # luma must not pay for chroma subsampling: Y-plane fidelity of
        # the 4:2:0 decode matches the 4:4:4 baseline within 0.2 dB
        # (chroma legitimately loses detail to the 2x2 box filter)
        def luma(x):
            x = x.astype(np.float64)
            return 0.299 * x[:, :, 0] + 0.587 * x[:, :, 1] + 0.114 * x[:, :, 2]

        base444 = decode_jpeg(encode_jpeg(img, quality=85))
        y420 = _psnr(luma(img), luma(a))
        y444 = _psnr(luma(img), luma(base444))
        assert abs(y420 - y444) < 0.2, (y420, y444)
        assert _psnr(img.astype(np.float64), a.astype(np.float64)) > 19.0

    def test_odd_dims_and_single_block(self):
        from edspdf_spark.kernel.jpeg import encode_jpeg_progressive

        for shape in [(7, 5), (8, 8), (9, 17)]:
            img = (np.arange(shape[0] * shape[1]) % 251).astype(np.uint8).reshape(shape)
            base = decode_jpeg(encode_jpeg(img, quality=92))
            prog = decode_jpeg(encode_jpeg_progressive(img, quality=92))
            assert np.array_equal(base, prog), shape

    def test_decode_image_pixels_routes_progressive_natively(self, spark):
        from edspdf_spark.functions.multimodal import decode_image_pixels
        from edspdf_spark.kernel.jpeg import encode_jpeg_progressive

        img = _smooth_rgb(16, 16, seed=2)
        jb = encode_jpeg_progressive(img, quality=90)
        df = spark.createDataFrame(
            [("a", bytearray(jb))], "doc_id string, media binary"
        )
        row = decode_image_pixels(df, "media").collect()[0]
        assert row["codec"] == "jpeg"
        assert (row["px_h"], row["px_w"], row["px_c"]) == (16, 16, 3)
        got = np.frombuffer(bytes(row["pixels"]), dtype=np.uint8).reshape(16, 16, 3)
        assert np.array_equal(got, decode_jpeg(jb))

    def test_bit_flips_in_progressive_stream_stay_valueerror_or_decode(self):
        import numpy as np

        from edspdf_spark.kernel.jpeg import encode_jpeg_progressive

        img = _smooth_rgb(16, 16, seed=4)
        jb = bytearray(encode_jpeg_progressive(img, quality=80))
        rng = np.random.default_rng(17)
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


class TestFillBytesAndProgressiveGuards:
    def test_fill_bytes_between_progressive_scans(self):
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker; real encoders pad with them. Decoded pixels must be
        # IDENTICAL to the unpadded stream, not silently wrong.
        from edspdf_spark.kernel.jpeg import encode_jpeg_progressive

        img = _smooth_rgb(24, 24, seed=6)
        jb = encode_jpeg_progressive(img, quality=85)
        want = decode_jpeg(jb)
        # insert fill bytes before EVERY SOS after the first
        out = bytearray()
        i = 0
        seen_sos = 0
        while i < len(jb) - 1:
            if jb[i] == 0xFF and jb[i + 1] == 0xDA:
                seen_sos += 1
                if seen_sos > 1:
                    out += b"\xff" * 3  # fill run
            out.append(jb[i])
            i += 1
        out.append(jb[-1])
        assert seen_sos > 1
        got = decode_jpeg(bytes(out))
        assert np.array_equal(want, got)

    def test_fill_bytes_between_ordinary_segments(self):
        jb = encode_jpeg(_smooth_rgb(16, 16), quality=80)
        i = jb.find(b"\xff\xc0")
        padded = jb[:i] + b"\xff\xff" + jb[i:]
        assert np.array_equal(decode_jpeg(jb), decode_jpeg(padded))

    def test_forged_progressive_dims_raise_before_block_loops(self):
        import struct

        from edspdf_spark.kernel.jpeg import encode_jpeg_progressive

        jb = encode_jpeg_progressive(np.zeros((16, 16), dtype=np.uint8))
        i = jb.find(b"\xff\xc2")
        forged = jb[: i + 5] + struct.pack(">HH", 7000, 7000) + jb[i + 9 :]
        with pytest.raises(ValueError, match="entropy data too short"):
            decode_jpeg(forged)

    def test_ac_scan_before_dc_first_raises(self):
        from edspdf_spark.kernel.jpeg import encode_jpeg_progressive

        # reorder the default script so an AC scan leads: spec-invalid
        # (G.1.1.1.1), must refuse rather than decode garbage
        script = [("each", 1, 63, 0, 0), ("all", 0, 0, 0, 0)]
        jb = encode_jpeg_progressive(
            np.zeros((8, 8), dtype=np.uint8), script=script
        )
        with pytest.raises(ValueError, match="DC-first"):
            decode_jpeg(jb)
