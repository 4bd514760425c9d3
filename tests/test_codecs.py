"""Stdlib media codecs (functions/codecs.py) and the real-codec
multimodal decode path.  PNG round-trips cover every scanline filter
(the decoder must reconstruct Sub/Up/Average/Paeth output bit-exactly);
a Pillow cross-check is skip-marked like the live spaCy/BERT tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from modernsearchengines_ray.functions.codecs import (
    UnsupportedMediaError,
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    sniff_mime,
)


def _rand_img(seed, h, w, c):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, (h, w, c)).astype(np.uint8)
    return a


class TestPng:
    @pytest.mark.parametrize("c", [1, 2, 3, 4])
    def test_roundtrip_all_color_types(self, c):
        a = _rand_img(c, 13, 17, c)
        assert np.array_equal(decode_png(encode_png(a)), a)

    def test_roundtrip_2d_gray(self):
        a = _rand_img(9, 5, 7, 1)
        assert np.array_equal(decode_png(encode_png(a[:, :, 0])), a)

    @pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
    def test_decodes_every_scanline_filter(self, filt):
        """Hand-filter the raw stream with each filter type and check
        the decoder inverts it (our encoder only writes filter 0, so
        this is the only coverage of Sub/Average/Paeth)."""
        import struct
        import zlib

        a = _rand_img(40 + filt, 9, 11, 3)
        h, w, c = a.shape
        bpp = c
        stride = w * c
        raw = bytearray()
        prev = np.zeros(stride, dtype=np.int32)
        for y in range(h):
            line = a[y].reshape(-1).astype(np.int32)
            enc = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                ul = int(prev[x - bpp]) if x >= bpp else 0
                if filt == 0:
                    pred = 0
                elif filt == 1:
                    pred = left
                elif filt == 2:
                    pred = up
                elif filt == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - ul
                    cand = sorted([(abs(p - left), 0, left),
                                   (abs(p - up), 1, up),
                                   (abs(p - ul), 2, ul)])
                    pred = cand[0][2]
                enc[x] = (int(line[x]) - pred) & 0xFF
            raw.append(filt)
            raw.extend(enc.astype(np.uint8).tobytes())
            prev = line

        sig = b"\x89PNG\r\n\x1a\n"

        def chunk(tag, data):
            body = tag + data
            return struct.pack(">I", len(data)) + body + \
                struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        payload = (sig + chunk(b"IHDR", ihdr)
                   + chunk(b"IDAT", zlib.compress(bytes(raw)))
                   + chunk(b"IEND", b""))
        assert np.array_equal(decode_png(payload), a)

    def test_rejects_unsupported(self):
        with pytest.raises(UnsupportedMediaError):
            decode_png(b"not a png at all")
        # 16-bit depth PNG header
        import struct
        import zlib

        sig = b"\x89PNG\r\n\x1a\n"

        def chunk(tag, data):
            body = tag + data
            return struct.pack(">I", len(data)) + body + \
                struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
        with pytest.raises(UnsupportedMediaError, match="depth"):
            decode_png(sig + chunk(b"IHDR", ihdr) + chunk(b"IEND", b""))

    def test_pillow_cross_check(self):
        pil = pytest.importorskip("PIL.Image")
        import io

        a = _rand_img(77, 21, 33, 3)
        got = np.asarray(pil.open(io.BytesIO(encode_png(a))))
        assert np.array_equal(got, a)


class TestBmp:
    def test_roundtrip(self):
        a = _rand_img(5, 10, 7, 3)  # width 7 exercises row padding
        assert np.array_equal(decode_bmp(encode_bmp(a)), a)

    def test_rejects_other_variants(self):
        with pytest.raises(UnsupportedMediaError):
            decode_bmp(b"XXnot a bmp")


class TestWav:
    def test_roundtrip_mono(self):
        rng = np.random.RandomState(3)
        samples = rng.randint(-30000, 30000, 500).astype(np.int16)
        rate, got = decode_wav(encode_wav(samples, 22050))
        assert rate == 22050
        assert got.shape == (500, 1)
        assert np.array_equal((got[:, 0] * 32768).astype(np.int16), samples)

    def test_roundtrip_stereo(self):
        rng = np.random.RandomState(4)
        samples = rng.randint(-30000, 30000, (100, 2)).astype(np.int16)
        rate, got = decode_wav(encode_wav(samples, 8000))
        assert rate == 8000
        assert got.shape == (100, 2)

    def test_rejects_garbage(self):
        with pytest.raises(UnsupportedMediaError):
            decode_wav(b"RIFFxxxxJUNKdata")


class TestSniff:
    def test_known_containers(self):
        png = encode_png(_rand_img(1, 4, 4, 3))
        bmp = encode_bmp(_rand_img(2, 4, 4, 3))
        wav = encode_wav(np.zeros(8, np.int16), 8000)
        assert sniff_mime(png) == "image/png"
        assert sniff_mime(bmp) == "image/bmp"
        assert sniff_mime(wav) == "audio/wav"
        assert sniff_mime(b"\xff\xd8\xff\xe0JFIF") == "image/jpeg"
        assert sniff_mime(b"??") is None


class TestRealCodecStages:
    def test_image_decode_real_features(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.multimodal import (
            image_features,
        )

        imgs = [_rand_img(s, 6 + s, 5 + s, 3) for s in range(4)]
        media = pa.table({
            "item_id": pa.array(range(4), pa.int64()),
            "payload": pa.array([encode_png(a) for a in imgs],
                                pa.binary()),
            "mime": pa.array(["image/png"] * 4, pa.string()),
        })
        out = image_features(rd.from_arrow(media), concurrency=1,
                             codec="real").to_pandas() \
            .sort_values("item_id", ignore_index=True)
        for s, a in enumerate(imgs):
            row = out.iloc[s]
            assert (row["width"], row["height"], row["channels"]) == \
                (a.shape[1], a.shape[0], 3)
            assert row["luma_sum"] == int(a.sum(dtype=np.int64))
            assert row["mean_luma"] == \
                int(a.sum(dtype=np.int64)) / a.size / 255.0

    def test_audio_decode_real_features(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.multimodal import (
            audio_features,
        )

        a = np.full(200, 16384, dtype=np.int16)  # amp = 0.5 exactly
        media = pa.table({
            "item_id": pa.array([7], pa.int64()),
            "payload": pa.array([encode_wav(a, 44100)], pa.binary()),
            "mime": pa.array(["audio/wav"], pa.string()),
        })
        out = audio_features(rd.from_arrow(media), concurrency=1,
                             codec="real").to_pandas()
        row = out.iloc[0]
        assert row["sample_rate"] == 44100
        assert row["n_samples"] == 200
        assert row["amp"] == 0.5
        assert row["rms"] == 0.5  # constant signal: rms == amp exactly

    def test_unknown_codec_rejected(self):
        from modernsearchengines_ray.stages.multimodal import (
            AudioDecode, ImageDecode,
        )

        with pytest.raises(ValueError):
            ImageDecode(codec="bogus")
        with pytest.raises(ValueError):
            AudioDecode(codec="bogus")


class TestCorruptPayloads:
    def test_truncated_png_raises_unsupported(self):
        # cuts inside the header, the IHDR, and the IDAT data itself
        # (a cut that only drops IEND/CRC decodes fine by design)
        png = encode_png(_rand_img(8, 6, 6, 3))
        for cut in (10, 20, len(png) // 2):
            with pytest.raises(UnsupportedMediaError):
                decode_png(png[:cut])

    def test_truncated_bmp_raises_unsupported(self):
        bmp = encode_bmp(_rand_img(9, 6, 6, 3))
        for cut in (5, 20, len(bmp) - 7):
            with pytest.raises(UnsupportedMediaError):
                decode_bmp(bmp[:cut])

    def test_sub_filter_no_overflow_warning(self):
        # Sub-filtered scanlines with sums > 255 must decode silently
        import struct
        import warnings
        import zlib

        a = np.full((4, 6, 3), 200, dtype=np.uint8)
        h, w, c = a.shape
        stride = w * c
        raw = bytearray()
        prev = np.zeros(stride, dtype=np.int32)
        for y in range(h):
            line = a[y].reshape(-1).astype(np.int32)
            enc = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                left = int(line[x - c]) if x >= c else 0
                enc[x] = (int(line[x]) - left) & 0xFF
            raw.append(1)
            raw.extend(enc.astype(np.uint8).tobytes())
            prev = line

        def chunk(tag, data):
            body = tag + data
            return struct.pack(">I", len(data)) + body + \
                struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

        payload = (b"\x89PNG\r\n\x1a\n"
                   + chunk(b"IHDR",
                           struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
                   + chunk(b"IDAT", zlib.compress(bytes(raw)))
                   + chunk(b"IEND", b""))
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            got = decode_png(payload)
        assert np.array_equal(got, a)
