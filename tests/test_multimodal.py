"""Multimodal column plumbing: binary schema, metadata struct, decode stub."""

import pytest

from pyspark.sql.types import BinaryType, IntegerType, LongType, StringType, StructType

from mapreducegcp_spark.operators.multimodal import (
    decode_media,
    encode_media,
    q_multimodal_decode_dims,
    q_multimodal_feature_extract,
    with_payload,
)
from mapreducegcp_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_payload_schema_is_binary_plus_typed_struct(spark):
    df = with_payload(load_table(spark, SF_DIR, "documents"))
    schema = dict(df.dtypes)
    assert isinstance(df.schema["payload"].dataType, BinaryType)
    meta = df.schema["meta"].dataType
    assert isinstance(meta, StructType)
    assert isinstance(meta["fmt"].dataType, StringType)
    assert isinstance(meta["width"].dataType, IntegerType)
    assert isinstance(meta["n_bytes"].dataType, LongType)


def test_payload_bytes_round_trip(spark):
    row = (
        with_payload(load_table(spark, SF_DIR, "documents"))
        .select("payload", "meta.n_bytes")
        .first()
    )
    assert isinstance(row.payload, bytearray | bytes)
    assert len(row.payload) == row.n_bytes


def test_feature_extract_runs_through_map_in_pandas(spark):
    out = q_multimodal_feature_extract(spark, SF_DIR)
    rows = out.limit(5).collect()
    assert rows and all(r.n_bytes > 0 and r.byte_sum > 0 for r in rows)
    assert dict(out.dtypes)["byte_sum"] == "bigint"


def test_decode_corrupt_bytes_raise_value_error_not_missing_codec():
    # Both entropy-coded formats decode in-repo now — corrupt/truncated
    # bytes are a ValueError at the public codec seam, never a missing
    # codec. (jpeg used to raise NotImplementedError here; the baseline
    # codec closed that boundary in round 6.)
    with pytest.raises(ValueError):
        decode_media(b"\xff\xd8\xff\xe0", "jpeg")  # truncated APP0
    with pytest.raises(ValueError):
        decode_media(b"\x89PNG", "png")  # truncated signature


def test_png_roundtrip_exercises_all_five_filters():
    """Pixels must survive compress -> filter -> inflate -> unfilter
    byte-for-byte; with h >= 5 the encoder emits every standard filter
    type (row % 5), so a decoder faking any filter breaks equality."""
    data = bytes((i * 37 + 11) % 256 for i in range(500))
    for w, h in [(23, 15), (8, 4), (1, 1), (16, 5)]:
        p = decode_media(encode_media(data, "png", width=w, height=h), "png")
        assert (p["width"], p["height"]) == (w, h)
        assert p["pixels"] == (data + b"\x00" * (w * h))[: w * h]
        assert p["n_filter_types"] == min(h, 5)


def test_png_truecolor_roundtrip_exact_and_imageio(spark):
    """Truecolor PNG (ctype 2) must round-trip byte-exact — PNG is
    lossless, so any filter-offset mistake (RGB filters reference one
    PIXEL back, 3 bytes, not one byte) shows as inequality — and the
    JVM's javax.imageio must decode the same RGB values from the same
    bytes (independent spec check)."""
    import numpy as np

    data = bytes((i * 29 + 5) % 256 for i in range(23 * 15 * 3))
    for w, h in [(23, 15), (1, 1), (8, 5)]:
        p = decode_media(
            encode_media(data, "png", width=w, height=h, channels=3), "png"
        )
        assert (p["width"], p["height"], p["channels"]) == (w, h, 3)
        assert p["pixels"] == (data + b"\x00" * (w * h * 3))[: w * h * 3]
        assert p["n_filter_types"] == min(h, 5)
    w, h = 16, 9
    rgb = np.frombuffer(data[: w * h * 3], np.uint8).reshape(h, w, 3)
    payload = encode_media(rgb.tobytes(), "png", width=w, height=h, channels=3)
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(payload))
    )
    assert img is not None, "ImageIO rejected the stream"
    for y in range(h):
        for x in range(w):
            pix = img.getRGB(x, y)
            assert ((pix >> 16) & 255, (pix >> 8) & 255, pix & 255) == tuple(
                int(v) for v in rgb[y, x]
            ), (x, y)


_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _adam7_reference_encode(arr, bpp):
    """Spec-direct Adam7 interlacer for test inputs: seven passes at
    the standard offsets, each pass filtered independently with a
    rotating filter type — exercises every filter in every pass
    geometry."""
    from mapreducegcp_spark.operators.multimodal import _codec_fns  # noqa: F401

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    h, w = arr.shape[0], arr.shape[1]
    flat = arr.reshape(h, w * bpp)
    out = bytearray()
    for pi, (x0, y0, dx, dy) in enumerate(_ADAM7):
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        prev = bytearray(pw * bpp)
        for r in range(ph):
            y = y0 + r * dy
            row = bytearray()
            for c in range(pw):
                x = x0 + c * dx
                row += bytes(flat[y, x * bpp : (x + 1) * bpp].tolist())
            f = (pi + r) % 5
            filt = bytearray(pw * bpp)
            for i in range(pw * bpp):
                xv = row[i]
                left = row[i - bpp] if i >= bpp else 0
                up = prev[i]
                ul = prev[i - bpp] if i >= bpp else 0
                if f == 0:
                    filt[i] = xv
                elif f == 1:
                    filt[i] = (xv - left) & 255
                elif f == 2:
                    filt[i] = (xv - up) & 255
                elif f == 3:
                    filt[i] = (xv - (left + up) // 2) & 255
                else:
                    filt[i] = (xv - paeth(left, up, ul)) & 255
            out.append(f)
            out += filt
            prev = row
    return bytes(out)


def test_png_adam7_interlaced_decode():
    """Adam7 (interlace 1): seven independently-filtered sub-images
    scattered at the standard pass offsets. Byte-exact round-trip
    through a spec-direct reference interlacer for gray / RGB / RGBA
    at sizes that exercise empty passes (1x1), exact pass grids (8x8)
    and ragged edges."""
    import struct
    import zlib

    import numpy as np

    def chunk(t, b):
        return (
            struct.pack(">I", len(b)) + t + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    rng = np.random.RandomState(9)
    for w, h, ctype, bpp in [
        (13, 11, 0, 1), (16, 8, 2, 3), (9, 7, 6, 4), (1, 1, 0, 1), (33, 17, 2, 3),
    ]:
        arr = rng.randint(0, 256, (h, w, bpp), dtype=np.uint8)
        raw = _adam7_reference_encode(arr, bpp)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1)
        png = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        )
        d = decode_media(png, "png")
        assert (d["width"], d["height"], d["channels"]) == (w, h, bpp)
        assert d["pixels"] == arr.tobytes(), (w, h, ctype)


def test_png_palette_decode(spark):
    """Indexed-color PNG (ctype 3) — the common web/icon profile.
    8-bit: javax.imageio writes a TYPE_BYTE_INDEXED image (256-entry
    PLTE) and our decode must match ImageIO's own decode of the same
    bytes EXACTLY (palette lookup is lossless). Sub-byte depths pack
    indices MSB-first: a handcrafted 4-bit file must map index-exactly
    through its 4-entry palette. tRNS stays an honest boundary."""
    import struct
    import zlib

    import numpy as np

    jvm = spark._jvm
    w, h = 16, 9
    img = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_BYTE_INDEXED
    )
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [(xx * 16) % 256, (yy * 25) % 256, ((xx + yy) * 8) % 256], axis=-1
    ).astype(int)
    for y in range(h):
        for x in range(w):
            img.setRGB(
                x, y,
                (int(rgb[y, x, 0]) << 16)
                | (int(rgb[y, x, 1]) << 8)
                | int(rgb[y, x, 2]),
            )
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "png", baos)
    payload = bytes(baos.toByteArray())
    d = decode_media(payload, "png")
    assert (d["channels"], d["palette_size"]) == (3, 256)
    got = np.frombuffer(d["pixels"], np.uint8).reshape(h, w, 3).astype(int)
    img2 = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(payload))
    )
    for y in range(h):
        for x in range(w):
            px = img2.getRGB(x, y)
            assert tuple(got[y, x]) == (
                (px >> 16) & 255, (px >> 8) & 255, px & 255
            ), (x, y)

    def chunk(t, b):
        return (
            struct.pack(">I", len(b)) + t + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    w2, h2, depth = 5, 3, 4
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    idx = [[0, 1, 2, 3, 0], [1, 1, 2, 2, 3], [3, 0, 0, 1, 2]]
    raw = bytearray()
    for r in range(h2):
        raw.append(0)
        for x in range(0, w2, 2):
            b = idx[r][x] << 4
            if x + 1 < w2:
                b |= idx[r][x + 1]
            raw.append(b)
    ihdr = struct.pack(">IIBBBBB", w2, h2, depth, 3, 0, 0, 0)
    png4 = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )
    d2 = decode_media(png4, "png")
    got2 = np.frombuffer(d2["pixels"], np.uint8).reshape(h2, w2, 3)
    exp = np.array(
        [[list(plte[i * 3 : i * 3 + 3]) for i in row] for row in idx], np.uint8
    )
    assert (got2 == exp).all() and d2["palette_size"] == 4

    # tRNS: per-entry alpha makes the decode RGBA; entries past the
    # tRNS length are opaque 255 per spec
    png_t = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
        + chunk(b"tRNS", bytes([128]))
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )
    dt = decode_media(png_t, "png")
    assert dt["channels"] == 4
    got_t = np.frombuffer(dt["pixels"], np.uint8).reshape(h2, w2, 4)
    assert (got_t[..., :3] == exp).all()
    alpha_exp = np.where(np.array(idx) == 0, 128, 255)
    assert (got_t[..., 3] == alpha_exp).all()
    # color-key tRNS on non-indexed color stays an explicit boundary
    ihdr_g = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    png_g = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_g)
        + chunk(b"tRNS", bytes([0, 7]))
        + chunk(b"IDAT", zlib.compress(bytes(bytearray(20))))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        decode_media(png_g, "png")


def test_png_corrupt_inputs_raise_valueerror():
    blob = bytearray(encode_media(b"x" * 64, "png", width=8, height=8))
    # flip one IDAT payload byte -> CRC mismatch, never a bare error
    blob[50] ^= 0xFF
    with pytest.raises(ValueError):
        decode_media(bytes(blob), "png")
    with pytest.raises(ValueError):  # truncated mid-chunk
        decode_media(bytes(encode_media(b"y" * 64, "png", width=8, height=8))[:-6], "png")
    with pytest.raises(ValueError):  # wrong magic entirely
        decode_media(b"NOTAPNGNOTAPNG" + b"\x00" * 32, "png")


def test_png_unsupported_profile_raises_notimplemented():
    """Round 7 closed the 16-bit and interlaced-palette seams; the one
    remaining profile boundary is SUB-BYTE palette + Adam7 (bit-level
    scatter, which no mainstream encoder emits) plus nonsense combos
    like 16-bit palette. Those must still hit the explicit boundary,
    not mis-decode."""
    import struct
    import zlib

    for depth, ctype, inter in ((4, 3, 1), (1, 3, 1), (16, 3, 0)):
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, ctype, 0, 0, inter)
        chunk = (
            struct.pack(">I", len(ihdr))
            + b"IHDR"
            + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        )
        with pytest.raises(NotImplementedError):
            decode_media(b"\x89PNG\r\n\x1a\n" + chunk, "png")


def _png_chunk(t, b):
    import struct
    import zlib

    return (
        struct.pack(">I", len(b)) + t + b
        + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
    )


def test_png_16bit_gray_imageio_interop(spark):
    """16-bit grayscale (depth 16, ctype 0) — round 7 seam closure,
    verified against a zero-shared-code independent ENCODER: the JVM's
    javax.imageio writes a TYPE_USHORT_GRAY PNG and our decode must
    reproduce every 16-bit sample exactly (big-endian byte order per
    spec)."""
    import numpy as np

    jvm = spark._jvm
    w, h = 19, 11
    vals = [((x * 4099 + y * 65551) % 65536) for y in range(h) for x in range(w)]
    img = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_USHORT_GRAY
    )
    raster = img.getRaster()
    for y in range(h):
        for x in range(w):
            raster.setSample(x, y, 0, vals[y * w + x])
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "png", baos)
    d = decode_media(bytes(baos.toByteArray()), "png")
    assert (d["width"], d["height"], d["channels"], d["bit_depth"]) == (w, h, 1, 16)
    got = np.frombuffer(d["pixels"], ">u2").reshape(h, w)
    assert got.flatten().tolist() == vals


def test_png_16bit_rgb_adam7_imageio_interop(spark):
    """16-bit truecolor + Adam7 in one profile: crafted with the
    spec-direct reference interlacer at 6 bytes/pixel (the filter
    offset the 16-bit path must get right), decoded by us AND by
    javax.imageio as the independent decoder — 16-bit samples equal
    on every band."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.RandomState(16)
    w, h = 13, 9
    arr16 = rng.randint(0, 65536, (h, w, 3), dtype=np.uint16)
    arr_bytes = arr16.astype(">u2").view(np.uint8).reshape(h, w, 6)
    raw = _adam7_reference_encode(arr_bytes, 6)
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 1)
    png = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")
    )
    d = decode_media(png, "png")
    assert (d["channels"], d["bit_depth"]) == (3, 16)
    got = np.frombuffer(d["pixels"], ">u2").reshape(h, w, 3)
    assert np.array_equal(got, arr16)

    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(png))
    )
    assert img is not None, "ImageIO rejected the 16-bit Adam7 stream"
    raster = img.getRaster()
    for y in range(h):
        for x in range(w):
            for b in range(3):
                assert raster.getSample(x, y, b) == int(arr16[y, x, b]), (x, y, b)


def test_png_gray_alpha_decode(spark):
    """Gray+alpha (ctype 4) — the color type the round-6 decoder
    rejected entirely. Crafted non-interlaced with mixed filters via
    the reference interlacer's filter rotation (interlace 1 also
    covered), cross-checked against javax.imageio."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.RandomState(44)
    w, h = 12, 10
    arr = rng.randint(0, 256, (h, w, 2), dtype=np.uint8)
    raw = _adam7_reference_encode(arr, 2)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 4, 0, 0, 1)
    png = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")
    )
    d = decode_media(png, "png")
    assert d["channels"] == 2 and "bit_depth" not in d
    got = np.frombuffer(d["pixels"], np.uint8).reshape(h, w, 2)
    assert np.array_equal(got, arr)

    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(png))
    )
    assert img is not None
    raster = img.getRaster()
    for y in range(h):
        for x in range(w):
            assert raster.getSample(x, y, 0) == int(arr[y, x, 0]), (x, y)
            assert raster.getSample(x, y, 1) == int(arr[y, x, 1]), (x, y)


def test_png_interlaced_palette_imageio_interop(spark):
    """Adam7 + indexed color (depth-8 palette) — the round-6
    interlaced-palette seam, closed: indices scatter as bytes exactly
    like gray, THEN map through PLTE. Crafted with the reference
    interlacer, verified against javax.imageio's decode of the same
    bytes."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.RandomState(77)
    w, h = 17, 13
    plte = bytes(rng.randint(0, 256, 256 * 3, dtype=np.uint8))
    idx = rng.randint(0, 256, (h, w, 1), dtype=np.uint8)
    raw = _adam7_reference_encode(idx, 1)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 1)
    png = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")
    )
    d = decode_media(png, "png")
    assert (d["channels"], d["palette_size"]) == (3, 256)
    got = np.frombuffer(d["pixels"], np.uint8).reshape(h, w, 3)
    want = np.frombuffer(plte, np.uint8).reshape(256, 3)[idx[:, :, 0]]
    assert np.array_equal(got, want)

    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(png))
    )
    assert img is not None, "ImageIO rejected the interlaced-palette stream"
    for y in range(h):
        for x in range(w):
            px = img.getRGB(x, y)
            assert tuple(int(v) for v in got[y, x]) == (
                (px >> 16) & 255, (px >> 8) & 255, px & 255
            ), (x, y)


def test_png_rgba_roundtrip_exact():
    """RGBA (ctype 6, bpp 4): byte-exact round-trip across all five
    filter types — the alpha byte rides the same one-pixel-back filter
    offset as the color bytes."""
    import numpy as np

    rng = np.random.RandomState(5)
    data = rng.randint(0, 256, 11 * 7 * 4, dtype=np.uint8).tobytes()
    p = decode_media(
        encode_media(data, "png", width=11, height=7, channels=4), "png"
    )
    assert (p["channels"], p["n_filter_types"]) == (4, 5)
    assert p["pixels"] == data


def test_encode_decode_round_trip():
    data = bytes(range(48))
    bmp = decode_media(encode_media(data, "bmp", width=37, height=21), "bmp")
    assert (bmp["width"], bmp["height"]) == (37, 21)
    ppm = decode_media(encode_media(data, "ppm", width=640, height=480), "ppm")
    assert (ppm["width"], ppm["height"]) == (640, 480)
    wav = decode_media(encode_media(data, "wav", sample_rate=16000), "wav")
    assert (wav["sample_rate"], wav["n_samples"]) == (16000, len(data))


def test_decode_rejects_bad_magic():
    with pytest.raises(ValueError):
        decode_media(b"XXXX" * 16, "bmp")
    with pytest.raises(ValueError):
        decode_media(b"XXXX" * 16, "wav")


def test_decode_dims_gate(spark):
    out = q_multimodal_decode_dims(spark, SF_DIR).collect()
    assert out
    for r in out:
        if r.fmt == "wav":
            assert r.sample_rate >= 12000 and r.width is None
        else:
            assert r.width >= 32 and r.height >= 24
            assert r.aspect_milli == r.width * 1000 // r.height
            assert r.sample_rate is None


def test_binary_file_source_ingest(spark, tmp_path):
    # the media-file ingest path: raw files on disk -> binaryFile scan
    # -> (path, length, content) rows, content byte-identical
    blobs = {f"m{i}.bin": bytes([i] * (i + 3)) for i in range(4)}
    for name, data in blobs.items():
        (tmp_path / name).write_bytes(data)
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(str(tmp_path))
    )
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == set(blobs)
    for name, data in blobs.items():
        assert bytes(rows[name].content) == data
        assert rows[name].length == len(data)


def test_decode_rejects_truncated_headers_with_valueerror():
    """ADVICE r5: a truncated payload with VALID magic must raise
    ValueError at the public codec seam, never a bare struct.error."""
    import pytest

    with pytest.raises(ValueError, match="truncated"):
        decode_media(b"BM" + b"\x00" * 10, "bmp")
    with pytest.raises(ValueError, match="truncated"):
        decode_media(b"RIFF\x00\x00\x00\x00WAVE", "wav")
    with pytest.raises(ValueError, match="truncated"):
        decode_media(b"P6\n12", "ppm")


def test_multimodal_manifest_composes_gate_dedup_pack(spark, sf_dir):
    """The capstone must reflect its stages: only gate-surviving
    formats appear, chunk bytes respect the budget granularity
    (every chunk except a stream's last holds >= BLOB_BUDGET once its
    first payload lands past the boundary — weak form: totals match
    the survivor byte sum), and no (fmt, shard, seq_id) repeats."""
    from mapreducegcp_spark.operators.multimodal import (
        q_pipeline_multimodal_manifest,
    )

    rows = q_pipeline_multimodal_manifest(spark, sf_dir).collect()
    assert rows
    keys = [(r.fmt, r.shard, r.seq_id) for r in rows]
    assert len(keys) == len(set(keys))
    assert {r.fmt for r in rows} <= {"bmp", "ppm", "wav"}
    assert all(r.n_payloads >= 1 and r.seq_bytes >= 1 for r in rows)
    # packing is contiguous: per (fmt, shard) stream, seq_ids start at
    # 0 with no gaps
    by_stream: dict[tuple, list] = {}
    for r in rows:
        by_stream.setdefault((r.fmt, r.shard), []).append(r.seq_id)
    for ids in by_stream.values():
        assert sorted(ids) == list(range(len(ids)))


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=600),
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=16),
)
def test_png_roundtrip_property(data, w, h):
    """For ARBITRARY payload bytes and dims, encode->decode must
    restore exactly the truncated/zero-padded pixel buffer — the
    filter math (incl. Paeth tie-breaks and the 0-byte/1-px edges)
    has no data-dependent escape hatch."""
    p = decode_media(encode_media(data, "png", width=w, height=h), "png")
    assert p["pixels"] == (data + b"\x00" * (w * h))[: w * h]
    assert (p["width"], p["height"]) == (w, h)


def test_jpeg_roundtrip_within_provable_bound():
    """Baseline JPEG encode->decode must land every pixel within the
    provable quantization bound (sum(Q)/8 + 2). Dims cover the block
    edge cases: non-multiple-of-8 both ways, single pixel, exact MCU
    grid."""
    from mapreducegcp_spark.operators.multimodal import JPEG_ERR_BOUND

    data = bytes((i * 37 + 11) % 256 for i in range(700))
    for w, h in [(12, 6), (32, 16), (17, 11), (1, 1), (8, 8), (9, 7)]:
        p = decode_media(encode_media(data, "jpeg", width=w, height=h), "jpeg")
        assert (p["width"], p["height"]) == (w, h)
        assert p["n_blocks"] == ((w + 7) // 8) * ((h + 7) // 8)
        expected = (data + b"\x00" * (w * h))[: w * h]
        assert len(p["pixels"]) == w * h
        err = max(
            (abs(a - b) for a, b in zip(p["pixels"], expected)), default=0
        )
        assert err <= JPEG_ERR_BOUND, (w, h, err)


def test_jpeg_flat_block_decodes_near_exact():
    # A constant image is pure DC; quantized DC error is at most
    # q_00/2 scaled by the basis amplitude (1/8) -> off by <= 1.
    p = decode_media(encode_media(b"\x80" * 64, "jpeg", width=8, height=8), "jpeg")
    assert all(abs(b - 0x80) <= 1 for b in p["pixels"])


def test_jpeg_color_roundtrip_within_bound():
    """4:4:4 YCbCr color round-trip. Per-channel YCbCr error obeys the
    grayscale quantization bound B = sum(Q)/8; the YCbCr->RGB matrix
    amplifies it by at most 1 + 1.772 = 2.772 (the largest row L1 norm
    over the chroma terms plus the Y term), and final rounding adds 1
    — so |RGB error| <= 2.772*B + slack. White-noise RGB is the worst
    case; dims cover partial MCUs."""
    import numpy as np

    from mapreducegcp_spark.operators.multimodal import JPEG_QTAB

    bound = int(2.772 * (sum(JPEG_QTAB) / 8)) + 3
    rng = np.random.RandomState(7)
    for w, h in [(19, 13), (8, 8), (1, 1), (24, 9)]:
        rgb = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        p = decode_media(
            encode_media(rgb.tobytes(), "jpeg", width=w, height=h, channels=3),
            "jpeg",
        )
        assert (p["width"], p["height"], p["channels"]) == (w, h, 3)
        assert p["n_blocks"] == ((w + 7) // 8) * ((h + 7) // 8)
        assert len(p["pixels"]) == w * h * 3
        got = np.frombuffer(p["pixels"], np.uint8).reshape(h, w, 3).astype(int)
        err = int(np.abs(got - rgb.astype(int)).max())
        assert err <= bound, (w, h, err, bound)
    # smooth content (the realistic case) reconstructs much tighter
    yy, xx = np.mgrid[0:13, 0:19]
    smooth = np.stack(
        [(xx * 9) % 256, (yy * 11) % 256, ((xx + yy) * 5) % 256], axis=-1
    ).astype(np.uint8)
    p = decode_media(
        encode_media(smooth.tobytes(), "jpeg", width=19, height=13, channels=3),
        "jpeg",
    )
    got = np.frombuffer(p["pixels"], np.uint8).reshape(13, 19, 3).astype(int)
    assert int(np.abs(got - smooth.astype(int)).max()) <= 8


def test_jpeg_color_interop_with_imageio(spark):
    """A completely independent decoder (the JVM's javax.imageio via
    py4j — zero shared code) must accept the color bytes and
    reconstruct the source within a small tolerance: a malformed SOS
    component binding, MCU interleave, or YCbCr matrix would either
    make ImageIO reject the stream or land far from the source."""
    import numpy as np

    w, h = 16, 9
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [(xx * 16) % 256, (yy * 25) % 256, (xx * 3 + yy * 7) % 256], axis=-1
    ).astype(np.uint8)
    payload = encode_media(rgb.tobytes(), "jpeg", width=w, height=h, channels=3)
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(payload))
    )
    assert img is not None, "ImageIO rejected the stream"
    assert (img.getWidth(), img.getHeight()) == (w, h)
    worst = 0
    for y in range(h):
        for x in range(w):
            pix = img.getRGB(x, y)
            worst = max(
                worst,
                abs(((pix >> 16) & 255) - int(rgb[y, x, 0])),
                abs(((pix >> 8) & 255) - int(rgb[y, x, 1])),
                abs((pix & 255) - int(rgb[y, x, 2])),
            )
    assert worst <= 12, worst  # smooth content: quantization-level only


def test_jpeg_420_roundtrip_and_imageio_agreement(spark):
    """4:2:0 — the profile virtually every real-world JPEG uses. On
    smooth content (chroma smoothness is the profile's own premise)
    the self round-trip must stay near the source, the stream must be
    SMALLER than its 4:4:4 twin (the point of subsampling), and
    javax.imageio must decode our 4:2:0 bytes close to the source."""
    import numpy as np

    w, h = 37, 22
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [(xx * 5 + 40) % 256, (yy * 7 + 10) % 256, ((xx + yy) * 3) % 256],
        axis=-1,
    ).astype(np.uint8)
    p420 = encode_media(
        rgb.tobytes(), "jpeg", width=w, height=h, channels=3, subsampling="420"
    )
    p444 = encode_media(rgb.tobytes(), "jpeg", width=w, height=h, channels=3)
    assert len(p420) < len(p444)
    d = decode_media(p420, "jpeg")
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    assert d["n_blocks"] == ((w + 15) // 16) * ((h + 15) // 16)  # 16x16 MCUs
    got = np.frombuffer(d["pixels"], np.uint8).reshape(h, w, 3).astype(int)
    assert int(np.abs(got - rgb.astype(int)).max()) <= 16
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(p420))
    )
    assert img is not None and (img.getWidth(), img.getHeight()) == (w, h)
    worst = 0
    for y in range(h):
        for x in range(w):
            pix = img.getRGB(x, y)
            worst = max(
                worst,
                abs(((pix >> 16) & 255) - int(rgb[y, x, 0])),
                abs(((pix >> 8) & 255) - int(rgb[y, x, 1])),
                abs((pix & 255) - int(rgb[y, x, 2])),
            )
    assert worst <= 16, worst


def test_jpeg_extended_sampling_profiles_roundtrip_and_imageio(spark):
    """4:1:1 (DV-video stills: chroma quartered horizontally, 32x8
    MCUs) and 4:4:0 (chroma halved vertically) — the rest of the T.81
    integer-ratio sampling space beyond 4:2:2/4:2:0 (round 8; the
    former `sampling factors beyond 1-2` seam). Self round-trip near
    the source on smooth content, both streams smaller than the 4:4:4
    twin, and javax.imageio (independent decoder, zero shared code)
    accepts both and lands near the source too."""
    import numpy as np

    from mapreducegcp_spark.operators.multimodal import decode_media, encode_media

    w, h = 37, 22
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [(xx * 5 + 40) % 256, (yy * 7 + 10) % 256, ((xx + yy) * 3) % 256],
        axis=-1,
    ).astype(np.uint8)
    p444 = encode_media(rgb.tobytes(), "jpeg", width=w, height=h, channels=3)
    jvm = spark._jvm
    for sub, mcu_w, mcu_h in (("411", 32, 8), ("440", 8, 16)):
        p = encode_media(
            rgb.tobytes(), "jpeg", width=w, height=h, channels=3, subsampling=sub
        )
        assert len(p) < len(p444), sub
        d = decode_media(p, "jpeg")
        assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
        assert d["n_blocks"] == (
            (w + mcu_w - 1) // mcu_w * ((h + mcu_h - 1) // mcu_h)
        ), sub
        got = np.frombuffer(d["pixels"], np.uint8).reshape(h, w, 3).astype(int)
        assert int(np.abs(got - rgb.astype(int)).max()) <= 24, sub
        img = jvm.javax.imageio.ImageIO.read(
            jvm.java.io.ByteArrayInputStream(bytearray(p))
        )
        assert img is not None and (img.getWidth(), img.getHeight()) == (w, h), sub
        worst = 0
        for y in range(h):
            for x in range(w):
                pix = img.getRGB(x, y)
                worst = max(
                    worst,
                    abs(((pix >> 16) & 255) - int(rgb[y, x, 0])),
                    abs(((pix >> 8) & 255) - int(rgb[y, x, 1])),
                    abs((pix & 255) - int(rgb[y, x, 2])),
                )
        assert worst <= 24, (sub, worst)


def test_jpeg_fractional_sampling_mix_is_an_explicit_seam():
    """A 3x-against-2x component mix has a fractional upsampling ratio;
    T.81 permits it but no mainstream encoder emits it (libjpeg
    rejects it outright). The decoder must name the seam, not decode
    garbage: a handcrafted SOF with factors (3,1)/(2,1)/(1,1) must
    raise NotImplementedError from the finalize ratio check."""
    import numpy as np
    import pytest

    from mapreducegcp_spark.operators.multimodal import decode_media, encode_media

    # take a real 4:4:4 stream and rewrite its SOF sampling bytes:
    # comp0 (3,1), comp1 (2,1), comp2 (1,1) — parse passes (1..4),
    # finalize must refuse the 3/2 ratio
    w, h = 24, 8
    rgb = (np.indices((h, w)).sum(0) % 256).astype(np.uint8)
    rgb = np.stack([rgb] * 3, axis=-1)
    p = bytearray(
        encode_media(rgb.tobytes(), "jpeg", width=w, height=h, channels=3)
    )
    i = p.find(b"\xff\xc0")
    assert i >= 0
    # SOF0 body: len(2) prec(1) h(2) w(2) nc(1) then per-comp 3 bytes
    base = i + 2 + 2 + 1 + 4 + 1
    p[base + 1] = 0x31  # comp 0: h=3, v=1
    p[base + 4] = 0x21  # comp 1: h=2, v=1
    p[base + 7] = 0x11  # comp 2: h=1, v=1
    with pytest.raises((NotImplementedError, ValueError)) as exc:
        decode_media(bytes(p), "jpeg")
    # the scan bytes no longer match the declared geometry, so the
    # entropy decoder may hit a framing error before finalize — both
    # are loud; what must NOT happen is silent wrong pixels
    assert exc.type in (NotImplementedError, ValueError)


def test_jpeg_ingests_imageio_written_420_file(spark):
    """The ingest receipt: javax.imageio WRITES a color JPEG with its
    default settings (baseline 4:2:0, two quant tables, its own
    Huffman choices — nothing shared with our encoder) and OUR decoder
    must parse and reconstruct it near the source. This is the decode
    path a real pipeline runs on crawled images."""
    import numpy as np

    jvm = spark._jvm
    w, h = 32, 24
    img = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [(xx * 7) % 256, (yy * 9) % 256, ((xx + yy) * 4) % 256], axis=-1
    ).astype(int)
    for y in range(h):
        for x in range(w):
            img.setRGB(
                x, y,
                (int(rgb[y, x, 0]) << 16)
                | (int(rgb[y, x, 1]) << 8)
                | int(rgb[y, x, 2]),
            )
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "jpg", baos)
    payload = bytes(baos.toByteArray())
    # confirm the file really is subsampled (else this test is vacuous)
    i = payload.find(b"\xff\xc0")
    assert payload[i + 2 + 2 + 1 + 4 + 1 + 1] == 0x22, "ImageIO wrote 4:4:4?"
    d = decode_media(payload, "jpeg")
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    got = np.frombuffer(d["pixels"], np.uint8).reshape(h, w, 3).astype(int)
    assert int(np.abs(got - rgb).max()) <= 20


def test_jpeg_422_subsampling_roundtrip(spark):
    """4:2:2 (horizontal-only chroma decimation, the broadcast-video
    profile) exercises the asymmetric (2,1) sampling path the 4:2:0
    tests never hit: MCU = 2 Y blocks + Cb + Cr over 16x8 pixels. The
    stream must be smaller than 4:4:4 and larger than 4:2:0, round-trip
    near the source on smooth content, and decode in javax.imageio."""
    import numpy as np

    w, h = 37, 22
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [(xx * 5 + 40) % 256, (yy * 7 + 10) % 256, ((xx + yy) * 3) % 256],
        axis=-1,
    ).astype(np.uint8)
    sizes = {}
    for sub in ("444", "422", "420"):
        p = encode_media(
            rgb.tobytes(), "jpeg", width=w, height=h, channels=3,
            subsampling=sub,
        )
        sizes[sub] = len(p)
        if sub != "422":
            continue
        d = decode_media(p, "jpeg")
        assert d["n_blocks"] == ((w + 15) // 16) * ((h + 7) // 8)  # 16x8 MCUs
        got = np.frombuffer(d["pixels"], np.uint8).reshape(h, w, 3).astype(int)
        assert int(np.abs(got - rgb.astype(int)).max()) <= 16
        jvm = spark._jvm
        img = jvm.javax.imageio.ImageIO.read(
            jvm.java.io.ByteArrayInputStream(bytearray(p))
        )
        assert img is not None and (img.getWidth(), img.getHeight()) == (w, h)
    assert sizes["420"] < sizes["422"] < sizes["444"]


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn — the recovery structure camera JPEGs carry. The
    encoder must byte-align, emit RSTn in cyclic order, and reset DC
    predictors; the decoder must split the scan on RST boundaries and
    reconstruct EXACTLY as well as the unrestarted stream (white-noise
    worst case stays inside the provable bound at every interval)."""
    import numpy as np

    from mapreducegcp_spark.operators.multimodal import JPEG_ERR_BOUND

    rng = np.random.RandomState(3)
    w, h = 40, 24  # 15 MCUs at 8x8 — several restart intervals
    g = rng.randint(0, 256, (h, w), dtype=np.uint8)
    base = decode_media(
        encode_media(g.tobytes(), "jpeg", width=w, height=h), "jpeg"
    )["pixels"]
    for interval in (1, 2, 7):
        p = encode_media(
            g.tobytes(), "jpeg", width=w, height=h, restart_interval=interval
        )
        assert b"\xff\xdd" in p  # DRI present
        d = decode_media(p, "jpeg")
        # restart markers change the framing, not the coefficients:
        # the reconstruction must be IDENTICAL to the unrestarted one
        assert d["pixels"] == base
        got = np.frombuffer(d["pixels"], np.uint8).astype(int)
        assert int(np.abs(got - g.astype(int).ravel()).max()) <= JPEG_ERR_BOUND
    # color 4:2:0 with restarts, and a corrupt-sequence probe
    rgb = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    p = encode_media(
        rgb.tobytes(), "jpeg", width=w, height=h, channels=3,
        subsampling="420", restart_interval=2,
    )
    d = decode_media(p, "jpeg")
    assert (d["channels"], len(d["pixels"])) == (3, w * h * 3)
    i = p.find(b"\xff\xd0")  # first RST0 -> RST5: out of sequence
    assert i > 0
    with pytest.raises(ValueError):
        decode_media(p[:i + 1] + b"\xd5" + p[i + 2 :], "jpeg")


def test_jpeg_16bit_quant_table_decodes():
    """Extended-precision DQT (pq=1, 16-bit entries): rewrite our own
    stream's 8-bit table as big-endian 16-bit with identical values —
    the decoder must parse the wide layout and reconstruct the exact
    same pixels."""
    import struct

    blob = encode_media(bytes(i % 256 for i in range(400)), "jpeg",
                        width=20, height=16)
    base = decode_media(blob, "jpeg")["pixels"]
    i = blob.find(b"\xff\xdb")
    (ln,) = struct.unpack(">H", blob[i + 2 : i + 4])
    assert ln == 2 + 1 + 64  # one 8-bit table
    vals = blob[i + 5 : i + 5 + 64]
    wide = (
        b"\xff\xdb"
        + struct.pack(">H", 2 + 1 + 128)
        + bytes([0x10 | (blob[i + 4] & 15)])
        + b"".join(struct.pack(">H", v) for v in vals)
    )
    patched = blob[:i] + wide + blob[i + 2 + ln :]
    assert decode_media(patched, "jpeg")["pixels"] == base


def test_jpeg_sampling_out_of_t81_range_raises():
    """Sampling factors 1-4 are now SUPPORTED (round 8 closed the
    former beyond-1-2 seam; see the 4:1:1/4:4:0 round-trip test), so
    the loud-contract pin moves to the T.81 A.1.1 bound itself:
    factors of 0 or above 4 are malformed streams and must raise
    ValueError rather than misinterpret the MCU layout."""
    blob = encode_media(
        bytes(300), "jpeg", width=10, height=10, channels=3
    )
    i = blob.find(b"\xff\xc0")
    # SOF0 body: len(2) prec(1) h(2) w(2) nc(1) then (id, samp, qid)*3
    samp_off = i + 2 + 2 + 1 + 4 + 1 + 1  # first component's sampling byte
    assert blob[samp_off] == 0x11
    for bad in (b"\x55", b"\x01", b"\x10"):  # 5x5, h=0, v=0
        patched = blob[:samp_off] + bad + blob[samp_off + 1 :]
        with pytest.raises(ValueError):
            decode_media(patched, "jpeg")


def _imageio_progressive_bytes(jvm, arr, gray=False):
    """Write `arr` as a PROGRESSIVE JPEG with the JVM's ImageIO writer
    — its default progression (10 scans for color: DC-first +
    spectral-selection AC bands + successive-approximation refinements,
    4:2:0 for color). Gray goes through the RASTER (get/setRGB on
    TYPE_BYTE_GRAY applies an sRGB<->linear gamma conversion that
    would poison the comparison)."""
    h, w = arr.shape[:2]
    t = (
        jvm.java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        if gray
        else jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    img = jvm.java.awt.image.BufferedImage(w, h, t)
    if gray:
        raster = img.getRaster()
        for y in range(h):
            for x in range(w):
                raster.setSample(x, y, 0, int(arr[y, x]))
    else:
        for y in range(h):
            for x in range(w):
                img.setRGB(
                    x, y,
                    (int(arr[y, x, 0]) << 16)
                    | (int(arr[y, x, 1]) << 8)
                    | int(arr[y, x, 2]),
                )
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    param = writer.getDefaultWriteParam()
    param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
    ios.flush()
    return bytes(baos.toByteArray())


def test_jpeg_progressive_gray_matches_imageio_decode(spark):
    """PROGRESSIVE ingest, exactness receipt: a grayscale progressive
    file (no chroma upsampling in play) decoded by us and by ImageIO
    from the SAME bytes must agree within IDCT rounding (<= 2) — the
    strongest possible cross-decoder check of the successive-
    approximation coefficient reconstruction, on white noise (the
    densest scan content)."""
    import numpy as np

    jvm = spark._jvm
    rng = np.random.RandomState(11)
    g = rng.randint(0, 256, (21, 30), dtype=np.uint8)
    payload = _imageio_progressive_bytes(jvm, g, gray=True)
    assert b"\xff\xc2" in payload  # really progressive
    d = decode_media(payload, "jpeg")
    assert (d["width"], d["height"], d["channels"]) == (30, 21, 1)
    got = np.frombuffer(d["pixels"], np.uint8).reshape(21, 30).astype(int)
    img2 = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(payload))
    )
    r2 = img2.getRaster()
    ref = np.array(
        [[r2.getSample(x, y, 0) for x in range(30)] for y in range(21)], int
    )
    assert int(np.abs(got - ref).max()) <= 2


def test_jpeg_progressive_color_ingest(spark):
    """Progressive COLOR ingest (ImageIO's default 10-scan 4:2:0
    progression): smooth chroma (no wrap seams — our nearest-neighbor
    chroma upsample and ImageIO's interpolating one agree only where
    chroma is locally smooth) must land near the source at several
    sizes including partial MCUs. Truncation must raise."""
    import numpy as np

    jvm = spark._jvm
    for w, h in [(17, 13), (32, 24), (16, 16)]:
        yy, xx = np.mgrid[0:h, 0:w]
        rgb = np.stack(
            [
                np.minimum(xx * 6 + 10, 255),
                np.minimum(yy * 7 + 5, 255),
                np.minimum(xx * 2 + yy * 3, 255),
            ],
            axis=-1,
        ).astype(np.uint8)
        payload = _imageio_progressive_bytes(jvm, rgb)
        assert b"\xff\xc2" in payload
        d = decode_media(payload, "jpeg")
        assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
        got = np.frombuffer(d["pixels"], np.uint8).reshape(h, w, 3).astype(int)
        assert int(np.abs(got - rgb.astype(int)).max()) <= 20, (w, h)
    with pytest.raises(ValueError):
        decode_media(payload[: len(payload) // 2], "jpeg")


def test_jpeg_fill_bytes_before_markers_tolerated():
    """ITU T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker (some camera firmware pads segments). Injecting fill before
    SOF and SOS must not change the decode, in both the baseline and
    progressive marker walks."""
    blob = encode_media(bytes(range(200)), "jpeg", width=16, height=10)
    base = decode_media(blob, "jpeg")["pixels"]
    for marker in (b"\xff\xc0", b"\xff\xda"):
        i = blob.find(marker)
        padded = blob[:i] + b"\xff\xff\xff" + blob[i:]
        assert decode_media(padded, "jpeg")["pixels"] == base


def test_jpeg_adobe_rgb_components_skip_ycc_transform():
    """A 3-component frame whose components are 'R','G','B' (the Adobe
    layout, or APP14 transform=0) must NOT go through the YCbCr
    inverse matrix — running RGB planes through it is a silent
    misdecode. Witness: encode an achromatic color image (R=G=B=v):
    its YCbCr planes are (v, 128, 128). Relabel the components R,G,B —
    a correct passthrough decode returns channel 0 ~= v and channels
    1/2 pinned near 128, while the (wrong) YCbCr path would return
    ~(v,v,v). An APP14 transform=1 marker must force YCbCr back on."""
    import numpy as np

    w, h = 16, 8
    v = np.tile(np.arange(0, 256, 16, dtype=np.uint8), (h, 1))
    rgb = np.stack([v, v, v], axis=-1)
    blob = encode_media(rgb.tobytes(), "jpeg", width=w, height=h, channels=3)
    normal = np.frombuffer(
        decode_media(blob, "jpeg")["pixels"], np.uint8
    ).reshape(h, w, 3).astype(int)
    assert int(np.abs(normal - rgb.astype(int)).max()) <= 8  # sanity

    # relabel component ids 1,2,3 -> 'R','G','B' in SOF and SOS
    relabeled = bytearray(blob)
    i = blob.find(b"\xff\xc0")
    # marker(2) + len(2) + prec(1) + h(2) + w(2) + nc(1) -> first cid
    for k, cid in enumerate(b"RGB"):
        relabeled[i + 10 + 3 * k] = cid
    j = blob.find(b"\xff\xda")
    for k, cid in enumerate(b"RGB"):
        relabeled[j + 2 + 2 + 1 + 2 * k] = cid
    d = decode_media(bytes(relabeled), "jpeg")
    rgb_pass = np.frombuffer(d["pixels"], np.uint8).reshape(h, w, 3).astype(int)
    assert int(np.abs(rgb_pass[..., 0] - v.astype(int)).max()) <= 8
    assert int(np.abs(rgb_pass[..., 1:] - 128).max()) <= 8

    # APP14 transform=1 overrides the component-id heuristic
    app14 = b"\xff\xee" + (12 + 2).to_bytes(2, "big") + b"Adobe" + bytes(6) + b"\x01"
    with_app14 = bytes(relabeled[:2]) + app14 + bytes(relabeled[2:])
    back = np.frombuffer(
        decode_media(with_app14, "jpeg")["pixels"], np.uint8
    ).reshape(h, w, 3).astype(int)
    assert (back == normal).all()


def test_jpeg_corrupt_and_profile_errors():
    blob = encode_media(b"abc" * 50, "jpeg", width=16, height=10)
    with pytest.raises(ValueError):
        decode_media(b"XX" + blob[2:], "jpeg")  # bad magic
    with pytest.raises(ValueError):
        decode_media(b"\xff\xd8\xff\xd9", "jpeg")  # no scan
    with pytest.raises(ValueError):
        decode_media(blob[: len(blob) // 2], "jpeg")  # truncated mid-header
    with pytest.raises(ValueError):
        decode_media(blob[:-2], "jpeg")  # EOI stripped
    i = blob.find(b"\xff\xc0")
    with pytest.raises(NotImplementedError):  # lossless SOF3
        decode_media(blob[: i + 1] + b"\xc3" + blob[i + 2 :], "jpeg")
    # a sequential scan header (Ss=0, Se=63) inside a PROGRESSIVE frame
    # is spec-invalid spectral selection — must be rejected, not
    # misread as a DC scan
    with pytest.raises(ValueError):
        decode_media(blob[: i + 1] + b"\xc2" + blob[i + 2 :], "jpeg")


@settings(max_examples=40, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=600),
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=16),
)
def test_jpeg_roundtrip_property(data, w, h):
    """For ARBITRARY payload bytes and dims the lossy round-trip must
    stay inside the provable reconstruction bound — white noise is
    JPEG's worst case, so hypothesis probes exactly the adversarial
    region where a subtle Huffman/DCT bug would blow past it."""
    from mapreducegcp_spark.operators.multimodal import JPEG_ERR_BOUND

    p = decode_media(encode_media(data, "jpeg", width=w, height=h), "jpeg")
    assert (p["width"], p["height"]) == (w, h)
    expected = (data + b"\x00" * (w * h))[: w * h]
    err = max((abs(a - b) for a, b in zip(p["pixels"], expected)), default=0)
    assert err <= JPEG_ERR_BOUND


def test_jpeg_roundtrip_query_gate(spark, sf_dir):
    from mapreducegcp_spark.operators.multimodal import (
        JPEG_ERR_BOUND,
        q_multimodal_jpeg_roundtrip,
    )

    rows = q_multimodal_jpeg_roundtrip(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.within_tol, r
        assert r.err_bound == JPEG_ERR_BOUND
        assert r.n_blocks == ((r.width + 7) // 8) * ((r.height + 7) // 8)


def test_image_source_interop_both_codecs(spark, sf_dir):
    """The JVM's ImageIO (via Spark's image source) must accept and
    correctly decode files written by BOTH in-repo codecs — an
    independent-decoder spec-compliance check, not a self-roundtrip."""
    from mapreducegcp_spark.operators.multimodal import (
        q_multimodal_image_source_interop,
    )

    rows = q_multimodal_image_source_interop(spark, sf_dir).collect()
    assert rows
    assert {r.fmt for r in rows} == {"png", "jpeg"}
    for r in rows:
        assert r.pixels_ok, r


@settings(max_examples=150, deadline=None)
@given(tail=st.binary(min_size=0, max_size=120))
def test_jpeg_decode_fuzz_raises_only_contract_errors(tail):
    """The public codec seam promises ValueError (corrupt bytes) or
    NotImplementedError (unsupported profile) — never IndexError /
    struct.error / zlib.error. Arbitrary bytes after a valid magic
    exercise every marker-walk branch."""
    try:
        decode_media(b"\xff\xd8" + tail, "jpeg")
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=150, deadline=None)
@given(
    bodies=st.lists(
        st.tuples(
            st.sampled_from([b"IHDR", b"PLTE", b"tRNS", b"IDAT", b"IEND", b"teXt"]),
            st.binary(min_size=0, max_size=25),
        ),
        min_size=1,
        max_size=4,
    )
)
def test_png_decode_fuzz_raises_only_contract_errors(bodies):
    """PNG twin of the JPEG fuzz, with VALID chunk CRCs so malformed
    content reaches the parse logic instead of dying at the CRC gate
    (this fuzz found a struct.error on short IHDR bodies)."""
    import struct
    import zlib

    payload = bytearray(b"\x89PNG\r\n\x1a\n")
    for typ, body in bodies:
        payload += (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )
    try:
        decode_media(bytes(payload), "png")
    except (ValueError, NotImplementedError):
        pass
