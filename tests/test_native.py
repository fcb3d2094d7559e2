"""Native C++ TIFF decoder vs PIL ground truth (segland_tpu/native)."""

import struct
import zlib

import numpy as np
import pytest
from PIL import Image

from segland_tpu import native


pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native tiffdec unavailable (no g++?)")


def _rand_rgb(seed, h=57, w=43):
    return np.random.RandomState(seed).randint(0, 255, (h, w, 3), np.uint8)


@pytest.mark.parametrize("compression", [None, "tiff_deflate", "tiff_lzw", "packbits"])
@pytest.mark.parametrize("gray", [False, True])
def test_decode_matches_pil(tmp_path, compression, gray):
    arr = _rand_rgb(1)
    if gray:
        arr = arr[..., 0]
    path = tmp_path / "t.tif"
    kw = {"compression": compression} if compression else {}
    Image.fromarray(arr).save(path, **kw)
    out = native.decode(path)
    assert out is not None, f"native decode failed for {compression}"
    np.testing.assert_array_equal(out, np.asarray(Image.open(path)))


def test_decode_big_endian(tmp_path):
    # PIL writes little-endian only; build a big-endian file by hand
    arr = _rand_rgb(2)
    path = _write_tiff(tmp_path / "be.tif", arr, big_endian=True)
    out = native.decode(path)
    assert out is not None
    np.testing.assert_array_equal(out, arr)


def _write_tiff(path, arr, *, big_endian=False, tiled=False, tile=32,
                predictor=1, compression=1):
    """Minimal TIFF writer (strips or tiles, optional deflate + predictor 2)
    to cover GDAL-style layouts PIL cannot produce."""
    h, w = arr.shape[:2]
    c = 1 if arr.ndim == 2 else arr.shape[2]
    px = arr.reshape(h, w, c)
    e = ">" if big_endian else "<"

    def pack_payload(block):  # block: [bh, bw, c] uint8
        data = block.copy()
        if predictor == 2:
            data = data.astype(np.int16)
            data[:, 1:, :] -= data[:, :-1, :]
            data = (data % 256).astype(np.uint8)
        raw = data.tobytes()
        if compression == 8:
            return zlib.compress(raw)
        assert compression == 1
        return raw

    payloads = []
    if tiled:
        ty = -(-h // tile)
        tx = -(-w // tile)
        for j in range(ty):
            for i in range(tx):
                block = np.zeros((tile, tile, c), np.uint8)
                sub = px[j * tile:(j + 1) * tile, i * tile:(i + 1) * tile]
                block[: sub.shape[0], : sub.shape[1]] = sub
                payloads.append(pack_payload(block))
    else:
        rps = max(1, h // 3)  # multiple strips
        for y0 in range(0, h, rps):
            payloads.append(pack_payload(px[y0:y0 + rps]))

    # layout: header(8) | IFD | out-of-line values | payload offsets | payloads
    entries = []

    def add(tagid, typ, cnt, val=None, data=None):
        entries.append([tagid, typ, cnt, val, data])

    add(256, 3, 1, w)
    add(257, 3, 1, h)
    if c == 1:
        add(258, 3, 1, 8)
    else:
        add(258, 3, c, None, struct.pack(f"{e}{c}H", *([8] * c)))
    add(259, 3, 1, compression)
    add(262, 3, 1, 2 if c == 3 else 1)
    add(277, 3, 1, c)
    if predictor == 2:
        add(317, 3, 1, 2)
    counts_fmt = f"{e}{len(payloads)}I"
    if tiled:
        add(322, 3, 1, tile)
        add(323, 3, 1, tile)
        add(324, 4, len(payloads), None, b"OFFSETS")
        add(325, 4, len(payloads), None, struct.pack(counts_fmt, *[len(p) for p in payloads]))
    else:
        rps = max(1, h // 3)
        add(273, 4, len(payloads), None, b"OFFSETS")
        add(278, 3, 1, rps)
        add(279, 4, len(payloads), None, struct.pack(counts_fmt, *[len(p) for p in payloads]))
    entries.sort(key=lambda x: x[0])

    ifd_off = 8
    ifd_size = 2 + len(entries) * 12 + 4
    data_off = ifd_off + ifd_size
    # assign offsets for out-of-line values
    blobs = []
    for ent in entries:
        if ent[4] is not None and ent[4] != b"OFFSETS":
            size = len(ent[4])
            if size <= 4:
                ent[3] = int.from_bytes(ent[4].ljust(4, b"\0"),
                                        "big" if big_endian else "little")
                ent[4] = None
            else:
                ent[3] = data_off
                blobs.append(ent[4])
                data_off += size
    # payload offsets table
    payload_table_off = data_off
    data_off += 4 * len(payloads)
    payload_offs = []
    for p in payloads:
        payload_offs.append(data_off)
        data_off += len(p)
    for ent in entries:
        if ent[4] == b"OFFSETS":
            if len(payloads) == 1:
                ent[3] = payload_offs[0]
            else:
                ent[3] = payload_table_off
            ent[4] = None

    out = bytearray()
    out += (b"MM\0*" if big_endian else b"II*\0")
    out += struct.pack(f"{e}I", ifd_off)
    out += struct.pack(f"{e}H", len(entries))
    for tagid, typ, cnt, val, _ in entries:
        out += struct.pack(f"{e}HHI", tagid, typ, cnt)
        if typ == 3 and cnt == 1:
            out += struct.pack(f"{e}HH", val, 0)
        else:
            out += struct.pack(f"{e}I", val)
    out += struct.pack(f"{e}I", 0)  # next IFD
    for b in blobs:
        out += b
    out += struct.pack(counts_fmt, *payload_offs)
    for p in payloads:
        out += p
    with open(path, "wb") as f:
        f.write(bytes(out))
    return path


@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.parametrize("predictor", [1, 2])
def test_decode_gdal_style(tmp_path, tiled, predictor):
    """Tiled organization + deflate + horizontal predictor (GDAL defaults)."""
    arr = _rand_rgb(3, h=70, w=45)
    path = _write_tiff(tmp_path / "g.tif", arr, tiled=tiled,
                       predictor=predictor, compression=8)
    out = native.decode(path)
    assert out is not None
    np.testing.assert_array_equal(out, arr)


def test_decode_batch_and_normalize(tmp_path):
    from segland_tpu.data import augment as A

    paths = []
    arrs = []
    for i in range(5):
        a = _rand_rgb(10 + i, h=40, w=40)
        p = tmp_path / f"b{i}.tif"
        Image.fromarray(a).save(p, compression="tiff_deflate")
        paths.append(str(p))
        arrs.append(a)
    batch = native.decode_batch(paths, 40, 40, 3)
    assert batch is not None
    np.testing.assert_array_equal(batch, np.stack(arrs))

    mean, std = A.IMAGENET_MEAN, A.IMAGENET_STD
    fused = native.decode_normalize_batch(paths, 40, 40, mean, std)
    assert fused is not None
    ref = np.stack([A.normalize(a, mean, std) for a in arrs])
    np.testing.assert_allclose(fused, ref, atol=1e-5)


def test_unsupported_falls_back(tmp_path):
    arr = np.random.RandomState(0).randint(0, 65535, (16, 16), np.uint16)
    path = tmp_path / "u16.tif"
    Image.fromarray(arr).save(path)
    assert native.decode(path) is None  # 16-bit unsupported -> caller uses PIL
    from segland_tpu.data.tileio import read_label

    lab = read_label(str(path))
    assert lab.shape == (16, 16)  # PIL fallback still works


def test_tileio_uses_native(tmp_path):
    from segland_tpu.data.tileio import read_image

    arr = _rand_rgb(4)
    path = tmp_path / "img.tif"
    Image.fromarray(arr).save(path, compression="tiff_lzw")
    np.testing.assert_array_equal(read_image(str(path)), arr)


def test_batch_wrong_dims_no_write(tmp_path):
    """A wrong-sized tile in a batch must fail cleanly BEFORE writing
    (regression: the dim check used to run after decode -> heap overflow)."""
    arr = _rand_rgb(7, h=64, w=64)
    p = tmp_path / "big.tif"
    Image.fromarray(arr).save(p)
    sentinel = np.full((1, 16, 16, 3), 0xAB, np.uint8)
    out = native.decode_batch([str(p)], 16, 16, 3, out=sentinel)
    assert out is None
    assert (sentinel == 0xAB).all()  # untouched


def test_decode_bogus_header_returns_none(tmp_path):
    """Corrupt/bogus dims must return None (PIL fallback), never raise."""
    # ImageWidth tag with a huge value
    p = tmp_path / "bogus.tif"
    arr = _rand_rgb(8, h=8, w=8)
    _write_tiff(p, arr)
    data = bytearray(p.read_bytes())
    # find the width entry (tag 256) and blow it up
    import struct as _s
    n = _s.unpack("<H", data[8:10])[0]
    for k in range(n):
        off = 10 + k * 12
        if _s.unpack("<H", data[off:off + 2])[0] == 256:
            data[off + 8:off + 12] = _s.pack("<I", 0x80000000)
    p.write_bytes(bytes(data))
    assert native.decode(p) is None


def test_geotiff_writer_roundtrip(tmp_path):
    """write_palette_geotiff: PIL and the native decoder read back the class
    map; geo tags copied from a source tile survive the roundtrip."""
    from segland_tpu.data.geotiff import read_geo_tags, write_palette_geotiff, GEO_TAGS
    from segland_tpu.data.tileio import OEM_COLORMAP, write_pred_tiff

    # source tile carrying geo tags (pixel scale + tiepoint + geokeys)
    src = tmp_path / "src.tif"
    pred = np.random.RandomState(11).randint(0, 12, (40, 30)).astype(np.uint8)
    geo = {
        33550: (12, struct.pack("<3d", 0.5, 0.5, 0.0)),
        33922: (12, struct.pack("<6d", 0, 0, 0, 100000.0, 200000.0, 0)),
        34735: (3, struct.pack("<8H", 1, 1, 0, 1, 1024, 0, 1, 1)),
        34737: (2, b"WGS 84|\x00"),
    }
    write_palette_geotiff(src, pred, OEM_COLORMAP, geo)

    # read back: pixels (both readers) + palette + geo tags
    assert np.array_equal(np.asarray(Image.open(src)), pred)
    assert np.array_equal(native.decode(src), pred)
    got = read_geo_tags(src)
    assert got == geo
    pal = Image.open(src).getpalette()
    assert tuple(pal[3:6]) == OEM_COLORMAP[1]

    # the tileio export path copies geo tags from profile_from
    out = tmp_path / "pred.tif"
    write_pred_tiff(str(out), pred, OEM_COLORMAP, profile_from=str(src))
    assert read_geo_tags(out) == geo
    assert np.array_equal(np.asarray(Image.open(out)), pred)
