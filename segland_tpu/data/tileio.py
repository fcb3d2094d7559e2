"""Host-side GeoTIFF tile I/O.

rasterio (GDAL) is used when available — matching the reference's geo-profile
copy + colormap export (eval_base.py:180-191).  Without rasterio: reads go
through the native C++ decoder (segland_tpu/native) with PIL as last resort,
and prediction exports use the in-repo GeoTIFF writer (data/geotiff.py),
which copies the source tile's geo tags so outputs stay georeferenced.
"""

import os
import numpy as np

try:
    import rasterio  # type: ignore

    # guard against injected import stubs (tests stub rasterio to import the
    # torch reference; a stub without .open must not select this path)
    HAS_RASTERIO = hasattr(rasterio, "open")
except ImportError:
    rasterio = None
    HAS_RASTERIO = False

from PIL import Image

from .. import native as _native

# 12-class OEM colormap (reference eval_base.py:32-45)
OEM_COLORMAP = {
    0: (147, 147, 147),
    1: (49, 139, 87),
    2: (0, 255, 0),
    3: (128, 0, 0),
    4: (75, 181, 73),
    5: (245, 245, 245),
    6: (35, 91, 200),
    7: (247, 142, 82),
    8: (166, 166, 171),
    9: (3, 7, 255),
    10: (255, 242, 0),
    11: (170, 255, 0),
}

# eval_ft saturates novel-class colors (reference eval_ft.py:44-47)
OEM_COLORMAP_FT = dict(OEM_COLORMAP)
OEM_COLORMAP_FT.update({8: (255, 0, 255), 9: (0, 0, 255), 10: (255, 255, 0), 11: (0, 255, 255)})


def read_image(path: str) -> np.ndarray:
    """Read an image tile -> [H,W,C] uint8 (RGB band order as stored)."""
    if HAS_RASTERIO:
        arr = rasterio.open(path).read()  # [C,H,W]
        return np.rollaxis(arr, 0, 3)
    arr = _native.decode(path)  # C++ decoder (native/tiffdec.cpp); None -> PIL
    if arr is None:
        arr = np.asarray(Image.open(path))
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr[:, :, :3] if arr.shape[2] > 3 else arr


def read_label(path: str) -> np.ndarray:
    """Read a label tile -> [H,W] int."""
    if HAS_RASTERIO:
        return rasterio.open(path).read()[0]
    arr = _native.decode(path)
    if arr is None:
        arr = np.asarray(Image.open(path))
    if arr.ndim == 3:
        arr = arr[:, :, 0]
    return arr


def write_pred_tiff(path: str, pred: np.ndarray, colormap=None, profile_from: str | None = None):
    """Write a uint8 class-index prediction as colormapped GTiff
    (reference eval_base.py:180-189).  Without rasterio, the in-repo
    GeoTIFF writer copies the source tile's geo tags (pixel scale,
    tiepoints, geokeys) so outputs stay georeferenced."""
    pred = np.asarray(pred, dtype=np.uint8)
    colormap = colormap or OEM_COLORMAP
    if HAS_RASTERIO and profile_from and os.path.exists(profile_from):
        profile = rasterio.open(profile_from).profile.copy()
        profile.update(driver="GTiff", dtype="uint8", count=1, nodata=0)
        with rasterio.open(path, "w", **profile) as f:
            f.write(pred, 1)
            f.write_colormap(1, colormap)
        return
    from .geotiff import read_geo_tags, write_palette_geotiff

    geo = read_geo_tags(profile_from) if profile_from and os.path.exists(profile_from) else {}
    write_palette_geotiff(path, pred, colormap, geo)


def write_prob_mat(path: str, probs_nchw: np.ndarray):
    """Per-tile probability map as .mat with key 'outputs'
    (reference eval_base.py:190-191; NCHW layout preserved for fusemat
    byte-compatibility)."""
    import scipy.io

    scipy.io.savemat(path, {"outputs": np.asarray(probs_nchw)})


def read_prob_mat(path: str) -> np.ndarray:
    import scipy.io

    return scipy.io.loadmat(path)["outputs"]
