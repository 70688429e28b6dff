"""Native (C++) image loader: parity with the Python path and fallbacks."""
import glob
import os

import numpy as np
import pytest

DATA = "/root/reference/data/teaser_car-turn"


@pytest.fixture(scope="module")
def native():
    mod = pytest.importorskip("fatezero_tpu.native")
    if mod.get_lib() is None:
        pytest.skip("native loader not buildable here")
    return mod


def test_exact_at_native_resolution(native):
    paths = sorted(glob.glob(os.path.join(DATA, "*.png")))[:4]
    out = native.load_batch(paths, 512)  # source is 512x512: no resample
    from fatezero_tpu.common.image_util import load_image_folder

    ref = np.stack(load_image_folder(DATA)[:4]).astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_downscale_close_to_python(native):
    paths = sorted(glob.glob(os.path.join(DATA, "*.png")))[:2]
    out = native.load_batch(paths, 64)
    assert out.shape == (2, 64, 64, 3)
    assert -1.0 <= out.min() and out.max() <= 1.0
    from fatezero_tpu.common.image_util import load_image_folder
    from fatezero_tpu.data import transform as T

    frames = np.stack(load_image_folder(DATA)[:2])
    ref = T.center_crop(T.short_size_scale(frames, 64), 64, 64) / 127.5 - 1.0
    # area-average vs torch antialias-bilinear: close but not identical
    assert np.abs(out - ref).mean() < 0.03


def test_missing_file_falls_back(native):
    assert native.load_batch(["/no/such/image.png"], 64) is None


def test_dataset_uses_fast_path(native):
    from fatezero_tpu.data.dataset import ImageSequenceDataset

    ds = ImageSequenceDataset(path=DATA, n_sample_frame=2, image_size=512)
    imgs = ds[0]["images"]
    assert imgs.shape == (2, 512, 512, 3)
    assert imgs.dtype == np.float32
