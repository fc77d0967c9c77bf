"""Native C++ decoder vs PIL parity and crop semantics."""

import numpy as np
import pytest
from PIL import Image

from color_transfer_tpu.data import native_loader


@pytest.fixture
def png_path(tmp_path, rng):
    arr = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8)
    path = tmp_path / "img.png"
    Image.fromarray(arr).save(path)
    return path, arr


class TestNativeLoader:
    def test_available(self):
        assert native_loader.available(), "native imageio failed to build/load"

    def test_info(self, png_path):
        path, arr = png_path
        assert native_loader.image_info(path) == arr.shape[:2]

    def test_decode_matches_pil(self, png_path):
        path, arr = png_path
        got = native_loader.read_image(path)
        np.testing.assert_array_equal(got, arr)

    def test_crop_decode(self, png_path):
        path, arr = png_path
        got = native_loader.read_image_crop(path, 5, 7, 16, 20)
        np.testing.assert_array_equal(got, arr[5:21, 7:27])

    def test_jpeg_roundtrip(self, tmp_path, rng):
        arr = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
        path = tmp_path / "img.jpg"
        Image.fromarray(arr).save(path, quality=95)
        got = native_loader.read_image(path)
        want = np.asarray(Image.open(path).convert("RGB"))
        np.testing.assert_array_equal(got, want)

    def test_grayscale_png_promoted(self, tmp_path, rng):
        arr = rng.integers(0, 255, (12, 14), dtype=np.uint8)
        path = tmp_path / "gray.png"
        Image.fromarray(arr, mode="L").save(path)
        got = native_loader.read_image(path)
        assert got.shape == (12, 14, 3)
        np.testing.assert_array_equal(got[..., 0], arr)

    def test_rgba_png_stripped(self, tmp_path, rng):
        arr = rng.integers(0, 255, (10, 11, 4), dtype=np.uint8)
        path = tmp_path / "rgba.png"
        Image.fromarray(arr, mode="RGBA").save(path)
        got = native_loader.read_image(path)
        np.testing.assert_array_equal(got, arr[..., :3])

    def test_bounds_error(self, png_path):
        path, arr = png_path
        with pytest.raises(IOError):
            native_loader.read_image_crop(path, 30, 50, 16, 20)

    def test_missing_file(self, tmp_path):
        with pytest.raises(IOError):
            native_loader.read_image(tmp_path / "nope.png")
