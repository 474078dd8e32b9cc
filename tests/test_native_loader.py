"""Native C++ decode/resize loader tests (skipped if the toolchain can't
build the shared library)."""

import os

import numpy as np
import pytest

from mingraph_unet_tpu.data import native_loader as nl
from mingraph_unet_tpu.data.dataset import BatchLoader, MangoDataset

pytestmark = pytest.mark.skipif(not nl.available(), reason="native library unavailable")


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    import cv2

    base = tmp_path_factory.mktemp("native")
    img_dir = base / "images"
    mask_dir = base / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 256, (60, 80, 3), np.uint8)
        mask = rng.integers(0, 3, (60, 80), np.uint8)
        cv2.imwrite(str(img_dir / f"{i}.png"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(mask_dir / f"{i}.png"), mask)
    return str(img_dir), str(mask_dir)


class TestNativeDecode:
    def test_decode_exact_vs_cv2(self, png_dir):
        import cv2

        img_dir, _ = png_dir
        path = os.path.join(img_dir, "0.png")
        ours = nl.load_image(path, (60, 80))
        ref = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        np.testing.assert_array_equal(ours, ref)

    def test_bilinear_resize_close_to_cv2(self, png_dir):
        import cv2

        img_dir, _ = png_dir
        path = os.path.join(img_dir, "1.png")
        ours = nl.load_image(path, (32, 48))
        ref = cv2.resize(
            cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB), (48, 32),
            interpolation=cv2.INTER_LINEAR,
        )
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1

    def test_mask_nearest_exact(self, png_dir):
        import cv2

        _, mask_dir = png_dir
        path = os.path.join(mask_dir, "2.png")
        ours = nl.load_mask(path, (32, 48))
        ref = cv2.resize(
            cv2.imread(path, cv2.IMREAD_GRAYSCALE), (48, 32),
            interpolation=cv2.INTER_NEAREST,
        )
        np.testing.assert_array_equal(ours, ref)

    def test_missing_file(self):
        assert nl.load_image("/nonexistent/x.png", (8, 8)) is None

    def test_batch_loader_native_matches_cv2_path(self, png_dir):
        img_dir, mask_dir = png_dir
        ds_native = MangoDataset(img_dir, mask_dir, image_size=(60, 80), use_native=True)
        ds_cv2 = MangoDataset(img_dir, mask_dir, image_size=(60, 80), use_native=False)
        b_native = next(BatchLoader(ds_native, 4, shuffle=False).epoch(0))
        b_cv2 = next(BatchLoader(ds_cv2, 4, shuffle=False).epoch(0))
        np.testing.assert_array_equal(b_native[0], b_cv2[0])
        np.testing.assert_array_equal(b_native[1], b_cv2[1])
