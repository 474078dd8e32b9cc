import os

import numpy as np
import pytest

from mingraph_unet_tpu.data.dataset import BatchLoader, MangoDataset
from mingraph_unet_tpu.experiments import metrics as M


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    import cv2

    base = tmp_path_factory.mktemp("ds")
    img_dir = base / "images"
    mask_dir = base / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        cv2.imwrite(str(img_dir / f"{i:03d}.png"), rng.integers(0, 255, (40, 50, 3)).astype(np.uint8))
        cv2.imwrite(str(mask_dir / f"{i:03d}.png"), rng.integers(0, 2, (40, 50)).astype(np.uint8))
    return str(img_dir), str(mask_dir)


class TestMangoDataset:
    def test_pairing_and_shapes(self, tiny_dataset):
        img_dir, mask_dir = tiny_dataset
        ds = MangoDataset(img_dir, mask_dir, image_size=(32, 32), num_classes=2)
        assert len(ds) == 5
        img, mask = ds[0]
        assert img.shape == (32, 32, 3) and img.dtype == np.uint8
        assert mask.shape == (32, 32) and mask.dtype == np.int32
        assert mask.max() <= 1

    def test_missing_masks_dummy(self, tiny_dataset, capsys):
        img_dir, _ = tiny_dataset
        ds = MangoDataset(img_dir, None, image_size=(16, 16))
        _, mask = ds[0]
        assert mask.sum() == 0
        assert "dummy" in capsys.readouterr().out

    def test_count_mismatch_raises(self, tiny_dataset, tmp_path):
        import cv2

        img_dir, _ = tiny_dataset
        bad_masks = tmp_path / "bad_masks"
        bad_masks.mkdir()
        cv2.imwrite(str(bad_masks / "only_one.png"), np.zeros((8, 8), np.uint8))
        with pytest.raises(ValueError, match="mismatch"):
            MangoDataset(img_dir, str(bad_masks))

    def test_empty_dir_raises(self, tmp_path):
        (tmp_path / "empty").mkdir()
        with pytest.raises(FileNotFoundError):
            MangoDataset(str(tmp_path / "empty"))

    def test_strict_vs_lenient(self, tiny_dataset, tmp_path):
        import cv2

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        cv2.imwrite(str(img_dir / "ok.png"), np.zeros((8, 8, 3), np.uint8))
        ds = MangoDataset(str(img_dir), None, image_size=(8, 8))
        ds.image_paths[0] = str(img_dir / "gone.png")  # simulate corruption
        with pytest.raises(FileNotFoundError):
            ds[0]
        ds.strict = False
        img, mask = ds[0]
        assert img.sum() == 0  # zero substitution, logged not hidden

    def test_loader_epochs_deterministic(self, tiny_dataset):
        img_dir, mask_dir = tiny_dataset
        ds = MangoDataset(img_dir, mask_dir, image_size=(16, 16))
        loader = BatchLoader(ds, batch_size=2, shuffle=True, drop_last=True, seed=3)
        assert len(loader) == 2
        a = [b[0].sum() for b in loader.epoch(0)]
        b = [b[0].sum() for b in loader.epoch(0)]
        c = [b[0].sum() for b in loader.epoch(1)]
        assert a == b
        assert a != c  # different epoch, different order (w.h.p.)


class TestSegmentationMetrics:
    def test_matches_sklearn_confusion(self):
        from sklearn.metrics import confusion_matrix as sk_cm

        rng = np.random.default_rng(1)
        t = rng.integers(0, 3, 500)
        p = rng.integers(0, 3, 500)
        ours = M.confusion_matrix(t, p, 3)
        np.testing.assert_array_equal(ours, sk_cm(t, p, labels=[0, 1, 2]))

    def test_perfect_prediction(self):
        t = np.array([0, 1, 1, 0, 1])
        r = M.segmentation_metrics(t, t, 2)
        assert r["mean_iou"] > 0.999
        assert r["mean_f1"] > 0.999

    def test_toy_case_reference_values(self):
        # Reference __main__ toy case (metrics.py:255-262).
        t = np.array([0, 1, 0, 1, 1, 0])
        p = np.array([0, 1, 1, 1, 0, 0])
        r = M.segmentation_metrics(t, p, 2)
        # cm = [[2,1],[1,2]]: per-class IoU = 2/4.
        np.testing.assert_allclose(r["iou_per_class"], [0.5, 0.5], atol=1e-5)

    def test_missing_class_smoothing(self):
        t = np.zeros(10, int)
        p = np.zeros(10, int)
        r = M.segmentation_metrics(t, p, 3)
        # Absent classes: smoothing keeps metrics defined (≈1 with 0/0+s).
        assert np.isfinite(r["mean_iou"])


class TestDetectionMetrics:
    def test_box_iou(self):
        assert M.calculate_iou([0, 0, 10, 10], [0, 0, 10, 10]) == 1.0
        assert M.calculate_iou([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0
        np.testing.assert_allclose(
            M.calculate_iou([0, 0, 10, 10], [5, 0, 15, 10]), 50 / 150, atol=1e-6
        )

    def test_map_placeholder_and_ap(self):
        gt = [[{"bbox": [0, 0, 10, 10], "class_id": 0}]]
        pred_good = [[{"bbox": [1, 1, 10, 10], "class_id": 0, "confidence": 0.9}]]
        pred_bad = [[{"bbox": [50, 50, 60, 60], "class_id": 0, "confidence": 0.9}]]
        assert M.object_detection_map(gt, pred_good) > M.object_detection_map(gt, pred_bad)
        assert M.average_precision(gt, pred_good) == 1.0
        assert M.average_precision(gt, pred_bad) == 0.0


class TestYieldMetrics:
    def test_exact_counts(self):
        r = M.yield_estimation_metrics([5, 3], [5, 3])
        np.testing.assert_allclose(r["count_accuracy_perc"], 100.0, atol=1e-3)
        np.testing.assert_allclose(r["yield_estimation_error_perc"], 0.0, atol=1e-6)

    def test_count_accuracy_formula(self):
        # 100 * (1 - |ΣP - ΣG| / ΣG) — reference metrics.py:189.
        r = M.yield_estimation_metrics([10], [8])
        np.testing.assert_allclose(r["count_accuracy_perc"], 80.0, atol=1e-3)

    def test_matching_and_occlusion(self):
        gt = [
            [
                {"bbox": [0, 0, 10, 10], "class_id": 0, "occluded": True},
                {"bbox": [20, 20, 30, 30], "class_id": 0, "occluded": False},
            ]
        ]
        pred = [[{"bbox": [0, 0, 10, 10], "class_id": 0, "confidence": 0.9}]]
        r = M.yield_estimation_metrics([2], [1], gt, pred)
        np.testing.assert_allclose(r["object_matching_rate_perc"], 50.0, atol=1e-3)
        np.testing.assert_allclose(r["occlusion_robustness_perc"], 100.0, atol=1e-3)


class TestDataCollection:
    """D2/D3 behavioral roundtrip (reference ``frame_extractor.py:10-52``):
    write a synthetic video with cv2.VideoWriter, extract every Nth frame,
    check count, per-video subdir, and naming."""

    def test_frame_extractor_roundtrip(self, tmp_path):
        import cv2

        from mingraph_unet_tpu.data.collection import FrameExtractor

        video_path = str(tmp_path / "clip.mp4")
        writer = cv2.VideoWriter(
            video_path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48)
        )
        n_frames = 10
        for i in range(n_frames):
            frame = np.full((48, 64, 3), i * 20, np.uint8)
            writer.write(frame)
        writer.release()

        out_dir = str(tmp_path / "frames")
        extractor = FrameExtractor(frame_interval=3, image_format="png")
        saved = extractor.extract_frames(video_path, out_dir)
        # Frames 0, 3, 6, 9 — every-Nth semantics incl. frame 0.
        assert saved == 4
        frame_dir = os.path.join(out_dir, "clip")
        names = sorted(os.listdir(frame_dir))
        assert names == [
            "clip_frame000000.png", "clip_frame000003.png",
            "clip_frame000006.png", "clip_frame000009.png",
        ]
        # Frames decode back and carry the written content (tolerate codec
        # loss: mp4v is lossy, so check brightness ordering, not equality).
        imgs = [cv2.imread(os.path.join(frame_dir, n)) for n in names]
        means = [float(im.mean()) for im in imgs]
        assert all(b > a + 10 for a, b in zip(means, means[1:])), means

    def test_frame_extractor_missing_file(self, tmp_path):
        from mingraph_unet_tpu.data.collection import FrameExtractor

        with pytest.raises(FileNotFoundError):
            FrameExtractor().extract_frames(str(tmp_path / "nope.mp4"), str(tmp_path))

    def test_frame_extractor_rejects_bad_format(self):
        from mingraph_unet_tpu.data.collection import FrameExtractor

        with pytest.raises(ValueError):
            FrameExtractor(image_format="bmp")


class TestDevicePreprocessBatch:
    """The packed binary-mask augmentation fast path (num_classes=2) vs the
    exact per-pass nearest path (num_classes=None): same transform draws, same
    image pixels, geometrically matching masks/instances."""

    def _batch(self, b=2, h=48, w=48):
        import jax.numpy as jnp

        rng = np.random.default_rng(7)
        imgs = jnp.asarray(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))
        # Smooth blob masks (a disc per image) so path divergence is boundary-only.
        yy, xx = np.mgrid[:h, :w]
        masks = np.stack([
            ((yy - 20 - 3 * i) ** 2 + (xx - 24) ** 2 < 144).astype(np.int32)
            for i in range(b)
        ])
        return imgs, jnp.asarray(masks)

    def test_binary_fast_path_matches_nearest_geometry(self):
        import jax
        import jax.numpy as jnp

        from mingraph_unet_tpu.data.dataset import device_preprocess_batch

        imgs, masks = self._batch()
        key = jax.random.key(3)
        mean, std = (0.5, 0.5, 0.5), (0.25, 0.25, 0.25)
        i_fast, m_fast = device_preprocess_batch(
            key, imgs, masks, mean, std, augment=True, num_classes=2)
        i_ref, m_ref = device_preprocess_batch(
            key, imgs, masks, mean, std, augment=True, num_classes=None)
        # Image pixels: identical math (the packed channels don't perturb the
        # RGB contraction values).
        np.testing.assert_allclose(np.asarray(i_fast), np.asarray(i_ref),
                                   atol=1e-4)
        # Masks: labels stay binary and the two warps agree except at the
        # resampled boundary (IoU of the rotated discs).
        mf, mr = np.asarray(m_fast), np.asarray(m_ref)
        assert set(np.unique(mf)).issubset({0, 1})
        inter = np.logical_and(mf == 1, mr == 1).sum()
        union = np.logical_or(mf == 1, mr == 1).sum()
        assert union > 0 and inter / union > 0.9, inter / union

    def test_binary_fast_path_instances_track_mask(self):
        import jax
        import jax.numpy as jnp

        from mingraph_unet_tpu.data.dataset import device_preprocess_batch

        imgs, masks = self._batch()
        # One instance channel per image equal to the mask itself: after the
        # synced augment it must equal the augmented mask exactly (identical
        # packed-channel math).
        instances = masks[:, None, :, :]
        key = jax.random.key(11)
        mean, std = (0.5, 0.5, 0.5), (0.25, 0.25, 0.25)
        _, m_fast, inst_fast = device_preprocess_batch(
            key, imgs, masks, mean, std, augment=True, instances=instances,
            num_classes=2)
        np.testing.assert_array_equal(
            np.asarray(inst_fast[:, 0]), np.asarray(m_fast))
        assert inst_fast.dtype == jnp.int32

    def test_multiclass_keeps_exact_nearest_path(self):
        import jax

        from mingraph_unet_tpu.data.dataset import device_preprocess_batch

        imgs, masks = self._batch()
        masks = masks * 2  # labels {0, 2}: 3-class label space
        key = jax.random.key(5)
        mean, std = (0.5, 0.5, 0.5), (0.25, 0.25, 0.25)
        _, m3 = device_preprocess_batch(
            key, imgs, masks, mean, std, augment=True, num_classes=3)
        _, mn = device_preprocess_batch(
            key, imgs, masks, mean, std, augment=True, num_classes=None)
        np.testing.assert_array_equal(np.asarray(m3), np.asarray(mn))
        assert set(np.unique(np.asarray(m3))).issubset({0, 2})
