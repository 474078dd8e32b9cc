"""COCO-style annotation reader + instance-GT data path."""

import os

import numpy as np
import pytest

from mingraph_unet_tpu.data.annotations import (
    CocoAnnotations,
    YieldImageDataset,
    write_coco_json,
)


def _write_fixture(tmp_path):
    import cv2

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    img = np.full((40, 60, 3), 80, np.uint8)
    cv2.imwrite(str(img_dir / "a.png"), img)
    cv2.imwrite(str(img_dir / "b.png"), img)
    images = [
        {"id": 1, "file_name": "a.png", "height": 40, "width": 60},
        {"id": 2, "file_name": "b.png", "height": 40, "width": 60},
    ]
    annotations = [
        {  # diamond polygon
            "id": 10, "image_id": 1, "category_id": 0,
            "bbox": [10.0, 5.0, 20.0, 20.0],
            "segmentation": [[20, 5, 30, 15, 20, 25, 10, 15]],
            "iscrowd": 0,
        },
        {  # bbox-only, occluded via attributes
            "id": 11, "image_id": 1, "category_id": 0,
            "bbox": [40.0, 20.0, 10.0, 8.0],
            "attributes": {"occluded": True},
        },
        {"id": 12, "image_id": 2, "category_id": 0, "bbox": [0.0, 0.0, 5.0, 5.0],
         "iscrowd": 1},
    ]
    ann_path = write_coco_json(str(tmp_path / "ann.json"), images, annotations)
    return str(img_dir), ann_path


class TestCocoAnnotations:
    def test_objects_schema(self, tmp_path):
        _, ann_path = _write_fixture(tmp_path)
        ann = CocoAnnotations(ann_path)
        objs = ann.objects_for(1)
        assert len(objs) == 2
        assert objs[0]["bbox"] == [10.0, 5.0, 30.0, 25.0]
        assert objs[0]["occluded"] is False
        assert objs[1]["occluded"] is True
        assert ann.objects_for(2)[0]["occluded"] is True  # iscrowd

    def test_instance_masks_polygon_and_bbox(self, tmp_path):
        _, ann_path = _write_fixture(tmp_path)
        ann = CocoAnnotations(ann_path)
        masks = ann.instance_masks_for(1)
        assert masks.shape == (2, 40, 60)
        # Diamond interior point in, exterior corner of its bbox out.
        assert masks[0, 15, 20] == 1
        assert masks[0, 6, 11] == 0
        # bbox-only instance fills its rectangle.
        assert masks[1, 21, 41] == 1 and masks[1, 21, 39] == 0
        # Diamond area ≈ half its bounding box.
        assert 120 < masks[0].sum() < 300

    def test_max_instances_and_resize(self, tmp_path):
        _, ann_path = _write_fixture(tmp_path)
        ann = CocoAnnotations(ann_path)
        m = ann.instance_masks_for(1, out_hw=(20, 30), max_instances=4)
        assert m.shape == (4, 20, 30)
        assert m[2].sum() == 0 and m[3].sum() == 0  # padding slots
        m1 = ann.instance_masks_for(1, max_instances=1)
        assert m1.shape == (1, 40, 60) and m1[0].sum() > 0  # largest kept


class TestYieldImageDataset:
    def test_dummy_schema_parity(self, tmp_path):
        img_dir, ann_path = _write_fixture(tmp_path)
        ds = YieldImageDataset(img_dir, ann_path)
        assert len(ds) == 2
        img, count, objects = ds[0]
        assert img.shape == (40, 60, 3) and img.dtype == np.uint8
        assert count == 2
        assert set(objects[0]) == {"bbox", "class_id", "occluded"}

    def test_yield_eval_on_real_files(self, tmp_path):
        from mingraph_unet_tpu.experiments.yield_estimation_performance import (
            evaluate_yield_model,
        )

        img_dir, ann_path = _write_fixture(tmp_path)
        results = evaluate_yield_model(
            model_type="mock", image_dir=img_dir, ann_file=ann_path
        )
        assert "count_accuracy_perc" in results
        assert np.isfinite(results["yield_estimation_error_perc"])


class TestInstanceTraining:
    def test_dataset_emits_instances(self, tmp_path):
        from mingraph_unet_tpu.data.dataset import BatchLoader, MangoDataset
        from mingraph_unet_tpu.utils.bootstrap import make_dummy_run

        cfg_dir = make_dummy_run(
            str(tmp_path), num_images=4, image_size=(32, 32), batch_size=2,
            patch_size=8, with_annotations=True,
        )
        data_root = os.path.join(str(tmp_path), "data")
        ds = MangoDataset(
            image_dir=os.path.join(data_root, "train", "images"),
            mask_dir=os.path.join(data_root, "train", "masks"),
            image_size=(32, 32),
            annotations_file=os.path.join(data_root, "train", "annotations.json"),
            max_instances=8,
        )
        img, mask, inst = ds[0]
        assert inst.shape == (8, 32, 32) and inst.dtype == np.uint8
        # Instance union ⊇ most of the semantic mask (polygon vs raster edges).
        overlap = (inst.any(0) & (mask == 1)).sum() / max(1, (mask == 1).sum())
        assert overlap > 0.7
        batch = next(iter(BatchLoader(ds, 2, shuffle=False).epoch(0)))
        assert len(batch) == 3 and batch[2].shape == (2, 8, 32, 32)

    @pytest.mark.slow
    def test_e2e_trains_with_instance_gt(self, tmp_path):
        import yaml

        from mingraph_unet_tpu.train.end_to_end import train_end_to_end
        from mingraph_unet_tpu.utils.bootstrap import make_dummy_run

        cfg_dir = make_dummy_run(
            str(tmp_path), num_images=4, image_size=(32, 32), batch_size=2,
            num_epochs=1, patch_size=8, init_features=4, depth=2,
            with_annotations=True,
        )
        mc = yaml.safe_load(open(os.path.join(cfg_dir, "model.yaml")))
        mc["fusion_detection"]["use_dense_detection"] = True
        mc["fusion_detection"]["max_instances"] = 8
        yaml.safe_dump(mc, open(os.path.join(cfg_dir, "model.yaml"), "w"))
        state, history = train_end_to_end(cfg_dir, max_epochs=1)
        assert np.isfinite(history["epoch_loss"][0])
        assert int(state.step) == 2

        # Both detectors evaluate on the real annotated files end-to-end:
        # CC instancing vs the learned dense head (VERDICT round-1 item 8).
        from mingraph_unet_tpu.experiments.yield_estimation_performance import (
            evaluate_yield_model,
        )

        data_root = os.path.join(str(tmp_path), "data")
        img_dir = os.path.join(data_root, "train", "images")
        ann_file = os.path.join(data_root, "train", "annotations.json")
        weights = os.path.join(str(tmp_path), "checkpoints")
        for model_type in ("mingraph-unet", "mingraph-unet-dense"):
            res = evaluate_yield_model(
                cfg_dir, weights, model_type=model_type,
                image_dir=img_dir, ann_file=ann_file,
            )
            assert np.isfinite(res["count_accuracy_perc"]), model_type
