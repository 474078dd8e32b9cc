"""Guards for the accuracy-run pipeline (outputs/RESULTS.md): the synthetic
orchard generator's contracts, and a mini train→eval pass through the same
code path `scripts/run_results.py` drives (VERDICT r2 missing #1)."""

import json
import os

import numpy as np
import pytest


class TestOrchardGenerator:
    def test_split_contents_and_annotations(self, tmp_path):
        from mingraph_unet_tpu.data.annotations import CocoAnnotations
        from mingraph_unet_tpu.data.synthetic import generate_orchard_split

        ann_file = generate_orchard_split(
            str(tmp_path / "train"), num_images=6, image_size=(64, 64), seed=3,
            occlusion_prob=0.8,
        )
        assert os.path.exists(ann_file)
        with open(ann_file) as f:
            data = json.load(f)
        assert len(data["images"]) == 6
        assert len(data["annotations"]) >= 6  # >= min_fruits per image

        # Boxes are inside the frame; occlusion flags present (high prob).
        occluded = 0
        for a in data["annotations"]:
            x, y, w, h = a["bbox"]
            assert 0 <= x and 0 <= y and x + w <= 64 and y + h <= 64
            assert len(a["segmentation"][0]) >= 6  # polygon, not bbox-only
            occluded += bool(a.get("attributes", {}).get("occluded"))
        assert occluded > 0

        # The reader consumes what the generator writes.
        ann = CocoAnnotations(ann_file)
        masks = ann.instance_masks_for(0, max_instances=8)
        assert masks.shape == (8, 64, 64)
        assert masks.any()

    def test_semantic_mask_subset_of_amodal_instances(self, tmp_path):
        """Visible (semantic) fruit pixels lie inside the union of amodal
        instance polygons — occlusion only removes pixels."""
        import cv2

        from mingraph_unet_tpu.data.annotations import CocoAnnotations
        from mingraph_unet_tpu.data.synthetic import generate_orchard_split

        ann_file = generate_orchard_split(
            str(tmp_path / "t"), num_images=3, image_size=(64, 64), seed=11
        )
        ann = CocoAnnotations(ann_file)
        for i in range(3):
            mask = cv2.imread(
                str(tmp_path / "t" / "masks" / f"img_{i:05d}.png"), cv2.IMREAD_GRAYSCALE
            )
            amodal = ann.instance_masks_for(i).any(axis=0)
            visible = mask > 0
            # Rasterization of the polygon outline differs from cv2.ellipse
            # fill by a sub-pixel rim; allow a tiny tolerance.
            outside = visible & ~amodal
            assert outside.mean() < 0.01

    def test_splits_disjoint_seeds(self, tmp_path):
        import cv2

        from mingraph_unet_tpu.data.synthetic import generate_orchard_dataset

        generate_orchard_dataset(
            str(tmp_path), num_train=2, num_val=2, num_test=2, image_size=(32, 32)
        )
        a = cv2.imread(str(tmp_path / "train" / "images" / "img_00000.png"))
        b = cv2.imread(str(tmp_path / "val" / "images" / "img_00000.png"))
        assert not np.array_equal(a, b)


class TestMiniResultsRun:
    @pytest.mark.slow
    def test_train_and_eval_tables_mini(self, tmp_path):
        """One tiny pass through the Tables-1/2 machinery on the synthetic
        orchard data: train the full pipeline briefly, then run both eval
        harnesses from the written checkpoints — the same call path as
        scripts/run_results.py, which produced outputs/RESULTS.md."""
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
        import run_results

        from mingraph_unet_tpu.data.synthetic import generate_orchard_dataset
        from mingraph_unet_tpu.experiments.segmentation_performance import (
            evaluate_segmentation_model,
        )
        from mingraph_unet_tpu.experiments.yield_estimation_performance import (
            evaluate_yield_model,
        )
        from mingraph_unet_tpu.train.end_to_end import train_end_to_end

        root = str(tmp_path / "run")
        data_root = os.path.join(root, "data")
        generate_orchard_dataset(
            data_root, num_train=4, num_val=0, num_test=2, image_size=(64, 64)
        )
        cfg_dir = run_results.write_config_dir(
            os.path.join(root, "configs"), data_root, (64, 64),
            epochs=1, batch_size=2, lr_step=1,
            ckpt_dir=os.path.join(root, "ckpt"), log_dir=os.path.join(root, "logs"),
            use_dense=True, scan_window=1,
        )
        train_end_to_end(cfg_dir, max_steps_per_epoch=2)

        t1 = evaluate_segmentation_model(cfg_dir, os.path.join(root, "ckpt"),
                                         "mingraph-unet", batch_size=2)
        assert 0.0 <= t1["mean_iou"] <= 1.0

        t2 = evaluate_yield_model(
            cfg_dir, os.path.join(root, "ckpt"), model_type="mingraph-unet",
            num_images=2,
            image_dir=os.path.join(data_root, "test", "images"),
            ann_file=os.path.join(data_root, "test", "annotations.json"),
        )
        assert "count_accuracy_perc" in t2 and "yield_estimation_error_perc" in t2


class TestValueStudyMachinery:
    """Guards for scripts/run_value_study.py (the graph-branch value study)."""

    def _scripts(self):
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

    def test_write_config_dir_patch_size_roundtrip(self, tmp_path):
        self._scripts()
        import run_results

        from mingraph_unet_tpu.config import PipelineConfig

        cfg_dir = run_results.write_config_dir(
            str(tmp_path / "configs"), str(tmp_path), (96, 96),
            epochs=1, batch_size=2, lr_step=1, patch_size=8,
            ckpt_dir=str(tmp_path / "ck"), log_dir=str(tmp_path / "lg"),
            scan_window=1,
        )
        cfg = PipelineConfig.from_config_dir(cfg_dir)
        assert cfg.model.graph_construction.patch_size == 8
        assert cfg.preprocessing.resize_dim == (96, 96)

    def test_render_markdown_includes_scene_and_refined_rows(self):
        self._scripts()
        import run_value_study as vs

        seg = {"mean_iou": 0.5, "iou_per_class": [0.9, 0.1]}
        results = {
            "scene": {"occlusion_prob": 0.5, "clutter": 3.0,
                      "lighting_strength": 1.4, "min_fruits": 2, "max_fruits": 7,
                      "train_only": {"label_noise": 0.25}},
            "config": {"num_train": 320, "num_test": 200, "image_size": 96,
                       "patch_size": 8, "epochs": 12, "warmup_epochs": 6,
                       "batch_size": 16},
            "rows": {
                "unet": {"segmentation": seg,
                         "cc_counting": {"count_accuracy_perc": 50.0,
                                         "yield_estimation_error_perc": 50.0,
                                         "ap50_perc": 10.0}},
                "full_default": {"segmentation": seg,
                                 "segmentation_refined": seg,
                                 "cc_counting": {}, "dense_head": {}},
                "broken": {"error": "RuntimeError: boom"},
            },
            "wall_clock_sec": 1.0,
        }
        results["blend_sweep"] = {
            "full_default": {
                "γ=0.1": {"mean_iou": 0.6, "iou_per_class": [0.9, 0.3]},
                "γ=0.5, τ=0.01": {"error": "ValueError: x"},
            }
        }
        md = vs.render_markdown(results)
        assert "label noise 0.25" in md
        assert "patch size 8" in md
        assert "graph-refined eval" in md
        assert "failed: RuntimeError: boom" in md
        assert "Regime calibration" in md
        assert "Verdict vs the U-Net baseline" in md
        assert "+0.00" in md or "-0.00" in md or "0.0000" in md  # delta rows render
        assert "Blend-mechanism envelope" in md
        assert "γ=0.1 | 0.6000 | 0.3000" in md
        assert "failed: ValueError: x" in md
