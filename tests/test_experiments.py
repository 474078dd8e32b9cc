"""Evaluation-harness integration tests (tiny models, CPU)."""

import os

import numpy as np
import pytest

from mingraph_unet_tpu.experiments.ablation_study import ABLATION_VARIANTS, run_ablation_study
from mingraph_unet_tpu.experiments.yield_estimation_performance import (
    DummyYieldDataset,
    MockDetector,
    evaluate_yield_model,
)
from mingraph_unet_tpu.utils.bootstrap import make_dummy_run


class TestYieldHarness:
    def test_dummy_dataset_schema(self):
        ds = DummyYieldDataset(num_images=3, seed=1)
        img, count, objects = ds[0]
        assert img.shape == (128, 128, 3)
        assert count == len(objects)
        assert {"bbox", "class_id", "occluded"} <= set(objects[0])

    def test_mock_detector_schema(self):
        dets = MockDetector(seed=2)(np.zeros((64, 64, 3), np.uint8))
        for d in dets:
            assert {"bbox", "class_id", "confidence"} <= set(d)

    def test_mock_evaluation_runs(self, capsys):
        res = evaluate_yield_model(model_type="mock", num_images=4, seed=0)
        assert "count_accuracy_perc" in res
        assert "Yield Estimation Performance" in capsys.readouterr().out


class TestAblation:
    def test_variants_table(self):
        assert "Combined (Full Method)" in ABLATION_VARIANTS

    def test_mock_study_labeled(self, capsys):
        rows = run_ablation_study(allow_mock=True)
        assert len(rows) == 5
        assert all(r["mocked"] for r in rows)
        assert "Table-3" in capsys.readouterr().out

    def test_no_mock_raises_cleanly(self):
        from mingraph_unet_tpu.experiments.ablation_study import run_ablation_experiment

        with pytest.raises(FileNotFoundError):
            run_ablation_experiment("Min-Cut Only", None, None, allow_mock=False)

    @pytest.mark.slow
    def test_trained_table3_two_variants(self, tmp_path, capsys):
        """End-to-end Table 3: train two genuinely different architectures on
        a synthetic annotated dataset, evaluate with the yield harness — the
        path the reference only mocks (ablation_study.py:43-51)."""
        from mingraph_unet_tpu.experiments.ablation_study import run_ablation_study_trained

        rows = run_ablation_study_trained(
            str(tmp_path), variants=["graph_construction", "combined"],
            num_images=4, image_size=(32, 32), epochs=1, eval_images=4,
        )
        assert len(rows) == 2
        assert all(not r["mocked"] for r in rows)
        assert all(np.isfinite(r["count_accuracy_perc"]) for r in rows)
        assert "TRAINED" in capsys.readouterr().out


class TestSegmentationPerformance:
    def test_eval_after_training(self, tmp_path, capsys):
        from mingraph_unet_tpu.experiments.segmentation_performance import (
            evaluate_segmentation_model,
        )
        from mingraph_unet_tpu.train.segmentation import train_unet_segmentation

        cfg_dir = make_dummy_run(
            str(tmp_path), num_images=4, image_size=(32, 32), batch_size=2,
            num_epochs=1, patch_size=8, init_features=4, depth=2,
        )
        train_unet_segmentation(cfg_dir, max_epochs=1)
        res = evaluate_segmentation_model(
            cfg_dir, os.path.join(str(tmp_path), "checkpoints"), "unet", batch_size=2
        )
        assert 0.0 <= res["mean_iou"] <= 1.0
        out = capsys.readouterr().out
        assert "Segmentation Performance" in out
        assert "falling back" in out  # test/val missing → train fallback

    def test_unknown_model_type(self, tmp_path):
        from mingraph_unet_tpu.experiments.segmentation_performance import (
            evaluate_segmentation_model,
        )

        cfg_dir = make_dummy_run(str(tmp_path), num_images=2, image_size=(32, 32))
        with pytest.raises(NotImplementedError):
            evaluate_segmentation_model(cfg_dir, "nope", "yolo")


class TestRegionBlendLogits:
    """Graph-refined segmentation (eval-time region-mean logit blending)."""

    def test_single_region_equals_global_mean_blend(self):
        import jax.numpy as jnp

        from mingraph_unet_tpu.experiments.segmentation_performance import (
            region_blend_logits,
        )

        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
        labels = jnp.zeros((2, 2, 2), jnp.int32)  # one region everywhere
        out = region_blend_logits(logits, labels, patch=4, num_regions=4, gamma=0.5)
        want = 0.5 * logits + 0.5 * logits.mean(axis=(1, 2), keepdims=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)

    def test_gamma_zero_is_identity(self):
        import jax.numpy as jnp

        from mingraph_unet_tpu.experiments.segmentation_performance import (
            region_blend_logits,
        )

        rng = np.random.default_rng(1)
        logits = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 4, (1, 4, 4)), dtype=jnp.int32)
        out = region_blend_logits(logits, labels, patch=2, num_regions=4, gamma=0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(logits), atol=1e-6)

    def test_two_regions_blend_separately(self):
        import jax.numpy as jnp

        from mingraph_unet_tpu.experiments.segmentation_performance import (
            region_blend_logits,
        )

        # Left half region 0 with logits 0, right half region 1 with logits 1:
        # region means are exact and blending never crosses the boundary.
        # Patch grid (1, 2) at patch=4 -> pixel grid (4, 8).
        logits = jnp.concatenate(
            [jnp.zeros((1, 4, 4, 1)), jnp.ones((1, 4, 4, 1))], axis=2
        )
        labels = jnp.asarray([[[0, 1]]], jnp.int32)
        out = region_blend_logits(logits, labels, patch=4, num_regions=2, gamma=0.7)
        np.testing.assert_allclose(np.asarray(out[:, :, :4]), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[:, :, 4:]), 1.0, atol=1e-6)

    def test_purity_gate_blends_pure_region_only(self):
        import jax.numpy as jnp

        from mingraph_unet_tpu.experiments.segmentation_performance import (
            region_blend_logits,
        )

        # Region 0 (left): constant logits → p_fg variance 0 → blends.
        # Region 1 (right): half strongly fg, half strongly bg → high
        # variance → must keep its original logits untouched.
        pure = jnp.full((1, 4, 4, 2), 0.3)
        mixed = jnp.concatenate(
            [jnp.tile(jnp.asarray([[5.0, -5.0]]), (2, 1)).reshape(1, 2, 1, 2).repeat(4, 2),
             jnp.tile(jnp.asarray([[-5.0, 5.0]]), (2, 1)).reshape(1, 2, 1, 2).repeat(4, 2)],
            axis=1,
        )  # (1, 4, 4, 2): top half bg-ish, bottom half fg-ish
        logits = jnp.concatenate([pure, mixed], axis=2)  # (1, 4, 8, 2)
        labels = jnp.asarray([[[0, 1]]], jnp.int32)
        gated = region_blend_logits(
            logits, labels, patch=4, num_regions=2, gamma=0.5, purity_tau=0.05
        )
        ungated = region_blend_logits(
            logits, labels, patch=4, num_regions=2, gamma=0.5
        )
        # Pure region: gated == ungated blend; both == original (constant).
        np.testing.assert_allclose(
            np.asarray(gated[:, :, :4]), np.asarray(ungated[:, :, :4]), atol=1e-6
        )
        # Impure region: gated keeps the original logits; the ungated blend
        # must differ from them (region-mean mixing).
        np.testing.assert_allclose(
            np.asarray(gated[:, :, 4:]), np.asarray(logits[:, :, 4:]), atol=1e-6
        )
        assert np.abs(np.asarray(ungated[:, :, 4:] - logits[:, :, 4:])).max() > 1.0

    def test_purity_tau_huge_equals_ungated(self):
        import jax.numpy as jnp

        from mingraph_unet_tpu.experiments.segmentation_performance import (
            region_blend_logits,
        )

        rng = np.random.default_rng(2)
        logits = jnp.asarray(rng.normal(size=(2, 8, 8, 2)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 3, (2, 2, 2)), dtype=jnp.int32)
        a = region_blend_logits(logits, labels, patch=4, num_regions=3,
                                gamma=0.3, purity_tau=1e9)
        b = region_blend_logits(logits, labels, patch=4, num_regions=3, gamma=0.3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
