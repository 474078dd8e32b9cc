"""Trainer integration tests (tiny, CPU): loss decreases, checkpoints
resume, optimizer semantics match the reference."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mingraph_unet_tpu.config import TrainingConfig
from mingraph_unet_tpu.train.common import TrainState, make_lr_schedule, make_optimizer
from mingraph_unet_tpu.utils.bootstrap import make_dummy_run

from conftest import requires_reference


class TestOptimizer:
    def test_steplr_schedule(self):
        cfg = TrainingConfig(learning_rate=0.1, lr_step_size=2, lr_gamma=0.5)
        sched = make_lr_schedule(cfg, steps_per_epoch=10)
        assert float(sched(0)) == pytest.approx(0.1)
        assert float(sched(19)) == pytest.approx(0.1)
        assert float(sched(20)) == pytest.approx(0.05)
        assert float(sched(40)) == pytest.approx(0.025)

    @requires_reference
    def test_adam_matches_torch(self, reference_path):
        import torch

        w0 = np.array([1.0, -2.0, 0.5], np.float32)
        steps = 5
        cfg = TrainingConfig(
            learning_rate=1e-2, weight_decay=1e-2, optimizer="adam", lr_scheduler=None
        )
        tx, _ = make_optimizer(cfg, steps_per_epoch=1)
        params = {"w": jnp.asarray(w0)}
        opt_state = tx.init(params)
        for i in range(steps):
            grads = {"w": jnp.asarray([0.1, -0.2, 0.3], jnp.float32) * (i + 1)}
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

        tw = torch.nn.Parameter(torch.tensor(w0))
        opt = torch.optim.Adam([tw], lr=1e-2, weight_decay=1e-2)
        for i in range(steps):
            opt.zero_grad()
            tw.grad = torch.tensor([0.1, -0.2, 0.3]) * (i + 1)
            opt.step()
        np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), atol=1e-6)

    @requires_reference
    def test_sgd_matches_torch(self, reference_path):
        import torch

        w0 = np.array([1.0, -2.0], np.float32)
        cfg = TrainingConfig(
            learning_rate=1e-2, weight_decay=1e-3, optimizer="sgd", sgd_momentum=0.9,
            lr_scheduler=None,
        )
        tx, _ = make_optimizer(cfg, steps_per_epoch=1)
        params = {"w": jnp.asarray(w0)}
        opt_state = tx.init(params)
        for i in range(4):
            grads = {"w": jnp.asarray([0.5, -0.1], jnp.float32)}
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

        tw = torch.nn.Parameter(torch.tensor(w0))
        opt = torch.optim.SGD([tw], lr=1e-2, momentum=0.9, weight_decay=1e-3)
        for i in range(4):
            opt.zero_grad()
            tw.grad = torch.tensor([0.5, -0.1])
            opt.step()
        np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), atol=1e-6)


class TestSegmentationTrainer:
    def test_loss_decreases_and_resumes(self, tmp_path):
        from mingraph_unet_tpu.train.segmentation import train_unet_segmentation

        cfg_dir = make_dummy_run(
            str(tmp_path), num_images=4, image_size=(32, 32), batch_size=2,
            num_epochs=2, patch_size=8, init_features=4, depth=2,
        )
        state, history = train_unet_segmentation(cfg_dir, max_epochs=2)
        assert len(history["epoch_loss"]) == 2
        assert int(state.step) == 4  # 2 epochs × 2 steps

        # Resume continues from the checkpoint instead of restarting.
        state2, history2 = train_unet_segmentation(cfg_dir, max_epochs=4)
        assert int(state2.step) == 8
        assert len(history2["epoch_loss"]) == 2  # only epochs 2..3 ran

    def test_training_reduces_loss_on_learnable_task(self, tmp_path):
        from mingraph_unet_tpu.train.segmentation import train_unet_segmentation

        cfg_dir = make_dummy_run(
            str(tmp_path), num_images=8, image_size=(32, 32), batch_size=4,
            num_epochs=8, patch_size=8, init_features=8, depth=2, seed=1,
        )
        state, history = train_unet_segmentation(cfg_dir, max_epochs=8)
        assert history["epoch_loss"][-1] < history["epoch_loss"][0] * 0.9


class TestCheckpointRetention:
    def test_best_metric_retention(self, tmp_path):
        """best_metric keeps the max_to_keep best checkpoints, not the newest."""
        from mingraph_unet_tpu.train.checkpoint import CheckpointManager

        cm = CheckpointManager(str(tmp_path), max_to_keep=2, best_metric="loss", best_mode="min")
        for step, loss in [(1, 0.9), (2, 0.2), (3, 0.7), (4, 0.5)]:
            cm.save(step, {"state": {"w": np.full((2,), loss, np.float32)}},
                    metrics={"loss": loss})
        cm.wait()
        assert cm.best_step == 2
        kept = sorted(cm._mngr.all_steps())
        assert kept == [2, 4]  # the two lowest losses
        cm.close()


class TestMultistepWindow:
    def test_multistep_equals_sequential(self):
        """lax.scan window == sequential application of the same step fn
        with the same per-step keys."""
        import optax

        from mingraph_unet_tpu.train.common import make_multistep

        tx = optax.sgd(0.1)
        state = TrainState.create({"params": {"w": jnp.array([1.0, -1.0, 0.5])}}, tx)

        def train_step(st, imgs, masks, key):
            def loss_fn(p):
                noise = jax.random.normal(key, (3,)) * 0.01
                return ((p["w"] * imgs.mean() + noise - masks.mean()) ** 2).sum()

            loss, g = jax.value_and_grad(loss_fn)(st.params)
            return st.apply_updates(tx, g), {"loss": loss}

        k = 3
        imgs = jnp.asarray(np.random.default_rng(0).random((k, 2, 4)), jnp.float32)
        masks = jnp.asarray(np.random.default_rng(1).random((k, 2, 4)), jnp.float32)
        key = jax.random.key(42)

        multi = make_multistep(train_step, k)
        m_state, m_aux = jax.jit(multi)(state, imgs, masks, key)

        seq_state = state
        losses_seq = []
        for i, kk in enumerate(jax.random.split(key, k)):
            seq_state, aux = train_step(seq_state, imgs[i], masks[i], kk)
            losses_seq.append(float(aux["loss"]))
        np.testing.assert_allclose(
            np.asarray(m_state.params["w"]), np.asarray(seq_state.params["w"]), atol=1e-6
        )
        assert int(m_state.step) == k
        np.testing.assert_allclose(float(m_aux["loss"]), np.mean(losses_seq), rtol=1e-6)

    def test_trainer_with_scan_window(self, tmp_path):
        """scan_window=2 trains to the same step count (windows + remainder)."""
        import yaml

        from mingraph_unet_tpu.train.segmentation import train_unet_segmentation

        cfg_dir = make_dummy_run(
            str(tmp_path), num_images=6, image_size=(32, 32), batch_size=2,
            num_epochs=1, patch_size=8, init_features=4, depth=2,
        )
        tc = yaml.safe_load(open(os.path.join(cfg_dir, "training.yaml")))
        tc["scan_window"] = 2
        yaml.safe_dump(tc, open(os.path.join(cfg_dir, "training.yaml"), "w"))
        state, history = train_unet_segmentation(cfg_dir, max_epochs=1)
        assert int(state.step) == 3  # 3 steps: one window of 2 + remainder 1
        assert np.isfinite(history["epoch_loss"][0])


class TestEndToEndTrainer:
    def test_e2e_step_and_checkpoint(self, tmp_path):
        from mingraph_unet_tpu.train.end_to_end import train_end_to_end

        cfg_dir = make_dummy_run(
            str(tmp_path), num_images=4, image_size=(32, 32), batch_size=2,
            num_epochs=1, patch_size=8, init_features=4, depth=2,
        )
        state, history = train_end_to_end(cfg_dir, max_epochs=1)
        assert int(state.step) == 2
        ckpts = os.listdir(os.path.join(str(tmp_path), "checkpoints"))
        assert ckpts, "composite checkpoint must be written"


class TestTwoPhaseSchedule:
    def test_graph_warmup_zeroes_graph_losses_then_engages(self, tmp_path):
        """graph_warmup_epochs=1 (the value study's measured rescue for
        multi-loss cold-start collapse): epoch-0 steps must optimize ONLY
        seg+detection (logged total excludes the graph terms), epoch-1
        steps the full L_total. Raw per-loss metrics are logged unweighted
        either way, so the total is the discriminator."""
        import json

        import yaml

        from mingraph_unet_tpu.train.end_to_end import train_end_to_end

        cfg_dir = make_dummy_run(
            str(tmp_path), num_images=4, image_size=(32, 32), batch_size=2,
            num_epochs=2, patch_size=8, init_features=4, depth=2,
        )
        tc = yaml.safe_load(open(os.path.join(cfg_dir, "training.yaml")))
        tc["graph_warmup_epochs"] = 1
        tc["log_interval"] = 1
        yaml.safe_dump(tc, open(os.path.join(cfg_dir, "training.yaml"), "w"))
        state, history = train_end_to_end(cfg_dir, max_epochs=2)
        assert int(state.step) == 4
        log_dir = yaml.safe_load(open(os.path.join(cfg_dir, "training.yaml")))["log_dir"]
        (log_file,) = [f for f in os.listdir(log_dir) if f.endswith(".jsonl")]
        rows = [json.loads(l) for l in open(os.path.join(log_dir, log_file))]
        from mingraph_unet_tpu.config import PipelineConfig

        lw = PipelineConfig.from_config_dir(cfg_dir).model.losses
        for row in rows:
            expect_base = row["l_unet_seg"] + row["l_bbox"] + row["l_conf"]
            graph_part = (
                lw.l_shape_weight * row["l_shape"]
                + lw.l_feature_weight * row["l_feature"]
                + lw.l_partition_weight * row["l_partition"]
                + lw.l_smooth_weight * row["l_smooth"]
            )
            if row["epoch"] == 0:
                assert abs(row["total"] - expect_base) < 1e-4, row
            else:
                assert abs(row["total"] - expect_base - graph_part) < 1e-4, row


class TestPartitionSupervision:
    def test_loss_values(self):
        from mingraph_unet_tpu.models.losses import partition_supervision_loss

        y_p = jnp.asarray([[[0.0, 1.0], [1.0, 0.0]]])  # (1, 2, 2)
        perfect = jnp.stack(
            [1.0 - y_p, y_p], axis=-1
        )  # prob 1 on the target region
        wrong = jnp.stack([y_p, 1.0 - y_p], axis=-1)
        assert float(partition_supervision_loss(perfect, y_p)) < 1e-6
        assert float(partition_supervision_loss(wrong, y_p)) > 10.0
        # Uniform assignment: exactly -log(1/2).
        uniform = jnp.full((1, 2, 2, 2), 0.5)
        np.testing.assert_allclose(
            float(partition_supervision_loss(uniform, y_p)), np.log(2.0), rtol=1e-5
        )

    def test_e2e_engages_and_logs(self, tmp_path):
        import json

        import yaml

        from mingraph_unet_tpu.train.end_to_end import train_end_to_end

        cfg_dir = make_dummy_run(
            str(tmp_path), num_images=4, image_size=(32, 32), batch_size=2,
            num_epochs=1, patch_size=8, init_features=4, depth=2,
        )
        mc = yaml.safe_load(open(os.path.join(cfg_dir, "model.yaml")))
        mc["losses"]["l_partition_sup_weight"] = 0.5
        yaml.safe_dump(mc, open(os.path.join(cfg_dir, "model.yaml"), "w"))
        tc = yaml.safe_load(open(os.path.join(cfg_dir, "training.yaml")))
        tc["log_interval"] = 1
        yaml.safe_dump(tc, open(os.path.join(cfg_dir, "training.yaml"), "w"))
        state, history = train_end_to_end(cfg_dir, max_epochs=1)
        log_dir = tc["log_dir"]
        (log_file,) = [f for f in os.listdir(log_dir) if f.endswith(".jsonl")]
        rows = [json.loads(l) for l in open(os.path.join(log_dir, log_file))]
        from mingraph_unet_tpu.config import PipelineConfig

        lw = PipelineConfig.from_config_dir(cfg_dir).model.losses
        for row in rows:
            assert "l_partition_sup" in row and np.isfinite(row["l_partition_sup"])
            expect = (
                row["l_unet_seg"] + row["l_bbox"] + row["l_conf"]
                + lw.l_shape_weight * row["l_shape"]
                + lw.l_feature_weight * row["l_feature"]
                + lw.l_partition_weight * row["l_partition"]
                + lw.l_smooth_weight * row["l_smooth"]
                + 0.5 * row["l_partition_sup"]
            )
            assert abs(row["total"] - expect) < 1e-4, row


class TestUncertaintyBalance:
    def test_e2e_balanced_total_and_learnable_log_vars(self, tmp_path):
        import json

        import yaml

        from mingraph_unet_tpu.train.end_to_end import train_end_to_end

        cfg_dir = make_dummy_run(
            str(tmp_path), num_images=4, image_size=(32, 32), batch_size=2,
            num_epochs=1, patch_size=8, init_features=4, depth=2,
        )
        tc = yaml.safe_load(open(os.path.join(cfg_dir, "training.yaml")))
        tc["loss_balance"] = "uncertainty"
        tc["log_interval"] = 1
        yaml.safe_dump(tc, open(os.path.join(cfg_dir, "training.yaml"), "w"))
        state, history = train_end_to_end(cfg_dir, max_epochs=1)
        # The balancer's log-variances are params: present, trained.
        lv = np.asarray(state.params["loss_balance"]["log_vars"])
        assert lv.shape == (5,)
        assert np.abs(lv[:4]).max() > 0.0, "active slots must receive gradients"
        assert lv[4] == 0.0, "inactive psup slot must stay untouched"
        # Logged total matches exp(-s)·λ·L + s/2 assembly.
        log_dir = tc["log_dir"]
        (log_file,) = [f for f in os.listdir(log_dir) if f.endswith(".jsonl")]
        rows = [json.loads(l) for l in open(os.path.join(log_dir, log_file))]
        from mingraph_unet_tpu.config import PipelineConfig

        lw = PipelineConfig.from_config_dir(cfg_dir).model.losses
        for row in rows:
            expect = row["l_unet_seg"] + row["l_bbox"] + row["l_conf"]
            for name, w in (("l_shape", lw.l_shape_weight),
                            ("l_feature", lw.l_feature_weight),
                            ("l_partition", lw.l_partition_weight),
                            ("l_smooth", lw.l_smooth_weight)):
                s = row[f"bal_s_{name}"]
                expect += np.exp(-s) * w * row[name] + 0.5 * s
            assert abs(row["total"] - expect) < 1e-3, row

    def test_resume_with_balance(self, tmp_path):
        import yaml

        from mingraph_unet_tpu.train.end_to_end import train_end_to_end

        cfg_dir = make_dummy_run(
            str(tmp_path), num_images=4, image_size=(32, 32), batch_size=2,
            num_epochs=2, patch_size=8, init_features=4, depth=2,
        )
        tc = yaml.safe_load(open(os.path.join(cfg_dir, "training.yaml")))
        tc["loss_balance"] = "uncertainty"
        tc["save_epoch_interval"] = 1
        yaml.safe_dump(tc, open(os.path.join(cfg_dir, "training.yaml"), "w"))
        state1, _ = train_end_to_end(cfg_dir, max_epochs=1)
        state2, _ = train_end_to_end(cfg_dir, max_epochs=2)  # resumes
        assert int(state2.step) == 4
        assert "loss_balance" in state2.params


class TestDenseDetectionTraining:
    def test_e2e_with_dense_head(self, tmp_path):
        import yaml

        from mingraph_unet_tpu.train.end_to_end import train_end_to_end

        cfg_dir = make_dummy_run(
            str(tmp_path), num_images=4, image_size=(32, 32), batch_size=2,
            num_epochs=1, patch_size=8, init_features=4, depth=2,
        )
        mc = yaml.safe_load(open(os.path.join(cfg_dir, "model.yaml")))
        mc["fusion_detection"]["use_dense_detection"] = True
        mc["fusion_detection"]["max_instances"] = 8
        yaml.safe_dump(mc, open(os.path.join(cfg_dir, "model.yaml"), "w"))
        state, history = train_end_to_end(cfg_dir, max_epochs=1)
        assert np.isfinite(history["epoch_loss"][0])
