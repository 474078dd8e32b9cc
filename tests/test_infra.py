"""Infrastructure tests: prefetch loader, determinism, logging, profiling."""

import json
import os

import jax
import numpy as np
import pytest

from mingraph_unet_tpu.utils.bootstrap import make_dummy_run
from mingraph_unet_tpu.utils.logging import MetricsLogger
from mingraph_unet_tpu.utils.profiling import StepTimer, trace_if


class TestPrefetch:
    def _dataset(self, tmp_path):
        from mingraph_unet_tpu.data.dataset import BatchLoader, MangoDataset

        make_dummy_run(str(tmp_path), num_images=6, image_size=(32, 32))
        ds = MangoDataset(
            os.path.join(str(tmp_path), "data/train/images"),
            os.path.join(str(tmp_path), "data/train/masks"),
            image_size=(32, 32),
        )
        return BatchLoader(ds, 2, shuffle=True, drop_last=True, seed=5)

    def test_prefetch_matches_sync(self, tmp_path):
        loader = self._dataset(tmp_path)
        sync = list(loader.epoch(1))
        pre = list(loader.prefetch_epoch(1, prefetch=2))
        assert len(sync) == len(pre) == 3
        for (a, b), (c, d) in zip(sync, pre):
            np.testing.assert_array_equal(a, c)
            np.testing.assert_array_equal(b, d)

    def test_prefetch_propagates_errors(self, tmp_path):
        loader = self._dataset(tmp_path)
        loader.dataset.image_paths[0] = "/nonexistent.png"
        loader.shuffle = False
        with pytest.raises(FileNotFoundError):
            list(loader.prefetch_epoch(0))


class TestDeterminism:
    def test_same_seed_same_losses(self, tmp_path):
        from mingraph_unet_tpu.train.segmentation import train_unet_segmentation

        cfg_a = make_dummy_run(
            str(tmp_path / "a"), num_images=4, image_size=(32, 32), batch_size=2,
            num_epochs=1, depth=2, init_features=4,
        )
        cfg_b = make_dummy_run(
            str(tmp_path / "b"), num_images=4, image_size=(32, 32), batch_size=2,
            num_epochs=1, depth=2, init_features=4,
        )
        _, h1 = train_unet_segmentation(cfg_a, max_epochs=1)
        _, h2 = train_unet_segmentation(cfg_b, max_epochs=1)
        np.testing.assert_allclose(h1["epoch_loss"], h2["epoch_loss"], rtol=1e-5)


class TestLoggingProfiling:
    def test_metrics_jsonl(self, tmp_path):
        with MetricsLogger(str(tmp_path), "run", log_interval=1, echo=False) as lg:
            lg.log(1, {"loss": 0.5, "lr": 1e-3})
            lg.log(2, {"loss": 0.25})
            path = lg.path
        lines = [json.loads(l) for l in open(path)]
        assert lines[0]["loss"] == 0.5 and lines[1]["step"] == 2

    def test_trace_if_writes_profile(self, tmp_path):
        import jax.numpy as jnp

        trace_dir = str(tmp_path / "trace")
        with trace_if(trace_dir):
            jnp.zeros((8,)).block_until_ready()
        assert os.path.isdir(trace_dir) and os.listdir(trace_dir)

    def test_step_timer(self):
        import jax.numpy as jnp

        t = StepTimer()
        t.start()
        x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
        ms = t.stop(x)
        assert ms >= 0


class TestTraceAttribution:
    """bench.py's stage attribution: parse a synthetic Chrome trace and fold
    ops into stages by source file (utils/profiling.py, VERDICT r4 weak #5)."""

    def _write_trace(self, tmp_path, events):
        import gzip
        import json

        p = tmp_path / "plugins" / "profile" / "run"
        p.mkdir(parents=True)
        with gzip.open(p / "host.trace.json.gz", "wt") as f:
            json.dump({"traceEvents": events}, f)

    def test_parse_and_attribute(self, tmp_path):
        from mingraph_unet_tpu.utils.profiling import (
            attribute_stages,
            parse_device_trace,
        )

        events = [
            {"ph": "M", "pid": 1, "name": "process_name",
             "args": {"name": "/device:TPU:0"}},
            {"ph": "M", "pid": 1, "tid": 7, "name": "thread_name",
             "args": {"name": "XLA Ops"}},
            {"ph": "M", "pid": 9, "name": "process_name",
             "args": {"name": "python host"}},
            {"ph": "M", "pid": 9, "tid": 1, "name": "thread_name",
             "args": {"name": "XLA Ops"}},
            # 2 steps worth of device ops (durations in us).
            {"ph": "X", "pid": 1, "tid": 7, "name": "fusion.1", "dur": 2000,
             "args": {"hlo_category": "convolution",
                      "source": "mingraph_unet_tpu/models/unet.py:42"}},
            {"ph": "X", "pid": 1, "tid": 7, "name": "fusion.1", "dur": 2000,
             "args": {"hlo_category": "convolution",
                      "source": "mingraph_unet_tpu/models/unet.py:42"}},
            {"ph": "X", "pid": 1, "tid": 7, "name": "fusion.2", "dur": 500,
             "args": {"hlo_category": "fusion",
                      "source": "mingraph_unet_tpu/ops/filters.py:10"}},
            {"ph": "X", "pid": 1, "tid": 7, "name": "copy.3", "dur": 100,
             "args": {"hlo_category": "copy", "source": ""}},
            # while-wrapper double-counts its body: must be skipped.
            {"ph": "X", "pid": 1, "tid": 7, "name": "while.9", "dur": 99999,
             "args": {}},
            # host-side op: wrong pid, must be ignored.
            {"ph": "X", "pid": 9, "tid": 1, "name": "hostop", "dur": 7777,
             "args": {}},
        ]
        self._write_trace(tmp_path, events)
        rows = parse_device_trace(str(tmp_path), steps=2)
        by_op = {r["op"]: r for r in rows}
        assert by_op["fusion.1"]["us_per_step"] == 2000.0
        assert by_op["fusion.2"]["us_per_step"] == 250.0
        assert "while.9" not in by_op and "hostop" not in by_op
        stages = attribute_stages(rows, [
            ("unet", ("models/unet.py",)),
            ("aux_filters", ("ops/filters.py",)),
        ])
        assert stages == {"unet": 2.0, "aux_filters": 0.25, "other": 0.05}
        # Stage sums equal the device total by construction.
        assert abs(sum(stages.values())
                   - sum(r["us_per_step"] for r in rows) / 1e3) < 1e-9

    def test_empty_dir(self, tmp_path):
        from mingraph_unet_tpu.utils.profiling import parse_device_trace

        assert parse_device_trace(str(tmp_path), steps=1) == []
