import os

import pytest
import yaml

from mingraph_unet_tpu.config import (
    DatasetConfig,
    ModelConfig,
    PipelineConfig,
    PreprocessingConfig,
    TrainingConfig,
    get_by_path,
    load_yaml,
)


def test_default_roundtrip(tmp_path):
    PipelineConfig.write_defaults(str(tmp_path))
    cfg = PipelineConfig.from_config_dir(str(tmp_path))
    assert cfg.model.unet.init_features == 32
    assert cfg.model.gat.num_heads == 4
    assert cfg.preprocessing.resize_dim == (128, 128)
    assert cfg.training.batch_size == 16
    assert cfg.dataset.num_classes == 2


def test_markdown_wrapped_yaml(tmp_path):
    # Reproduce the reference's malformed dataset.yaml (markdown-fenced).
    body = (
        "---\n\n**`configs/dataset.yaml`**\n\n```yaml\n"
        "dataset_name: Test\nnum_classes: 3\nimage_height: 64\nimage_width: 64\n"
        "```\n"
    )
    p = tmp_path / "dataset.yaml"
    p.write_text(body)
    data = load_yaml(str(p))
    cfg = DatasetConfig.from_dict(data)
    assert cfg.num_classes == 3
    assert cfg.image_height == 64


def test_validation_errors():
    with pytest.raises(ValueError):
        TrainingConfig.from_dict({"optimizer": "adagrad"})
    with pytest.raises(ValueError):
        PreprocessingConfig.from_dict({"gaussian_blur_kernel": [4, 4]})
    with pytest.raises(ValueError):
        DatasetConfig.from_dict({"num_classes": 0})


def test_get_by_path():
    cfg = PipelineConfig()
    assert get_by_path(cfg, "model.unet.depth") == 4
    assert get_by_path(cfg, "model.gat.hidden_dim") == 128
    assert get_by_path(cfg, "nope.nope", default=7) == 7
    d = {"a": {"b": {"c": 1}}}
    assert get_by_path(d, "a.b.c") == 1


@pytest.mark.skipif(not os.path.isdir("/root/reference/MinGraph-UNet/configs"), reason="no reference")
def test_loads_reference_configs():
    ref = "/root/reference/MinGraph-UNet/configs"
    model = ModelConfig.from_dict(load_yaml(os.path.join(ref, "model.yaml")))
    assert model.unet.out_channels == 2
    assert model.graph_construction.patch_size == 16
    assert model.gat.output_dim == 64
    pre = PreprocessingConfig.from_dict(load_yaml(os.path.join(ref, "preprocessing.yaml")))
    assert pre.resize_dim == (128, 128)
    train = TrainingConfig.from_dict(load_yaml(os.path.join(ref, "training.yaml")))
    assert train.batch_size == 16
    # The malformed markdown-wrapped dataset.yaml must parse via fence stripping.
    ds = DatasetConfig.from_dict(load_yaml(os.path.join(ref, "dataset.yaml")))
    assert ds.num_classes == 2
    assert ds.dataset_name == "BanginapalleMangoDataset"
