"""Config/CLI tests: reference flag parity (modules/config.py:3-24),
serialization roundtrip, mesh-shape resolution."""

import pytest

from klab_multimodalmodel_tpu.config import (Config, T5_SIZES,
                                             build_arg_parser,
                                             parse_arguments)
from klab_multimodalmodel_tpu.utils import resolve_mesh_shape


def test_reference_flags_present_with_defaults():
    cfg = parse_arguments([])
    # the 13 reference flags with the reference's defaults
    assert cfg.image_model_name == "microsoft/swinv2-base-patch4-window8-256"
    assert cfg.image_model_train is False
    assert cfg.language_model_name == "t5-large"
    assert cfg.transformer_model_name == "t5-large"
    assert cfg.max_source_length == 256
    assert cfg.max_target_length == 128
    assert cfg.lr == 0.001
    assert cfg.lr_scheduler == ""
    assert cfg.batch_size == 64
    assert cfg.accumulation_steps == 1
    assert cfg.num_epochs is None
    assert cfg.num_steps is None
    assert cfg.save_interval is None
    assert cfg.data_dir == "/user/data/mscoco2017/"
    assert cfg.result_dir == "results/"


def test_reference_recipe_flags_parse():
    # run_scripts/caption/train_with_swin.sh flag set
    cfg = parse_arguments([
        "--image_model_train", "--num_epochs", "50", "--save_interval", "5",
        "--data_dir", "/user/data/mscoco2017/",
        "--result_dir", "results/caption/with_swin/"])
    assert cfg.image_model_train and cfg.num_epochs == 50
    # pretrain recipe
    cfg = parse_arguments(["--accumulation_steps", "2", "--num_steps",
                           "10000", "--data_dir", "/data/dataset/redcaps/",
                           "--result_dir", "results/pretrain/"])
    assert cfg.accumulation_steps == 2 and cfg.num_steps == 10000


def test_every_shipped_recipe_parses():
    """Every run_scripts/**/*.sh must parse through the real CLI — a
    recipe with a typo'd or removed flag should fail here, not at launch."""
    import pathlib
    import shlex

    root = pathlib.Path(__file__).resolve().parents[1] / "run_scripts"
    scripts = sorted(root.glob("*/*.sh"))
    assert len(scripts) >= 7
    for script in scripts:
        text = script.read_text()
        assert "python train.py" in text, script
        args = shlex.split(
            text.split("python train.py", 1)[1].replace("\\\n", " "))
        cfg = parse_arguments(args)
        assert cfg.result_dir.startswith("results/"), script


def test_scheduler_choices_enforced():
    with pytest.raises(SystemExit):
        build_arg_parser().parse_args(["--lr_scheduler", "bogus"])
    with pytest.raises(ValueError):
        Config(lr_scheduler="bogus")


def test_t5_size_table():
    # published t5 geometry (reference choices, modules/config.py:8-9).
    # The table also carries v1.1/Flan entries beyond the reference, so the
    # v1.0 five are asserted as a subset, not the whole table.
    v10 = {"t5-small", "t5-base", "t5-large", "t5-3b", "t5-11b"}
    assert v10 <= set(T5_SIZES)
    assert T5_SIZES["t5-large"].d_model == 1024
    assert T5_SIZES["t5-11b"].num_heads == 128
    # v1.1/Flan recipe entries: gated act, untied head.
    assert "google/t5-v1_1-base" in T5_SIZES
    assert "google/flan-t5-base" in T5_SIZES
    assert T5_SIZES["google/t5-v1_1-base"].feed_forward_proj == "gated-gelu"
    assert not T5_SIZES["google/t5-v1_1-base"].tie_word_embeddings
    # v1.0 entries keep the original recipe.
    assert T5_SIZES["t5-base"].feed_forward_proj == "relu"
    assert T5_SIZES["t5-base"].tie_word_embeddings


def test_config_json_roundtrip(tmp_path):
    cfg = Config(result_dir=str(tmp_path), mesh_shape=(2, 2, 2),
                 lr_scheduler="cosine", num_epochs=3)
    # 3-tuple (pre-seq/pipe-axis) shapes are right-padded to 6 axes.
    assert cfg.mesh_shape == (2, 2, 2, 1, 1, 1)
    path = cfg.save()
    with open(path) as f:
        restored = Config.from_json(f.read())
    assert restored.mesh_shape == (2, 2, 2, 1, 1, 1)
    assert restored.mesh_axis_names == ("data", "fsdp", "tensor", "seq",
                                        "pipe", "expert")
    assert restored.lr_scheduler == "cosine"
    assert restored.num_epochs == 3


def test_mesh_shape_seq_axis_cli():
    """--mesh_shape accepts 3 ints (legacy) up to 6 (seq/pipe/expert)."""
    cfg3 = parse_arguments(["--mesh_shape", "2", "2", "2"])
    assert cfg3.mesh_shape == (2, 2, 2, 1, 1, 1)
    cfg4 = parse_arguments(["--mesh_shape", "2", "1", "1", "4"])
    assert cfg4.mesh_shape == (2, 1, 1, 4, 1, 1)
    cfg5 = parse_arguments(["--mesh_shape", "2", "1", "1", "1", "2",
                            "--pipeline_stages", "2"])
    assert cfg5.mesh_shape == (2, 1, 1, 1, 2, 1)
    cfg6 = parse_arguments(["--mesh_shape", "2", "1", "1", "1", "1", "4",
                            "--moe_experts", "4"])
    assert cfg6.mesh_shape == (2, 1, 1, 1, 1, 4)
    with pytest.raises(ValueError):
        Config(mesh_shape=(2, 2))
    # expert axis > 1 without --moe_experts is rejected.
    with pytest.raises(ValueError):
        Config(mesh_shape=(2, 1, 1, 1, 1, 4))
    # moe is incompatible with the pipeline schedule.
    with pytest.raises(ValueError):
        Config(moe_experts=4, pipeline_stages=2,
               mesh_shape=(2, 1, 1, 1, 2, 1))
    # The same pipe/expert gating applies to DCN factors — a >1 factor in
    # --dcn_mesh_shape would otherwise silently build a replicated axis.
    with pytest.raises(ValueError, match="pipe"):
        Config(dcn_mesh_shape=(1, 1, 1, 1, 2, 1))
    with pytest.raises(ValueError, match="expert"):
        Config(dcn_mesh_shape=(1, 1, 1, 1, 1, 2))
    # ...and a legitimate ICI x DCN expert split passes.
    Config(moe_experts=4, mesh_shape=(2, 1, 1, 1, 1, 2),
           dcn_mesh_shape=(1, 1, 1, 1, 1, 2))


def test_mesh_shape_resolution():
    assert resolve_mesh_shape((-1, 1, 1), 8) == (8, 1, 1)
    assert resolve_mesh_shape((-1, 2, 2), 8) == (2, 2, 2)
    assert resolve_mesh_shape((4, 2, 1), 8) == (4, 2, 1)
    assert resolve_mesh_shape((-1, 1, 1, 2), 8) == (4, 1, 1, 2)
    with pytest.raises(ValueError):
        resolve_mesh_shape((3, 1, 1), 8)
    with pytest.raises(ValueError):
        resolve_mesh_shape((-1, -1, 1), 8)


@pytest.mark.slow
def test_dryrun_multichip_entry():
    """The driver's multi-chip dry run must work on the 8-device CPU mesh."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
