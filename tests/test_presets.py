"""Blessed-config presets: the reference pins its training recipes in shell
scripts (train_fluid/train_vel/train.sh, train_fluid/train_novel/train.sh,
train_action/train_dir/train.sh, train_action/eval_dis/run.sh). ``--preset``
must reproduce those flag sets exactly, with explicit flags overriding."""

import argparse

from tpugan_tpu.config import PRESETS, parse_with_preset


def test_train_vel_preset_values():
    from tpugan_tpu.cli.train_fluid import get_arguments

    opt = get_arguments(argparse.ArgumentParser(),
                        ["--preset", "train_vel", "--synthetic"])
    # train_fluid/train_vel/train.sh flag set
    assert opt.ckpt_every == 10000
    assert opt.iters == 80000
    assert opt.dump_visualization is True
    assert opt.batch_size == 4
    assert opt.use_vel is True
    assert opt.in_node_feats == 6


def test_train_novel_preset_values():
    from tpugan_tpu.cli.train_fluid import get_arguments

    opt = get_arguments(argparse.ArgumentParser(),
                        ["--preset", "train_novel"])
    # train_fluid/train_novel/train.sh flag set
    assert opt.ckpt_every == 10000
    assert opt.iters == 80000
    assert opt.dump_visualization is True
    assert opt.batch_size == 4
    assert opt.use_vel is False
    assert opt.in_node_feats == 3


def test_train_dir_preset_values():
    from tpugan_tpu.cli.train_action import get_arguments

    opt = get_arguments(argparse.ArgumentParser(),
                        ["--preset", "train_dir"])
    # train_action/train_dir/train.sh flag set
    assert opt.ckpt_every == 10000
    assert opt.iters == 100000
    assert opt.lr == 3e-4
    assert opt.batch_size == 4
    assert opt.dump_visualization is True


def test_explicit_flags_override_preset():
    from tpugan_tpu.cli.train_fluid import get_arguments

    opt = get_arguments(argparse.ArgumentParser(),
                        ["--preset", "train_vel", "--iters", "7",
                         "--batch_size", "2"])
    assert opt.iters == 7
    assert opt.batch_size == 2
    assert opt.use_vel is True          # untouched preset values stay


def test_preset_table_matches_reference_scripts():
    # the table itself is the spec — guard against accidental edits
    assert PRESETS["train_fluid"]["train_vel"]["in_node_feats"] == 6
    assert PRESETS["train_fluid"]["train_vel"]["use_vel"] is True
    assert PRESETS["train_action"]["train_dir"]["iters"] == 100000
    assert PRESETS["eval_tempo_feat"]["eval_dis"]["epochs"] == 60


def test_parse_with_preset_unknown_rejected(capsys):
    import pytest

    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=1)
    with pytest.raises(SystemExit):
        parse_with_preset(p, "train_fluid", ["--preset", "nope"])
