import pytest

from sgg_tpu.config import Config, config_from_args


def test_cli_flag_parity_roundtrip():
    cfg = config_from_args([
        "-m", "sgcls", "-loss", "dnorm", "-b", "24", "-lr", "1e-3",
        "-steps", "15_18", "-use_bias", "-gan", "-largeD",
        "-perturb", "graphn", "-L", "0.2", "-topk", "5", "-graphn_a", "2",
        "-ganlosses", "D_G_rec", "-data", "./data",
    ])
    assert cfg.mode == "sgcls" and cfg.loss == "dnorm"
    assert cfg.batch_size == 24 and cfg.steps == (15, 18)
    assert cfg.use_bias and cfg.gan and cfg.largeD
    assert cfg.perturb == "graphn" and cfg.L == 0.2
    assert cfg.ganlosses == ("D", "G", "rec")


def test_reference_validation_rules():
    # perturb requires gan (config.py:88-90)
    with pytest.raises(AssertionError):
        Config(perturb="rand", gan=False)
    # test_bias requires use_bias (config.py:85-86)
    with pytest.raises(AssertionError):
        Config(test_bias=True, use_bias=False)
    # GQA needs 1024 rels/img (config.py:73-74)
    with pytest.raises(AssertionError):
        Config(split="gqa", rels_per_img=512, backbone="resnet50")
    # non-stanford splits must use resnet50 (config.py:76-78)
    with pytest.raises(AssertionError):
        Config(split="vte", backbone="vgg16")
    # valid combos construct fine
    Config(split="gqa", backbone="resnet50")
    Config(perturb="graphn", gan=True)


def test_repro_metadata_captured():
    cfg = Config()
    assert cfg.hostname
    assert cfg.gitcommit
