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


def test_flag_parity_with_reference_parser():
    """Every flag of the reference ArgumentParser (config.py setup_parser)
    exists in our Config with a matching default, modulo documented
    TPU-substituted flags."""
    import sys
    import pytest

    from reference_utils import load_reference
    load_reference()
    try:
        import config as ref_config_mod
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference config unavailable: {e}")
    from sgg_tpu.config import Config

    conf = ref_config_mod.ModelConfig.__new__(ref_config_mod.ModelConfig)
    parser = conf.setup_parser()
    ours = Config()
    # flags whose role is replaced by TPU-native machinery (documented):
    substituted = {
        "num_gpus",      # device mesh replaces GPU count
        "nosave",        # we always checkpoint via save_dir
        "torch_version", # torch-internal
    }
    mismatched_defaults = []
    missing = []
    for action in parser._actions:
        dest = action.dest
        if dest in ("help",) or dest in substituted:
            continue
        if not hasattr(ours, dest):
            missing.append(dest)
            continue
        ref_d, our_d = action.default, getattr(ours, dest)
        if dest in ("steps", "ganlosses"):
            continue  # stored parsed (tuple) on our side, tested elsewhere
        if isinstance(ref_d, (int, float, str, bool, type(None))) and \
                ref_d != our_d and (ref_d or our_d):
            mismatched_defaults.append((dest, ref_d, our_d))
    assert not missing, f"flags missing from Config: {missing}"
    # defaults may deviate only for documented TPU-relevant knobs
    allowed_deviation = {"device", "batch_size", "num_workers", "data",
                         "save_dir", "ckpt"}
    bad = [m for m in mismatched_defaults if m[0] not in allowed_deviation]
    assert not bad, f"default mismatches: {bad}"
