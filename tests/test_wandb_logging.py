"""W&B adapter mock tests: call sequences of ``make_logger``.

The real wandb package is not installed here; a fake module injected into
``sys.modules`` asserts the adapter reproduces the reference's wiring
(``/root/reference/config.py:107-134``): init(name/dir/project/config,
resume=False), per-step ``log`` with prefix, ``summary`` writes when
is_summary, the repeat-log window (``log_repeats`` consecutive steps — the
reference's workaround for wandb dropping trailing values), and failures
swallowed (a raising ``log`` must not propagate into training).
"""

import sys
import types

import pytest

from sgg_tpu.config import Config


class _FakeRun:
    def __init__(self):
        self.logged = []       # (dict, step)
        self.summary = {}
        self.fail = False

    def log(self, d, step=None):
        if self.fail:
            raise RuntimeError("disk full")
        self.logged.append((dict(d), step))


@pytest.fixture
def fake_wandb(monkeypatch):
    mod = types.ModuleType("wandb")
    mod.calls = []

    def init(**kw):
        mod.calls.append(kw)
        mod.run = _FakeRun()
        return mod.run

    mod.init = init
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


def _make(fake_wandb, **cfg_kw):
    from sgg_tpu.utils.logging import make_logger
    config = Config(wandb="sgg-project", name="run7", wandb_dir="/tmp",
                    **cfg_kw)
    return make_logger(config), fake_wandb


def test_init_kwargs_and_config_dump(fake_wandb):
    _, mod = _make(fake_wandb)
    (kw,) = mod.calls
    assert kw["project"] == "sgg-project"
    assert kw["name"] == "run7"
    assert kw["dir"] == "/tmp"
    assert kw["resume"] is False
    # hyperparameter dump goes into init config (reference config.py:117)
    assert kw["config"]["mode"] == "sgcls"
    assert kw["config"]["batch_size"] == 6


def test_per_step_log_and_prefix(fake_wandb):
    log_fn, mod = _make(fake_wandb)
    log_fn({"obj_loss": 1.5, "rel_loss": 0.5}, step=17, prefix="loss/")
    assert mod.run.logged == [({"loss/obj_loss": 1.5}, 17),
                              ({"loss/rel_loss": 0.5}, 17)]
    assert mod.run.summary == {}  # not a summary write


def test_summary_and_repeat_window(fake_wandb):
    """log_repeats=5 logs the SAME values at 5 consecutive steps — the
    trailing-sync workaround (reference config.py:121-122); summary keys
    are (re)written each repeat."""
    log_fn, mod = _make(fake_wandb)
    log_fn({"R@100": 0.42}, step=100, log_repeats=5, is_summary=True)
    assert [(d, s) for d, s in mod.run.logged] == [
        ({"R@100": 0.42}, s) for s in range(100, 105)]
    assert mod.run.summary == {"R@100": 0.42}


def test_log_failure_swallowed(fake_wandb, capsys):
    """A raising wandb.log (full disk) must not propagate (reference
    config.py:127-128)."""
    log_fn, mod = _make(fake_wandb)
    mod.run.fail = True
    log_fn({"x": 1.0}, step=0)  # must not raise
    assert "error logging with wandb" in capsys.readouterr().out


def test_init_failure_degrades_to_noop(monkeypatch, capsys):
    mod = types.ModuleType("wandb")

    def init(**kw):
        raise OSError("no network")

    mod.init = init
    monkeypatch.setitem(sys.modules, "wandb", mod)
    from sgg_tpu.utils.logging import make_logger
    log_fn = make_logger(Config(wandb="p"))
    assert "disabled" in capsys.readouterr().out
    log_fn({"x": 1.0}, step=0)  # no-op, no raise


def test_no_project_no_wandb(fake_wandb):
    """Without -wandb the adapter never touches the module."""
    from sgg_tpu.utils.logging import make_logger
    log_fn = make_logger(Config())
    log_fn({"x": 1.0}, step=0)
    assert fake_wandb.calls == []
