"""End-to-end CLI dress rehearsal on schema-exact on-disk fixtures.

The one seam no unit test covers: ``python main.py -m sgcls -split
stanford -data D`` as a real subprocess over a real on-disk dataset —
argparse -> splits() -> SGGDataset -> BatchLoader JPEG decode -> Trainer
epochs -> dual eval -> checkpoint -> resume -> -save_scores — matching the
reference's module-level program flow (``/root/reference/main.py:40,54,78,
244-288``), plus the GQA workflow chain (detector fine-tune -> SGCls ->
SGGen, ``/root/reference/README.md:227-243``) and a VTE smoke.

Runs at SGG_IM_SCALE=160 so the VGG trunk doesn't dominate CPU time; the
program (and its compiled structure) is otherwise identical to a real run.
"""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "SGG_IM_SCALE": "160",
        "SGG_CHECK_SIZES": "0",
        # share the suite's persistent compile cache across subprocesses
        "JAX_COMPILATION_CACHE_DIR": os.path.join(REPO, "tests",
                                                  ".jax_cache_cpu"),
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "1.0",
    })
    return env


def _run(args, timeout=1500):
    proc = subprocess.run([sys.executable] + args, cwd=REPO, env=_env(),
                          capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, (
        f"CLI failed: {' '.join(args)}\n--- stdout ---\n{proc.stdout[-4000:]}"
        f"\n--- stderr ---\n{proc.stderr[-4000:]}")
    return proc.stdout


def _results(save_dir):
    with open(os.path.join(save_dir, "test_results.json")) as f:
        return json.load(f)


def _check_sane(results):
    for k, v in results.items():
        assert np.isfinite(v), (k, v)
        assert 0 <= v <= 301.001, (k, v)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    from sgg_tpu.data import fixtures
    d = str(tmp_path_factory.mktemp("cli_data"))
    fixtures.write_vg_fixture(d, n_train=10, n_test=6)
    fixtures.write_gqa_fixture(d, n_train=10, n_val=5)
    fixtures.write_vte_fixture(d, n_train=8, n_test=5)
    return d


def test_vg_sgcls_train_resume_save_scores(data_dir, tmp_path):
    """main.py stanford sgcls: train -> eval -> ckpt -> resume -> scores."""
    run = str(tmp_path / "run")
    base = ["main.py", "-m", "sgcls", "-split", "stanford", "-data",
            data_dir, "-val_size", "2", "-b", "4", "-p", "1",
            "-device", "cpu", "-nwork", "1", "-use_bias",
            "-save_dir", run]
    out = _run(base + ["-nepoch", "1"])
    assert "epoch 0:" in out
    res = _results(run)
    _check_sane(res)
    # predcls on GT boxes: unconstrained R@300 must match a good chunk of
    # GT even after 1 epoch (boxes are exact; scores only rank)
    assert res["predcls/test_alls_R@300_NOGC"] > 0.2
    assert "sgcls/test_alls_mR@100_GC" in res
    # zero/k-shot splits all evaluated (non-vacuous fixture)
    for split in ("test_zs", "test_10s", "test_100s"):
        assert f"predcls/{split}_R@100_GC" in res

    # resume: epoch-0 checkpoint picked up, continues at epoch 1, and the
    # test predictions pickle is written (reference main.py:284-288)
    out2 = _run(base + ["-nepoch", "2", "-save_scores"])
    assert "resumed from epoch 0" in out2
    assert "epoch 1:" in out2
    assert "epoch 0:" not in out2.split("resumed")[1]
    with open(os.path.join(run, "test_predictions.pkl"), "rb") as f:
        entries = pickle.load(f)
    assert "test_alls" in entries and len(entries["test_alls"]) == 6
    e = entries["test_alls"][0]
    assert {"pred_boxes", "pred_classes", "obj_scores", "pred_rel_inds",
            "rel_scores"} <= set(e)


def test_vg_sgcls_feature_cache(data_dir, tmp_path):
    """-feature_cache through the CLI: extraction + cached train/eval."""
    run = str(tmp_path / "runfc")
    cache = str(tmp_path / "fcache")
    out = _run(["main.py", "-m", "sgcls", "-split", "stanford", "-data",
                data_dir, "-val_size", "2", "-b", "4", "-nepoch", "1",
                "-p", "1", "-device", "cpu", "-nwork", "1",
                "-save_dir", run, "-feature_cache", cache])
    res = _results(run)
    _check_sane(res)
    assert os.path.isdir(cache) and len(os.listdir(cache)) > 0


def test_vg_sgdet_pretrain_handoff(data_dir, tmp_path):
    """pretrain_detector.py vg -> main.py -m sgdet -ckpt handoff."""
    det_dir = str(tmp_path / "det")
    _run(["pretrain_detector.py", "vg", data_dir, det_dir, "1", "2", "2"])
    run = str(tmp_path / "runsgdet")
    out = _run(["main.py", "-m", "sgdet", "-split", "stanford", "-data",
                data_dir, "-val_size", "2", "-b", "2", "-nepoch", "1",
                "-p", "1", "-device", "cpu", "-nwork", "1",
                "-backbone", "resnet50", "-ckpt", det_dir,
                "-save_dir", run])
    assert "loaded detector checkpoint" in out
    res = _results(run)
    _check_sane(res)
    assert any(k.startswith("sgdet/") for k in res)


def test_gqa_chain(data_dir, tmp_path):
    """GQA workflow: detector fine-tune -> SGCls -> SGGen eval
    (reference README.md:227-243; resnet50 forced for non-stanford)."""
    det_dir = str(tmp_path / "gqadet")
    _run(["pretrain_detector.py", "gqa", data_dir, det_dir, "1", "2", "2"])
    run = str(tmp_path / "gqarun")
    _run(["main.py", "-m", "sgcls", "-split", "gqa", "-data", data_dir,
          "-val_size", "2", "-b", "4", "-nepoch", "1", "-p", "1",
          "-device", "cpu", "-nwork", "1", "-backbone", "resnet50",
          "-exclude_left_right", "-save_dir", run])
    res = _results(run)
    _check_sane(res)
    assert "sgcls/test_alls_R@100_GC" in res
    assert "predcls/test_zs_R@100_GC" in res

    # SGGen: sgdet eval on the fine-tuned detector, resuming the sgcls
    # relation weights (-nepoch 1 with the epoch-0 ckpt -> eval only)
    out = _run(["main.py", "-m", "sgdet", "-split", "gqa", "-data",
                data_dir, "-val_size", "2", "-b", "2", "-nepoch", "1",
                "-p", "1", "-device", "cpu", "-nwork", "1",
                "-backbone", "resnet50", "-ckpt", det_dir,
                "-save_dir", run])
    assert "resumed from epoch 0" in out
    res2 = _results(run)
    _check_sane(res2)
    assert any(k.startswith("sgdet/") for k in res2)


def test_vte_smoke(data_dir, tmp_path):
    """VTE split through the CLI (predcls, 1 epoch)."""
    run = str(tmp_path / "vterun")
    _run(["main.py", "-m", "predcls", "-split", "vte", "-data", data_dir,
          "-val_size", "2", "-b", "4", "-nepoch", "1", "-p", "1",
          "-device", "cpu", "-nwork", "1", "-backbone", "resnet50",
          "-save_dir", run])
    res = _results(run)
    _check_sane(res)
    assert res["predcls/test_alls_R@300_NOGC"] > 0.1
