"""tools/preflight_real_data.py contract: READY on a valid (fixture) tree,
exact blocker list + exit 1 on a broken one (VERDICT r4 missing #4 — the
first real-data day must not burn hours on preventable surprises).

The fixture tree is schema-exact (``data/fixtures.py``), so every check the
tool can make without the real 60 GB payload runs for real here: h5 schema
cross-references, image decode sampling, disk/cache decision, and the
egress probe (recorded as info either way, never a blocker).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=240):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "preflight_real_data.py")] + args,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    from sgg_tpu.data import fixtures
    d = str(tmp_path_factory.mktemp("preflight_data"))
    fixtures.write_vg_fixture(d, n_train=10, n_test=4)
    return d


def test_ready_on_valid_tree(data_dir):
    proc = _run(["-data", data_dir, "--skip-dryrun"])
    assert proc.returncode == 0, proc.stdout + proc.stderr
    out = proc.stdout
    assert out.rstrip().endswith("READY"), out
    # the machine-readable INFO line carries the decision inputs
    info = json.loads([ln for ln in out.splitlines()
                       if ln.startswith("{")][-1])
    assert info["train_images"] == 10 and info["test_images"] == 4
    assert info["full_vg"] is False
    assert "cache_gb_1orient" in info and "disk_free_gb" in info
    assert "egress" in info  # probed, whatever the answer


def test_blockers_on_missing_tree(tmp_path):
    proc = _run(["-data", str(tmp_path), "--skip-dryrun"])
    assert proc.returncode == 1
    assert "BLOCKED" in proc.stdout
    assert "missing files/dirs" in proc.stdout


def test_blocker_on_corrupt_h5(data_dir, tmp_path):
    # copy the tree, truncate the h5 -> schema blocker, not a crash
    import shutil
    d = str(tmp_path / "corrupt")
    shutil.copytree(data_dir, d)
    h5 = os.path.join(d, "VG", "stanford_filtered", "VG-SGG.h5")
    with open(h5, "r+b") as f:
        f.truncate(100)
    proc = _run(["-data", d, "--skip-dryrun"])
    assert proc.returncode == 1
    assert "BLOCKED" in proc.stdout
