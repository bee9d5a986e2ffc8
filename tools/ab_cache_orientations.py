"""A/B: the accuracy cost of `-cache_orientations 1` (flip augmentation off).

`-cache_orientations 1` halves the feature-cache disk cost by storing only
the unflipped trunk fmap — which pins horizontal-flip augmentation OFF for
cached train splits (config.py `cache_orientations`). The reference always
random-hflips in training (`/root/reference/dataloaders/visual_genome.py:
377-455`), so the flag diverges from reference training semantics; this
tool prices that divergence with a measured R@K delta (VERDICT r4 weak #4).

Protocol: identical fixture + seeds, two real `main.py -feature_cache` runs
per seed — A with the default 2 orientations (flip augmentation live) and B
with `-cache_orientations 1` (flips off) — then compare held-out test R@K.
Fixture-scale by necessity (the 60 GB VG is not in this environment); the
number bounds the flag's effect on this workload shape, not on full VG.

Usage: python tools/ab_cache_orientations.py [OUT_DIR] [EPOCHS] [N_SEEDS]
Writes OUT_DIR/ab_cache_orientations.json and prints a delta table.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

KEYS = ["predcls/test_alls_R@50_GC", "predcls/test_alls_R@100_GC",
        "predcls/test_alls_R@100_NOGC", "predcls/test_alls_mR@100_GC"]


def _run(args, env, timeout=2400):
    proc = subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(f"CLI failed: {' '.join(args)}\n"
                           f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab_orient"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_seeds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    device = sys.argv[4] if len(sys.argv) > 4 else "tpu"
    os.makedirs(out_dir, exist_ok=True)

    data_dir = os.path.join(out_dir, "data")
    if not os.path.isdir(os.path.join(data_dir, "VG")):
        from sgg_tpu.data import fixtures
        # larger train split than the CLI-e2e fixture: augmentation effects
        # need some generalization gap to act on
        fixtures.write_vg_fixture(data_dir, n_train=40, n_test=12,
                                  n_classes=12, n_preds=8, seed=7)

    env = dict(os.environ)
    env.setdefault("SGG_IM_SCALE", "160")
    env["SGG_CHECK_SIZES"] = "0"
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, "tests", ".jax_cache_cpu"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

    results = {"A_flip_on": [], "B_flip_off": []}
    for seed in range(n_seeds):
        for arm, extra in (("A_flip_on", []),
                           ("B_flip_off", ["-cache_orientations", "1"])):
            run = os.path.join(out_dir, f"{arm}_s{seed}")
            cache = os.path.join(run, "fcache")
            _run(["main.py", "-m", "predcls", "-split", "stanford",
                  "-data", data_dir, "-val_size", "4", "-b", "4",
                  "-nepoch", str(epochs), "-p", "100", "-nwork", "1",
                  "-device", device,
                  "-seed", str(seed), "-use_bias", "-save_dir", run,
                  "-feature_cache", cache] + extra, env)
            with open(os.path.join(run, "test_results.json")) as f:
                res = json.load(f)
            results[arm].append({k: res[k] for k in KEYS if k in res})
            print(f"{arm} seed {seed}: " + "  ".join(
                f"{k.split('/')[-1]}={res[k]:.4f}" for k in KEYS
                if k in res), flush=True)

    summary = {"epochs": epochs, "n_seeds": n_seeds,
               "im_scale": env["SGG_IM_SCALE"], "delta": {}}
    for k in KEYS:
        a = [r[k] for r in results["A_flip_on"] if k in r]
        b = [r[k] for r in results["B_flip_off"] if k in r]
        if a and b:
            ma, mb = sum(a) / len(a), sum(b) / len(b)
            summary["delta"][k] = {"flip_on": round(ma, 4),
                                   "flip_off": round(mb, 4),
                                   "cost_of_no_flip": round(ma - mb, 4)}
    summary["runs"] = results
    path = os.path.join(out_dir, "ab_cache_orientations.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary["delta"], indent=1))
    print(f"written: {path}")


if __name__ == "__main__":
    main()
