"""bench.py stdout-line contract: ONE JSON line under the driver's
2000-char tail capture (round-4 regression: BENCH_r04.json came back
`parsed: null` because the line overflowed the capture and lost its
headline fields).

The full bench can't run here (needs the chip); these tests exercise the
slimming logic on a reconstruction of the round-4 full record — the
largest line ever produced — plus adversarial paddings.
"""

import json

import bench


def _r4_full_line():
    """A full record with every field the round-4 bench emitted (the line
    that overflowed), values shaped like the real ones."""
    line = {
        "metric": "sgcls_train_images_per_sec",
        "value": 238.21,
        "unit": "images/sec/chip",
        "baseline_source": "estimate",
        "vs_baseline": 18.32,
        "pipeline_images_per_sec": 41.2,
        "pipeline_vs_baseline": 3.17,
        "h2d_link_mbps": 49.7,
    }
    metrics = ("sgcls_train", "sgcls_train_cached", "sgdet_eval",
               "sgdet_eval_cached", "sgcls_eval", "sgcls_eval_cached",
               "gan_train", "gan_train_cached", "sgdet_train",
               "sgdet_train_cached", "detector_pretrain")
    for m in metrics:
        line[f"{m}_images_per_sec"] = 238.21
        line[f"{m}_best_images_per_sec"] = 240.55
        line[f"{m}_spread_pct"] = 1.1
    for m in ("sgcls_train", "sgcls_train_cached", "sgdet_eval",
              "sgcls_eval", "gan_train", "detector_pretrain"):
        line[f"{m}_tflops_per_sec"] = 95.78
        line[f"{m}_mfu"] = 0.4862
    for m in ("sgcls_train", "sgcls_train_cached", "sgdet_eval",
              "sgdet_train", "detector_pretrain"):
        line[f"{m}_vs_baseline"] = 33.29
    line["sgdet_pair_fallback_rate"] = 0.0
    line["sgdet_nms_cand_overflow_rate"] = 0.0
    line["host_prep_images_per_sec_per_worker"] = 192.2
    line["host_prep_images_per_sec"] = 194.0
    line["host_prep_workers"] = 1
    line["bench_env"] = {
        "cpu_count": 1, "device": "TPU v5 lite0", "jax": "0.9.0",
        "iters_per_repeat": 10, "repeats": 3, "peak_bf16_tflops": 197.0,
        "tunnel_sensitive": ["pipeline_images_per_sec", "h2d_link_mbps",
                             "host_prep_images_per_sec"],
    }
    return line


def test_r4_line_overflowed_but_slim_fits():
    full = _r4_full_line()
    assert len(json.dumps(full)) > bench.MAX_LINE_BYTES  # the r4 failure
    slim = bench._slim(full)
    assert len(json.dumps(slim)) < bench.MAX_LINE_BYTES


def test_slim_keeps_essentials():
    slim = bench._slim(_r4_full_line())
    # the driver's headline contract
    for k in ("metric", "value", "unit", "vs_baseline"):
        assert k in slim
    # per-metric throughput + mfu survive
    assert slim["sgcls_train_cached_images_per_sec"] == 238.21
    assert slim["sgdet_eval_mfu"] == 0.4862
    # exactness accounting survives
    assert slim["sgdet_pair_fallback_rate"] == 0.0
    assert slim["sgdet_nms_cand_overflow_rate"] == 0.0
    # compact env: identity only, no long lists
    assert slim["bench_env"] == {"cpu_count": 1, "device": "TPU v5 lite0",
                                 "jax": "0.9.0"}
    # full-only detail is gone from stdout
    assert "sgcls_train_best_images_per_sec" not in slim
    assert "sgcls_train_spread_pct" not in slim
    assert "sgcls_train_tflops_per_sec" not in slim


def test_slim_survives_alert_storm():
    """Every compute-only metric alerting at once (worst realistic case)
    plus error fields still fits the budget."""
    full = _r4_full_line()
    full["regression_alerts"] = [
        f"{k}: 238.21 -> 190.0 (-20%)" for k in bench.COMPUTE_ONLY]
    full["sgdet_train_cached_error"] = "X" * 120
    full["gan_train_cached_error"] = "Y" * 120
    slim = bench._slim(full)
    assert len(json.dumps(slim)) < bench.MAX_LINE_BYTES
    # the alerts survive (possibly as a count under extreme padding, but
    # at this realistic size they should be verbatim)
    assert "regression_alerts" in slim or "regression_alerts_n" in slim


def test_slim_hard_budget_under_adversarial_padding():
    """Even pathological extra content cannot break the byte contract."""
    full = _r4_full_line()
    for i in range(30):
        full[f"mystery_field_{i}_images_per_sec"] = 123.456
    full["regression_alerts"] = ["z" * 80 for _ in range(40)]
    slim = bench._slim(full)
    assert len(json.dumps(slim)) <= bench.MAX_LINE_BYTES
    assert slim["metric"] == "sgcls_train_images_per_sec"
    assert slim["value"] == 238.21
