"""Re-probe the toolchain-gated perf alternatives on the current chip.

Five rewrites are implemented, parity-tested, and measured-blocked on a
prior toolchain snapshot (determinations in each module docstring):
fixed-point NMS (``ops/nms.py``), Pallas RoIAlign
(``ops/roi_align_pallas.py``), outer-product RoIAlign
(``ops/roi_align.py method='outer'``), space-to-depth stem conv
(``ops/stem_conv.py``), and the Pallas VGG stem
(``ops/vgg_stem_pallas.py``). "Blocked" is a property of the toolchain,
not the code — this tool re-runs each probe so a newer toolchain can be
detected and the defaults flipped (VERDICT r2, item 5).

Each gate runs in its OWN subprocess: the known failure mode of two gates
is a TPU-worker crash/hang, which must not take down the other probes.

Usage:
  python tools/reprobe_gates.py          # run all gates, print a table
  python tools/reprobe_gates.py <gate>   # run one gate in-process
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

GATES = ("nms_fixpoint", "pallas_roi", "outer_roi", "s2d_stem",
         "vgg_stem_pallas")
PER_GATE_TIMEOUT = 900


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


def gate_nms_fixpoint():
    """Fixed-point NMS composed into the FULL detector program (the
    standalone kernel already works; composition is what crashed)."""
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

    def run(method):
        det_mod.nms = functools.partial(nms_mod.nms, method=method)
        try:
            step = jax.jit(lambda v, im, hw: det.apply(v, im, hw,
                                                       train=False))
            ms = _time(lambda: step(det_vars, gb.images, gb.im_hw)["scores"])
        finally:
            det_mod.nms = nms_mod.nms
        return ms

    seq = run("sequential")
    fix = run("fixpoint")
    return {"sequential_ms": round(seq, 2), "fixpoint_ms": round(fix, 2),
            "winner": "fixpoint" if fix < seq else "sequential"}


def gate_pallas_roi():
    """Pallas RoIAlign vs the XLA separable path at the SGCls union load
    (B=24, 256 ROIs, 37x37x512 bf16 fmap)."""
    import jax
    import jax.numpy as jnp

    from sgg_tpu.ops.roi_align import roi_align
    from sgg_tpu.ops.roi_align_pallas import roi_align_pallas

    B, H, W, C, R = 24, 37, 37, 512, 256
    k1, k2 = jax.random.split(jax.random.key(0))
    fmap = jax.random.normal(k1, (B, H, W, C), jnp.bfloat16)
    rois = jax.random.uniform(k2, (B, R, 4), jnp.float32) * 500
    rois = rois.at[..., 2:].set(rois[..., :2] + 90)

    xla = _time(lambda: roi_align(fmap, rois, spatial_scale=1 / 16.0,
                                  pooled=7))
    pallas = _time(lambda: roi_align_pallas(fmap, rois,
                                            spatial_scale=1 / 16.0,
                                            pooled=7), iters=3)
    return {"xla_ms": round(xla, 2), "pallas_ms": round(pallas, 2),
            "winner": "pallas" if pallas < xla else "xla"}


def gate_outer_roi():
    """Outer-product (single-matmul) RoIAlign vs separable, same load."""
    import jax
    import jax.numpy as jnp

    from sgg_tpu.ops.roi_align import roi_align

    B, H, W, C, R = 24, 37, 37, 512, 256
    k1, k2 = jax.random.split(jax.random.key(0))
    fmap = jax.random.normal(k1, (B, H, W, C), jnp.bfloat16)
    rois = jax.random.uniform(k2, (B, R, 4), jnp.float32) * 500
    rois = rois.at[..., 2:].set(rois[..., :2] + 90)

    sep = _time(lambda: roi_align(fmap, rois, spatial_scale=1 / 16.0,
                                  pooled=7, method="separable"))
    outer = _time(lambda: roi_align(fmap, rois, spatial_scale=1 / 16.0,
                                    pooled=7, method="outer"))
    return {"separable_ms": round(sep, 2), "outer_ms": round(outer, 2),
            "winner": "outer" if outer < sep else "separable"}


def gate_s2d_stem():
    """Space-to-depth stem conv vs direct conv (bf16 24x592x592x3 -> 64)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sgg_tpu.ops.stem_conv import stem_conv_s2d

    B = 24
    k1, k2 = jax.random.split(jax.random.key(0))
    x = jax.random.normal(k1, (B, 592, 592, 3), jnp.bfloat16)
    w = jax.random.normal(k2, (3, 3, 3, 64), jnp.bfloat16) * 0.1
    b = jnp.zeros((64,), jnp.bfloat16)

    def direct(x):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    direct_j = jax.jit(direct)
    s2d_j = jax.jit(lambda x: stem_conv_s2d(x, w, b, block=2))
    d = _time(lambda: direct_j(x))
    s = _time(lambda: s2d_j(x))
    return {"direct_ms": round(d, 2), "s2d_ms": round(s, 2),
            "winner": "s2d" if s < d else "direct"}


def gate_vgg_stem_pallas():
    """Pallas VGG stem kernel: does it lower on this toolchain, and how
    does it compare to the direct conv?"""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sgg_tpu.ops.vgg_stem_pallas import vgg_conv1_pallas

    B = 24
    k1, k2 = jax.random.split(jax.random.key(0))
    x = jax.random.normal(k1, (B, 592, 592, 3), jnp.bfloat16)
    w = jax.random.normal(k2, (3, 3, 3, 64), jnp.bfloat16) * 0.1
    b = jnp.zeros((64,), jnp.bfloat16)

    def direct(x):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    d = _time(lambda: jax.jit(direct)(x))
    p = _time(lambda: vgg_conv1_pallas(x, w, b), iters=3)
    return {"direct_ms": round(d, 2), "pallas_ms": round(p, 2),
            "winner": "pallas" if p < d else "direct"}


def main():
    if len(sys.argv) > 1:
        gate = sys.argv[1]
        result = globals()[f"gate_{gate}"]()
        print("GATE_RESULT " + json.dumps({gate: result}))
        return

    results = {}
    for gate in GATES:
        t0 = time.time()
        try:
            env = dict(os.environ)
            env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), gate],
                capture_output=True, text=True, timeout=PER_GATE_TIMEOUT,
                cwd=ROOT, env=env)
            line = [l for l in proc.stdout.splitlines()
                    if l.startswith("GATE_RESULT ")]
            if proc.returncode == 0 and line:
                results.update(json.loads(line[0][len("GATE_RESULT "):]))
            else:
                tail = (proc.stdout + proc.stderr)[-400:]
                results[gate] = {"error": f"rc={proc.returncode}",
                                 "tail": tail}
        except subprocess.TimeoutExpired:
            results[gate] = {"error": "timeout",
                             "tail": f">{PER_GATE_TIMEOUT}s"}
        results[gate]["elapsed_s"] = round(time.time() - t0, 1)
        print(f"{gate}: {json.dumps(results[gate])}", flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
