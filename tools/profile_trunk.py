"""Trunk deep-dive on the real chip (VERDICT r3 item 4).

The VGG16 trunk is ~half the sgcls train step but runs far below the heads'
MXU efficiency. This tool measures WHERE the time goes and whether any
rewrite moves it, producing the per-attempt ms table the round brief asks
for:

  1. per-layer ms + TFLOP/s + MFU for the production trunk
     (cumulative-prefix timing: jit conv1..convK prefixes, diff
     consecutive medians — each prefix is a real compiled program, so the
     diffs include XLA's actual fusion/relayout decisions),
  2. batch sweep (B=8/24/48) to separate fixed relayout cost from conv
     cost,
  3. stem variants, timed as FULL-trunk replacements so any layout
     ripple shows up:
       - baseline          nn.Conv 3->64 on the raw image
       - channel_pad       input zero-padded 3->8 channels (the Mosaic
                           vector-concat rejection in GATES_r03 was about
                           lane-misaligned 3-channel loads; XLA may also
                           prefer an 8-deep contraction)
       - im2col            conv1_1 as extract_patches + one (27,64) matmul
       - fold_norm         uint8 normalization folded into conv1_1's
                           kernel/bias (removes the f32 (B,592,592,3)
                           normalize pass; input cast once to bf16)
  4. conv dimension-number sweep on the heaviest single conv (conv1_2,
     64->64 @ 592^2): NHWC vs NCHW operand orders at XLA level.

Reference being accelerated: the torchvision VGG16 trunk the reference
wraps (/root/reference/sgg_models/rel_model_base.py:310-321).

Run on TPU: python tools/profile_trunk.py [--iters 10] [--quick]
Prints a table + one JSON line (machine-readable, for STATUS/GATES).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sgg_tpu.models.backbone import (IMAGENET_MEAN, IMAGENET_STD, VGG16_CFG,
                                     VGG16Trunk)

PEAK_BF16 = 197e12  # v5e per-chip bf16 peak (public spec)


def sync(x):
    """Tunnel-safe sync: force a scalar readback (CLAUDE.md)."""
    float(jnp.asarray(x).ravel()[0].astype(jnp.float32))


def time_fn(fn, *args, iters=10, repeats=3):
    """Amortized-dispatch timing: queue `iters` async calls, sync once.

    A per-call readback would charge every iteration the full remote-tunnel
    round trip (~50-90 ms, larger than most programs measured here); the
    batched-dispatch pattern matches bench.py / tools/profile_step.py.
    Returns the min over `repeats` loops (tunnel jitter is one-sided)."""
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def flops_of(fn, *args) -> float:
    try:
        comp = jax.jit(fn).lower(*args).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


# ---------------------------------------------------------------- layers

def layer_names():
    names, block, k = [], 1, 1
    for v in VGG16_CFG:
        if v == "M":
            names.append(f"pool{block}")
            block += 1
            k = 1
        else:
            names.append(f"conv{block}_{k} ({v})")
            k += 1
    return names


def _prefix_apply(params, x, upto):
    """normalize + the first `upto` VGG16 layers, pure jax (flax modules
    can't be constructed outside a compact scope)."""
    from sgg_tpu.models.backbone import normalize_images
    x = normalize_images(x).astype(jnp.bfloat16)
    conv_i = 0
    for i, v in enumerate(VGG16_CFG):
        if i >= upto:
            break
        if v == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
        else:
            p = params[f"Conv_{conv_i}"]
            x = jax.lax.conv_general_dilated(
                x, p["kernel"].astype(jnp.bfloat16), (1, 1),
                ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.relu(x + p["bias"].astype(jnp.bfloat16))
            conv_i += 1
    return x


def prefix_fn(params, upto):
    return jax.jit(lambda x: _prefix_apply(params, x, upto))


# ---------------------------------------------------------------- variants

def make_baseline(params):
    trunk = VGG16Trunk(dtype=jnp.bfloat16)
    return jax.jit(lambda x: trunk.apply({"params": params}, x))


def _tail_from(params, x, first_out):
    """Apply conv1_2..end given conv1_1's output (shared by stem variants)."""
    from flax import linen as nn

    class Tail(nn.Module):
        dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, x):
            conv_i = 1
            for v in VGG16_CFG[1:]:
                if v == "M":
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                else:
                    x = nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                                name=f"Conv_{conv_i}")(x)
                    x = nn.relu(x)
                    conv_i += 1
            return x

    tail_params = {k: v for k, v in params.items() if k != "Conv_0"}
    return Tail().apply({"params": tail_params}, first_out)


def _norm(x):
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    return (x.astype(jnp.float32) - mean) / std


def make_channel_pad(params, pad_to=8):
    """Zero-pad input channels 3->pad_to; pad conv1_1 kernel to match."""
    k = params["Conv_0"]["kernel"]  # (3, 3, 3, 64)
    b = params["Conv_0"]["bias"]
    k_pad = jnp.pad(k, ((0, 0), (0, 0), (0, pad_to - k.shape[2]), (0, 0)))

    def fn(x):
        x = _norm(x).astype(jnp.bfloat16)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_to - x.shape[-1])))
        y = jax.lax.conv_general_dilated(
            x, k_pad.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.nn.relu(y + b.astype(jnp.bfloat16))
        return _tail_from(params, x, y)
    return jax.jit(fn)


def make_im2col(params):
    """conv1_1 as patch extraction + a single (27,64) matmul."""
    k = params["Conv_0"]["kernel"]  # (3, 3, 3, 64) HWIO
    b = params["Conv_0"]["bias"]
    # conv_general_dilated_patches emits features channel-major (C, kh, kw)
    w = jnp.transpose(k, (2, 0, 1, 3)).reshape(-1, k.shape[-1])  # (27, 64)

    def fn(x):
        x = _norm(x).astype(jnp.bfloat16)
        bsz, h, wdt, c = x.shape
        patches = jax.lax.conv_general_dilated_patches(
            x, (3, 3), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (B,H,W,27)
        y = patches @ w.astype(jnp.bfloat16)
        y = jax.nn.relu(y + b.astype(jnp.bfloat16))
        return _tail_from(params, x, y)
    return jax.jit(fn)


def make_im2col_manual(params):
    """conv1_1 as HAND-ROLLED im2col: 9 static pad-slices concatenated on
    the channel axis, then ONE (B*H*W, 27) @ (27, 64) matmul.

    conv_general_dilated_patches lowers to the same pathological small-C
    conv being replaced (im2col variant: 0.68x); explicit slices turn the
    patch build into pure bandwidth (~1.5 GB of moves) and the compute into
    a 27-deep MXU contraction (~21% of a 128 lane, vs the 0.8% MFU the
    direct conv achieves)."""
    k = params["Conv_0"]["kernel"]  # (3, 3, 3, 64) HWIO
    b = params["Conv_0"]["bias"]
    w = k.reshape(-1, k.shape[-1])  # (kh, kw, C) flatten -> (27, 64)

    def fn(x):
        x = _norm(x).astype(jnp.bfloat16)
        bsz, h, wd, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        rows = [xp[:, dh:dh + h] for dh in range(3)]          # H taps
        patches = jnp.concatenate(
            [r[:, :, dw:dw + wd] for r in rows for dw in range(3)], -1)
        y = patches @ w.astype(jnp.bfloat16)                  # (B,H,W,64)
        y = jax.nn.relu(y + b.astype(jnp.bfloat16))
        return _tail_from(params, x, y)
    return jax.jit(fn)


def make_fold_norm(params):
    """Fold ImageNet normalization into conv1_1: conv((u-m)/s, K) =
    conv(u, K/s) - conv(m/s, K) — the second term is a constant bias."""
    k = params["Conv_0"]["kernel"].astype(jnp.float32)  # (3,3,3,64)
    b = params["Conv_0"]["bias"].astype(jnp.float32)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    k_f = (k / std[None, None, :, None])
    b_f = b - (k_f * mean[None, None, :, None]).sum((0, 1, 2))

    def fn(x):
        x = x.astype(jnp.bfloat16)  # raw uint8 -> bf16, no normalize pass
        y = jax.lax.conv_general_dilated(
            x, k_f.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.nn.relu(y + b_f.astype(jnp.bfloat16))
        return _tail_from(params, x, y)
    return jax.jit(fn)


# ------------------------------------------------------------- dimnum sweep

def stem_dimnum_sweep(iters):
    """conv1_1-shaped conv (3->64 @ 592^2, B=24) under operand orders.

    The 3-channel stem is the trunk's one slow layer; channel-minor NHWC
    forces XLA to pad C 3->128 in HBM (~40x traffic inflation). NCHW makes
    W the minor dim (no tiny-lane pad), so the sweep checks whether any
    XLA-level operand order sidesteps the pathology."""
    rng = np.random.RandomState(0)
    res = {}
    x_nhwc = jnp.asarray(rng.randn(24, 592, 592, 3), jnp.bfloat16)
    k_hwio = jnp.asarray(rng.randn(3, 3, 3, 64), jnp.bfloat16)
    cases = {
        "NHWC/HWIO": (x_nhwc, k_hwio, ("NHWC", "HWIO", "NHWC")),
        "NHWC/HWIO->NCHW": (x_nhwc, k_hwio, ("NHWC", "HWIO", "NCHW")),
        "NCHW/OIHW": (jnp.transpose(x_nhwc, (0, 3, 1, 2)),
                      jnp.transpose(k_hwio, (3, 2, 0, 1)),
                      ("NCHW", "OIHW", "NCHW")),
        "NCHW/OIHW->NHWC": (jnp.transpose(x_nhwc, (0, 3, 1, 2)),
                            jnp.transpose(k_hwio, (3, 2, 0, 1)),
                            ("NCHW", "OIHW", "NHWC")),
        "CHWN/HWIO-style": (jnp.transpose(x_nhwc, (3, 1, 2, 0)),
                            k_hwio, ("CHWN", "HWIO", "CHWN")),
    }
    for name, (x, k, dn) in cases.items():
        fn = jax.jit(lambda x, k, dn=dn: jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn))
        try:
            res[name] = round(time_fn(fn, x, k, iters=iters) * 1000, 2)
        except Exception as e:
            res[name] = f"error: {type(e).__name__}"
    return res


def dimnum_sweep(iters):
    """conv1_2-shaped conv (64->64 @ 592^2, B=24) under operand orders."""
    rng = np.random.RandomState(0)
    res = {}
    x_nhwc = jnp.asarray(rng.randn(24, 592, 592, 64), jnp.bfloat16)
    k_hwio = jnp.asarray(rng.randn(3, 3, 64, 64), jnp.bfloat16)
    cases = {
        "NHWC/HWIO": (x_nhwc, k_hwio, ("NHWC", "HWIO", "NHWC")),
        "NCHW/OIHW": (jnp.transpose(x_nhwc, (0, 3, 1, 2)),
                      jnp.transpose(k_hwio, (3, 2, 0, 1)),
                      ("NCHW", "OIHW", "NCHW")),
        "NHWC/OHWI": (x_nhwc, jnp.transpose(k_hwio, (3, 0, 1, 2)),
                      ("NHWC", "OHWI", "NHWC")),
    }
    for name, (x, k, dn) in cases.items():
        fn = jax.jit(lambda x, k, dn=dn: jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn))
        try:
            res[name] = round(time_fn(fn, x, k, iters=iters) * 1000, 2)
        except Exception as e:  # an order XLA:TPU rejects is a finding too
            res[name] = f"error: {type(e).__name__}"
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--img", type=int, default=592)
    ap.add_argument("--quick", action="store_true",
                    help="skip the per-layer prefix table (compile-heavy)")
    ap.add_argument("--layers-only", action="store_true",
                    help="only the baseline + per-layer table")
    args = ap.parse_args()
    B, IMG = 24, args.img

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 256, (B, IMG, IMG, 3)), jnp.uint8)
    trunk = VGG16Trunk(dtype=jnp.bfloat16)
    params = trunk.init(jax.random.key(0), x)["params"]
    out = {"B": B, "img": IMG, "iters": args.iters}

    base_fn = make_baseline(params)
    base_ms = time_fn(base_fn, x, iters=args.iters) * 1000
    base_flops = flops_of(lambda x: trunk.apply({"params": params}, x), x)
    out["baseline_ms"] = round(base_ms, 2)
    out["baseline_tflops"] = round(base_flops / (base_ms / 1e3) / 1e12, 1)
    out["baseline_mfu"] = round(
        base_flops / (base_ms / 1e3) / PEAK_BF16, 3)
    print(f"\nbaseline trunk B={B}@{IMG}: {base_ms:.2f} ms  "
          f"{out['baseline_tflops']} TF/s  MFU {out['baseline_mfu']:.1%}",
          flush=True)

    # batch sweep: fixed overhead vs conv scaling
    out["batch_sweep"] = {}
    for bsz in () if args.layers_only else (8, 24, 48):
        xb = jnp.asarray(rng.randint(0, 256, (bsz, IMG, IMG, 3)), jnp.uint8)
        ms = time_fn(base_fn, xb, iters=max(3, args.iters // 2)) * 1000
        out["batch_sweep"][bsz] = {"ms": round(ms, 2),
                                   "img_s": round(bsz / (ms / 1e3), 1),
                                   "ms_per_img": round(ms / bsz, 3)}
        print(f"  B={bsz:3d}: {ms:8.2f} ms  {bsz / (ms / 1e3):7.1f} img/s",
              flush=True)

    # stem variants (full-trunk timings; parity asserted vs baseline)
    out["variants"] = {}
    variant_list = [] if args.layers_only else [
        ("channel_pad8", lambda: make_channel_pad(params, 8)),
        ("im2col", lambda: make_im2col(params)),
        ("im2col_manual", lambda: make_im2col_manual(params)),
        ("fold_norm", lambda: make_fold_norm(params))]
    ref = None if args.layers_only else np.asarray(base_fn(x), np.float32)
    for name, mk in variant_list:
        try:
            fn = mk()
            got = np.asarray(fn(x), np.float32)
            # bf16 trunks: loose tolerance; fold_norm reorders the scale
            err = float(np.max(np.abs(got - ref)) /
                        max(1e-6, float(np.max(np.abs(ref)))))
            ms = time_fn(fn, x, iters=args.iters) * 1000
            out["variants"][name] = {"ms": round(ms, 2),
                                     "vs_baseline": round(base_ms / ms, 3),
                                     "rel_err": round(err, 4)}
            print(f"  {name:14s}: {ms:8.2f} ms  ({base_ms / ms:5.2f}x)  "
                  f"rel_err {err:.4f}", flush=True)
        except Exception as e:
            out["variants"][name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"  {name:14s}: ERROR {e}", flush=True)

    if not args.layers_only:
        out["dimnum_conv1_2"] = dimnum_sweep(max(3, args.iters // 2))
        print(f"  conv1_2 dimnums: {out['dimnum_conv1_2']}", flush=True)
        out["dimnum_conv1_1"] = stem_dimnum_sweep(max(3, args.iters // 2))
        print(f"  conv1_1 dimnums: {out['dimnum_conv1_1']}", flush=True)

    if not args.quick:
        # per-layer table via compiled-prefix diffs
        names = layer_names()
        prefix_ms, prefix_flops = [0.0], [0.0]
        for upto in range(1, len(VGG16_CFG) + 1):
            fn = prefix_fn(params, upto)
            ms = time_fn(fn, x, iters=max(3, args.iters // 2)) * 1000
            fl = flops_of(lambda x, u=upto: _prefix_apply(params, x, u), x)
            prefix_ms.append(ms)
            prefix_flops.append(fl)
        table = []
        print(f"\n{'layer':16s} {'ms':>8s} {'TF/s':>7s} {'MFU':>6s}")
        for i, name in enumerate(names):
            dms = prefix_ms[i + 1] - prefix_ms[i]
            dfl = prefix_flops[i + 1] - prefix_flops[i]
            tf = dfl / (dms / 1e3) / 1e12 if dms > 0 else 0.0
            mfu = dfl / (dms / 1e3) / PEAK_BF16 if dms > 0 else 0.0
            table.append({"layer": name, "ms": round(dms, 2),
                          "tflops": round(tf, 1), "mfu": round(mfu, 3)})
            print(f"{name:16s} {dms:8.2f} {tf:7.1f} {mfu:6.1%}", flush=True)
        out["per_layer"] = table

    print(json.dumps(out))


if __name__ == "__main__":
    main()
