"""Component-time breakdown of the GAN F/G/D training step on the real chip.

Run on TPU: python tools/profile_gan.py

Answers VERDICT r4 weak #3 for the `gan_train` bench metric (0.52 MFU):
per-block ms + per-block MFU so the non-MXU half of the step is accounted
for. Mirrors tools/profile_step.py / profile_sgdet.py. Production shapes
(B=24, N=40, E=256, 592 px, 151/51 classes, bf16) — the same program
bench.py times (reference choreography: /root/reference/main.py:100-200).
"""

import sys
import time

sys.path.insert(0, ".")

import jax

if __name__ == "__main__" and \
        __import__("os").environ.get("JAX_PLATFORMS", "") == "cpu":
    # the axon TPU plugin pins the platform and ignores the env var —
    # honor it explicitly so CPU smoke runs stay off the chip
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from sgg_tpu.config import Config
from sgg_tpu.data import SyntheticSGGDataset
from sgg_tpu.models import RelModelIMP
from sgg_tpu.models.gan import GANModel
from sgg_tpu.ops.boxes import scale_boxes_01
from sgg_tpu.train.assign import sample_edges
from sgg_tpu.train.gan_step import create_gan_state, make_gan_train_step
from sgg_tpu.train.state import create_train_state
from sgg_tpu.train.step import make_train_step

import os

B = int(os.environ.get("SGG_PROFILE_B", 24))
N = int(os.environ.get("SGG_PROFILE_N", 40))
E = int(os.environ.get("SGG_PROFILE_E", 256))
IMG = int(os.environ.get("SGG_PROFILE_IMG", 592))
PEAK_TFLOPS = 197.0  # v5e bf16 peak (same constant bench.py uses)


def _flops_of(jitted, *args, **kw):
    try:
        ca = jitted.lower(*args, **kw).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def timeit(name, fn, *args, iters=10, flops=None):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).astype(jnp.float32).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).astype(jnp.float32).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    mfu = ""
    if flops:
        mfu = f"  {flops / dt / 1e12:6.1f} TF/s ({flops / dt / 1e12 / PEAK_TFLOPS * 100:4.1f}% MFU)"
    print(f"{name:40s} {dt * 1000:8.2f} ms  ({B / dt:7.1f} img/s){mfu}")
    return dt


def main():
    config = Config(batch_size=B, max_nodes=N, max_edges=E, mode="sgcls",
                    loss="dnorm", gan=True, ganlosses=("D", "G", "rec"))
    ds = SyntheticSGGDataset(num_images=B, num_classes=151,
                             num_predicates=51, max_objects=20,
                             image_size=IMG, with_images=True, seed=0)
    gb = jax.device_put(ds.batch(list(range(B)), max_nodes=N, max_edges=E))
    model = RelModelIMP(num_classes=151, num_predicates=51, mode="sgcls",
                        dtype=jnp.bfloat16)
    gan = GANModel(num_classes=151, num_predicates=51, dtype=jnp.bfloat16)
    sampled, pm = sample_edges(jax.random.key(0), gb.rels, gb.rel_mask,
                               gb.node_mask, max_out=E)
    pairs = sampled[..., :2]
    variables = jax.jit(lambda k: model.init(
        k, gb.images, gb.boxes, gb.classes, pairs, pm,
        train=False))(jax.random.key(0))
    boxes01 = scale_boxes_01(gb.boxes, gb.im_hw)
    gan_vars = jax.jit(lambda k: gan.init(
        k, gb.classes, boxes01, gb.rels, gb.node_mask, gb.rel_mask,
        train=False, method=gan.init_all))(jax.random.key(1))
    sgg_state = create_train_state(config, variables)
    state = create_gan_state(config, sgg_state, gan_vars)

    # --- phase 1 in isolation: the plain SGG train step -------------------
    # (donated first arg -> thread the state through a box)
    f_step = make_train_step(model, config)
    # donation would invalidate the buffers state.sgg shares — copy first
    fbox = {"s": jax.tree_util.tree_map(
        lambda x: jnp.copy(x) if hasattr(x, "dtype") else x, sgg_state)}

    def run_f(i=0):
        fbox["s"], m = f_step(fbox["s"], gb, jax.random.key(i))
        return m

    m1 = run_f()
    float(m1["total"])
    flops_f = _flops_of(f_step, fbox["s"], gb, jax.random.key(0))
    t0 = time.perf_counter()
    for i in range(10):
        m1 = run_f(i)
    float(m1["total"])
    t_f = (time.perf_counter() - t0) / 10
    mfu_f = (f"  {flops_f / t_f / 1e12:6.1f} TF/s "
             f"({flops_f / t_f / 1e12 / PEAK_TFLOPS * 100:4.1f}% MFU)"
             if flops_f else "")
    print(f"{'phase F: SGG fwd+bwd+update':40s} {t_f * 1000:8.2f} ms  "
          f"({B / t_f:7.1f} img/s){mfu_f}")

    gvars = {"params": state.gan_params, "batch_stats": state.gan_stats}

    # --- generator forward -------------------------------------------------
    gen_fn = jax.jit(lambda v: gan.apply(
        v, gb.classes, boxes01, gb.rels, gb.node_mask, gb.rel_mask,
        train=False, method=gan.generate))
    fmaps_fake = gen_fn(gvars)
    t_gen = timeit("G forward (GCN+layout+CRN)", gen_fn, gvars,
                   flops=_flops_of(gen_fn, gvars))

    # --- generator fwd+bwd (adversarial-path gradient shape) --------------
    def gen_loss(params):
        f = gan.apply({"params": params, "batch_stats": state.gan_stats},
                      gb.classes, boxes01, gb.rels, gb.node_mask,
                      gb.rel_mask, train=False, method=gan.generate)
        return jnp.sum(f.astype(jnp.float32))

    gen_grad = jax.jit(jax.grad(gen_loss))
    gen_grad(state.gan_params)
    timeit("G fwd+bwd (grad wrt G params)", gen_grad, state.gan_params,
           flops=_flops_of(gen_grad, state.gan_params))

    # --- SGG forward on fake fmaps (runs 1-2x inside the G phase) ---------
    sgg_fake_fn = jax.jit(lambda v, f: model.apply(
        v, None, gb.boxes, gb.classes, pairs, pm, fmap=f, train=False,
        return_feats=True))
    out_fake = sgg_fake_fn(variables, fmaps_fake)
    t_sggf = timeit("SGG fwd on fake fmap (per call)", sgg_fake_fn,
                    variables, fmaps_fake,
                    flops=_flops_of(sgg_fake_fn, variables, fmaps_fake))

    # --- the three discriminator forwards ----------------------------------
    nodes_fake = out_fake["node_pool"]
    edges_fake = out_fake["edge_pool"]
    dn_fn = jax.jit(lambda v, x: gan.apply(v, x, gb.classes,
                                           method=gan.disc_nodes))
    dn_fn(gvars, nodes_fake)
    timeit("D_nodes fwd (960 rois)", dn_fn, gvars, nodes_fake,
           flops=_flops_of(dn_fn, gvars, nodes_fake))
    de_fn = jax.jit(lambda v, x: gan.apply(v, x, sampled[..., 2],
                                           method=gan.disc_edges))
    de_fn(gvars, edges_fake)
    timeit("D_edges fwd (6144 unions)", de_fn, gvars, edges_fake,
           flops=_flops_of(de_fn, gvars, edges_fake))
    dg_fn = jax.jit(lambda v, x: gan.apply(v, x, method=gan.disc_global))
    dg_fn(gvars, fmaps_fake)
    timeit("D_global fwd (24 fmaps)", dg_fn, gvars, fmaps_fake,
           flops=_flops_of(dg_fn, gvars, fmaps_fake))

    # --- D phase in isolation: BCE real-vs-fake grads over the three Ds ---
    real_fmap = out_fake["fmap"]

    def d_loss(params):
        v = {"params": params, "batch_stats": state.gan_stats}
        import optax
        tot = jnp.zeros(())
        for feats, labels in ((nodes_fake, gb.classes),):
            for t in (1.0, 0.0):
                lo = gan.apply(v, feats, labels, method=gan.disc_nodes)
                tot += optax.sigmoid_binary_cross_entropy(
                    lo, jnp.full_like(lo, t)).mean()
        for t in (1.0, 0.0):
            lo = gan.apply(v, edges_fake, sampled[..., 2],
                           method=gan.disc_edges)
            tot += optax.sigmoid_binary_cross_entropy(
                lo, jnp.full_like(lo, t)).mean()
            lo = gan.apply(v, real_fmap, method=gan.disc_global)
            tot += optax.sigmoid_binary_cross_entropy(
                lo, jnp.full_like(lo, t)).mean()
        return tot

    d_grad = jax.jit(jax.grad(d_loss))
    d_grad(state.gan_params)
    t_d = timeit("phase D: 3xD fwd+bwd (2 passes each)", d_grad,
                 state.gan_params, flops=_flops_of(d_grad,
                                                   state.gan_params))

    # --- full step ----------------------------------------------------------
    step = make_gan_train_step(model, gan, config)
    box = {"s": state}

    def run(i):
        box["s"], m = step(box["s"], gb, gb.classes, None, jax.random.key(i))
        return m

    m = run(0)
    float(m["obj_loss"])
    t0 = time.perf_counter()
    iters = 10
    for i in range(iters):
        m = run(i + 1)
    float(m["obj_loss"])
    t_full = (time.perf_counter() - t0) / iters
    flops_full = _flops_of(step, box["s"], gb, gb.classes, None,
                           jax.random.key(0))
    mfu = f"  {flops_full / t_full / 1e12:6.1f} TF/s ({flops_full / t_full / 1e12 / PEAK_TFLOPS * 100:4.1f}% MFU)" if flops_full else ""
    print(f"{'FULL GAN F/G/D step':40s} {t_full * 1000:8.2f} ms  "
          f"({B / t_full:7.1f} img/s){mfu}")

    print(f"\nshares of the full step: F {100 * t_f / t_full:.0f}%  "
          f"G-fwd {100 * t_gen / t_full:.0f}%  "
          f"SGG-on-fake {100 * t_sggf / t_full:.0f}%/call  "
          f"D-phase {100 * t_d / t_full:.0f}%")


if __name__ == "__main__":
    main()
