"""Benchmark: SGCls training throughput on one TPU chip.

Prints ONE JSON line (< 1900 bytes — the driver captures a 2000-char tail,
round-4's line outgrew it and the round artifact lost its headline fields):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
The slim line carries the essentials (per-metric img/s + mfu, vs_baseline,
fallback rates, regression_alerts, compact bench_env); the FULL record
(best_*, spread_pct, tflops, derivations) is written to BENCH_FULL.json
beside this file.

Measured workload: the full SGCls training step (VGG16 trunk on 592x592
images, RoIAlign node+union features, rects conv, 4096-d RoI heads, 3-iter
IMP message passing, dnorm loss, SGD update) on VG-statistics synthetic
batches — the same per-image compute as the reference's canonical run
(``/root/reference/main.py`` with ``-b 24``, README.md:184-192).

Baseline: the reference trains VG SGCls (57k images/epoch, 20 epochs + eval)
in ~1 day on one 1080Ti/2080Ti-class GPU at b=24 (README.md:43,179-198;
GQA ~1 day README.md:227), i.e. ~13 images/sec. vs_baseline reports our
images/sec against that estimate.

Measurement protocol (round 4):
  * every metric is timed as ``REPEATS`` independent blocks of ``iters``
    steps; the headline value is the MEDIAN block, and ``*_spread_pct``
    reports (max-min)/median across blocks so a slow-tunnel hour is
    distinguishable from a real regression;
  * per-step FLOPs come from XLA's own cost analysis
    (``jitted.lower(...).compile().cost_analysis()``), giving absolute
    ``*_tflops_per_sec`` and ``*_mfu`` against the v5e bf16 peak —
    denominator-free perf accounting (round-3 VERDICT #3);
  * ``bench_env`` records cpu_count / device / link bandwidth and which
    metrics are tunnel-sensitive; ``regression_alerts`` lists compute-only
    metrics that moved >15% against the committed ``BENCH_REFERENCE.json``
    line.

Two pipeline numbers contextualize the step numbers:
  value                    — step-only img/s (device-resident batch): the
                             compute ceiling of the chip.
  pipeline_images_per_sec  — pipeline-inclusive img/s: distinct host uint8
                             batches streamed through device_prefetch (H2D
                             overlap) into the same step. In THIS dev
                             environment H2D rides a ~50 MB/s remote-TPU
                             tunnel (~25 MB/batch), which caps the pipeline
                             number; on a real TPU host PCIe/DMA makes the
                             gap vanish.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import jax
import numpy as np

_T0 = time.time()


def _stage(name: str) -> None:
    """Progress marker on STDERR (stdout carries only the one JSON line)."""
    print(f"[bench +{time.time() - _T0:7.1f}s] {name}", file=sys.stderr,
          flush=True)

REFERENCE_IMAGES_PER_SEC = 13.0  # 2080Ti-class estimate, see docstring
# sgdet test eval: "a couple hours" for the 10k-image GQA test set
# (reference README.md:243) ~= 1.4 img/s
REFERENCE_SGDET_EVAL_IMAGES_PER_SEC = 1.4
# detector fine-tune: "~1 day" for ~72k GQA images x 10 epochs
# (reference README.md:236) ~= 8.3 img/s
REFERENCE_DETECTOR_PRETRAIN_IMAGES_PER_SEC = 8.3
# TPU v5e (lite) bf16 peak: 197 TFLOP/s per chip (public spec).
PEAK_BF16_TFLOPS = 197.0
BATCH = 24
MAX_NODES = 40
MAX_EDGES = 256
IMG = 592
ITERS = 10
REPEATS = 3
WARMUP = 3

# metrics whose value depends only on chip compute (not the tunnel / host):
# these are checked against BENCH_REFERENCE.json for >15% moves
COMPUTE_ONLY = (
    "sgcls_train_images_per_sec", "sgcls_train_cached_images_per_sec",
    "sgcls_eval_images_per_sec", "sgcls_eval_cached_images_per_sec",
    "sgdet_eval_images_per_sec", "sgdet_train_images_per_sec",
    "gan_train_images_per_sec", "detector_pretrain_images_per_sec",
)
TUNNEL_SENSITIVE = ("pipeline_images_per_sec", "h2d_link_mbps",
                    "host_prep_images_per_sec")


def _measure(enqueue, sync, iters: int = ITERS, repeats: int = REPEATS):
    """Per-repeat wall seconds of ``iters`` enqueued steps + final sync.

    ``sync`` must force completion via a scalar readback —
    block_until_ready does NOT synchronize on the tunneled axon backend.
    """
    times = []
    for r in range(repeats):
        t0 = time.perf_counter()
        for i in range(iters):
            enqueue(r * iters + i)
        sync()
        times.append(time.perf_counter() - t0)
    return times


def _flops_of(jitted, *args, **kw):
    """Per-call FLOPs from XLA cost analysis (None if unavailable).

    The program was just executed, so lower+compile is served by the
    in-process/persistent compile cache rather than a fresh tunnel compile.
    """
    try:
        ca = jitted.lower(*args, **kw).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def _fields(name: str, times, n_img_per_iter: int, iters: int = ITERS,
            flops_per_step=None):
    """Throughput + variance + MFU fields for one metric."""
    med = statistics.median(times)
    spread = (max(times) - min(times)) / med * 100
    out = {
        f"{name}_images_per_sec": round(n_img_per_iter * iters / med, 2),
        f"{name}_best_images_per_sec": round(
            n_img_per_iter * iters / min(times), 2),
        f"{name}_spread_pct": round(spread, 1),
    }
    if flops_per_step:
        tf = flops_per_step * iters / med / 1e12
        out[f"{name}_tflops_per_sec"] = round(tf, 2)
        out[f"{name}_mfu"] = round(tf / PEAK_BF16_TFLOPS, 4)
    return out


def _pop_metric(fields, name):
    """Split the '{name}_images_per_sec' headline out of a fields dict."""
    return fields.pop(f"{name}_images_per_sec"), fields


# stdout-line size contract: the driver captures a 2000-char tail of the
# bench output; BENCH_r04 overflowed it and `parsed` came back null. The
# slim line must stay comfortably below that with headroom for alerts.
MAX_LINE_BYTES = 1900

# key suffixes that belong to the FULL record only (written to
# BENCH_FULL.json), in the order they are dropped if the slim line is
# still too long after the suffix filter (defense in depth — should not
# trigger in practice).
_FULL_ONLY_SUFFIXES = ("_best_images_per_sec", "_spread_pct",
                       "_tflops_per_sec")
_DROP_ORDER_SUFFIXES = ("_mfu", "_vs_baseline", "_cached_images_per_sec")


def _slim(line: dict) -> dict:
    """The < MAX_LINE_BYTES stdout subset of the full bench record.

    Keeps: headline metric/value/vs_baseline, per-metric img/s + mfu,
    fallback rates, pipeline + link numbers, errors, regression_alerts,
    and a compact bench_env. Drops per-metric best/spread/tflops detail
    (those live in BENCH_FULL.json). Guarantees the byte budget by
    progressively dropping lower-priority suffixes, then truncating
    regression_alerts to a count.
    """
    slim = {k: v for k, v in line.items()
            if not k.endswith(_FULL_ONLY_SUFFIXES)}
    env = line.get("bench_env")
    if isinstance(env, dict):
        slim["bench_env"] = {k: env[k] for k in
                             ("cpu_count", "device", "jax") if k in env}

    def size(d):
        return len(json.dumps(d))

    for suffix in _DROP_ORDER_SUFFIXES:
        if size(slim) <= MAX_LINE_BYTES:
            break
        protected = ("value", "vs_baseline")  # headline stays
        slim = {k: v for k, v in slim.items()
                if k in protected or not k.endswith(suffix)}
    if size(slim) > MAX_LINE_BYTES and "regression_alerts" in slim:
        slim["regression_alerts_n"] = len(slim.pop("regression_alerts"))
    while size(slim) > MAX_LINE_BYTES and len(slim) > 4:
        # last resort: drop the longest non-headline entry
        k = max((k for k in slim
                 if k not in ("metric", "value", "unit", "vs_baseline")),
                key=lambda k: len(json.dumps({k: slim[k]})))
        del slim[k]
    return slim


def main():
    import jax.numpy as jnp

    # persistent compilation cache: the full-model compile via the remote
    # tunnel takes minutes; cache it across bench runs
    try:
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from sgg_tpu.config import Config
    from sgg_tpu.data import SyntheticSGGDataset
    from sgg_tpu.models import RelModelIMP
    from sgg_tpu.train.assign import sample_edges
    from sgg_tpu.train.state import create_train_state
    from sgg_tpu.train.step import make_train_step

    _stage("sgcls_train")
    config = Config(batch_size=BATCH, max_nodes=MAX_NODES,
                    max_edges=MAX_EDGES, mode="sgcls", loss="dnorm")
    model = RelModelIMP(num_classes=151, num_predicates=51, mode="sgcls",
                        dtype=jnp.bfloat16)
    ds = SyntheticSGGDataset(num_images=BATCH, num_classes=151,
                             num_predicates=51, max_objects=20,
                             image_size=IMG, with_images=True, seed=0)
    gb = ds.batch(list(range(BATCH)), max_nodes=MAX_NODES,
                  max_edges=MAX_EDGES)
    gb = jax.device_put(gb)  # batches are host-resident by design
    sampled, pmask = sample_edges(jax.random.key(0), gb.rels, gb.rel_mask,
                                  gb.node_mask, max_out=MAX_EDGES)
    variables = model.init(jax.random.key(0), gb.images, gb.boxes,
                           gb.classes, sampled[..., :2], pmask, train=False)
    state = create_train_state(config, variables)
    step = make_train_step(model, config)

    # NOTE: block_until_ready does not synchronize on the tunneled axon
    # backend; a scalar device->host readback is the reliable barrier.
    box = {"state": state, "metrics": None}

    def enqueue_train(i):
        box["state"], box["metrics"] = step(box["state"], gb,
                                            jax.random.key(i))

    def sync_train():
        assert np.isfinite(float(box["metrics"]["total"]))

    for i in range(WARMUP):
        enqueue_train(i)
    sync_train()
    train_flops = _flops_of(step, box["state"], gb, jax.random.key(0))
    times = _measure(enqueue_train, sync_train)
    img_per_sec, train_extra = _pop_metric(
        _fields("sgcls_train", times, BATCH, flops_per_step=train_flops),
        "sgcls_train")

    # ---- pipeline-inclusive: distinct host-resident uint8 batches streamed
    # through device_prefetch (overlapped H2D) into the same step ----
    import dataclasses

    from sgg_tpu.data.pipeline import device_prefetch

    _stage("pipeline")
    host_batches = []
    for k in range(4):
        hb = ds.batch(list(range(BATCH)), max_nodes=MAX_NODES,
                      max_edges=MAX_EDGES)
        # uint8 canvases: the pipeline's low-bandwidth transfer format
        # (device-side normalization, models/backbone.py:normalize_images)
        hb = dataclasses.replace(
            hb, images=np.round(np.asarray(hb.images) * 255).astype(np.uint8))
        host_batches.append(hb)

    def stream(n):
        for k in range(n):
            yield host_batches[k % len(host_batches)]

    # warmup (uint8 input recompiles the step once)
    for b in device_prefetch(stream(2), size=2):
        enqueue_pipe_batch = b
        box["state"], box["metrics"] = step(box["state"], b,
                                            jax.random.key(99))
    sync_train()
    t0 = time.perf_counter()
    n_pipe = 10
    for i, b in enumerate(device_prefetch(stream(n_pipe), size=2)):
        box["state"], box["metrics"] = step(box["state"], b,
                                            jax.random.key(100 + i))
    sync_train()
    pipe_per_sec = BATCH * n_pipe / (time.perf_counter() - t0)

    # ---- frozen-trunk feature-cache training step (data/feature_cache.py,
    # no reference analogue): the trunk output is precomputed once per
    # image x flip, so the step starts at RoIAlign. Same state/step
    # function; the batch carries fmaps instead of images. The fmap here is
    # the REAL trunk output of the bench batch, so head compute is
    # realistic.
    errors = {}
    cached_fields = None
    try:
        _stage("sgcls_train_cached")
        from sgg_tpu.data.feature_cache import cached_batch
        gb_cached = cached_batch(box["state"].params["trunk"], gb)

        def enqueue_cached(i):
            box["state"], box["metrics"] = step(box["state"], gb_cached,
                                                jax.random.key(200 + i))

        for i in range(WARMUP):
            enqueue_cached(i)
        sync_train()
        cflops = _flops_of(step, box["state"], gb_cached, jax.random.key(0))
        times = _measure(enqueue_cached, sync_train)
        cached_fields = _fields("sgcls_train_cached", times, BATCH,
                                flops_per_step=cflops)
    except Exception as e:
        errors["sgcls_train_cached_error"] = repr(e)[:120]

    # measured H2D link bandwidth, reported alongside: the pipeline number
    # is capped by the remote-TPU tunnel (~25 MB/batch), whose bandwidth
    # varies by the hour — this field makes a slow-tunnel run
    # self-explaining instead of looking like a pipeline regression.
    imgs_u8 = host_batches[0].images
    jax.device_put(imgs_u8)  # warm
    t0 = time.perf_counter()
    n_xfer = 3
    for _ in range(n_xfer):
        d = jax.device_put(imgs_u8)
    float(jnp.asarray(d).reshape(-1)[0])
    link_mbps = imgs_u8.nbytes * n_xfer / (time.perf_counter() - t0) / 1e6

    # ---- sgdet end-to-end eval (detector -> all detection pairs -> IMP):
    # the reference's slowest protocol (~1.4 img/s: "a couple hours" for
    # the 10k-image GQA test set, README.md:243). Guarded so a failure
    # cannot break the one-JSON-line contract.
    sgdet_fields = sgdet_caps = None
    try:
        _stage("sgdet_eval")
        sgdet_fields, sgdet_caps = _bench_sgdet_eval()
    except Exception as e:  # record, don't hide (a consumer must be able
        errors["sgdet_eval_error"] = repr(e)[:120]  # to tell broken from
        pass                                        # not-run)

    # ---- sgcls eval (the reference's per-epoch val / test protocol,
    # lib/eval.py val_epoch at batch size 1): jitted all-pairs eval step
    # with the driver's pair-budget ladder (512 rung, typical images in a
    # 64-node no-truncation bucket).
    # NOTE self-contained (fresh init): main's ``variables`` share buffers
    # with ``state.params``, which the donating train step invalidates.
    sgcls_eval_fields = sgcls_eval_cached_fields = None
    try:
        _stage("sgcls_eval")
        sgcls_eval_fields, sgcls_eval_cached_fields = \
            _bench_sgcls_eval(model)
    except Exception as e:
        errors["sgcls_eval_error"] = repr(e)[:120]

    line = {
        "metric": "sgcls_train_images_per_sec",
        "value": round(img_per_sec, 2),
        "unit": "images/sec/chip",
        # PROVENANCE: both vs_baseline denominators are ESTIMATES derived
        # from the reference README's runtime claims (13 img/s train from
        # "~1 day" for 57k imgs x 20 epochs + eval, README.md:227;
        # 1.4 img/s sgdet eval from "a couple hours" for 10k images,
        # README.md:243) — no measured 2080Ti number exists in the repo.
        "baseline_source": "estimate",
        "vs_baseline": round(img_per_sec / REFERENCE_IMAGES_PER_SEC, 2),
        "pipeline_images_per_sec": round(pipe_per_sec, 2),
        "pipeline_vs_baseline": round(
            pipe_per_sec / REFERENCE_IMAGES_PER_SEC, 2),
        "h2d_link_mbps": round(link_mbps, 1),
    }
    line.update(train_extra)
    if cached_fields is not None:
        # frozen-trunk feature-cache step (extract once, train 20 epochs
        # from the cache; the reference recomputes the frozen VGG forward
        # every step)
        line.update(cached_fields)
        line["sgcls_train_cached_vs_baseline"] = round(
            cached_fields["sgcls_train_cached_images_per_sec"]
            / REFERENCE_IMAGES_PER_SEC, 2)
    if sgdet_fields is not None:
        line.update(sgdet_fields)
        line["sgdet_eval_vs_baseline"] = round(
            sgdet_fields["sgdet_eval_images_per_sec"]
            / REFERENCE_SGDET_EVAL_IMAGES_PER_SEC, 2)
    if sgdet_caps is not None:
        # exactness-cap overflow rates over the bench batches (fraction of
        # images whose candidate pairs / NMS candidates exceeded the
        # compiled fast-path caps and took the exact fallback)
        line.update({k: round(v, 4) if isinstance(v, float) else v
                     for k, v in sgdet_caps.items()})
    if sgcls_eval_fields is not None:
        line.update(sgcls_eval_fields)
    if isinstance(sgcls_eval_cached_fields, Exception):
        errors["sgcls_eval_cached_error"] = repr(
            sgcls_eval_cached_fields)[:120]
    elif sgcls_eval_cached_fields is not None:
        line.update(sgcls_eval_cached_fields)

    # ---- GAN-augmented training (the ICCV'21 configuration, reference
    # main.py -gan: F/G/D phases in one jitted program). Reference pays
    # ~2x its base step for -gan (~6 img/s at b=24).
    gan_fields = gan_cached_fields = None
    try:
        _stage("gan_train")
        gan_fields, gan_cached_fields = _bench_gan_train()
    except Exception as e:
        errors["gan_train_error"] = repr(e)[:120]
    if gan_fields is not None:
        line.update(gan_fields)
    if isinstance(gan_cached_fields, Exception):
        errors["gan_train_cached_error"] = repr(gan_cached_fields)[:120]
    elif gan_cached_fields is not None:
        line.update(gan_cached_fields)

    # ---- sgdet TRAINING step (frozen detector -> rel_assignments ->
    # rel-head update, one jitted program; reference main.py -m sgdet,
    # ~same ~13 img/s class as sgcls training: "~1 day" runs)
    try:
        _stage("sgdet_train")
        f, f_cached = _bench_sgdet_train()
        line.update(f)
        line["sgdet_train_vs_baseline"] = round(
            f["sgdet_train_images_per_sec"] / REFERENCE_IMAGES_PER_SEC, 2)
        if isinstance(f_cached, Exception):
            errors["sgdet_train_cached_error"] = repr(f_cached)[:120]
        else:
            line.update(f_cached)
    except Exception as e:
        errors["sgdet_train_error"] = repr(e)[:120]

    # ---- detector pretraining step (RPN + RoI-head losses + SGD update;
    # reference pretrain_detector.py spends ~1 day here, README.md:236)
    try:
        _stage("detector_pretrain")
        f = _bench_detector_pretrain()
        line.update(f)
        line["detector_pretrain_vs_baseline"] = round(
            f["detector_pretrain_images_per_sec"]
            / REFERENCE_DETECTOR_PRETRAIN_IMAGES_PER_SEC, 2)
    except Exception as e:
        errors["detector_pretrain_error"] = repr(e)[:120]

    # ---- host-side prep rate (native C++ resize/flip/pad per worker):
    # bounds the real-host pipeline claim: pipeline = min(compute, link,
    # host_prep * workers). No TPU involved. On THIS 1-CPU dev box the
    # thread-scaled number is meaningless (threads contend on the single
    # core); bench_env.cpu_count makes that self-explaining.
    try:
        _stage("host_prep")
        per_worker, scaled, nthreads = _bench_host_prep()
        line["host_prep_images_per_sec_per_worker"] = round(per_worker, 1)
        line["host_prep_images_per_sec"] = round(scaled, 1)
        line["host_prep_workers"] = nthreads
    except Exception as e:
        errors["host_prep_error"] = repr(e)[:120]

    # ---- environment + provenance block (round-3 VERDICT #3/#7) ----
    line["bench_env"] = {
        "cpu_count": os.cpu_count(),
        "device": str(jax.devices()[0]),
        "jax": jax.__version__,
        "iters_per_repeat": ITERS,
        "repeats": REPEATS,
        "peak_bf16_tflops": PEAK_BF16_TFLOPS,
        "tunnel_sensitive": list(TUNNEL_SENSITIVE),
    }

    # ---- regression alerts vs the committed reference line: flags
    # compute-only metrics that moved >15% (tunnel metrics excluded) ----
    try:
        ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH_REFERENCE.json")
        if os.path.exists(ref_path):
            with open(ref_path) as fh:
                ref = json.load(fh)
            alerts = []
            for k in COMPUTE_ONLY:
                cur = line.get(k, line["value"] if k ==
                               "sgcls_train_images_per_sec" else None)
                if cur is None or k not in ref:
                    continue
                delta = (cur - ref[k]) / ref[k]
                if abs(delta) > 0.15:
                    alerts.append(f"{k}: {ref[k]} -> {cur} "
                                  f"({delta * 100:+.0f}%)")
            if alerts:
                line["regression_alerts"] = alerts
    except Exception as e:
        errors["regression_check_error"] = repr(e)[:120]

    line.update(errors)
    # full record beside the script; stdout carries only the slim line
    # (driver tail capture is 2000 chars — see MAX_LINE_BYTES)
    try:
        full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BENCH_FULL.json")
        with open(full_path, "w") as fh:
            json.dump(line, fh, indent=1)
    except Exception as e:
        line["bench_full_write_error"] = repr(e)[:120]
    out = json.dumps(_slim(line))
    assert len(out) < 2000, f"bench line {len(out)} bytes overflows capture"
    print(out)


def _bench_gan_train(B: int = BATCH):
    """Fields for the one-program GAN F/G/D training step (SGG fwd+bwd,
    generator GCN->layout->CRN, three spectral-norm discriminators, rec
    losses, three optimizer updates)."""
    import jax.numpy as jnp

    from sgg_tpu.config import Config
    from sgg_tpu.data import SyntheticSGGDataset
    from sgg_tpu.models import RelModelIMP
    from sgg_tpu.models.gan import GANModel
    from sgg_tpu.ops.boxes import scale_boxes_01
    from sgg_tpu.train.assign import sample_edges
    from sgg_tpu.train.gan_step import create_gan_state, make_gan_train_step
    from sgg_tpu.train.state import create_train_state

    config = Config(batch_size=B, max_nodes=MAX_NODES, max_edges=MAX_EDGES,
                    mode="sgcls", loss="dnorm", gan=True,
                    ganlosses=("D", "G", "rec"))
    ds = SyntheticSGGDataset(num_images=B, num_classes=151,
                             num_predicates=51, max_objects=20,
                             image_size=IMG, with_images=True, seed=0)
    gb = jax.device_put(ds.batch(list(range(B)), max_nodes=MAX_NODES,
                                 max_edges=MAX_EDGES))
    model = RelModelIMP(num_classes=151, num_predicates=51, mode="sgcls",
                        dtype=jnp.bfloat16)
    gan = GANModel(num_classes=151, num_predicates=51, dtype=jnp.bfloat16)
    sampled, pm = sample_edges(jax.random.key(0), gb.rels, gb.rel_mask,
                               gb.node_mask, max_out=MAX_EDGES)
    variables = jax.jit(lambda k: model.init(
        k, gb.images, gb.boxes, gb.classes, sampled[..., :2], pm,
        train=False))(jax.random.key(0))
    boxes01 = scale_boxes_01(gb.boxes, gb.im_hw)
    gan_vars = jax.jit(lambda k: gan.init(
        k, gb.classes, boxes01, gb.rels, gb.node_mask, gb.rel_mask,
        train=False, method=gan.init_all))(jax.random.key(1))
    state = create_gan_state(config, create_train_state(config, variables),
                             gan_vars)
    step = make_gan_train_step(model, gan, config)
    box = {"state": state, "metrics": None}

    def enqueue(i, batch=gb):
        box["state"], box["metrics"] = step(box["state"], batch,
                                            batch.classes, None,
                                            jax.random.key(i))

    def sync():
        float(box["metrics"]["obj_loss"])

    for i in range(2):
        enqueue(i)
    sync()
    flops = _flops_of(step, box["state"], gb, gb.classes, None,
                      jax.random.key(0))
    times = _measure(enqueue, sync)
    fields = _fields("gan_train", times, B, flops_per_step=flops)

    # frozen-trunk cached variant: the trunk is frozen under -gan too; the
    # discriminators' "real" fmap is the cached one. Guarded so a failure
    # here cannot discard the base metric.
    try:
        from sgg_tpu.data.feature_cache import cached_batch
        gbc = cached_batch(box["state"].sgg.params["trunk"], gb)
        for i in range(2):
            enqueue(20 + i, gbc)
        sync()
        times = _measure(lambda i: enqueue(30 + i, gbc), sync)
        cached_fields = _fields("gan_train_cached", times, B)
    except Exception as e:
        cached_fields = e
    return fields, cached_fields


def _bench_sgcls_eval(model, B: int = 16, eval_nodes: int = 64):
    """Fields for the jitted sgcls eval step at the driver's 512
    pair-budget rung over a 64-node no-truncation bucket (typical 12-object
    images). B=16 is the driver's default predcls/sgcls eval batch
    (measured v5e sweet spot; sgdet stays at 8). ``dedup=True`` is passed
    EXPLICITLY: the measured configuration is the driver's default
    split-fc6 unordered-union path (exact for untruncated pair sets) —
    numbers from rounds <=3 measured the non-dedup path."""
    import jax.numpy as jnp

    from sgg_tpu.data import SyntheticSGGDataset
    from sgg_tpu.train.assign import sample_edges
    from sgg_tpu.train.step import make_eval_step

    ds = SyntheticSGGDataset(num_images=B, num_classes=151,
                             num_predicates=51, max_objects=12,
                             image_size=IMG, with_images=True, seed=1)
    gb = jax.device_put(ds.batch(list(range(B)), max_nodes=eval_nodes,
                                 max_edges=MAX_EDGES))
    sampled, pm = sample_edges(jax.random.key(0), gb.rels, gb.rel_mask,
                               gb.node_mask, max_out=MAX_EDGES)
    variables = jax.jit(lambda k: model.init(
        k, gb.images, gb.boxes, gb.classes, sampled[..., :2], pm,
        train=False))(jax.random.key(0))
    step = make_eval_step(model, mode="sgcls", max_pairs=512, dedup=True)
    box = {"out": None}

    def enqueue(i, batch=gb):
        box["out"] = step(variables, batch)

    def sync():
        float(jnp.asarray(box["out"]["rel_logits"]).astype(
            jnp.float32).ravel()[0])

    enqueue(0)
    sync()
    flops = _flops_of(step, variables, gb)
    times = _measure(enqueue, sync)
    fields = _fields("sgcls_eval", times, B, flops_per_step=flops)

    # frozen-trunk cached variant: same eval step on precomputed fmaps
    # (eval never flips, so the cache holds one orientation per image).
    # Guarded so a cached-path failure cannot discard the base metric.
    try:
        from sgg_tpu.data.feature_cache import cached_batch
        gbc = cached_batch(variables["params"]["trunk"], gb)
        enqueue(0, gbc)
        sync()
        times = _measure(lambda i: enqueue(i, gbc), sync)
        cached_fields = _fields("sgcls_eval_cached", times, B)
    except Exception as e:  # surfaced as *_cached_error by main()
        cached_fields = e
    return fields, cached_fields


def _bench_sgdet_eval(B: int = 8):
    """Fields for the jitted single-pass sgdet retry eval step (detector at
    the full 0.2->0.05->0.01 per-image threshold protocol + overlap-
    constrained detection-pair relation classification compacted to the
    production pair budget) on synthetic batches."""
    import jax.numpy as jnp

    from sgg_tpu.data import SyntheticSGGDataset
    from sgg_tpu.models import RelModelIMP
    from sgg_tpu.models.detector import FasterRCNNVGG
    from sgg_tpu.models.sgdet import (SGDET_EVAL_MAX_PAIRS,
                                      make_sgdet_retry_eval_step)
    from sgg_tpu.train.assign import all_pairs

    ds = SyntheticSGGDataset(num_images=B, num_classes=151,
                             num_predicates=51, max_objects=20,
                             image_size=IMG, with_images=True, seed=0)
    gb = jax.device_put(ds.batch(list(range(B)), max_nodes=MAX_NODES,
                                 max_edges=MAX_EDGES))
    det = FasterRCNNVGG(num_classes=151, dtype=jnp.bfloat16)
    det_vars = jax.jit(lambda k, im, hw: det.init(k, im, hw, train=False))(
        jax.random.key(0), gb.images, gb.im_hw)
    dout = jax.jit(lambda v, im, hw: det.apply(v, im, hw, train=False))(
        det_vars, gb.images, gb.im_hw)
    rel = RelModelIMP(num_classes=151, num_predicates=51, mode="sgdet",
                      dtype=jnp.bfloat16)
    pairs, pm = all_pairs(dout["mask"])
    rel_vars = jax.jit(lambda k: rel.init(
        k, None, dout["boxes"], dout["labels"], pairs, pm,
        fmap=dout["fmap"], train=False))(jax.random.key(0))
    step = make_sgdet_retry_eval_step(det, rel,
                                      max_pairs=SGDET_EVAL_MAX_PAIRS)
    box = {"out": None}

    def enqueue(i, batch=gb):
        box["out"] = step((det_vars, rel_vars), batch)

    def sync():
        float(jnp.asarray(box["out"]["rel_logits"]).astype(
            jnp.float32).mean())

    enqueue(0)
    sync()
    flops = _flops_of(step, (det_vars, rel_vars), gb)
    times = _measure(enqueue, sync)
    fields = _fields("sgdet_eval", times, B, flops_per_step=flops)
    out = box["out"]
    # exactness-cap overflow rates on these batches (see
    # sgdet_eval_with_retry: overflow triggers the exact fallback path)
    caps = {
        "sgdet_pair_fallback_rate": float(np.mean(
            np.asarray(out["pair_count"]) > SGDET_EVAL_MAX_PAIRS)),
        "sgdet_nms_cand_overflow_rate": float(np.mean(
            np.asarray(out["n_nms_candidates"]) > det.nms_candidates)),
    }

    # frozen-trunk cached variant: sgdet's detector is frozen too — with
    # batch.fmaps the program restarts at the RPN. Guarded so a failure
    # here cannot discard the base metric.
    try:
        from sgg_tpu.data.feature_cache import cached_batch
        gbc = cached_batch(det_vars["params"]["trunk"], gb)
        enqueue(0, gbc)
        sync()
        times = _measure(lambda i: enqueue(i, gbc), sync)
        caps.update(_fields("sgdet_eval_cached", times, B))
    except Exception as e:
        caps["sgdet_eval_cached_error"] = repr(e)[:120]
    return fields, caps


def _bench_sgdet_train(B: int = 8):
    """Fields for the one-program sgdet TRAINING step: frozen full-size
    detector forward, in-jit rel_assignments sampling, relation-head
    forward+backward and SGD update (reference main.py -m sgdet)."""
    import jax.numpy as jnp

    from sgg_tpu.config import Config
    from sgg_tpu.data import SyntheticSGGDataset
    from sgg_tpu.models import RelModelIMP
    from sgg_tpu.models.detector import FasterRCNNVGG
    from sgg_tpu.models.sgdet import detection_pairs, make_sgdet_train_step
    from sgg_tpu.train.state import create_train_state

    config = Config(batch_size=B, max_nodes=MAX_NODES, max_edges=MAX_EDGES,
                    mode="sgdet", loss="dnorm")
    ds = SyntheticSGGDataset(num_images=B, num_classes=151,
                             num_predicates=51, max_objects=20,
                             image_size=IMG, with_images=True, seed=0)
    gb = jax.device_put(ds.batch(list(range(B)), max_nodes=MAX_NODES,
                                 max_edges=MAX_EDGES))
    det = FasterRCNNVGG(num_classes=151, dtype=jnp.bfloat16)
    det_vars = jax.jit(lambda k, im, hw: det.init(k, im, hw, train=False))(
        jax.random.key(0), gb.images, gb.im_hw)
    dout = jax.jit(lambda v, im, hw: det.apply(v, im, hw, train=False))(
        det_vars, gb.images, gb.im_hw)
    rel = RelModelIMP(num_classes=151, num_predicates=51, mode="sgdet",
                      dtype=jnp.bfloat16)
    pairs, pm = detection_pairs(dout["boxes"], dout["mask"], True)
    rel_vars = jax.jit(lambda k: rel.init(
        k, None, dout["boxes"], dout["labels"], pairs, pm,
        fmap=dout["fmap"], train=False))(jax.random.key(0))
    state = create_train_state(config, rel_vars)
    step = make_sgdet_train_step(det, rel, config, det_vars)
    box = {"state": state, "metrics": None}

    def enqueue(i, batch=gb):
        box["state"], box["metrics"] = step(box["state"], batch,
                                            jax.random.key(i))

    def sync():
        assert np.isfinite(float(box["metrics"]["total"]))

    for i in range(2):
        enqueue(i)
    sync()
    # NOTE: make_sgdet_train_step runs as a split program on this toolchain
    # (detector program + rel program); _flops_of sees only the outer jit
    # if one exists — report flops only when the lookup succeeds.
    try:
        flops = _flops_of(step, box["state"], gb, jax.random.key(0))
    except Exception:
        flops = None
    times = _measure(enqueue, sync)
    fields = _fields("sgdet_train", times, B, flops_per_step=flops)

    # frozen-trunk cached variant (detector restarts at the RPN). Guarded
    # so a failure here cannot discard the base metric.
    try:
        from sgg_tpu.data.feature_cache import cached_batch
        gbc = cached_batch(det_vars["params"]["trunk"], gb)
        for i in range(2):
            enqueue(20 + i, gbc)
        sync()
        times = _measure(lambda i: enqueue(30 + i, gbc), sync)
        cached_fields = _fields("sgdet_train_cached", times, B)
    except Exception as e:
        cached_fields = e
    return fields, cached_fields


def _bench_detector_pretrain(B: int = 8):
    """Fields for the jitted detector-pretraining step (trunk + RPN + RoI
    heads forward, target assignment + balanced sampling, RPN/RoI losses,
    backward, SGD update — reference pretrain_detector.py + engine.py)."""
    import jax.numpy as jnp
    import optax

    from pretrain_detector import make_detector_train_step
    from sgg_tpu.data import SyntheticSGGDataset
    from sgg_tpu.models.detector import FasterRCNNVGG
    from sgg_tpu.train.state import TrainState

    ds = SyntheticSGGDataset(num_images=B, num_classes=151,
                             num_predicates=51, max_objects=20,
                             image_size=IMG, with_images=True, seed=0)
    gb = jax.device_put(ds.batch(list(range(B)), max_nodes=MAX_NODES,
                                 max_edges=1))
    det = FasterRCNNVGG(num_classes=151, dtype=jnp.bfloat16)
    variables = jax.jit(lambda k, im, hw: det.init(k, im, hw, train=False))(
        jax.random.key(0), gb.images, gb.im_hw)
    tx = optax.chain(optax.add_decayed_weights(5e-4),
                     optax.sgd(0.005, momentum=0.9))
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]), tx=tx)
    step = make_detector_train_step(det)
    box = {"state": state, "metrics": None}

    def enqueue(i):
        box["state"], box["metrics"] = step(box["state"], gb,
                                            jax.random.key(i))

    def sync():
        assert np.isfinite(float(box["metrics"]["total"]))

    for i in range(2):
        enqueue(i)
    sync()
    flops = _flops_of(step, box["state"], gb, jax.random.key(0))
    times = _measure(enqueue, sync)
    return _fields("detector_pretrain", times, B, flops_per_step=flops)


def _bench_host_prep(n_images: int = 64):
    """Host-side image-prep rate: the native C++ one-pass resize/flip/
    mean-padded-canvas prep (sgg_tpu/native/image_prep.cpp) on VG-sized
    uint8 images, single-thread and thread-scaled (ctypes releases the GIL
    during the C call, so worker threads scale across cores). No TPU."""
    from concurrent.futures import ThreadPoolExecutor

    from sgg_tpu.data.pipeline import prepare_example

    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (768, 1024, 3), np.uint8)
            for _ in range(8)]
    boxes = rng.rand(12, 4).astype(np.float32) * 500
    boxes[:, 2:] += boxes[:, :2] + 10
    rels = np.asarray([[0, 1, 1]], np.int32)

    def prep(i):
        r = np.random.RandomState(i)
        prepare_example(imgs[i % len(imgs)], boxes, rels, "native", True,
                        r, uint8=True)

    for i in range(4):
        prep(i)  # warm (triggers the on-demand native build)
    t0 = time.perf_counter()
    for i in range(n_images):
        prep(i)
    per_worker = n_images / (time.perf_counter() - t0)

    nthreads = min(os.cpu_count() or 1, 8)
    with ThreadPoolExecutor(nthreads) as pool:
        list(pool.map(prep, range(4 * nthreads)))  # warm pool
        t0 = time.perf_counter()
        list(pool.map(prep, range(n_images * nthreads)))
        scaled = n_images * nthreads / (time.perf_counter() - t0)
    return per_worker, scaled, nthreads


if __name__ == "__main__":
    main()
