"""Pallas TPU kernel for the VGG stem (conv1_1) — the MXU-starved layer.

The first VGG16 conv (3->64 channels at 592x592) is the one layer XLA runs
badly on TPU: the 3-channel contraction starves the 128-lane MXU and XLA's
conv layout pads the input tensor's channel dim in HBM, inflating traffic
~40x (measured ~10 ms of a ~100 ms SGCls step for 1.2 GFLOP/img — <3% MXU).
This kernel reads the raw (H, W, 3) rows once, builds the 3x3x3=27-channel
patch tensor in VMEM, and runs one (TH*W, 27) @ (27, 64) MXU matmul per row
tile with fused bias+ReLU, streaming the output block back to HBM.

Reference analogue: torchvision ``vgg16.features[0]`` inside the frozen
detector trunk (``/root/reference/sgg_models/rel_model_base.py:310-321``);
numerics identical to ``lax.conv_general_dilated`` (parity-tested in
``tests/test_vgg_stem_pallas.py``, interpret mode — exact).

On-device status (round-2 determination, with evidence):
  * XLA direct conv1_1 @ (24, 592, 592): ~10 ms real (dispatch-corrected),
    ~3 GFLOPS — the slow path this kernel targets. Profile: conv1_2 runs at
    ~68 TFLOPS and stages 2-5 at the ~120 TFLOPS matmul ceiling, so conv1_1
    is the only inefficient trunk layer (~7% of the train step).
  * XLA ``conv_general_dilated_patches`` + K=27 matmul: ~9 + ~3 ms — the
    patch extraction itself is the bottleneck, so the win requires building
    patches in VMEM.
  * This kernel's Mosaic lowering is blocked by two layout limits of the
    current toolchain (verbatim errors):
      - ``tpu.concatenate`` of nine 3-lane ``vector<16x592x3xbf16>`` pieces:
        "unsupported vpad layout" (lane-concat of sub-128-lane vectors);
      - any C-minor HBM layout: "Slice shape along dimension 3 must be
        aligned to tiling (128), but is 3" — a (B, H, W, 3) array cannot be
        DMA'd, and W-minor layouts push the fix into unsupported lane
        compaction (strided lane slices) or batched ``dot_general``.
    Net: a Mosaic-compilable formulation exists only via full-lane-padded
    channels, which reinstates the 42x HBM inflation the kernel exists to
    avoid. Bounded win (~7 ms of ~96 ms) does not justify maintaining a
    layout fork of the trunk; revisit when Mosaic grows small-lane concat.
  * The kernel stays interpret-mode-verified so the formulation is ready.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stem_kernel(xp_hbm, w_ref, b_ref, o_ref, xs, sem, *, th, w_img):
    b_i = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xp_hbm.at[b_i, pl.ds(i * th, th + 2)], xs, sem)
    dma.start()
    dma.wait()

    # 3x3 patches: 9 shifted (TH, W, 3) views -> (TH, W, 27) in VMEM
    cols = [xs[dy:dy + th, dx:dx + w_img, :]
            for dy in range(3) for dx in range(3)]
    p = jnp.concatenate(cols, axis=-1).reshape(th * w_img, 27)
    y = jax.lax.dot_general(p, w_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = jnp.maximum(y + b_ref[:].astype(jnp.float32), 0.0)
    o_ref[0] = y.astype(o_ref.dtype).reshape(th, w_img, 64)


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def vgg_conv1_pallas(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                     tile_rows: int = 16,
                     interpret: bool = False) -> jnp.ndarray:
    """relu(conv2d(x, w, padding=1)) for the 3->64 VGG stem.

    Args:
      x: (B, H, W, 3) image batch (bf16/f32); H must divide by tile_rows.
      w: (3, 3, 3, 64) HWIO kernel.
      b: (64,) bias.

    Returns (B, H, W, 64) in x.dtype.
    """
    B, H, W, C = x.shape
    assert C == 3 and w.shape == (3, 3, 3, 64), (x.shape, w.shape)
    th = tile_rows
    assert H % th == 0, (H, th)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.reshape(9 * 3, 64).astype(x.dtype)
    # (dy, dx, c) patch order must match the kernel's concat order:
    # cols[dy*3+dx] carries channels [ (dy,dx,0..2) ] -> already row-major.
    bf = b.reshape(1, 64).astype(jnp.float32)

    kernel = functools.partial(_stem_kernel, th=th, w_img=W)
    return pl.pallas_call(
        kernel,
        grid=(B, H // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # padded image in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # (27, 64) weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # (1, 64) bias
        ],
        out_specs=pl.BlockSpec((1, th, W, 64),
                               lambda b_i, i: (b_i, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, 64), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, W + 2, 3), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, wf, bf)
