"""Fixed-shape NMS and box-delta coding (jit-safe).

TPU-native equivalents of the C++/CUDA detection ops torchvision hides inside
``rpn``/``roi_heads`` (invoked by the reference at
``/root/reference/sgg_models/rel_model_base.py:210-211``): greedy NMS as a
masked ``fori_loop`` over score-sorted boxes (static shapes, no data-
dependent sizes), and the Faster R-CNN box encode/decode transforms with
torchvision's weights and clamping.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from sgg_tpu.ops.boxes import box_iou


@functools.partial(jax.jit,
                   static_argnames=("max_out", "method", "chunk", "rounds",
                                    "with_converged"))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
        iou_thresh: float, max_out: int,
        method: str = "sequential", chunk: int = 64, rounds: int = 16,
        with_converged: bool = False):
    """Greedy NMS over one image's boxes.

    Args:
      boxes: (N, 4); scores: (N,); valid: (N,) bool.
      iou_thresh: suppression threshold.
      max_out: number of kept slots.
      method: ``"sequential"`` (default), ``"chunked"``, ``"rounds"`` or
        ``"fixpoint"`` — identical results (``rounds``: identical iff
        converged; see below), see below.
      chunk: in-chunk unroll width for ``method="chunked"``.
      rounds: fixed round count for ``method="rounds"``.
      with_converged: also return a scalar bool — True iff the result
        provably equals the greedy solution. Always True except for
        ``method="rounds"`` with an unusually deep suppression chain;
        callers re-run with an exact method when False (the repo's
        cap-escalation pattern).

    Returns (indices (max_out,) into the input, keep_mask (max_out,)).
    Output order is by descending score (torchvision contract).

    The greedy recurrence ``keep[j] = valid[j] and no kept i<j overlaps
    j`` has a UNIQUE solution (induction on j), and that solution is the
    unique fixed point of the parallel update
    ``suppressed' = any_i(kept_i and i<j and iou>t)``. ``fixpoint``
    iterates that O(N^2)-vectorized update to its fixed point (row j is
    provably stable after depth(j) rounds, where depth is the longest
    suppression chain ending at j — a handful in practice, <= N always),
    instead of N sequential O(N)-work ``fori_loop`` steps whose per-step
    latency dominates on TPU (N=2048 candidates: ~ms sequential vs ~tens
    of us of vector work). Bit-identical to sequential
    (tests/test_detector.py differential).

    On-device determination (v5e via the remote toolchain, 2026-08):
    ``fixpoint`` compiles and runs CORRECTLY standalone — including
    vmapped over 8 images at N=2048 — but composed into the full detector
    program this toolchain's codegen either crashes the TPU worker
    ("kernel fault") or hangs the remote compile; the same class of fault
    as the chained-gather crash worked around in generate_proposals.

    ``chunked`` keeps the sequential greedy recurrence but restructures it
    for TPU loop-trip latency: an outer ``fori_loop`` over N/chunk blocks
    of score-ordered boxes. Each trip first applies suppression from all
    finalized earlier boxes in ONE masked reduction over the (N, chunk)
    IoU slice, then resolves the chunk internally with ``chunk`` unrolled
    straight-line steps (each O(chunk) vector work, fused by XLA into one
    kernel — no per-step dispatch). Bit-identical to ``sequential`` (the
    recurrence is evaluated in the same order), but with N/chunk loop
    trips instead of N; at N=2048, 32 trips vs 2048. No ``while_loop``,
    no data-dependent control flow — avoids the fixpoint's codegen fault
    class by construction. Measured (v5e, B=8 vmapped, N=2048):
    sequential 23.3 ms, chunked 17.3 ms — the remaining cost is the
    N-deep scalar dependency chain itself, which no reordering removes.

    ``rounds`` breaks that chain: greedy NMS is the lexicographically-
    first maximal independent set of the score-ordered suppression graph,
    computable by monotone rounds — each round KEEPS every undecided box
    whose higher-scored conflicting boxes are all already removed, then
    REMOVES everything a kept box suppresses. Rounds needed = depth of
    the greedy suppression DAG's level structure (a handful for real
    boxes; the top undecided box is decided every round, so <= N always).
    Each round is two masked (N, N) reductions — pure VPU vector work, no
    scalar chain. A fixed ``rounds`` budget keeps control flow static;
    the returned ``converged`` flag is True iff every valid box was
    decided, i.e. the result IS the greedy solution (monotonicity: keeps/
    removals never flip). Measured: 4.5 ms at N=2048/B=8 with R=8 (~5x
    sequential), converging in <= 4 rounds on dense random sets. Unlike
    ``fixpoint`` there is no ``while_loop``, and composed into the full
    detector program it neither faults nor hangs this toolchain.
    """
    N = boxes.shape[0]
    if method == "rounds" and N % 128:
        # Pad the whole problem to a 128-lane multiple: composed into the
        # detector program, this toolchain kernel-faults on the unaligned
        # N=1000 RPN candidate count while the identical program at
        # N=1024 runs (bisected 2026-08). Padded rows are invalid (never
        # kept, sort to the tail) so results are unchanged, and output
        # slots never reference them.
        pad = 128 - N % 128
        boxes = jnp.concatenate(
            [boxes, jnp.zeros((pad, 4), boxes.dtype)])
        scores = jnp.concatenate([scores, jnp.zeros((pad,), scores.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
        N += pad
    neg = jnp.finfo(scores.dtype).min
    s = jnp.where(valid, scores, neg)
    order = jnp.argsort(-s)
    sb = boxes[order]
    sv = s[order] > neg
    iou = box_iou(sb, sb)
    tri = jnp.triu(jnp.ones((N, N), bool), k=1)  # j suppressible by i<j

    if method == "fixpoint":
        sup_mat = tri & (iou > iou_thresh)  # [i, j]: kept i suppresses j

        def cond(state):
            s_cur, s_prev, it = state
            return jnp.any(s_cur != s_prev) & (it < N)

        def body(state):
            s_cur, _, it = state
            kept = sv & ~s_cur
            s_new = jnp.any(sup_mat & kept[:, None], axis=0)
            return s_new, s_cur, it + 1

        init = (jnp.zeros((N,), bool), jnp.ones((N,), bool),
                jnp.zeros((), jnp.int32))
        suppressed, _, _ = lax.while_loop(cond, body, init)
    elif method == "rounds":
        # supT[j, i]: higher-scored i conflicts j. Rounds are expressed as
        # float matvecs (any_i == matvec > 0) rather than boolean masked
        # reductions: the matvec rides the MXU and — decisive on this
        # toolchain — avoids the vectorized-boolean codegen path that
        # kernel-faults the TPU worker when composed into the full
        # detector program (same fault class as "fixpoint"; bisected
        # 2026-08: boolean-reduce rounds crash, matvec rounds run).
        supT = (tri & (iou > iou_thresh)).T.astype(jnp.float32)

        def round_body(_, state):
            kept, removed = state
            alive = (sv & ~removed).astype(jnp.float32)
            # j is kept when no non-removed valid higher-score conflict
            # remains (all its greedy predecessors are decided-removed)
            blocker = (supT @ alive) > 0.0
            kept = kept | (sv & ~kept & ~removed & ~blocker)
            removed = removed | (
                ((supT @ kept.astype(jnp.float32)) > 0.0) & ~kept)
            return kept, removed

        kept_r, removed_r = lax.fori_loop(
            0, rounds, round_body,
            (jnp.zeros((N,), bool), jnp.zeros((N,), bool)))
        converged = jnp.all(kept_r | removed_r | ~sv)
        suppressed = ~kept_r  # kept == sv & ~suppressed below
    elif method == "chunked":
        C = min(chunk, N)
        n_chunks = -(-N // C)
        Np = n_chunks * C
        if Np != N:  # pad to a chunk multiple; padded rows can't be kept
            iou_p = jnp.zeros((Np, Np), iou.dtype)
            iou_p = lax.dynamic_update_slice(iou_p, iou, (0, 0))
            sv_p = jnp.zeros((Np,), bool).at[:N].set(sv)
        else:
            iou_p, sv_p = iou, sv
        sup_mat = iou_p > iou_thresh
        pos = jnp.arange(Np)
        loc = jnp.arange(C)

        def chunk_body(c, suppressed):
            cs = c * C
            # suppression of this chunk by all finalized earlier keeps
            col = lax.dynamic_slice(sup_mat, (0, cs), (Np, C))  # (Np, C)
            kept_prefix = sv_p & ~suppressed & (pos < cs)
            sup_local = lax.dynamic_slice(suppressed, (cs,), (C,))
            sup_local |= jnp.any(kept_prefix[:, None] & col, axis=0)
            sv_local = lax.dynamic_slice(sv_p, (cs,), (C,))
            blk = lax.dynamic_slice(sup_mat, (cs, cs), (C, C))
            for k in range(C):  # unrolled: straight-line, one fused kernel
                keep_k = sv_local[k] & ~sup_local[k]
                sup_local |= keep_k & (loc > k) & blk[k]
            return lax.dynamic_update_slice(suppressed, sup_local, (cs,))

        suppressed = lax.fori_loop(0, n_chunks, chunk_body,
                                   jnp.zeros((Np,), bool))[:N]
    else:
        def body(i, suppressed):
            keep_i = sv[i] & ~suppressed[i]
            return suppressed | (keep_i & tri[i] & (iou[i] > iou_thresh))

        suppressed = lax.fori_loop(0, N, body, jnp.zeros((N,), bool))
    if method != "rounds":
        converged = jnp.asarray(True)
    keep = sv & ~suppressed
    # first max_out kept, in score order
    kept_rank = jnp.cumsum(keep) - 1
    out_mask = keep & (kept_rank < max_out)
    # scatter sorted positions into output slots
    slot = jnp.where(out_mask, kept_rank, max_out)
    out_idx = jnp.zeros((max_out + 1,), jnp.int32).at[slot].set(
        order.astype(jnp.int32))[:max_out]
    out_valid = jnp.zeros((max_out + 1,), bool).at[slot].set(
        out_mask)[:max_out]
    if with_converged:
        return out_idx, out_valid, converged
    return out_idx, out_valid


def encode_boxes(ref: jnp.ndarray, gt: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Box -> regression targets (torchvision BoxCoder.encode)."""
    wx, wy, ww, wh = weights
    rw = ref[..., 2] - ref[..., 0]
    rh = ref[..., 3] - ref[..., 1]
    rx = ref[..., 0] + 0.5 * rw
    ry = ref[..., 1] + 0.5 * rh
    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]
    gx = gt[..., 0] + 0.5 * gw
    gy = gt[..., 1] + 0.5 * gh
    rw = jnp.maximum(rw, 1e-6)
    rh = jnp.maximum(rh, 1e-6)
    return jnp.stack([
        wx * (gx - rx) / rw, wy * (gy - ry) / rh,
        ww * jnp.log(jnp.maximum(gw, 1e-6) / rw),
        wh * jnp.log(jnp.maximum(gh, 1e-6) / rh)], axis=-1)


def decode_boxes(ref: jnp.ndarray, deltas: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Regression deltas -> boxes (torchvision BoxCoder.decode, with the
    log-space clamp at log(1000/16))."""
    wx, wy, ww, wh = weights
    clamp = math.log(1000.0 / 16)
    rw = ref[..., 2] - ref[..., 0]
    rh = ref[..., 3] - ref[..., 1]
    rx = ref[..., 0] + 0.5 * rw
    ry = ref[..., 1] + 0.5 * rh
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, None, clamp)
    dh = jnp.clip(deltas[..., 3] / wh, None, clamp)
    cx = dx * rw + rx
    cy = dy * rh + ry
    w = jnp.exp(dw) * rw
    h = jnp.exp(dh) * rh
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h,
                      cx + 0.5 * w, cy + 0.5 * h], axis=-1)
