"""Relation target assignment / FG-BG edge sampling (pure JAX, jit-safe).

TPU-native redesign of the reference's samplers:

* ``proposal_assignments_gtbox`` (``/root/reference/lib/proposal_assignments_gtbox.py``)
  — predcls/sgcls training sampling over GT boxes: keep annotated (FG) pairs
  capped at ``RELS_PER_IMG * REL_FG_FRACTION``, fill with background pairs
  (all ordered same-image pairs minus the diagonal minus FG) up to
  ``RELS_PER_IMG``.
* the inference-time all-pairs enumeration ``get_rel_inds``
  (``/root/reference/sgg_models/rel_model_base.py:143-165``).

The reference runs these in torch/numpy on the host with dynamic shapes. Here
they are fixed-shape, masked, vectorized, and live *inside* the jitted train
step: candidates get random priority scores and a single ``top_k`` selects the
edge set (FG always outranks BG; invalid candidates get ``-inf``), so the
sampling is one fused device op per batch. Budgets are per image (the
reference pools the budget across the batch, ``proposal_assignments_gtbox.py:47-56``
— a deliberate, documented difference; statistically equivalent for
same-sized images).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sgg_tpu.constants import REL_FG_FRACTION


def _sample_edges_one(key, rels, rel_mask, node_mask, max_out: int,
                      fg_fraction: float):
    """Per-image FG/BG edge sampling. Shapes: rels (E,3); node_mask (N,)."""
    E = rels.shape[0]
    N = node_mask.shape[0]
    max_fg = int(round(max_out * fg_fraction))

    k_fg, k_bg = jax.random.split(key)

    # --- FG candidates: annotated rels, random-ranked, capped at max_fg.
    u_fg = jax.random.uniform(k_fg, (E,))
    # rank among valid FG edges; edges ranked >= max_fg are dropped
    order = jnp.argsort(jnp.where(rel_mask, u_fg, jnp.inf))
    rank = jnp.zeros((E,), jnp.int32).at[order].set(
        jnp.arange(E, dtype=jnp.int32))
    fg_keep = rel_mask & (rank < max_fg)
    # score: FG in [2, 3) so it always beats BG in [0, 1)
    fg_score = jnp.where(fg_keep, 2.0 + u_fg, -jnp.inf)

    # --- BG candidates: all ordered valid pairs minus diagonal minus FG pairs.
    pair_valid = node_mask[:, None] & node_mask[None, :]
    pair_valid &= ~jnp.eye(N, dtype=bool)
    fg_pair = jnp.zeros((N, N), bool).at[rels[:, 0], rels[:, 1]].max(rel_mask)
    bg_valid = (pair_valid & ~fg_pair).reshape(-1)
    u_bg = jax.random.uniform(k_bg, (N * N,))
    bg_score = jnp.where(bg_valid, u_bg, -jnp.inf)

    # --- Combined top-k selection.
    subj_grid = jnp.repeat(jnp.arange(N, dtype=jnp.int32), N)
    obj_grid = jnp.tile(jnp.arange(N, dtype=jnp.int32), N)
    all_scores = jnp.concatenate([fg_score, bg_score])
    all_subj = jnp.concatenate([rels[:, 0].astype(jnp.int32), subj_grid])
    all_obj = jnp.concatenate([rels[:, 1].astype(jnp.int32), obj_grid])
    all_pred = jnp.concatenate(
        [rels[:, 2].astype(jnp.int32), jnp.zeros((N * N,), jnp.int32)])

    top_scores, top_idx = jax.lax.top_k(all_scores, max_out)
    out_mask = top_scores > -jnp.inf
    out = jnp.stack([
        jnp.where(out_mask, all_subj[top_idx], 0),
        jnp.where(out_mask, all_obj[top_idx], 0),
        jnp.where(out_mask, all_pred[top_idx], 0),
    ], axis=1)
    return out, out_mask


@functools.partial(jax.jit, static_argnames=("max_out", "fg_fraction"))
def sample_edges(key, rels: jnp.ndarray, rel_mask: jnp.ndarray,
                 node_mask: jnp.ndarray, *, max_out: int,
                 fg_fraction: float = REL_FG_FRACTION):
    """Batched FG/BG edge sampling for training.

    Args:
      key: PRNG key.
      rels: (B, E, 3) annotated relations ``(subj, obj, predicate)``.
      rel_mask: (B, E) bool.
      node_mask: (B, N) bool.
      max_out: edges per image in the output (the per-image budget; the
        reference analogue is ``RELS_PER_IMG``).
      fg_fraction: FG cap fraction (``REL_FG_FRACTION`` = 0.25).

    Returns:
      (sampled (B, max_out, 3) int32, mask (B, max_out) bool). Sampled edges
      are sorted FG-first; BG edges have predicate 0.
    """
    B = rels.shape[0]
    keys = jax.random.split(key, B)
    return jax.vmap(
        lambda k, r, rm, nm: _sample_edges_one(k, r, rm, nm, max_out,
                                               fg_fraction)
    )(keys, rels, rel_mask, node_mask)


@functools.partial(jax.jit, static_argnames=())
def all_pairs(node_mask: jnp.ndarray):
    """Inference edge enumeration: all ordered valid pairs minus the diagonal.

    Reference: ``get_rel_inds`` eval branch (rel_model_base.py:148-163).

    Args:
      node_mask: (B, N) bool.

    Returns:
      (pairs (B, N*(N-1), 2) int32, mask (B, N*(N-1)) bool) — a static
      enumeration (independent of the mask) so every batch compiles to the
      same shape; identical ordering to ``nonzero`` row-major traversal of
      the reference's candidate matrix.
    """
    B, N = node_mask.shape
    subj, obj = jnp.nonzero(
        ~jnp.eye(N, dtype=bool), size=N * (N - 1))  # static: off-diagonal grid
    pairs = jnp.stack([subj, obj], axis=1).astype(jnp.int32)
    pairs = jnp.broadcast_to(pairs[None], (B, N * (N - 1), 2))
    mask = node_mask[:, subj] & node_mask[:, obj]
    return pairs, mask


def unordered_union_index(pairs, pair_mask, max_unique: int,
                          num_nodes: int = None):
    """Dedup structure for union-box work over *unordered* pairs.

    Union boxes (``ops/boxes.union_boxes``) are symmetric in the pair
    order, and every eval enumeration is swap-closed: ``all_pairs`` emits
    both directions, the overlap filter is IoU-symmetric, and
    order-preserving compaction keeps the row-major-first (i<j) direction
    whenever it keeps (j,i). Union RoIAlign (and the linear part of the
    edge fc6) can therefore run once per unordered pair at HALF the edge
    budget and be gathered back to every ordered slot — exactly (the
    representative's union box is identical), cutting the dominant
    bandwidth/FLOP terms of the relation head in half.

    Pure jit, fixed shapes. Per batch row:

    Args:
      pairs: (B, E, 2) int32 ordered candidate pairs.
      pair_mask: (B, E) bool.
      max_unique: U, the unordered budget (callers use E // 2; exact
        whenever the ordered set is swap-closed, since then
        #unique = #valid / 2, rounding up for degenerate self-pairs).

    Returns:
      uni_slots: (B, U) int32 — for each unordered representative, its
        ordered-edge slot (edge-order preserving; slots past the unique
        count repeat non-representative slots and are masked by ``ok``).
      gather_idx: (B, E) int32 — for each ordered edge, the row in
        ``uni_slots`` holding its representative (garbage for invalid
        edges — mask downstream).
      ok: (B,) bool — True iff the image's unique pairs fit ``U``. False
        means the gathered values are garbage; callers must fall back.
      n_unique: (B,) int32 unique-pair counts.
    """
    B, E = pair_mask.shape
    slot = jnp.arange(E, dtype=jnp.int32)[None, :]
    mn = jnp.minimum(pairs[..., 0], pairs[..., 1]).astype(jnp.int32)
    mx = jnp.maximum(pairs[..., 0], pairs[..., 1]).astype(jnp.int32)
    # unordered key. ``num_nodes`` is the STATIC node-axis bound of the
    # bucket the pair indices come from (callers pass boxes.shape[1]); a
    # key collision would silently merge distinct pairs (it LOWERS
    # n_unique, so the ok-flag could not catch it) — the trace-time assert
    # makes the packed key space provably collision-free in int32.
    if num_nodes is None:
        num_nodes = 32768  # legacy bound (exactly fills the int32 space)
    shift = 1
    while shift < num_nodes:
        shift *= 2
    assert shift * (num_nodes - 1) + (num_nodes - 1) < (1 << 30), (
        f"unordered-pair key packing overflows int32 for node bucket "
        f"{num_nodes}")
    key = mn * shift + mx
    # invalid slots get unique keys above the valid key space
    key = jnp.where(pair_mask, key, (jnp.int32(1) << 30) + slot)

    order = jnp.argsort(key, axis=1, stable=True)          # (B, E)
    skey = jnp.take_along_axis(key, order, 1)
    first = jnp.concatenate(
        [jnp.ones((B, 1), bool), skey[:, 1:] != skey[:, :-1]], axis=1)
    # slot of each sorted run's first element (stable sort => the
    # lowest-slot, i.e. canonical row-major-first, direction)
    first_pos = jax.lax.cummax(jnp.where(first, slot, -1), axis=1)
    rep_sorted = jnp.take_along_axis(order, first_pos, 1)
    brow = jnp.arange(B)[:, None]
    rep = jnp.zeros((B, E), jnp.int32).at[brow, order].set(rep_sorted)

    uniq = (rep == slot) & pair_mask
    n_unique = uniq.sum(axis=1)
    ok = n_unique <= max_unique
    uni_slots = jnp.argsort(~uniq, axis=1, stable=True)[:, :max_unique]
    inv = jnp.zeros((B, E), jnp.int32).at[brow, uni_slots].set(
        jnp.arange(max_unique, dtype=jnp.int32)[None, :])
    gather_idx = jnp.take_along_axis(inv, rep, 1)
    return uni_slots, gather_idx, ok, n_unique


def compact_pairs(pairs, pair_mask, max_pairs: int):
    """Gather the valid pairs into a (B, max_pairs) buffer, order-preserving.

    Candidate-pair enumerations are padded to N*(N-1) slots but a real
    image has n*(n-1) valid pairs (n = its objects/detections) — far fewer
    than the bucket's N. Downstream compute is shape-bound, so compacting
    is a pure speedup. EXACT whenever every image has <= max_pairs valid
    pairs; callers either guarantee that from host-side counts
    (eval/driver.py bucket ladder) or check the returned per-image
    ``count`` and fall back to the dense shape (models/sgdet.py).
    """
    count = pair_mask.sum(axis=1)
    order = jnp.argsort(~pair_mask, axis=1, stable=True)[:, :max_pairs]
    cpairs = jnp.take_along_axis(pairs, order[..., None], 1)
    cmask = jnp.take_along_axis(pair_mask, order, 1)
    return cpairs, cmask, count
