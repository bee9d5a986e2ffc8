import numpy as np
import jax.numpy as jnp
import pytest

from sgg_tpu.train.losses import edge_losses, node_losses


def _np_ce(logits, label):
    x = logits - logits.max()
    return -(x[label] - np.log(np.exp(x).sum()))


def _manual_edge_loss(logits, labels, mask, loss_type, alpha, beta, gamma):
    """Hand-computed reference semantics (lib/losses.py:26-63) on the valid
    subset only."""
    ce = np.asarray([_np_ce(l, y) for l, y in zip(logits, labels)])
    valid = np.nonzero(mask)[0]
    fg = [i for i in valid if labels[i] > 0]
    bg = [i for i in valid if labels[i] == 0]
    M, M_FG, M_BG = len(valid), len(fg), len(bg)
    if loss_type == "baseline":
        return gamma * ce[valid].sum() / M
    w = np.ones(len(labels))
    if M_FG > 0:
        for i in fg:
            w[i] = alpha / M_FG
    if loss_type == "dnorm":
        if M_BG > 0 and M_FG > 0:
            for i in bg:
                w[i] = beta / M_FG
    else:
        if M_BG > 0:
            for i in bg:
                w[i] = beta / M_BG
    return gamma * (ce[valid] * w[valid]).sum()


@pytest.mark.parametrize("loss_type", ["baseline", "dnorm", "dnorm-fgbg"])
def test_edge_losses_match_manual(loss_type):
    rng = np.random.RandomState(0)
    B, E, R = 2, 10, 6
    logits = rng.randn(B, E, R).astype(np.float32)
    labels = rng.randint(0, R, (B, E))
    mask = rng.rand(B, E) < 0.7
    mask[0, 0] = True
    weights = (1.0, 1.0, 2.0) if loss_type == "baseline" else (1.3, 0.7, 2.0)
    got = float(edge_losses(jnp.asarray(logits), jnp.asarray(labels),
                            jnp.asarray(mask), loss_type, weights)["rel_loss"])
    want = _manual_edge_loss(logits.reshape(-1, R), labels.ravel(),
                             mask.ravel(), loss_type, *weights)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dnorm_equals_baseline_times_density_ratio():
    # With alpha=beta=1, dnorm = baseline * M / M_FG (the paper's key identity)
    rng = np.random.RandomState(1)
    B, E, R = 1, 12, 5
    logits = rng.randn(B, E, R).astype(np.float32)
    labels = rng.randint(0, R, (B, E))
    labels[0, :3] = [1, 2, 3]  # ensure some FG
    mask = np.ones((B, E), bool)
    base = float(edge_losses(jnp.asarray(logits), jnp.asarray(labels),
                             jnp.asarray(mask), "baseline")["rel_loss"])
    dnorm = float(edge_losses(jnp.asarray(logits), jnp.asarray(labels),
                              jnp.asarray(mask), "dnorm")["rel_loss"])
    m = mask.sum()
    m_fg = (labels > 0).sum()
    np.testing.assert_allclose(dnorm, base * m / m_fg, rtol=1e-5)


def test_padding_does_not_change_loss():
    rng = np.random.RandomState(2)
    logits = rng.randn(1, 6, 4).astype(np.float32)
    labels = np.asarray([[1, 0, 2, 0, 0, 3]])
    mask = np.ones((1, 6), bool)
    a = float(edge_losses(jnp.asarray(logits), jnp.asarray(labels),
                          jnp.asarray(mask), "dnorm")["rel_loss"])
    # append garbage padding
    logits_p = np.concatenate([logits, rng.randn(1, 4, 4).astype(np.float32)], 1)
    labels_p = np.concatenate([labels, [[9, 9, 9, 9]]], 1) % 4
    mask_p = np.concatenate([mask, np.zeros((1, 4), bool)], 1)
    b = float(edge_losses(jnp.asarray(logits_p), jnp.asarray(labels_p),
                          jnp.asarray(mask_p), "dnorm")["rel_loss"])
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_node_losses_masked_mean():
    rng = np.random.RandomState(3)
    logits = rng.randn(2, 5, 7).astype(np.float32)
    labels = rng.randint(0, 7, (2, 5))
    mask = np.asarray([[1, 1, 1, 0, 0], [1, 0, 0, 0, 0]], bool)
    got = float(node_losses(jnp.asarray(logits), jnp.asarray(labels),
                            jnp.asarray(mask))["obj_loss"])
    ces = [_np_ce(logits[b, i], labels[b, i]) for b in range(2)
           for i in range(5) if mask[b, i]]
    np.testing.assert_allclose(got, np.mean(ces), rtol=1e-5)


def test_torch_reference_parity():
    """Differential test against the reference loss code run via torch."""
    torch = pytest.importorskip("torch")
    import sys
    if "/root/reference" not in sys.path:
        # append: reference root-level module names must not shadow ours
        sys.path.append("/root/reference")
    try:
        from lib.losses import edge_losses as ref_edge_losses
    except Exception as e:
        pytest.skip(f"reference losses unavailable: {e}")

    rng = np.random.RandomState(4)
    E, R = 20, 8
    logits = rng.randn(E, R).astype(np.float32)
    labels = rng.randint(0, R, E)
    for loss_type in ("baseline", "dnorm", "dnorm-fgbg"):
        weights = (1, 1, 1.5) if loss_type == "baseline" else (1.2, 0.8, 1.5)
        ref = ref_edge_losses(torch.tensor(logits), torch.tensor(labels),
                              loss_type=loss_type, loss_weights=weights)
        want = float(ref["rel_loss"])
        got = float(edge_losses(jnp.asarray(logits[None]),
                                jnp.asarray(labels[None]),
                                jnp.ones((1, E), bool), loss_type,
                                weights)["rel_loss"])
        np.testing.assert_allclose(got, want, rtol=1e-4), loss_type
