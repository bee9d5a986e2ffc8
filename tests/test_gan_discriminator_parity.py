"""Weight-level differential: our GAN discriminators vs the reference's.

The reference wraps every discriminator conv in torch ``spectral_norm``
(``/root/reference/augment/gan.py:69-104``), whose state_dict stores the
``weight_orig``/``weight_u``/``weight_v`` reparameterization. This test
builds the reference's own D Sequentials (same ctor recipe, gan.py:74-103),
converges the torch power iteration with train-mode forwards, imports the
state through ``gan_discriminator_flat_updates`` and asserts eval-mode
logit parity for D_nodes/D_edges (class-conditional patch Ds) and D_global
(both plain and ``largeD``).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sgg_tpu.models.gan.discriminators import (CondPatchDiscriminator,
                                               GlobalDiscriminator,
                                               conditioned_features)
from sgg_tpu.train.checkpoint import (gan_discriminator_flat_updates,
                                      optimistic_update)  # noqa: E402

from reference_utils import load_reference  # noqa: E402

pytestmark = pytest.mark.slow

N_CH, POOL, FMAP, C_CLS = 16, 7, 38, 9


def _ref_convs(torch):
    """The reference's spectral-normed conv factory (gan.py:70)."""
    from torch.nn.utils import spectral_norm
    return lambda n_in, n_out, ks, pad: spectral_norm(
        torch.nn.Conv2d(n_in, n_out, kernel_size=ks, padding=pad))


def _ref_cond_discriminator(torch, n_classes, n_ch):
    """cond_discriminator (gan.py:74-82) — local closure in GAN.__init__,
    reconstructed with the same Sequential layout."""
    nn, conv = torch.nn, _ref_convs(torch)
    return nn.Sequential(conv(n_ch + n_classes, n_ch // 2, 3, 0), nn.ReLU(),
                         conv(n_ch // 2, n_ch // 4, 3, 0), nn.ReLU(),
                         conv(n_ch // 4, n_ch // 8, 1, 0), nn.ReLU(),
                         conv(n_ch // 8, 1, 3, 0), nn.Flatten())


def _ref_global_discriminator(torch, n_ch, fmap_sz, largeD):
    """D_global (gan.py:87-103)."""
    nn, conv = torch.nn, _ref_convs(torch)
    ident = nn.Identity()
    return nn.Sequential(
        conv(n_ch, n_ch // 2, 3, 0),
        nn.LeakyReLU(0.2),
        conv(n_ch // 2, n_ch // 2, 1, 0) if largeD else ident,
        nn.LeakyReLU(0.2) if largeD else ident,
        nn.AvgPool2d(2, ceil_mode=True) if fmap_sz > 24 else ident,
        conv(n_ch // 2, n_ch // 2, 3, 0),
        nn.LeakyReLU(0.2),
        conv(n_ch // 2, n_ch // 2, 1, 0) if largeD else ident,
        nn.LeakyReLU(0.2) if largeD else ident,
        nn.AvgPool2d(2),
        conv(n_ch // 2, n_ch // 4, 3, 0),
        nn.LeakyReLU(0.2),
        conv(n_ch // 4, n_ch // 4, 1, 0) if largeD else ident,
        nn.LeakyReLU(0.2) if largeD else ident,
        nn.AvgPool2d(2),
        conv(n_ch // 4, 1, 3, 0),
        nn.Flatten())


def _converge_power_iteration(torch, module, x, iters=200):
    """Train-mode forwards advance torch's u/v; converge them so the
    one-step sigma estimates on both sides agree (see _snconv_updates)."""
    module.train()
    with torch.no_grad():
        for _ in range(iters):
            module(x)
    module.eval()


def _state_np(m, prefix):
    return {f"{prefix}.{k}": v.detach().numpy().copy()
            for k, v in m.state_dict().items()}


def test_cond_patch_discriminator_parity():
    torch = load_reference()
    torch.manual_seed(0)
    ref = _ref_cond_discriminator(torch, C_CLS, N_CH)

    rng = np.random.RandomState(1)
    n = 5
    feats = rng.randn(n, N_CH, POOL, POOL).astype(np.float32)
    labels = rng.randint(0, C_CLS, n)
    onehot = np.zeros((n, C_CLS), np.float32)
    onehot[np.arange(n), labels] = 1
    cond = np.concatenate(
        [feats, np.broadcast_to(onehot[:, :, None, None],
                                (n, C_CLS, POOL, POOL))], 1)
    x_t = torch.from_numpy(cond)
    _converge_power_iteration(torch, ref, x_t)
    with torch.no_grad():
        want = ref(x_t).numpy()

    ts = _state_np(ref, "D_nodes")
    ours = CondPatchDiscriminator(n_ch=N_CH, dtype=jnp.float32)
    x = conditioned_features(
        jnp.asarray(np.transpose(feats, (0, 2, 3, 1)))[None],
        jnp.asarray(labels)[None], C_CLS)
    variables = ours.init(jax.random.key(0), x[0], train=False)
    flat = {k.replace("D_nodes/", ""): v
            for k, v in gan_discriminator_flat_updates(ts).items()
            if k.split("/", 1)[1].startswith("D_nodes/")}
    variables = optimistic_update(variables, flat)
    got = ours.apply(variables, x[0], train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("largeD", [False, True])
def test_global_discriminator_parity(largeD):
    torch = load_reference()
    torch.manual_seed(2)
    ref = _ref_global_discriminator(torch, N_CH, FMAP, largeD)

    rng = np.random.RandomState(3)
    fmaps = rng.randn(2, N_CH, FMAP, FMAP).astype(np.float32)
    x_t = torch.from_numpy(fmaps)
    _converge_power_iteration(torch, ref, x_t)
    with torch.no_grad():
        want = ref(x_t).numpy()

    ts = _state_np(ref, "D_global")
    ours = GlobalDiscriminator(n_ch=N_CH, large=largeD, fmap_sz=FMAP,
                               dtype=jnp.float32)
    x = jnp.asarray(np.transpose(fmaps, (0, 2, 3, 1)))
    variables = ours.init(jax.random.key(0), x, train=False)
    flat = {k.replace("D_global/", ""): v
            for k, v in gan_discriminator_flat_updates(
                ts, largeD=largeD).items()
            if k.split("/", 1)[1].startswith("D_global/")}
    variables = optimistic_update(variables, flat)
    got = ours.apply(variables, x, train=False)
    assert got.shape == (2, 1) and want.shape == (2, 1)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)
