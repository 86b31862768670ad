import jax
import jax.numpy as jnp
import numpy as np
import pytest

from confild_tpu.models import cnf
from confild_tpu.ops import siren_decode as sd


@pytest.fixture(scope="module")
def setup():
    m = cnf.create_nf(
        "SIRENAutodecoder_film",
        in_coord_features=2, in_latent_features=16, out_features=3,
        num_hidden_layers=3, hidden_features=32)
    params = m.init_params(jax.random.key(0))
    coords = jax.random.uniform(jax.random.key(1), (300, 2), minval=-1, maxval=1)
    latents = jax.random.normal(jax.random.key(2), (5, 16)) * 0.1
    return params, coords, latents


def _f64_truth(params, coords, latents, w0=30.0):
    """Ground-truth decode in float64 numpy."""
    p = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
    x = np.asarray(coords, np.float64)[None]
    z = np.asarray(latents, np.float64)
    for l1, l2 in zip(p["net1"][:-1], p["net2"]):
        x = np.sin(w0 * (x @ l1["kernel"] + l1["bias"]
                         + (z @ l2["kernel"])[:, None, :]))
    return x @ p["net1"][-1]["kernel"] + p["net1"][-1]["bias"]


class TestFusedDecode:
    def test_accuracy_vs_f64(self, setup):
        """A deep w0=30 SIREN amplifies f32 roundoff chaotically, so the gate
        is: the fused kernel must be at least as close to the f64 truth as the
        plain XLA f32 path (both are valid f32 evaluations)."""
        params, coords, latents = setup
        truth = _f64_truth(params, coords, latents)
        ref32 = np.asarray(sd.siren_decode(params, coords, latents,
                                           use_pallas=False), np.float64)
        fused = np.asarray(sd.fused_siren_decode(params, coords, latents,
                                                 30.0, 2, 128, True), np.float64)
        assert fused.shape == ref32.shape == (5, 300, 3)
        err_ref = np.abs(ref32 - truth).max()
        err_fused = np.abs(fused - truth).max()
        assert err_fused <= 2 * err_ref + 1e-6, (err_fused, err_ref)

    def test_nondivisible_tiles(self, setup):
        params, coords, latents = setup
        # 300 % 128 != 0 and 5 % 2 != 0: exercises padding; padded and
        # unpadded tilings must agree exactly on the valid region.
        a = sd.fused_siren_decode(params, coords, latents, 30.0, 2, 128, True)
        b = sd.fused_siren_decode(params, coords[:256], latents[:4],
                                  30.0, 4, 256, True)
        np.testing.assert_allclose(np.asarray(a[:4, :256]), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)

    def test_gradients_wrt_latents(self, setup):
        """dlatents comes from the fused Pallas dZ kernel: must match the XLA
        autodiff gradient up to f32 rounding (both are valid f32 backward
        evaluations of the same chain)."""
        params, coords, latents = setup
        w = jax.random.normal(jax.random.key(5), (5, 300, 3))

        def loss_fused(z):
            return jnp.sum(sd.fused_siren_decode(params, coords, z,
                                                 30.0, 2, 128, True) * w)

        def loss_ref(z):
            return jnp.sum(sd.siren_decode(params, coords, z,
                                           use_pallas=False) * w)

        g_fused = jax.grad(loss_fused)(latents)
        g_ref = jax.grad(loss_ref)(latents)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   rtol=5e-3, atol=1e-4)
        assert jnp.all(jnp.isfinite(g_fused)) and jnp.any(g_fused != 0)

    def test_frozen_op_dz_matches_autodiff(self, setup):
        params, coords, latents = setup
        w = jax.random.normal(jax.random.key(9), (5, 300, 3))

        def loss_frozen(z):
            return jnp.sum(sd.fused_siren_decode_frozen(
                params, coords, z, 30.0, 2, 128, True) * w)

        def loss_ref(z):
            return jnp.sum(sd.siren_decode(params, coords, z,
                                           use_pallas=False) * w)

        g_frozen = jax.grad(loss_frozen)(latents)
        g_ref = jax.grad(loss_ref)(latents)
        np.testing.assert_allclose(np.asarray(g_frozen), np.asarray(g_ref),
                                   rtol=5e-3, atol=1e-4)
        # frozen semantics: zero cotangents for params/coords
        gp = jax.grad(lambda p: jnp.sum(sd.fused_siren_decode_frozen(
            p, coords, latents, 30.0, 2, 128, True)))(params)
        assert all(np.allclose(np.asarray(x), 0) for x in jax.tree.leaves(gp))

    def test_gradients_wrt_params(self, setup):
        params, coords, latents = setup
        w = jax.random.normal(jax.random.key(6), (5, 300, 3))

        def loss_fused(p):
            return jnp.sum(sd.fused_siren_decode(p, coords, latents,
                                                 30.0, 2, 128, True) * w)

        def loss_ref(p):
            return jnp.sum(sd.siren_decode(p, coords, latents,
                                           use_pallas=False) * w)

        g_fused = jax.grad(loss_fused)(params)
        g_ref = jax.grad(loss_ref)(params)
        # the fused backward evaluates sin/cos with the kernel's minimax
        # polynomial; a deep w0=30 SIREN amplifies the ~1e-7 activation
        # difference, so gate at the same tolerance as the latent grads
        for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=1e-4)

    def test_fused_bwd_structure_and_values(self, setup):
        """fused_siren_decode_bwd returns a cotangent pytree with exactly the
        param structure plus dlatents matching the jnp vjp."""
        params, coords, latents = setup
        w = jax.random.normal(jax.random.key(9), (5, 300, 3))
        dp, dz = sd.fused_siren_decode_bwd(params, coords, latents, w,
                                           30.0, 8, 128, True)
        assert (jax.tree.structure(dp) == jax.tree.structure(params))

        def loss_ref(p, z):
            return jnp.sum(sd.siren_decode(p, coords, z,
                                           use_pallas=False) * w)

        gp_ref, gz_ref = jax.grad(loss_ref, argnums=(0, 1))(params, latents)
        np.testing.assert_allclose(np.asarray(dz), np.asarray(gz_ref),
                                   rtol=5e-3, atol=1e-4)
        for a, b in zip(jax.tree.leaves(dp), jax.tree.leaves(gp_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=1e-4)

    def test_single_modulated_layer(self):
        # num_hidden_layers=0: net1 has 2 layers, net2 has 1 (n_mid=0 edge)
        m = cnf.create_nf(
            "SIRENAutodecoder_film",
            in_coord_features=2, in_latent_features=8, out_features=2,
            num_hidden_layers=0, hidden_features=16)
        params = m.init_params(jax.random.key(0))
        coords = jax.random.uniform(jax.random.key(1), (64, 2))
        latents = jax.random.normal(jax.random.key(2), (3, 8))
        fused = np.asarray(sd.fused_siren_decode(params, coords, latents,
                                                 30.0, 2, 64, True), np.float64)
        truth = _f64_truth(params, coords, latents)
        ref32 = np.asarray(sd.siren_decode(params, coords, latents,
                                           use_pallas=False), np.float64)
        err_ref = np.abs(ref32 - truth).max()
        assert np.abs(fused - truth).max() <= 2 * err_ref + 1e-6


class TestChunkedBackward:
    def test_chunked_bwd_matches_direct(self, setup, monkeypatch):
        """Coordinate-chunked backward must equal the direct vjp."""
        params, coords, latents = setup
        w = jax.random.normal(jax.random.key(7), (5, 300, 3))

        def loss(z):
            return jnp.sum(sd.fused_siren_decode(params, coords, z,
                                                 30.0, 2, 128, True) * w)

        g_direct = jax.grad(loss)(latents)          # m=300 <= BWD_CHUNK
        monkeypatch.setattr(sd, "BWD_CHUNK", 128)   # force 3 chunks
        g_chunked = jax.grad(loss)(latents)
        np.testing.assert_allclose(np.asarray(g_chunked),
                                   np.asarray(g_direct), rtol=1e-5, atol=1e-6)

    def test_chunked_bwd_coords_grad(self, setup, monkeypatch):
        params, coords, latents = setup
        w = jax.random.normal(jax.random.key(8), (5, 300, 3))

        def loss(c):
            return jnp.sum(sd.fused_siren_decode(params, c, latents,
                                                 30.0, 2, 128, True) * w)

        g_direct = jax.grad(loss)(coords)
        monkeypatch.setattr(sd, "BWD_CHUNK", 128)
        g_chunked = jax.grad(loss)(coords)
        np.testing.assert_allclose(np.asarray(g_chunked),
                                   np.asarray(g_direct), rtol=1e-5, atol=1e-6)
