import jax
import jax.numpy as jnp
import numpy as np
import pytest

from confild_tpu.models import unet as junet


def small_model(**kw):
    defaults = dict(
        image_size=32, num_channels=32, num_res_blocks=1,
        channel_mult="1,2", attention_resolutions="16",
        num_heads=2, num_head_channels=-1, out_channels=1)
    defaults.update(kw)
    return junet.create_model(**defaults)


class TestUNetShapes:
    def test_forward_shape(self):
        m = small_model()
        params = m.init(jax.random.key(0))
        x = jnp.zeros((2, 1, 32, 32))
        t = jnp.array([0, 500])
        out = m.apply(params, x, t)
        assert out.shape == (2, 1, 32, 32)

    def test_learn_sigma_doubles_channels(self):
        m = small_model(learn_sigma=True)
        params = m.init(jax.random.key(0))
        out = m.apply(params, jnp.zeros((1, 1, 32, 32)), jnp.array([3]))
        assert out.shape == (1, 2, 32, 32)

    @pytest.mark.slow
    def test_1d(self):
        m = small_model(dims=1)
        params = m.init(jax.random.key(0))
        out = m.apply(params, jnp.zeros((2, 1, 32)), jnp.array([0, 1]))
        assert out.shape == (2, 1, 32)

    @pytest.mark.slow
    def test_3d(self):
        m = small_model(dims=3)
        params = m.init(jax.random.key(0))
        out = m.apply(params, jnp.zeros((1, 1, 4, 16, 16)), jnp.array([0]))
        assert out.shape == (1, 1, 4, 16, 16)

    @pytest.mark.slow
    def test_timestep_dependence(self):
        m = small_model()
        params = m.init(jax.random.key(0))
        # every residual/emb path ends in a zero-init conv (faithful to the
        # reference zero_module), so a fresh net is t-independent; perturb all
        # params to exercise the emb pathway.
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(jax.random.key(9), len(leaves))
        params = jax.tree.unflatten(treedef, [
            l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
            for l, k in zip(leaves, keys)])
        x = jax.random.normal(jax.random.key(1), (1, 1, 32, 32))
        a = m.apply(params, x, jnp.array([0]))
        b = m.apply(params, x, jnp.array([900]))
        assert not jnp.allclose(a, b)

    def test_zero_init_out(self):
        # zero_module on the final conv: fresh model must output exactly 0
        m = small_model()
        params = m.init(jax.random.key(0))
        out = m.apply(params, jax.random.normal(jax.random.key(1), (1, 1, 32, 32)),
                      jnp.array([10]))
        assert jnp.allclose(out, 0.0)

    def test_class_conditional(self):
        m = small_model(class_cond=True, num_classes=5)
        params = m.init(jax.random.key(0))
        x = jax.random.normal(jax.random.key(1), (2, 1, 32, 32))
        out = m.apply(params, x, jnp.array([1, 2]), y=jnp.array([0, 3]))
        assert out.shape == (2, 1, 32, 32)


class TestTimestepEmbedding:
    def test_matches_torch_formula(self):
        from confild_tpu.models.nn import timestep_embedding
        t = jnp.array([0.0, 1.0, 999.0])
        emb = timestep_embedding(t, 16)
        assert emb.shape == (3, 16)
        # t=0: cos half = 1, sin half = 0
        np.testing.assert_allclose(emb[0, :8], 1.0, atol=1e-6)
        np.testing.assert_allclose(emb[0, 8:], 0.0, atol=1e-6)


@pytest.mark.parametrize("scale_shift", [False, True])
class TestTorchParity:
    def test_forward_parity(self, scale_shift):
        torch = pytest.importorskip("torch")
        import sys
        sys.path.insert(0, "/root/reference/UnconditionalDiffusionTraining_and_Generation")
        from src.unet import UNetModel as TorchUNet

        kwargs = dict(
            image_size=32, in_channels=1, model_channels=32, out_channels=1,
            num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
            num_heads=2, use_scale_shift_norm=scale_shift, dims=2)
        tm = TorchUNet(**kwargs)
        tm.eval()

        m = junet.UNetModel(junet.UNetConfig(
            image_size=32, in_channels=1, model_channels=32, out_channels=1,
            num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
            num_heads=2, use_scale_shift_norm=scale_shift, dims=2))

        from confild_tpu.io.torch_port import unet_params_from_state_dict
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = unet_params_from_state_dict(sd, m)

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 1, 32, 32)).astype(np.float32)
        t = np.array([7, 300], dtype=np.int64)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x), torch.from_numpy(t)).numpy()
        ours = np.asarray(m.apply(jax.tree.map(jnp.asarray, params),
                                  jnp.asarray(x), jnp.asarray(t)))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


class TestGroupNorm:
    """Direct golden test for the lane-preserving GroupNorm formulation
    (GroupNorm32, reference ``src/nn.py:17-19``) against torch.nn.GroupNorm."""

    @pytest.mark.parametrize("shape,groups", [
        ((2, 24, 24, 64), 32),
        ((1, 7, 13, 128), 32),     # non-tile-aligned spatial dims
        ((2, 4, 6, 6, 32), 32),    # 3-D, groups clamped to channels
        ((3, 10, 16), 16),         # 1-D
    ])
    def test_torch_parity(self, shape, groups):
        import torch
        from confild_tpu.models import nn as tnn

        c = shape[-1]
        rng = np.random.default_rng(0)
        x = (rng.standard_normal(shape) * 2.7 + 1.3).astype(np.float32)
        scale = rng.standard_normal(c).astype(np.float32)
        bias = rng.standard_normal(c).astype(np.float32)

        out = tnn.group_norm({"scale": jnp.asarray(scale),
                              "bias": jnp.asarray(bias)}, jnp.asarray(x),
                             num_groups=groups)

        g = min(groups, c)
        tg = torch.nn.GroupNorm(g, c)
        with torch.no_grad():
            tg.weight.copy_(torch.from_numpy(scale))
            tg.bias.copy_(torch.from_numpy(bias))
        # torch GroupNorm is channels-first
        perm = (0, len(shape) - 1) + tuple(range(1, len(shape) - 1))
        xt = torch.from_numpy(np.transpose(x, perm))
        with torch.no_grad():
            ref = tg(xt).numpy()
        inv = np.argsort(perm)
        np.testing.assert_allclose(np.asarray(out), np.transpose(ref, inv),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("shape,groups", [
        ((2, 24, 24, 64), 32),
        ((3, 10, 16), 16),         # 1-D
    ])
    def test_backward_torch_parity(self, shape, groups):
        """The fused custom-VJP backward (``nn._gn_bwd``: one reduction
        pass + one ``dy*P + x*Q + R`` elementwise pass) must produce the
        same dx/dscale/dbias as torch autograd through torch.nn.GroupNorm."""
        import torch
        from confild_tpu.models import nn as tnn

        c = shape[-1]
        rng = np.random.default_rng(1)
        x = (rng.standard_normal(shape) * 2.7 + 1.3).astype(np.float32)
        scale = rng.standard_normal(c).astype(np.float32)
        bias = rng.standard_normal(c).astype(np.float32)
        dy = rng.standard_normal(shape).astype(np.float32)

        def loss(p, xx):
            return jnp.sum(tnn.group_norm(p, xx, num_groups=groups)
                           * jnp.asarray(dy))
        (gp, gx) = jax.grad(loss, argnums=(0, 1))(
            {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
            jnp.asarray(x))

        g = min(groups, c)
        tg = torch.nn.GroupNorm(g, c)
        with torch.no_grad():
            tg.weight.copy_(torch.from_numpy(scale))
            tg.bias.copy_(torch.from_numpy(bias))
        perm = (0, len(shape) - 1) + tuple(range(1, len(shape) - 1))
        xt = torch.from_numpy(np.transpose(x, perm)).requires_grad_(True)
        tg(xt).backward(torch.from_numpy(np.transpose(dy, perm)))
        inv = np.argsort(perm)
        np.testing.assert_allclose(
            np.asarray(gx), np.transpose(xt.grad.numpy(), inv),
            rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gp["scale"]),
                                   tg.weight.grad.numpy(),
                                   rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(gp["bias"]),
                                   tg.bias.grad.numpy(),
                                   rtol=2e-4, atol=2e-3)

    def test_bf16_preserves_dtype_and_accuracy(self):
        from confild_tpu.models import nn as tnn

        x = jax.random.normal(jax.random.key(0), (2, 16, 16, 64),
                              jnp.bfloat16) * 3 + 1.5
        p = {"scale": jnp.ones((64,)), "bias": jnp.zeros((64,))}
        out = tnn.group_norm(p, x)
        assert out.dtype == jnp.bfloat16
        ref = tnn.group_norm(p, x.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref), atol=0.05)


def test_gn_stats_remat_policy_saves_moments():
    """"matmuls+stats" must (a) leave gradients bit-identical to
    "matmuls" and (b) remove the per-GN moment recompute from the
    backward: two activation-size reduction passes per GN site (the
    recomputed reductions also induced f32 conv-epilogue sinks, r04 HLO —
    see models/unet.py::_save_matmuls_and_stats)."""
    from confild_tpu.models import unet as junet

    def build(policy):
        return junet.create_model(
            image_size=32, num_channels=32, num_res_blocks=1,
            channel_mult="1,2", attention_resolutions="16", num_heads=2,
            use_bf16=True, use_checkpoint=True, remat_policy=policy)

    m1, m2 = build("matmuls"), build("matmuls+stats")
    params = m1.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 1, 32, 32))
    t = jnp.array([3, 7])

    def grads(model):
        def f(p):
            return jnp.sum(jnp.square(
                model.apply(p, x, t).astype(jnp.float32)))
        return jax.grad(f)(params)

    for a, b in zip(jax.tree.leaves(grads(m1)), jax.tree.leaves(grads(m2))):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))

    def count_act_reduces(model):
        def f(p):
            return jnp.sum(jnp.square(
                model.apply(p, x, t).astype(jnp.float32)))
        jaxpr = jax.make_jaxpr(jax.grad(f))(params)
        n = 0

        def walk(j):
            nonlocal n
            for eq in j.eqns:
                if (eq.primitive.name == "reduce_sum" and eq.invars
                        and eq.invars[0].aval.shape
                        and int(np.prod(eq.invars[0].aval.shape)) >= 2048):
                    n += 1
                for v in eq.params.values():
                    vs = v if isinstance(v, (list, tuple)) else [v]
                    for vv in vs:
                        if hasattr(vv, "jaxpr"):
                            walk(vv.jaxpr)
                        elif hasattr(vv, "eqns"):
                            walk(vv)
        walk(jaxpr.jaxpr)
        return n

    n1, n2 = count_act_reduces(m1), count_act_reduces(m2)
    assert n2 < n1, (n1, n2)


@pytest.mark.parametrize("policy", ["full", "matmuls", "matmuls+stats"])
@pytest.mark.slow
def test_remat_policy_grads_match_no_remat(policy):
    """Block remat (either policy) must be a pure memory/time trade: loss
    and parameter gradients identical to the un-rematerialized model."""
    from confild_tpu.models import unet as junet

    def build(use_checkpoint):
        return junet.create_model(
            image_size=16, num_channels=8, num_res_blocks=1,
            channel_mult="1,2", attention_resolutions="8", num_heads=2,
            use_checkpoint=use_checkpoint,
            remat_policy=policy if use_checkpoint else "full")

    ref = build(False)
    rem = build(True)
    params = ref.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 1, 16, 16))
    t = jnp.array([3, 7])

    def loss(model):
        def f(p):
            return jnp.sum(jnp.square(model.apply(p, x, t)))
        return jax.value_and_grad(f)(params)

    v0, g0 = loss(ref)
    v1, g1 = loss(rem)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_group_norm_near_constant_large_mean_finite():
    """E[x^2]-E[x]^2 cancellation on a near-constant large-mean group must
    not produce NaN (variance clamped at zero)."""
    from confild_tpu.models import nn as tnn

    x = 1e3 + 1e-4 * jax.random.normal(jax.random.key(0), (1, 64, 64, 64))
    p = {"scale": jnp.ones((64,)), "bias": jnp.zeros((64,))}
    out = tnn.group_norm(p, x)
    assert np.all(np.isfinite(np.asarray(out)))


def test_cast_torso_params_bit_identical():
    """Pre-casting torso kernels to bf16 must be a no-op for the forward:
    ``apply`` already casts every kernel to the activation dtype at use, so
    casting once up front applies the same rounding earlier (sampling CLIs
    and bench use this to hoist per-step weight converts out of the scan)."""
    m = small_model(use_bf16=True)
    params = m.init(jax.random.key(0))
    cast = m.cast_torso_params(params)

    # torso kernels became bf16; time-embed and GroupNorm params stayed f32
    assert cast["input_blocks"][1][0]["in_conv"]["kernel"].dtype == jnp.bfloat16
    assert cast["time_embed"][0]["kernel"].dtype == jnp.float32
    assert cast["out_conv"]["kernel"].dtype == jnp.float32  # runs in f32
    assert cast["input_blocks"][1][0]["in_norm"]["scale"].dtype == jnp.float32

    x = jax.random.normal(jax.random.key(1), (2, 1, 32, 32))
    t = jnp.array([3, 700])
    a = np.asarray(m.apply(params, x, t))
    b = np.asarray(m.apply(cast, x, t))
    np.testing.assert_array_equal(a, b)

    # f32 torso: identity (no copies)
    m32 = small_model(use_bf16=False)
    p32 = m32.init(jax.random.key(0))
    assert m32.cast_torso_params(p32) is p32


class TestGroupNormSilu:
    """Fused GroupNorm(+FiLM)+SiLU (``nn.group_norm_silu``): forward and
    custom-VJP backward vs the unfused composition autodiffed by JAX —
    the exact ResBlock chain (reference ``src/unet.py:233-241``)."""

    @pytest.mark.parametrize("film", [False, True])
    @pytest.mark.parametrize("shape,groups", [
        ((2, 12, 12, 64), 32),
        ((3, 10, 16), 16),         # 1-D
    ])
    def test_matches_unfused(self, shape, groups, film):
        from confild_tpu.models import nn as tnn

        c = shape[-1]
        b = shape[0]
        rng = np.random.default_rng(3)
        x = jnp.asarray((rng.standard_normal(shape) * 2.1 + 0.7)
                        .astype(np.float32))
        p = {"scale": jnp.asarray(rng.standard_normal(c).astype(np.float32)),
             "bias": jnp.asarray(rng.standard_normal(c).astype(np.float32))}
        dy = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        fs = jnp.asarray(rng.standard_normal((b, c)).astype(np.float32) * .3)
        ft = jnp.asarray(rng.standard_normal((b, c)).astype(np.float32))
        bshape = (b,) + (1,) * (len(shape) - 2) + (c,)

        def fused(p, xx, fs, ft):
            kw = ({"film_scale": fs, "film_shift": ft} if film else {})
            return tnn.group_norm_silu(p, xx, num_groups=groups, **kw)

        def unfused(p, xx, fs, ft):
            h = tnn.group_norm(p, xx, num_groups=groups)
            if film:
                h = h * (1 + fs.reshape(bshape)) + ft.reshape(bshape)
            return jax.nn.silu(h)

        np.testing.assert_allclose(np.asarray(fused(p, x, fs, ft)),
                                   np.asarray(unfused(p, x, fs, ft)),
                                   rtol=2e-5, atol=2e-5)

        def loss(fn):
            def f(p, xx, fs, ft):
                return jnp.sum(fn(p, xx, fs, ft) * dy)
            return f

        gf = jax.grad(loss(fused), argnums=(0, 1, 2, 3))(p, x, fs, ft)
        gu = jax.grad(loss(unfused), argnums=(0, 1, 2, 3))(p, x, fs, ft)
        np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gu[1]),
                                   rtol=3e-4, atol=3e-4)  # dx
        for k in ("scale", "bias"):
            np.testing.assert_allclose(np.asarray(gf[0][k]),
                                       np.asarray(gu[0][k]),
                                       rtol=3e-4, atol=2e-3)
        if film:
            np.testing.assert_allclose(np.asarray(gf[2]), np.asarray(gu[2]),
                                       rtol=3e-4, atol=2e-3)  # d film_scale
            np.testing.assert_allclose(np.asarray(gf[3]), np.asarray(gu[3]),
                                       rtol=3e-4, atol=2e-3)  # d film_shift

    def test_bf16_dtype_and_accuracy(self):
        from confild_tpu.models import nn as tnn

        x = jax.random.normal(jax.random.key(1), (2, 16, 16, 64),
                              jnp.bfloat16) * 2 + 0.5
        p = {"scale": jnp.ones((64,)), "bias": jnp.zeros((64,))}
        out = tnn.group_norm_silu(p, x)
        assert out.dtype == jnp.bfloat16
        ref = jax.nn.silu(tnn.group_norm(p, x.astype(jnp.float32)))
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref), atol=0.05)
        # gradient path stays in the activation dtype
        g = jax.grad(lambda xx: jnp.sum(
            tnn.group_norm_silu(p, xx).astype(jnp.float32)))(x)
        assert g.dtype == jnp.bfloat16


class TestTailDtype:
    """The final norm+SiLU+conv dtype knob (ADVICE r03): default runs in the
    torso dtype (a deliberate perf deviation), tail_dtype=f32 restores the
    reference's exact behavior (ref unet.py:662-663 casts h to x.dtype before
    self.out; convert_to_fp16 never converts self.out)."""

    def _perturbed_params(self, m):
        params = m.init(jax.random.key(0))
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(jax.random.key(7), len(leaves))
        return jax.tree.unflatten(treedef, [
            l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
            for l, k in zip(leaves, keys)])

    def test_f32_torso_tail_noop(self):
        import dataclasses
        m = small_model()
        params = self._perturbed_params(m)
        m32 = junet.UNetModel(dataclasses.replace(m.cfg,
                                                  tail_dtype=jnp.float32))
        x = jax.random.normal(jax.random.key(1), (2, 1, 32, 32))
        t = jnp.array([10, 700])
        np.testing.assert_array_equal(np.asarray(m.apply(params, x, t)),
                                      np.asarray(m32.apply(params, x, t)))

    def test_bf16_tail_error_quantified(self):
        import dataclasses
        m = small_model(use_bf16=True)
        params = self._perturbed_params(m)
        m32 = junet.UNetModel(dataclasses.replace(m.cfg,
                                                  tail_dtype=jnp.float32))
        x = jax.random.normal(jax.random.key(1), (2, 1, 32, 32))
        t = jnp.array([10, 700])
        a = np.asarray(m.apply(params, x, t), np.float64)
        b = np.asarray(m32.apply(params, x, t), np.float64)
        # bf16 tail vs f32 tail on the SAME bf16 torso activations: the only
        # delta is the final GroupNorm+SiLU+conv rounding — must stay within
        # bf16 epsilon territory relative to the output scale
        err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)
        assert err < 0.02, f"bf16-tail relative error {err:.4f}"


class TestConvBwdMM:
    """The shifted-matmul conv backward (nn.set_conv_bwd_mode('mm')) must be
    numerically identical to XLA autodiff up to f32 reassociation."""

    @pytest.mark.parametrize("k,cin,cout", [(3, 8, 16), (5, 4, 4), (1, 8, 8)])
    def test_grads_match_autodiff(self, k, cin, cout):
        from confild_tpu.models import nn as tnn
        key = jax.random.key(0)
        kx, kk, kd = jax.random.split(key, 3)
        x = jax.random.normal(kx, (2, 12, 10, cin), jnp.float32)
        params = {"kernel": jax.random.normal(kk, (k, k, cin, cout)) * 0.1,
                  "bias": jnp.zeros((cout,))}
        dy_seed = jax.random.normal(kd, (2, 12, 10, cout))

        def loss(p, x):
            return jnp.sum(tnn.conv(p, x) * dy_seed)

        tnn.set_conv_bwd_mode("xla")
        try:
            ref = jax.grad(loss, argnums=(0, 1))(params, x)
            tnn.set_conv_bwd_mode("mm")
            got = jax.grad(loss, argnums=(0, 1))(params, x)
        finally:
            tnn.set_conv_bwd_mode("xla")
        np.testing.assert_allclose(got[1], ref[1], rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(got[0]["kernel"], ref[0]["kernel"],
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(got[0]["bias"], ref[0]["bias"],
                                   rtol=2e-5, atol=2e-5)

    def test_strided_and_3d_fall_back(self):
        """Non stride-1/2-d cases must keep working (and stay differentiable)
        under mm mode via the XLA fallback path."""
        from confild_tpu.models import nn as tnn
        key = jax.random.key(1)
        tnn.set_conv_bwd_mode("mm")
        try:
            x = jax.random.normal(key, (1, 8, 8, 4))
            p = {"kernel": jax.random.normal(key, (3, 3, 4, 8)) * 0.1,
                 "bias": jnp.zeros((8,))}
            g = jax.grad(lambda xx: jnp.sum(
                tnn.conv(p, xx, stride=2)))(x)
            assert g.shape == x.shape
            x3 = jax.random.normal(key, (1, 4, 4, 4, 2))
            p3 = {"kernel": jax.random.normal(key, (3, 3, 3, 2, 2)) * 0.1,
                  "bias": jnp.zeros((2,))}
            g3 = jax.grad(lambda xx: jnp.sum(tnn.conv(p3, xx)))(x3)
            assert g3.shape == x3.shape
        finally:
            tnn.set_conv_bwd_mode("xla")

    def test_unet_grads_match(self):
        """Full small-UNet input-grad parity between the two backward modes."""
        from confild_tpu.models import nn as tnn
        m = small_model()
        params = m.init(jax.random.key(0))
        x = jax.random.normal(jax.random.key(2), (1, 1, 32, 32))
        t = jnp.array([3], jnp.int32)

        def loss(xx):
            return jnp.sum(m.apply(params, xx, t) ** 2)

        tnn.set_conv_bwd_mode("xla")
        try:
            ref = jax.grad(loss)(x)
            tnn.set_conv_bwd_mode("mm")
            got = jax.grad(loss)(x)
        finally:
            tnn.set_conv_bwd_mode("xla")
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
