import jax
import jax.numpy as jnp
import numpy as np
import pytest

from confild_tpu.ops.flash_attention import (_reference_attention,
                                             flash_attention)


class TestFlashAttention:
    @pytest.mark.parametrize("n,d", [(256, 64), (512, 32)])
    def test_matches_reference(self, n, d):
        q = jax.random.normal(jax.random.key(0), (4, n, d))
        k = jax.random.normal(jax.random.key(1), (4, n, d))
        v = jax.random.normal(jax.random.key(2), (4, n, d))
        ref = _reference_attention(q, k, v)
        out = flash_attention(q, k, v, 128, 128, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_nondivisible_length_masked_correctly(self):
        """Padded keys must receive zero softmax weight."""
        n, d = 200, 32  # pads to 256 with block 128
        q = jax.random.normal(jax.random.key(0), (2, n, d))
        k = jax.random.normal(jax.random.key(1), (2, n, d))
        v = jax.random.normal(jax.random.key(2), (2, n, d))
        ref = _reference_attention(q, k, v)
        out = flash_attention(q, k, v, 128, 128, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_gradients_match(self):
        n, d = 128, 32
        q = jax.random.normal(jax.random.key(0), (1, n, d))
        k = jax.random.normal(jax.random.key(1), (1, n, d))
        v = jax.random.normal(jax.random.key(2), (1, n, d))
        w = jax.random.normal(jax.random.key(3), (1, n, d))

        g_flash = jax.grad(lambda q: jnp.sum(
            flash_attention(q, k, v, 64, 64, True) * w))(q)
        g_ref = jax.grad(lambda q: jnp.sum(
            _reference_attention(q, k, v) * w))(q)
        np.testing.assert_allclose(np.asarray(g_flash), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-5)


    def test_all_gradients_match(self):
        """dQ, dK, dV from the Pallas backward vs the jnp reference."""
        n, d = 256, 32
        q = jax.random.normal(jax.random.key(0), (2, n, d))
        k = jax.random.normal(jax.random.key(1), (2, n, d))
        v = jax.random.normal(jax.random.key(2), (2, n, d))
        w = jax.random.normal(jax.random.key(3), (2, n, d))

        gf = jax.grad(lambda q, k, v: jnp.sum(
            flash_attention(q, k, v, 128, 128, True) * w), argnums=(0, 1, 2))(
            q, k, v)
        gr = jax.grad(lambda q, k, v: jnp.sum(
            _reference_attention(q, k, v) * w), argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5,
                                       err_msg=f"d{name}")

    def test_gradients_match_ragged_length(self):
        """Backward must mask padded keys/queries (N not divisible by the
        block): padded columns get zero softmax weight, padded query rows
        contribute nothing to dK/dV."""
        n, d = 200, 32   # pads to 256 with block 128
        q = jax.random.normal(jax.random.key(0), (2, n, d))
        k = jax.random.normal(jax.random.key(1), (2, n, d))
        v = jax.random.normal(jax.random.key(2), (2, n, d))
        w = jax.random.normal(jax.random.key(3), (2, n, d))

        gf = jax.grad(lambda q, k, v: jnp.sum(
            flash_attention(q, k, v, 128, 128, True) * w), argnums=(0, 1, 2))(
            q, k, v)
        gr = jax.grad(lambda q, k, v: jnp.sum(
            _reference_attention(q, k, v) * w), argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5,
                                       err_msg=f"d{name}")

    def test_backward_has_no_quadratic_intermediate(self):
        """O(N) memory: the jaxpr of the VJP must not contain any (N, N)
        attention-matrix intermediate — the two-pass recompute keeps P
        blockwise inside the kernels (VERDICT r02 item 4)."""
        n, d = 1024, 32
        q = jax.random.normal(jax.random.key(0), (1, n, d))

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v, 256, 256, True))

        jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2)))(q, q, q)
        for eqn in jaxpr.jaxpr.eqns:
            for var in list(eqn.invars) + list(eqn.outvars):
                shape = getattr(getattr(var, "aval", None), "shape", ())
                assert not (len(shape) >= 2 and shape[-1] == n
                            and shape[-2] == n), (
                    f"O(N^2) intermediate {shape} in {eqn.primitive}")

    def test_bf16_inputs(self):
        n, d = 256, 64
        mk = lambda s: jax.random.normal(jax.random.key(s), (2, n, d),
                                         jnp.bfloat16)
        q, k, v = mk(0), mk(1), mk(2)
        ref = _reference_attention(q, k, v)
        out = flash_attention(q, k, v, 128, 128, True)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-2, atol=2e-2)
        g = jax.grad(lambda q: jnp.sum(
            flash_attention(q, k, v, 128, 128, True).astype(jnp.float32)))(q)
        assert g.dtype == jnp.bfloat16

    def test_unet_flash_matches_einsum(self):
        """AttentionBlock with use_flash must reproduce the einsum path."""
        from confild_tpu.models.unet import AttnSpec, _apply_attn, _init_layer
        import dataclasses

        spec = AttnSpec(64, 2, use_flash=False)
        p = _init_layer(jax.random.key(0), spec)
        x = jax.random.normal(jax.random.key(1), (2, 16, 16, 64))
        ref = _apply_attn(p, spec, x)
        out = _apply_attn(p, dataclasses.replace(spec, use_flash=True), x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-5, atol=3e-5)


class TestRingAttention:
    def test_matches_reference_on_mesh(self):
        from confild_tpu.ops.ring_attention import ring_attention
        from confild_tpu.parallel import mesh as pmesh

        mesh = pmesh.get_mesh(8)
        bh, n, d = 2, 64, 16
        q = jax.random.normal(jax.random.key(0), (bh, n, d))
        k = jax.random.normal(jax.random.key(1), (bh, n, d))
        v = jax.random.normal(jax.random.key(2), (bh, n, d))
        ref = _reference_attention(q, k, v)
        out = ring_attention(q, k, v, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-5, atol=3e-5)

    def test_output_stays_sharded(self):
        from confild_tpu.ops.ring_attention import ring_attention
        from confild_tpu.parallel import mesh as pmesh

        mesh = pmesh.get_mesh(8)
        q = jax.random.normal(jax.random.key(0), (1, 128, 8))
        out = ring_attention(q, q, q, mesh)
        assert out.sharding.spec == jax.sharding.PartitionSpec(None, "data",
                                                               None)


class TestUNetFlashPlumbing:
    def test_create_model_auto_threshold(self):
        """create_model auto-enables flash attention only at >=8192 tokens
        (measured TPU v5e crossover); an explicit flag overrides."""
        from confild_tpu.models import unet as junet

        # case4 shape: 384^2 image, ds8 (res key 48) -> 2304 tokens:
        # stays on XLA attention
        m = junet.create_model(image_size=384, num_channels=32,
                               num_res_blocks=1, channel_mult="1,2",
                               attention_resolutions="48", num_heads=2)
        assert not m.cfg.use_flash_attention
        # beyond-crossover scale: 1536^2 at ds8 -> 36864 tokens: flash
        # auto-on (768^2/9216 sits below the measured crossover,
        # examples/xl_steady.json)
        m = junet.create_model(image_size=1536, num_channels=32,
                               num_res_blocks=1, channel_mult="1,2",
                               attention_resolutions="192", num_heads=2)
        assert m.cfg.use_flash_attention
        # explicit override wins both ways
        m = junet.create_model(image_size=384, num_channels=32,
                               num_res_blocks=1, channel_mult="1,2",
                               attention_resolutions="48", num_heads=2,
                               use_flash_attention=True)
        assert m.cfg.use_flash_attention

    @pytest.mark.parametrize("new_order", [False, True])
    def test_attention_block_parity_2304_tokens(self, new_order):
        """UNet AttentionBlock with flash on vs off at the case4 token count
        (384^2 latent image at ds8 = 2304 tokens), both QKV layouts."""
        from confild_tpu.models import unet as junet

        b, c, heads = 2, 64, 2
        spec = junet.AttnSpec(ch=c, num_heads=heads,
                              new_order=new_order, use_flash=False)
        spec_f = junet.AttnSpec(ch=c, num_heads=heads,
                                new_order=new_order, use_flash=True)
        p = junet._init_layer(jax.random.key(0), spec)
        # proj is zero-initialized (residual block convention): randomize it
        # so the attention output actually reaches the block output
        p["proj"]["kernel"] = 0.02 * jax.random.normal(
            jax.random.key(2), p["proj"]["kernel"].shape)
        x = jax.random.normal(jax.random.key(1), (b, 48, 48, c))
        ref = junet._apply_attn(p, spec, x)
        fla = junet._apply_attn(p, spec_f, x)
        np.testing.assert_allclose(np.asarray(fla), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


class TestUNetRingPlumbing:
    @pytest.mark.slow
    def test_seq_parallel_unet_matches_single_device(self):
        """A UNet built with sequence_parallel_mesh must reproduce the plain
        model: same params, attention tokens sharded over the 8-device mesh
        with ring K/V rotation (SURVEY §5.7 additive capability)."""
        from confild_tpu.models import unet as junet
        from confild_tpu.parallel import mesh as pmesh

        mesh = pmesh.get_mesh(8)
        kw = dict(image_size=16, num_channels=32, num_res_blocks=1,
                  channel_mult="1,2", attention_resolutions="16,8",
                  num_heads=2, out_channels=1)
        plain = junet.create_model(**kw)
        ring = junet.create_model(**kw, sequence_parallel_mesh=mesh)
        # engage ring at this toy scale: ds1 -> 256 tokens (divisible by 8)
        ring.ring_min_tokens = 64

        params = plain.init(jax.random.key(0))
        x = jax.random.normal(jax.random.key(1), (1, 1, 16, 16))
        t = jnp.array([3], jnp.int32)

        ref = plain.apply(params, x, t)
        out = jax.jit(ring.apply)(params, x, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-5, atol=3e-5)

    @pytest.mark.slow
    def test_seq_parallel_unet_at_production_token_count(self):
        """Ring attention inside the FULL UNet at a token count where it
        matters: 96x96 latent image with attention at ds1 = 9216 tokens,
        past the default RING_MIN_TOKENS=8192 gate (no test override), vs
        the single-device dense path.  This is the `case4_xl_768`-scale
        regime (768^2 image, attention res 96 -> ds8 -> 9216 tokens) the
        reference cannot reach with its O(N^2) flatten-all-positions
        attention (`src/unet.py:299-305`)."""
        from confild_tpu.models import unet as junet
        from confild_tpu.parallel import mesh as pmesh

        mesh = pmesh.get_mesh(8)
        kw = dict(image_size=96, num_channels=16, num_res_blocks=1,
                  channel_mult="1", attention_resolutions="96",
                  num_heads=1, out_channels=1)
        plain = junet.create_model(**kw)
        ring = junet.create_model(**kw, sequence_parallel_mesh=mesh)
        assert ring.ring_min_tokens == junet.RING_MIN_TOKENS  # no override

        params = plain.init(jax.random.key(0))
        x = jax.random.normal(jax.random.key(1), (1, 1, 96, 96))
        t = jnp.array([5], jnp.int32)

        ref = plain.apply(params, x, t)
        out = jax.jit(ring.apply)(params, x, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-5, atol=5e-5)

    def test_xl_recipe_auto_keeps_dense_below_crossover(self):
        """`recipes/diffusion/case4_xl_768.yml` (additive beyond-reference
        recipe): after the measured re-gate (examples/xl_steady.json:
        flash_vs_dense 0.98 at 9216 tokens — flash is a speed LOSS at the
        recipe's largest block and its (BH,N,N) dense residuals still fit)
        auto mode must keep every 768^2 block on dense XLA attention:
        ds8 -> 9216 < FLASH_MIN_TOKENS."""
        import os
        import yaml

        from confild_tpu.models import unet as junet

        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        path = os.path.join(repo_root, "recipes", "diffusion",
                            "case4_xl_768.yml")
        hp = yaml.safe_load(open(path))
        model = junet.create_model(
            image_size=hp["image_size"], num_channels=hp["num_channels"],
            num_res_blocks=hp["num_res_blocks"],
            channel_mult=hp["channel_mult"],
            attention_resolutions=str(hp["attention_resolutions"]),
            num_heads=hp["num_heads"],
            num_head_channels=hp["num_head_channels"],
            use_flash_attention=hp["use_flash_attention"],  # null -> auto
            use_checkpoint=hp["use_checkpoint"])

        flash_flags = [spec.use_flash
                       for block in (*model.plan.input_blocks,
                                     model.plan.middle_block,
                                     *model.plan.output_blocks)
                       for spec in block
                       if isinstance(spec, junet.AttnSpec)]
        assert flash_flags, "xl recipe lost its attention blocks"
        assert not any(flash_flags), \
            "all 768^2 blocks sit below the measured flash crossover " \
            "(9216 tokens: dense is faster, xl_steady.json) and must " \
            "stay on the dense path"

        # the kernel still auto-engages past the crossover: the same plan
        # at 1536^2 puts ds8 at 36864 tokens (ds16 at 9216 stays dense)
        big = junet.create_model(
            image_size=1536, num_channels=hp["num_channels"],
            num_res_blocks=hp["num_res_blocks"],
            channel_mult=hp["channel_mult"],
            attention_resolutions="192,96,48",
            num_heads=hp["num_heads"],
            num_head_channels=hp["num_head_channels"],
            use_flash_attention=hp["use_flash_attention"],
            use_checkpoint=hp["use_checkpoint"])
        big_flags = [spec.use_flash
                     for block in (*big.plan.input_blocks,
                                   big.plan.middle_block,
                                   *big.plan.output_blocks)
                     for spec in block
                     if isinstance(spec, junet.AttnSpec)]
        assert any(big_flags), \
            "no attention block auto-enabled flash past the crossover"
        assert not all(big_flags), \
            "sub-crossover blocks must stay on the dense path"

    def test_ring_skips_indivisible_token_counts(self):
        """Token counts not divisible by the mesh fall back to the local
        path instead of asserting."""
        from confild_tpu.models import unet as junet
        from confild_tpu.parallel import mesh as pmesh

        mesh = pmesh.get_mesh(8)
        spec = junet.AttnSpec(ch=32, num_heads=2)
        p = junet._init_layer(jax.random.key(0), spec)
        x = jax.random.normal(jax.random.key(1), (1, 6, 6, 32))  # 36 tokens
        ref = junet._apply_attn(p, spec, x)
        out = junet._apply_attn(p, spec, x, seq_mesh=mesh, ring_min_tokens=1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


class TestPerBlockFlashGating:
    def test_auto_mode_gates_per_block(self):
        """In auto mode only blocks at/above FLASH_MIN_TOKENS run the Pallas
        kernel; sub-threshold blocks in the same model stay on XLA."""
        from confild_tpu.models import unet as junet

        # 1536^2 at ds 8/16 -> 36864 / 9216 tokens: only the 36864 block
        # flips (9216 sits below the measured crossover, xl_steady.json)
        m = junet.create_model(image_size=1536, num_channels=32,
                               num_res_blocks=1, channel_mult="1,1,1,1,1",
                               attention_resolutions="192,96", num_heads=2)
        assert m.cfg.use_flash_attention and m.cfg.flash_auto
        flags = {}
        for block in (*m.plan.input_blocks, m.plan.middle_block,
                      *m.plan.output_blocks):
            for spec in block:
                if isinstance(spec, junet.AttnSpec):
                    # ds recoverable from channel count? use token count via
                    # use_flash truthiness grouping instead
                    flags.setdefault(spec.use_flash, 0)
                    flags[spec.use_flash] = flags[spec.use_flash] + 1
        assert True in flags and False in flags, flags

    def test_explicit_flag_applies_to_all_blocks(self):
        from confild_tpu.models import unet as junet

        m = junet.create_model(image_size=32, num_channels=32,
                               num_res_blocks=1, channel_mult="1,2",
                               attention_resolutions="16,8", num_heads=2,
                               use_flash_attention=True)
        specs = [s for block in (*m.plan.input_blocks, m.plan.middle_block,
                                 *m.plan.output_blocks)
                 for s in block if isinstance(s, junet.AttnSpec)]
        assert specs and all(s.use_flash for s in specs)
