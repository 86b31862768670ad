"""End-to-end DPS parity against the torch reference.

With DDIM eta=0 and a shared set of UNet weights, the whole guided reverse
trajectory is deterministic, so the final sample must agree between the torch
reference (``ConditionalDiffusionGeneration/src/guided_diffusion``) and this
framework up to f32 accumulation differences."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/UnconditionalDiffusionTraining_and_Generation")


@pytest.mark.slow
def test_guided_ddim_trajectory_parity():
    from src.unet import UNetModel as TorchUNet
    from ConditionalDiffusionGeneration.src.guided_diffusion.gaussian_diffusion import (
        create_sampler as ref_create_sampler)
    from ConditionalDiffusionGeneration.src.guided_diffusion.condition_methods import (
        get_conditioning_method as ref_get_cond)
    from ConditionalDiffusionGeneration.src.guided_diffusion.measurements import (
        get_operator as ref_get_operator, get_noise as ref_get_noise)

    from confild_tpu.guidance import (create_sampler, get_conditioning_method,
                                      get_noise, get_operator)
    from confild_tpu.io.torch_port import unet_params_from_state_dict
    from confild_tpu.models import unet as junet

    # --- shared weights ---
    kwargs = dict(image_size=16, in_channels=1, model_channels=32,
                  out_channels=1, num_res_blocks=1, attention_resolutions=(2,),
                  channel_mult=(1, 2), num_heads=2, dims=2)
    tm = TorchUNet(**kwargs)
    tm.eval()
    jm = junet.UNetModel(junet.UNetConfig(**kwargs))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = jax.tree.map(jnp.asarray, unet_params_from_state_dict(sd, jm))

    # --- shared problem ---
    rng = np.random.default_rng(0)
    x_start = rng.normal(size=(1, 1, 16, 16)).astype(np.float32)
    mask_np = np.zeros((1, 1, 16, 16), np.float32)
    mask_np[..., :8, :] = 1.0
    target = np.tanh(rng.normal(size=(1, 1, 16, 16))).astype(np.float32)
    measurement = (mask_np * target).astype(np.float32)
    steps, scale = 10, 0.3

    # --- torch reference run ---
    t_sampler = ref_create_sampler(
        sampler="ddim", steps=steps, noise_schedule="cosine",
        model_mean_type="epsilon", model_var_type="fixed_large",
        dynamic_threshold=False, clip_denoised=True, rescale_timesteps=False,
        timestep_respacing="")
    t_op = ref_get_operator(name="inpainting", device="cpu")
    t_noiser = ref_get_noise(name="gaussian", sigma=0.0)
    t_cond = ref_get_cond("ps", t_op, t_noiser, scale=scale)
    from functools import partial
    cond_fn = partial(t_cond.conditioning, mask=torch.from_numpy(mask_np))

    ref_out = t_sampler.p_sample_loop(
        model=tm, x_start=torch.from_numpy(x_start.copy()),
        measurement=torch.from_numpy(measurement),
        measurement_cond_fn=cond_fn, record=False, save_root=None)
    ref_out = ref_out.detach().numpy()

    # --- our run ---
    sampler = create_sampler(
        sampler="ddim", steps=steps, noise_schedule="cosine",
        model_mean_type="epsilon", model_var_type="fixed_large",
        dynamic_threshold=False, clip_denoised=True, rescale_timesteps=False)
    op = get_operator("inpainting", mask=jnp.asarray(mask_np))
    method = get_conditioning_method("ps", op, get_noise("gaussian", sigma=0.0),
                                     scale=scale)

    @jax.jit
    def run(params, x0):
        def model_fn(x, t, **kw):
            return jm.apply(params, x, t)
        return sampler.p_sample_loop(model_fn, x0, jnp.asarray(measurement),
                                     method, jax.random.key(0))

    out = np.asarray(run(params, jnp.asarray(x_start)))

    assert out.shape == ref_out.shape
    # eta=0 DDIM + deterministic guidance: identical trajectories up to f32
    np.testing.assert_allclose(out, ref_out, rtol=5e-3, atol=5e-3)
