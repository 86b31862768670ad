import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestCNFExportRoundtrip:
    def test_export_then_torch_forward(self, tmp_path):
        """Train-here -> export .pt -> load in the torch reference -> same
        forward (the reverse interop direction)."""
        torch = pytest.importorskip("torch")
        import sys
        sys.path.insert(0, "/root/reference")
        from ConditionalNeuralField.cnf.nf_networks import SIRENAutodecoder_film

        from confild_tpu.models import cnf
        from confild_tpu.io.torch_export import save_cnf_checkpoint_pt

        m = cnf.create_nf("SIRENAutodecoder_film", in_coord_features=2,
                          in_latent_features=8, out_features=2,
                          num_hidden_layers=2, hidden_features=16)
        params = m.init_params(jax.random.key(0))
        latents = np.random.default_rng(0).normal(size=(5, 8)).astype(np.float32)
        path = tmp_path / "checkpoint_3.pt"
        save_cnf_checkpoint_pt(str(path), params, latents, epoch=3)

        ckpt = torch.load(path, weights_only=False)
        tm = SIRENAutodecoder_film(2, 8, 2, 2, 16)
        tm.load_state_dict(ckpt["model_state_dict"])
        tm.eval()
        assert ckpt["epoch"] == 3
        np.testing.assert_allclose(ckpt["hidden_states"]["latents"].numpy(),
                                   latents)

        coords = np.random.default_rng(1).uniform(-1, 1, (20, 2)).astype(np.float32)
        z = latents[:1]
        with torch.no_grad():
            ref = tm(torch.from_numpy(coords), torch.from_numpy(z)).numpy()
        ours = np.asarray(m(params, jnp.asarray(coords), jnp.asarray(z)))
        np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-3)


class TestUNetExportRoundtrip:
    def test_export_then_torch_forward(self, tmp_path):
        torch = pytest.importorskip("torch")
        import sys
        sys.path.insert(0, "/root/reference/UnconditionalDiffusionTraining_and_Generation")
        from src.unet import UNetModel as TorchUNet

        from confild_tpu.models import unet as junet
        from confild_tpu.io.torch_export import save_unet_checkpoint_pt

        m = junet.UNetModel(junet.UNetConfig(
            image_size=32, in_channels=1, model_channels=32, out_channels=1,
            num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
            num_heads=2))
        params = m.init(jax.random.key(0))
        path = tmp_path / "model000001.pt"
        save_unet_checkpoint_pt(str(path), params, m)

        tm = TorchUNet(image_size=32, in_channels=1, model_channels=32,
                       out_channels=1, num_res_blocks=1,
                       attention_resolutions=(2,), channel_mult=(1, 2),
                       num_heads=2)
        sd = torch.load(path, weights_only=False)
        tm.load_state_dict(sd)
        tm.eval()

        x = np.random.default_rng(0).normal(size=(1, 1, 32, 32)).astype(np.float32)
        t = np.array([5], dtype=np.int64)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x), torch.from_numpy(t)).numpy()
        ours = np.asarray(m.apply(params, jnp.asarray(x), jnp.asarray(t)))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
