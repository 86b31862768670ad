"""CNF training-dynamics parity against the torch reference trainer.

Drives the reference ``_single_trainer`` math (``ConditionalNeuralField/
scripts/train.py:396-420``) — the load-bearing two-optimizer cadence
(decoder Adam stepped once at the START of every epoch except 0 on grads
accumulated over the previous epoch; latent Adam stepped per batch on the
FULL table) — side by side with ``CNFTrainer`` on identical tiny data with
identical (ported) inits and identical batch permutations, and asserts the
per-epoch loss trajectory and the post-training decoder/latent states agree
to f32 over several epochs.
"""

import csv
import os
import sys

import jax
import numpy as np
import pytest
import yaml

from confild_tpu import config as cfg
from confild_tpu.train.cnf_trainer import CNFTrainer


def _make_case(tmp_path, t=12, n=48, c=2, epochs=5, batch_size=4):
    rng = np.random.default_rng(7)
    coords = rng.uniform(size=(n, 2)).astype(np.float32)
    phase = rng.uniform(0, 2 * np.pi, size=(t, 1, 1))
    fois = (np.sin(2 * np.pi * coords[None, :, :1] + phase)
            * np.array([1.0, 0.5])).astype(np.float32)
    np.save(tmp_path / "fois.npy", fois)
    np.save(tmp_path / "coords.npy", coords)
    recipe = {
        "data_path": str(tmp_path / "fois.npy"),
        "coor_path": str(tmp_path / "coords.npy"),
        "save_path": str(tmp_path / "run"),
        "lumped_latent": True,
        "normalizer": {"method": "-11", "dim": 0},
        "batch_size": batch_size, "test_batch_size": t, "multiGPU": 1,
        "readin_data_shape": "t N c", "batch_shape": "t N c",
        "hidden_size": 8, "epochs": epochs, "loss_fn": "MSELoss",
        "test_criteria": "rMAE", "save_every": 100, "dims": 2,
        "use_fused_decode": False,   # dynamics parity on the jnp path
        "NF": {"name": "SIRENAutodecoder_film", "num_hidden_layers": 2,
               "out_features": 2, "hidden_features": 16},
        "lr": {"nf": 1.0e-3, "latents": 1.0e-2},
    }
    path = tmp_path / "case.yml"
    path.write_text(yaml.safe_dump(recipe))
    return cfg.basic_input(str(path)), fois


class TestCNFTorchTrainingParity:
    def test_loss_trajectory_and_states_match_reference(self, tmp_path):
        torch = pytest.importorskip("torch")
        sys.path.insert(0, "/root/reference")
        from ConditionalNeuralField.cnf.nf_networks import (
            SIRENAutodecoder_film)

        epochs, batch_size = 5, 4
        hp, _ = _make_case(tmp_path, epochs=epochs, batch_size=batch_size)
        tr = CNFTrainer(hp)
        tr.load(-1)
        tr.state = tr.init_state()
        n = tr.N_samples
        n_batches = n // batch_size

        # --- port the identical init to torch -------------------------------
        from confild_tpu.io.torch_export import cnf_state_dict
        sd = {k: torch.from_numpy(np.array(v))
              for k, v in cnf_state_dict(tr.state.nf_params).items()}
        tmodel = SIRENAutodecoder_film(2, 8, 2, 2, 16)
        tmodel.load_state_dict(sd)
        tlat = torch.nn.Parameter(torch.zeros((n, 8), dtype=torch.float32))

        coords_t = torch.from_numpy(np.asarray(tr.normed_coords))
        fois_t = torch.from_numpy(np.asarray(tr.normed_fois))

        # --- the reference loop verbatim (scripts/train.py:396-420):
        # decoder step at the start of every epoch i != 0, on grads
        # accumulated over the whole previous epoch; latent step per batch --
        opt_nf = torch.optim.Adam(tmodel.parameters(), lr=hp.lr["nf"])
        opt_lat = torch.optim.Adam([tlat], lr=hp.lr["latents"])
        mse = torch.nn.MSELoss()

        # identical batch permutations: CNFTrainer.train draws them from
        # np.random.default_rng(0), one table per epoch
        rng = np.random.default_rng(0)
        perms = [rng.permutation(n)[: n_batches * batch_size]
                 .reshape(n_batches, batch_size) for _ in range(epochs)]

        torch_losses = []
        for i in range(epochs):
            if i != 0:
                opt_nf.step()
                opt_nf.zero_grad()
            ep = []
            for idx in perms[i]:
                lat = tlat[torch.from_numpy(idx)][:, None, :]   # N f->N 1 f
                out = tmodel(coords_t, lat)
                loss = mse(out, fois_t[torch.from_numpy(idx)])
                opt_lat.zero_grad()
                loss.backward()
                opt_lat.step()
                ep.append(float(loss.detach()))
            torch_losses.append(float(np.mean(ep)))

        # --- ours ----------------------------------------------------------
        tr.train(log_formats=())
        ours_losses = []
        with open(os.path.join(hp.save_path, "progress.csv")) as f:
            for row in csv.DictReader(f):
                if row.get("loss"):
                    ours_losses.append(float(row["loss"]))
        assert len(ours_losses) == epochs

        np.testing.assert_allclose(ours_losses, torch_losses,
                                   rtol=5e-5, atol=1e-7)

        # post-training states: latents and decoder params to f32
        np.testing.assert_allclose(
            np.asarray(tr.state.latents), tlat.detach().numpy(),
            rtol=1e-4, atol=1e-6)
        ours_sd = cnf_state_dict(tr.state.nf_params)
        for k, v in tmodel.state_dict().items():
            np.testing.assert_allclose(
                np.asarray(ours_sd[k]), v.numpy(), rtol=1e-4, atol=1e-6,
                err_msg=k)

    def test_epoch0_decoder_frozen(self, tmp_path):
        """The decoder must NOT move during epoch 0 (reference :399-401
        steps it only when i != 0) while latents do."""
        hp, _ = _make_case(tmp_path, epochs=1)
        tr = CNFTrainer(hp)
        tr.state = tr.init_state()
        before = jax.tree.map(np.asarray, tr.state.nf_params)
        tr.train(log_formats=())
        after = jax.tree.map(np.asarray, tr.state.nf_params)
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
            np.testing.assert_array_equal(a, b)
        assert float(np.abs(np.asarray(tr.state.latents)).max()) > 0


class TestReferenceWrittenCheckpointRoundTrip:
    """Port a checkpoint written by the REFERENCE trainer's own save path
    (``ConditionalNeuralField/scripts/train.py:468-479``) — not one written
    by this framework — through ``io/torch_port.py`` and verify golden
    forward agreement.  Covers both the trainer layout (``hidden_states`` =
    LatentContainer state dict) and the published-checkpoint ``is_pub``
    layout (``hidden_states`` = raw latent tensor,
    ``cnf/inference_function.py:183-212``)."""

    def _reference_model(self, torch, n=6, feats=8):
        sys.path.insert(0, "/root/reference")
        # scripts/train.py imports `cnf` as a top-level package
        sys.path.insert(0, "/root/reference/ConditionalNeuralField")
        from ConditionalNeuralField.cnf.nf_networks import (
            SIRENAutodecoder_film)
        from ConditionalNeuralField.scripts.train import LatentContainer

        torch.manual_seed(11)
        tmodel = SIRENAutodecoder_film(2, feats, 2, 2, 16)
        tlat = LatentContainer(N_samples=n, N_features=feats, dims=2,
                               lumped=True)
        with torch.no_grad():
            tlat.latents.normal_(0, 0.5)
        return tmodel, tlat

    def _assert_forward_parity(self, torch, tmodel, tlat, ported):
        import jax.numpy as jnp

        from confild_tpu.models.cnf import siren_film_apply

        n = tlat.latents.shape[0]
        coords = np.random.default_rng(5).uniform(
            size=(40, 2)).astype(np.float32)
        with torch.no_grad():
            idx = torch.arange(n)
            ref = tmodel(torch.from_numpy(coords),
                         tlat(idx)).numpy()          # (N, 40, 2)
        ours = np.asarray(siren_film_apply(
            ported["params"], jnp.asarray(coords),
            jnp.asarray(ported["latents"])[:, None, :]))
        np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-6)

    def test_trainer_save_layout(self, tmp_path):
        torch = pytest.importorskip("torch")
        import types

        from confild_tpu.io import torch_port

        tmodel, tlat = self._reference_model(torch)
        sys.path.insert(0, "/root/reference")
        from ConditionalNeuralField.scripts.train import trainer

        opt_nf = torch.optim.Adam(tmodel.parameters(), lr=1e-4)
        opt_lat = torch.optim.Adam(tlat.parameters(), lr=1e-3)
        # drive the reference trainer's OWN save method, unbound, with a
        # shim carrying only what it reads (self.hyper_para.save_path)
        shim = types.SimpleNamespace(hyper_para=types.SimpleNamespace(
            save_path=str(tmp_path)))
        trainer.save(shim, tmodel, tlat, 7, opt_nf, opt_lat)

        path = str(tmp_path / "checkpoint_7.pt")
        assert os.path.exists(path)
        ported = torch_port.load_cnf_checkpoint(path)
        assert ported["epoch"] == 7
        assert ported["latents"].shape == (6, 8)
        np.testing.assert_array_equal(ported["latents"],
                                      tlat.latents.detach().numpy())
        self._assert_forward_parity(torch, tmodel, tlat, ported)

    def test_is_pub_raw_tensor_layout(self, tmp_path):
        torch = pytest.importorskip("torch")

        from confild_tpu.io import torch_port

        tmodel, tlat = self._reference_model(torch)
        # the published checkpoints store hidden_states as the raw latent
        # tensor (with broadcast singleton dims), not a module state dict
        path = str(tmp_path / "checkpoint_pub.pt")
        torch.save({
            "epoch": 99,
            "model_state_dict": tmodel.state_dict(),
            "hidden_states": tlat.latents.detach()[:, None, :],  # (N, 1, F)
        }, path)
        ported = torch_port.load_cnf_checkpoint(path)
        assert ported["latents"].shape == (6, 8)
        self._assert_forward_parity(torch, tmodel, tlat, ported)

    def test_reference_normalizer_file(self, tmp_path):
        torch = pytest.importorskip("torch")

        from confild_tpu.io import torch_port

        sys.path.insert(0, "/root/reference")
        from ConditionalNeuralField.cnf.utils.normalize import Normalizer_ts

        # the reference trainer writes normalizer_params.pt from
        # Normalizer_ts.get_params() (train.py:205-213)
        xs = torch.linspace(-2, 3, 24).reshape(12, 2)
        nx = Normalizer_ts(method="-11", dim=0)
        nx.fit_normalize(xs)
        ny = Normalizer_ts(method="ms", dim=0)
        ny.fit_normalize(xs * 2 + 1)
        path = str(tmp_path / "normalizer_params.pt")
        torch.save({"x_normalizer_params": nx.get_params(),
                    "y_normalizer_params": ny.get_params()}, path)

        loaded = torch_port.load_normalizer_params(path)
        for got, ref in ((loaded["x"], nx.get_params()),
                         (loaded["y"], ny.get_params())):
            for g, r in zip(got, ref):
                np.testing.assert_allclose(np.asarray(g), r.numpy(),
                                           rtol=1e-6)
