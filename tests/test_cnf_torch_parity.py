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
