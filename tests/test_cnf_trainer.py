import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from confild_tpu import config as cfg
from confild_tpu.train.cnf_trainer import CNFTrainer, rMAE


def make_case(tmp_path, lumped=True, epochs=12, **extra):
    """Tiny synthetic elbow-like case: 16 snapshots x 120 points x 2 channels."""
    rng = np.random.default_rng(0)
    t, n, c = 16, 120, 2
    coords = rng.uniform(size=(n, 2)).astype(np.float32)
    phase = rng.uniform(0, 2 * np.pi, size=(t, 1, 1))
    fois = np.sin(2 * np.pi * coords[None, :, :1] + phase) * np.array([1.0, 0.5])
    fois = fois.astype(np.float32)
    np.save(tmp_path / "fois.npy", fois)
    np.save(tmp_path / "coords.npy", coords)

    recipe = {
        "data_path": str(tmp_path / "fois.npy"),
        "coor_path": str(tmp_path / "coords.npy"),
        "save_path": str(tmp_path / "run"),
        "lumped_latent": lumped,
        "normalizer": {"method": "-11", "dim": 0},
        "batch_size": 8,
        "test_batch_size": 8,
        "multiGPU": 1,
        "readin_data_shape": "t N c",
        "batch_shape": "t N c",
        "hidden_size": 16,
        "epochs": epochs,
        "loss_fn": "MSELoss",
        "test_criteria": "rMAE",
        "save_every": 5,
        "dims": 2,
        "NF": {"name": "SIRENAutodecoder_film", "num_hidden_layers": 2,
               "out_features": 2, "hidden_features": 32},
        "lr": {"nf": 1.0e-4, "latents": 1.0e-3},
    }
    recipe.update(extra)
    path = tmp_path / "case.yml"
    path.write_text(yaml.safe_dump(recipe))
    return cfg.basic_input(str(path))


class TestCNFTrainer:
    def test_training_reduces_loss(self, tmp_path):
        hp = make_case(tmp_path, epochs=40)
        hp.lr = {"nf": 1e-3, "latents": 3e-2}
        tr = CNFTrainer(hp)
        tr.load(-1)  # no checkpoint -> scratch
        tr.train(log_formats=())
        # read the CSV log to compare first/last loss
        import csv
        with open(os.path.join(hp.save_path, "progress.csv")) as f:
            rows = list(csv.DictReader(f))
        losses = [float(r["loss"]) for r in rows if r.get("loss")]
        assert losses[-1] < losses[0] * 0.1, losses

    def test_per_batch_nf_cadence_trains(self, tmp_path):
        """``nf_optim_cadence: batch`` (opt-in, beyond-reference) steps the
        decoder with every latent step instead of once per epoch
        (reference scripts/train.py:399-401).  Same epoch budget must (a)
        train to a lower loss than the reference cadence on this
        decoder-bound toy (latents lr is tiny so decoder quality decides
        the fit), (b) actually move the decoder within an epoch, and (c)
        checkpoint-resume cleanly."""
        losses = {}
        for cadence in ("epoch", "batch"):
            (tmp_path / cadence).mkdir()
            hp = make_case(tmp_path / cadence, epochs=30,
                           nf_optim_cadence=cadence)
            hp.lr = {"nf": 1e-3, "latents": 1e-4}
            tr = CNFTrainer(hp)
            tr.train(log_formats=())
            import csv
            with open(os.path.join(hp.save_path, "progress.csv")) as f:
                rows = list(csv.DictReader(f))
            losses[cadence] = [float(r["loss"]) for r in rows
                               if r.get("loss")]
            if cadence == "batch":
                # resume must continue from the checkpoint
                tr2 = CNFTrainer(hp)
                st = tr2.load(-1)
                assert st is not None and int(st.epoch) == int(tr.state.epoch)
                tr2.train(log_formats=())
                assert int(tr2.state.epoch) > int(tr.state.epoch)
        assert losses["batch"][-1] < losses["epoch"][-1], losses

    def test_checkpoint_roundtrip_and_infer(self, tmp_path):
        hp = make_case(tmp_path, epochs=6)
        tr = CNFTrainer(hp)
        tr.train(log_formats=())
        epoch0 = int(tr.state.epoch)

        tr2 = CNFTrainer(hp)
        st = tr2.load(-1)
        assert st is not None and int(st.epoch) == epoch0
        np.testing.assert_allclose(np.asarray(st.latents),
                                   np.asarray(tr.state.latents))

        out = tr2.infer(tr2.train_coord, tr2.state.latents[:4])
        assert out.shape == (4, 120, 2)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_infer_mode_full_load_without_dataset(self, tmp_path):
        """An infer-mode trainer (no dataset read) must be able to FULL-load
        a checkpoint: the latent-table size (and the unused latent-optimizer
        schedule) comes from the checkpoint, not the absent data.  This is
        the DPS conditional-generation entry path
        (examples/demo_conditional.py, cli/sample_conditional.py)."""
        hp = make_case(tmp_path, epochs=4)
        tr = CNFTrainer(hp)
        tr.train(log_formats=())

        tr_inf = CNFTrainer(hp, infer_mode=True)
        st = tr_inf.load(-1)
        assert st is not None
        assert tr_inf.N_samples == tr.state.latents.shape[0]
        np.testing.assert_allclose(np.asarray(st.latents),
                                   np.asarray(tr.state.latents))

    def test_resume_continues_epoch(self, tmp_path):
        hp = make_case(tmp_path, epochs=6)
        tr = CNFTrainer(hp)
        tr.train(log_formats=())
        tr2 = CNFTrainer(hp)
        tr2.load(-1)
        tr2.train(log_formats=())
        assert int(tr2.state.epoch) > int(tr.state.epoch)

    def test_normalizer_persisted(self, tmp_path):
        hp = make_case(tmp_path, epochs=6)
        tr = CNFTrainer(hp)
        assert os.path.exists(os.path.join(hp.save_path,
                                           "normalizer_params.ckpt"))
        # a fresh infer-mode trainer loads them
        tr_inf = CNFTrainer(hp, infer_mode=True)
        a = tr_inf.in_normalizer.get_params()
        b = tr.in_normalizer.get_params()
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]))

    def test_rmae_definition(self):
        pred = jnp.ones((2, 10, 3)) * 2.0
        target = jnp.ones((2, 10, 3))
        err = rMAE(pred, target, dims=(1,))
        np.testing.assert_allclose(np.asarray(err), 1.0)

    def test_non_lumped_grid_case(self, tmp_path):
        """Grid-shaped case2-style data: (t, h, w, c) with per-cell coords."""
        rng = np.random.default_rng(1)
        t, h, w, c = 8, 8, 12, 2
        fois = rng.normal(size=(t, h, w, c)).astype(np.float32)
        np.save(tmp_path / "fois.npy", fois)
        recipe = {
            "data_path": str(tmp_path / "fois.npy"),
            "save_path": str(tmp_path / "run"),
            "lumped_latent": False,
            "normalizer": {"method": "-11", "dim": 0},
            "batch_size": 4, "test_batch_size": 4, "multiGPU": 1,
            "readin_data_shape": "t h w c", "batch_shape": "t h w c",
            "hidden_size": 8, "epochs": 4, "loss_fn": "MSELoss",
            "test_criteria": "rMAE", "save_every": 2, "dims": 2,
            "NF": {"name": "SIRENAutodecoder_film", "num_hidden_layers": 1,
                   "out_features": 2, "hidden_features": 16},
            "lr": {"nf": 1.0e-4, "latents": 1.0e-3},
        }
        p = tmp_path / "case.yml"
        p.write_text(yaml.safe_dump(recipe))
        tr = CNFTrainer(cfg.basic_input(str(p)))
        tr.train(log_formats=())
        out = tr.infer(tr.train_coord, tr.state.latents[:2])
        assert out.shape == (2, h, w, c)


class TestLrDecayTail:
    def test_latent_lr_tail_quiets_late_updates(self, tmp_path):
        """``lr.latents_end`` cosine-decays the per-batch latent Adam (the
        fixed-lr latent jitter is the CNF noise floor; the reference ships
        ``CyclicCosineDecayLR`` for the same purpose,
        ``cnf/utils/train.py:556-676``): with a ~zero tail, late-epoch
        latent movement must be far below the undecayed trainer's."""
        def late_move(extra):
            hp = make_case(tmp_path, epochs=30, **extra)
            tr = CNFTrainer(hp)
            tr.load(-1)
            tr.train(log_formats=())
            before = np.asarray(tr.state.latents).copy()
            hp.epochs = 5
            tr.train(log_formats=())  # resumes: 5 more epochs at the tail
            return float(np.abs(np.asarray(tr.state.latents) - before).max())

        moved_flat = late_move({"save_path": str(tmp_path / "run_flat")})
        moved_tail = late_move({
            "save_path": str(tmp_path / "run_tail"),
            "lr": {"nf": 1.0e-4, "latents": 1.0e-3,
                   "latents_end": 1.0e-8, "decay_epochs": 30}})
        assert moved_tail < 0.2 * moved_flat, (moved_tail, moved_flat)


class TestExtraSirenIn:
    def test_parametric_cnf_trains(self, tmp_path):
        """extra_siren_in: (t, n_extra, N, c) data with a scalar parameter
        channel (reference scripts/train.py:117-136)."""
        import yaml
        rng = np.random.default_rng(0)
        t, n_extra, n_pts, c = 6, 4, 50, 1
        coords = rng.uniform(size=(n_pts, 2)).astype(np.float32)
        levels = np.linspace(0, 1, n_extra, dtype=np.float32)
        fois = np.sin(2 * np.pi * coords[None, None, :, :1]
                      + levels[None, :, None, None]).astype(np.float32)
        fois = np.broadcast_to(fois, (t, n_extra, n_pts, c)).copy()
        np.save(tmp_path / "fois.npy", fois)
        np.save(tmp_path / "coords.npy", coords)
        recipe = {
            "data_path": str(tmp_path / "fois.npy"),
            "coor_path": str(tmp_path / "coords.npy"),
            "save_path": str(tmp_path / "run"),
            "lumped_latent": True,
            "extra_siren_in": n_extra,
            "normalizer": {"method": "-11", "dim": 0},
            "batch_size": 8, "test_batch_size": 8, "multiGPU": 1,
            "readin_data_shape": "t e N c", "batch_shape": "t e N c",
            "hidden_size": 8, "epochs": 6, "loss_fn": "MSELoss",
            "test_criteria": "rMAE", "save_every": 3, "dims": 2,
            "NF": {"name": "SIRENAutodecoder_film_extra_in",
                   "num_hidden_layers": 1, "out_features": 1,
                   "hidden_features": 16},
            "lr": {"nf": 1e-3, "latents": 1e-2},
        }
        (tmp_path / "case.yml").write_text(yaml.safe_dump(recipe))
        tr = CNFTrainer(cfg.basic_input(str(tmp_path / "case.yml")))
        assert tr.N_samples == t * n_extra
        state = tr.train(log_formats=())
        assert np.all(np.isfinite(np.asarray(state.latents)))
        # normalizer file carries the extra params
        from confild_tpu.io.checkpoint import load_pytree
        p = load_pytree(str(tmp_path / "run" / "normalizer_params.ckpt"))
        assert "extra_normalizer_params" in p


class TestParityFixes:
    def test_siren_only_loads_decoder_only(self, tmp_path):
        """siren_only=True restores decoder + decoder-optimizer but leaves
        latents and their optimizer fresh (reference scripts/train.py:509-527)."""
        hp = make_case(tmp_path, epochs=6)
        tr = CNFTrainer(hp)
        tr.train(log_formats=())
        assert not np.allclose(np.asarray(tr.state.latents), 0.0)

        tr2 = CNFTrainer(hp)
        st = tr2.load(-1, siren_only=True)
        # decoder restored
        for a, b in zip(jax.tree.leaves(st.nf_params),
                        jax.tree.leaves(tr.state.nf_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # latents fresh (zeros), latent optimizer fresh (zero Adam moments)
        np.testing.assert_allclose(np.asarray(st.latents), 0.0)
        mu = jax.tree.leaves(st.opt_lat_state)
        assert all(np.allclose(np.asarray(x), 0.0) for x in mu
                   if hasattr(x, "shape") and np.ndim(x) > 0)
        # epoch still reported (reference sets start_epoch in both modes)
        assert int(st.epoch) == int(tr.state.epoch)

    def test_infer_broadcasts_3d_grid_coords(self, tmp_path):
        """infer() must expand one singleton per coord grid axis; the
        reference hardcodes two for any ndim>2 and breaks on 3-D grids."""
        rng = np.random.default_rng(2)
        t, h, w, d, c = 4, 4, 5, 6, 2
        fois = rng.normal(size=(t, h, w, d, c)).astype(np.float32)
        np.save(tmp_path / "fois.npy", fois)
        recipe = {
            "data_path": str(tmp_path / "fois.npy"),
            "save_path": str(tmp_path / "run3d"),
            "lumped_latent": False,
            "normalizer": {"method": "-11", "dim": 0},
            "batch_size": 2, "test_batch_size": 2, "multiGPU": 1,
            "readin_data_shape": "t h w d c", "batch_shape": "t h w d c",
            "hidden_size": 8, "epochs": 2, "loss_fn": "MSELoss",
            "test_criteria": "rMAE", "save_every": 2, "dims": 3,
            "NF": {"name": "SIRENAutodecoder_film", "num_hidden_layers": 1,
                   "out_features": 2, "hidden_features": 16},
            "lr": {"nf": 1.0e-4, "latents": 1.0e-3},
        }
        p = tmp_path / "case3d.yml"
        p.write_text(yaml.safe_dump(recipe))
        tr = CNFTrainer(cfg.basic_input(str(p)))
        tr.train(log_formats=())
        # grid-shaped (h, w, d, 3) coords
        out = tr.infer(tr.train_coord, tr.state.latents[:2])
        assert out.shape == (2, h, w, d, c)
        # must agree with decoding the same coords flattened
        flat = tr.infer(tr.train_coord.reshape(-1, 3), tr.state.latents[:2])
        np.testing.assert_allclose(np.asarray(out).reshape(2, -1, c),
                                   np.asarray(flat), rtol=1e-5, atol=1e-6)


class TestFusedTrainingPath:
    def test_fused_matches_jnp_training(self, tmp_path):
        """Training through the fused Pallas decode must reproduce the jnp
        path (same init, same permutations) up to f32 kernel-math noise."""
        (tmp_path / "a").mkdir()
        (tmp_path / "b").mkdir()
        hp1 = make_case(tmp_path / "a", epochs=4)
        hp2 = make_case(tmp_path / "b", epochs=4, use_fused_decode=False)

        tr1 = CNFTrainer(hp1)
        assert tr1.use_fused_decode
        tr2 = CNFTrainer(hp2)
        assert not tr2.use_fused_decode
        tr1.train(log_formats=())
        tr2.train(log_formats=())

        np.testing.assert_allclose(np.asarray(tr1.state.latents),
                                   np.asarray(tr2.state.latents),
                                   rtol=5e-3, atol=1e-5)
        for a, b in zip(jax.tree.leaves(tr1.state.nf_params),
                        jax.tree.leaves(tr2.state.nf_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=1e-5)


class TestLoadSizingAndNoopTrain:
    def test_siren_only_sizes_latents_from_current_dataset(self, tmp_path):
        """Decoder-only reuse on a different-sized dataset must give a fresh
        latent table sized by the CURRENT dataset, not the checkpoint's."""
        a = tmp_path / "a"
        a.mkdir()
        hp_a = make_case(a, epochs=4)
        tr_a = CNFTrainer(hp_a)
        tr_a.train(log_formats=())
        assert tr_a.N_samples == 16

        # smaller dataset B (10 snapshots), pointing at A's checkpoints
        b = tmp_path / "b"
        b.mkdir()
        hp_b = make_case(b, epochs=2)
        np.save(b / "fois.npy", np.load(a / "fois.npy")[:10])
        hp_b.save_path = hp_a.save_path
        tr_b = CNFTrainer(hp_b)
        st = tr_b.load(-1, siren_only=True)
        assert tr_b.N_samples == 10
        assert st.latents.shape == (10, hp_b.hidden_size)
        # decoder restored from A's checkpoint
        for x, y in zip(jax.tree.leaves(st.nf_params),
                        jax.tree.leaves(tr_a.state.nf_params)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y))

    def test_zero_epoch_train_keeps_epoch(self, tmp_path):
        """train() with epochs=0 is a no-op and must not rewind
        state.epoch (checkpoint sequence would go backwards)."""
        hp = make_case(tmp_path, epochs=4)
        tr = CNFTrainer(hp)
        tr.train(log_formats=())
        e = int(tr.state.epoch)
        hp.epochs = 0
        st = tr.train(log_formats=())
        assert int(st.epoch) == e

    @pytest.mark.slow
    def test_orbax_checkpoint_restore_keeps_optimizer_structure(self, tmp_path):
        """Multi-process saves go through Orbax (a directory); restore must
        rebuild optax NamedTuple states from the structure template or the
        first update after resume crashes."""
        from confild_tpu.io import checkpoint as ckpt_io

        hp = make_case(tmp_path, epochs=4)
        tr = CNFTrainer(hp)
        tr.train(log_formats=())
        s = tr.state
        path = os.path.join(hp.save_path, "checkpoint_900.ckpt")
        ckpt_io.save_sharded(path, {
            "epoch": 900,
            "model_state_dict": s.nf_params,
            "hidden_states": {"latents": s.latents},
            "optim_net_dec_dict": s.opt_nf_state,
            "optim_states_dict": s.opt_lat_state,
        })
        assert os.path.isdir(path)

        tr2 = CNFTrainer(hp)
        st = tr2.load(-1)
        assert int(st.epoch) == 900
        assert jax.tree.structure(st.opt_lat_state) == \
            jax.tree.structure(s.opt_lat_state)
        # restored state must be directly usable: one more epoch
        hp.epochs = 1
        tr2.train(log_formats=())

    def test_eval_counts_every_sample_with_ragged_tail(self, tmp_path):
        """test_batch_size not dividing N_samples must NOT drop the tail
        from the reported rMAE (the reference evaluates the full set,
        scripts/train.py:429-459): eval == direct full-set computation."""
        hp = make_case(tmp_path, epochs=2)
        hp.test_batch_size = 8          # N=16 -> override data to N=13 below
        # rebuild the dataset with 13 snapshots (13 % 8 = 5 tail)
        rng = np.random.default_rng(3)
        t, n, c = 13, 120, 2
        coords = rng.uniform(size=(n, 2)).astype(np.float32)
        phase = rng.uniform(0, 2 * np.pi, size=(t, 1, 1))
        fois = (np.sin(2 * np.pi * coords[None, :, :1] + phase)
                * np.array([1.0, 0.5])).astype(np.float32)
        np.save(tmp_path / "fois.npy", fois)
        np.save(tmp_path / "coords.npy", coords)

        tr = CNFTrainer(hp)
        tr.train(log_formats=())
        _, eval_rmae, _ = tr._build_train_fns(False)
        got = np.asarray(eval_rmae(tr.state))

        pred = np.asarray(tr.infer(tr.train_coord, tr.state.latents))
        want = np.asarray(rMAE(jnp.asarray(pred), jnp.asarray(fois),
                               dims=(1,))).mean(axis=0)
        np.testing.assert_allclose(got, want, rtol=2e-5)

    def test_latent_regularization_knobs(self, tmp_path):
        """latent_noise_std / latent_l2 (beyond-reference, opt-in) must (a)
        default off — bit-identical training to the parity path, (b) train
        stably when on, and (c) with L2 on, shrink the latent-code norm
        relative to the unregularized run."""
        runs = {}
        for name, extra in (
            ("plain", {}),
            ("plain2", {"latent_noise_std": 0.0, "latent_l2": 0.0}),
            ("reg", {"latent_noise_std": 0.05, "latent_l2": 1e-2}),
            ("l2only", {"latent_l2": 0.5}),
        ):
            (tmp_path / name).mkdir()
            hp = make_case(tmp_path / name, epochs=20, **extra)
            hp.lr = {"nf": 1e-3, "latents": 3e-2}
            tr = CNFTrainer(hp)
            tr.train(log_formats=())
            runs[name] = tr
        # (a) explicit zeros == knobs absent, bit-for-bit
        np.testing.assert_array_equal(
            np.asarray(runs["plain"].state.latents),
            np.asarray(runs["plain2"].state.latents))
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(runs["plain"].state.nf_params)[0]),
            np.asarray(jax.tree.leaves(runs["plain2"].state.nf_params)[0]))
        # (b) regularized run is finite and still fits the data reasonably
        _, eval_rmae, _ = runs["reg"]._build_train_fns(False)
        got = np.asarray(eval_rmae(runs["reg"].state))
        assert np.all(np.isfinite(got)) and np.all(got < 1.0), got
        # (c) L2 pulls codes toward the origin (checked on an L2-only run
        # so latent noise does not confound the norm comparison)
        n_reg = float(np.mean(np.square(
            np.asarray(runs["l2only"].state.latents))))
        n_pl = float(np.mean(np.square(np.asarray(runs["plain"].state.latents))))
        assert n_reg < n_pl, (n_reg, n_pl)


def test_latent_init_table(tmp_path):
    """latent_init (beyond-reference, opt-in) seeds the fresh latent table
    from an .npy file (e.g. POD coefficients via tools/pca_ceiling.py
    --dump-latents); shape mismatches are rejected."""
    init = np.linspace(-0.3, 0.3, 16 * 16).reshape(16, 16).astype(np.float32)
    np.save(tmp_path / "zinit.npy", init)
    hp = make_case(tmp_path, epochs=1,
                   latent_init=str(tmp_path / "zinit.npy"))
    tr = CNFTrainer(hp)
    st = tr.init_state()
    np.testing.assert_array_equal(np.asarray(st.latents), init)

    bad = np.zeros((4, 16), np.float32)
    np.save(tmp_path / "bad.npy", bad)
    hp2 = make_case(tmp_path, epochs=1,
                    latent_init=str(tmp_path / "bad.npy"))
    with pytest.raises(ValueError, match="latent_init"):
        CNFTrainer(hp2).init_state()
