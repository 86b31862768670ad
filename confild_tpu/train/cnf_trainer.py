"""Auto-decoding CNF trainer (reference ``ConditionalNeuralField/scripts/
train.py`` trainer + ``_single_trainer`` hot loop, re-designed TPU-first).

Training dynamics reproduced exactly (they are load-bearing, see SURVEY §3.1):

* two optimizers — the latent table steps Adam **per batch**, the decoder
  accumulates gradients across the epoch and steps Adam **once per epoch**
  (reference ``scripts/train.py:399-416``);
* latents are a dense trainable ``(N_samples, F)`` table (zero-init,
  ``LatentContainer``, :43-63) with dense Adam updates (DDP makes the torch
  grads dense too, so momentum decays un-sampled rows identically);
* MSE on normalized fields, rMAE eval on denormalized fields every
  ``save_every`` epochs (:429-459).

TPU-native execution: the whole epoch is ONE jitted ``lax.scan`` over
pre-shuffled batch indices (no per-batch Python dispatch), the batch axis is
sharded over the data mesh (replacing DDP), gradients arrive via XLA ``psum``.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from einops import rearrange

from confild_tpu import config as cfgmod
from confild_tpu.core import normalize as cnorm
from confild_tpu.io import checkpoint as ckpt_io
from confild_tpu.models import cnf as cnf_models
from confild_tpu.parallel import mesh as pmesh
from confild_tpu.utils import logger as tlog
from confild_tpu.utils import readdata


def rMAE(prediction, target, dims):
    """Relative MAE per (sample, channel) (reference ``scripts/train.py:66``)."""
    dims = tuple(dims)
    return (jnp.abs(prediction - target).mean(axis=dims)
            / jnp.abs(target).mean(axis=dims))


TEST_CRITERIA = {"rMAE": rMAE}
LOSS_FNS = {"MSELoss": lambda pred, target: jnp.mean((pred - target) ** 2)}


@partial(jax.tree_util.register_dataclass,
         data_fields=["nf_params", "latents", "opt_nf_state", "opt_lat_state",
                      "nf_grad_accum", "epoch"],
         meta_fields=[])
@dataclasses.dataclass
class CNFTrainState:
    nf_params: Any
    latents: jnp.ndarray            # (N_samples, F)
    opt_nf_state: Any
    opt_lat_state: Any
    nf_grad_accum: Any              # decoder grads accumulated over the epoch
    epoch: int


class CNFTrainer:
    """Recipe-driven auto-decoding trainer.

    Mirrors the reference trainer API: ``train()``, ``load(ckpt_id,
    siren_only)``, ``infer(coords, latents)``, plus functional accessors for
    the diffusion stage.
    """

    def __init__(self, hp: cfgmod.Config, infer_mode: bool = False,
                 infer_dps: bool = False, mesh=None):
        self.hp = hp
        self.infer_mode = infer_mode
        self.mesh = mesh
        self.save_path = hp.save_path

        # extra scalar SIREN input (parametric CNF, reference :117-136)
        self.extra_siren_in = None
        if "extra_siren_in" in hp and hp.extra_siren_in is not None:
            spec = hp.extra_siren_in
            if isinstance(spec, int):
                self.extra_siren_in = np.linspace(0, 1, spec, dtype=np.float32)
            elif len(spec) == 3:
                self.extra_siren_in = np.linspace(*spec, dtype=np.float32)
            else:
                self.extra_siren_in = np.asarray(spec, np.float32)

        if not infer_mode:
            fois = self._load_fois(hp)
            fois = rearrange(
                fois, f"{hp.readin_data_shape} -> {hp.batch_shape}")
            nf_spec = hp.NF
            out_features = (nf_spec.get("kwargs", {}).get("out_features")
                            or nf_spec["out_features"])
            assert out_features == fois.shape[-1], \
                "NF out_features inconsistent with data shape"

            if self.extra_siren_in is not None:
                # data layout (t, n_extra, *spatial, c): flatten the first
                # two axes into the sample axis (reference basic_set :34-38)
                self.n_extra = fois.shape[1]
                assert self.n_extra == len(self.extra_siren_in)
                self.spatio_shape = fois.shape[2:-1]
                self.spatio_axis = list(range(1, fois.ndim - 2))
                fois = fois.reshape(fois.shape[0] * self.n_extra,
                                    *fois.shape[2:])
            else:
                self.spatio_shape = fois.shape[1:-1]
                self.spatio_axis = list(range(1, fois.ndim - 1))
            coords = self._load_coords(hp)
            self.train_coord = np.asarray(coords, np.float32)
            self.N_samples = fois.shape[0]
            fois = np.asarray(fois, np.float32)

        # normalizers (fit-or-load, reference :169-217)
        self.in_normalizer = cnorm.Normalizer(**hp.normalizer)
        self.out_normalizer = cnorm.Normalizer(**hp.normalizer)
        norm_file = os.path.join(hp.save_path, "normalizer_params.ckpt")
        norm_file_pt = os.path.join(hp.save_path, "normalizer_params.pt")
        self.extra_in_normalizer = (cnorm.Normalizer(**hp.normalizer)
                                    if self.extra_siren_in is not None
                                    else None)
        if os.path.exists(norm_file):
            params = ckpt_io.load_pytree(norm_file)
            self.in_normalizer.params = tuple(params["x_normalizer_params"])
            self.out_normalizer.params = tuple(params["y_normalizer_params"])
            if self.extra_in_normalizer is not None:
                self.extra_in_normalizer.params = tuple(
                    params["extra_normalizer_params"])
        elif os.path.exists(norm_file_pt):
            from confild_tpu.io.torch_port import load_normalizer_params
            p = load_normalizer_params(norm_file_pt)
            self.in_normalizer.params = p["x"]
            self.out_normalizer.params = p["y"]
            if self.extra_in_normalizer is not None and "extra" in p:
                self.extra_in_normalizer.params = p["extra"]
        elif not infer_mode:
            lumped = hp.lumped_latent
            dims = hp.dims
            coord_fit = (coords if lumped
                         else coords.reshape(-1, coords.shape[-1]))
            fois_fit = (fois if lumped
                        else fois.reshape(-1, *fois.shape[dims + 1:]))
            self.in_normalizer.fit_normalize(coord_fit)
            self.out_normalizer.fit_normalize(fois_fit)
            to_save = {
                "x_normalizer_params": self.in_normalizer.get_params(),
                "y_normalizer_params": self.out_normalizer.get_params(),
            }
            if self.extra_in_normalizer is not None:
                self.extra_in_normalizer.fit_normalize(
                    self.extra_siren_in.reshape(-1))
                to_save["extra_normalizer_params"] = \
                    self.extra_in_normalizer.get_params()
            os.makedirs(hp.save_path, exist_ok=True)
            ckpt_io.save_pytree(norm_file, to_save)
        else:
            raise FileNotFoundError(f"no normalizer params in {hp.save_path}")

        # NF model (extra scalar input adds one coordinate channel,
        # reference :229-240)
        if self.extra_siren_in is not None:
            nf_spec = hp.NF
            self.model = cnf_models.create_nf(
                nf_spec["name"],
                in_coord_features=hp.dims + 1,
                in_latent_features=hp.hidden_size,
                out_features=nf_spec["out_features"],
                num_hidden_layers=nf_spec["num_hidden_layers"],
                hidden_features=nf_spec["hidden_features"])
        else:
            self.model = cnf_models.siren_film_from_recipe(hp)

        if not infer_mode:
            self.normed_coords = np.asarray(
                self.in_normalizer.normalize(self.train_coord), np.float32)
            self.normed_fois = np.asarray(
                self.out_normalizer.normalize(fois), np.float32)
            if self.extra_in_normalizer is not None:
                self.normed_extra = np.asarray(
                    self.extra_in_normalizer.normalize(self.extra_siren_in),
                    np.float32)
            self.test_criteria = partial(
                TEST_CRITERIA[hp.test_criteria], dims=self.spatio_axis)

        self.state: CNFTrainState | None = None
        self._latent_expand = None  # set lazily from dims/lumped

        # fused Pallas decode in the training hot loop (VERDICT r1 #4): the
        # kernel handles the plain FiLM decoder over flat or grid coords;
        # the extra-scalar-input variant falls back to the jnp path
        nf_name = (hp.NF["name"] if isinstance(hp.NF, dict)
                   else hp.NF.get("name"))
        self.use_fused_decode = (
            bool(hp.get("use_fused_decode", True))
            and nf_name == "SIRENAutodecoder_film"
            and self.extra_siren_in is None)

    # -- data ---------------------------------------------------------------

    @staticmethod
    def _load_fois(hp):
        if "load_data_fn" in hp:
            spec = hp.load_data_fn
            if isinstance(spec, str):
                return readdata.get_loader(spec)(hp.data_path)
            return readdata.get_loader(spec["name"])(
                hp.data_path, **spec.get("kwargs", {}))
        return np.load(hp.data_path)

    def _load_coords(self, hp):
        if "coor_path" in hp and hp.coor_path:
            coord = np.load(hp.coor_path)
            assert coord.shape[:-1] == self.spatio_shape
            assert coord.shape[-1] == hp.dims
            return coord
        axes = [np.linspace(0, 1, s, dtype=np.float32)
                for s in self.spatio_shape]
        return np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)

    # -- latent broadcasting (LatentContainer.expand_dims semantics) ---------

    def expand_latents(self, rows: jnp.ndarray) -> jnp.ndarray:
        """(B, F) -> (B, 1...1, F) with ``dims`` ones (or a single 1 when
        lumped) so they broadcast against coords (reference :43-63)."""
        n_ones = 1 if self.hp.lumped_latent else self.hp.dims
        return rows.reshape(rows.shape[0], *(1,) * n_ones, rows.shape[-1])

    # -- state --------------------------------------------------------------

    def _optimizers(self):
        """Adam pair; optional cosine-decay tails (``lr.nf_end`` /
        ``lr.latents_end`` + ``lr.decay_epochs``) — the per-batch latent Adam
        at a fixed lr never settles, leaving a latent-jitter noise floor in
        the decoder fit (the reference ships ``CyclicCosineDecayLR`` for the
        same reason, ``cnf/utils/train.py:556-676``).  Decay counts optimizer
        steps: per-epoch for the decoder, per-batch for latents."""
        lr = self.hp.lr
        n_batches = max(self.N_samples // self.hp.batch_size, 1)

        def _sched(init, end, steps):
            if end is None:
                return init
            return optax.cosine_decay_schedule(init, max(steps, 1),
                                               alpha=end / init)

        decay_epochs = lr.get("decay_epochs", self.hp.epochs) \
            if isinstance(lr, dict) else self.hp.epochs
        # nf schedule counts optimizer steps: one per epoch under the
        # reference cadence, one per batch under ``nf_optim_cadence: batch``
        nf_steps = decay_epochs * (n_batches if self._per_batch_nf else 1)
        opt_nf = optax.adam(_sched(lr["nf"], lr.get("nf_end"), nf_steps))
        opt_lat = optax.adam(_sched(lr["latents"], lr.get("latents_end"),
                                    decay_epochs * n_batches))
        return opt_nf, opt_lat

    @property
    def _per_batch_nf(self) -> bool:
        """Opt-in decoder cadence ``nf_optim_cadence: batch``.

        The reference steps the decoder ONCE PER EPOCH with gradients
        accumulated over every batch (scripts/train.py:399-401 &
        414-417) — effectively full-batch Adam, very stable but slow: a
        16k-epoch fit performs only 16k decoder updates.  ``batch`` steps
        the decoder with every latent step (standard auto-decoder
        practice), giving n_batches-times more decoder updates per epoch;
        measured on the forced-turbulence demo it reaches the same train
        rMAE in a fraction of the epochs.  Default remains reference
        parity."""
        return str(self.hp.get("nf_optim_cadence", "epoch")) == "batch"

    def _fresh_latents(self) -> jnp.ndarray:
        """Fresh latent table: zeros (reference scripts/train.py parity), or
        a precomputed per-sample initialization loaded from ``latent_init``
        (beyond-reference, opt-in) — e.g. scaled POD coefficients, which
        organize the latent space globally from step 0 (the f3 postmortem's
        PCA-ceiling probe measured a LINEAR 256-dim code generalizing 2x
        better held-out than the zero-init auto-decoded space)."""
        path = self.hp.get("latent_init")
        if not path:
            return jnp.zeros((self.N_samples, self.hp.hidden_size),
                             jnp.float32)
        init = np.load(path)
        if init.shape != (self.N_samples, self.hp.hidden_size):
            raise ValueError(
                f"latent_init {path}: shape {init.shape} != "
                f"({self.N_samples}, {self.hp.hidden_size})")
        return jnp.asarray(init, jnp.float32)

    def init_state(self, key=None) -> CNFTrainState:
        key = key if key is not None else jax.random.key(0)
        nf_params = self.model.init_params(key)
        latents = self._fresh_latents()
        opt_nf, opt_lat = self._optimizers()
        return CNFTrainState(
            nf_params=nf_params,
            latents=latents,
            opt_nf_state=opt_nf.init(nf_params),
            opt_lat_state=opt_lat.init(latents),
            nf_grad_accum=jax.tree.map(jnp.zeros_like, nf_params),
            epoch=0,
        )

    # -- train --------------------------------------------------------------

    def _build_train_fns(self, fix_nf: bool):
        """Build (and jit) run_chunk / eval_rmae / shard_perm ONCE per
        trainer: jit caches key on function identity, so rebuilding these
        closures every train() call would recompile everything."""
        hp = self.hp
        loss_fn = LOSS_FNS[hp.loss_fn]
        opt_nf, opt_lat = self._optimizers()
        coords = jnp.asarray(self.normed_coords)
        fois = jnp.asarray(self.normed_fois)
        batch_size = hp.batch_size
        n = self.N_samples
        n_batches = max(n // batch_size, 1)

        if self.mesh is not None:
            fois = pmesh.replicate(fois, self.mesh)
            coords = pmesh.replicate(coords, self.mesh)

        def shard_perm(perm):
            """Shard the batch axis of the epoch's index table over the data
            mesh: the per-sample gathers and the SIREN forward/backward then
            shard along batch, and jit inserts the psum for the shared-decoder
            grads (replaces DDP over decoder+latents, reference :355-358)."""
            if self.mesh is None:
                return perm
            from jax.sharding import NamedSharding, PartitionSpec as P
            axes = pmesh.batch_axes(self.mesh)
            spec = (None,) * (perm.ndim - 1) + (
                axes if len(axes) > 1 else axes[0],)
            return jax.device_put(perm, NamedSharding(self.mesh, P(*spec)))

        extra = (jnp.asarray(self.normed_extra)
                 if self.extra_siren_in is not None else None)

        # Operands ride as jit ARGUMENTS, never closure constants: a
        # closed-over concrete array is inlined into the serialized HLO, and
        # at production scale (e.g. 268 MB of targets for 128 trajectories)
        # that blows the compile payload and bloats every recompile.  The
        # wrappers returned below bind `data` so callers keep the old
        # run_chunk(state, perms, epoch_ids) / eval_rmae(state) signatures.
        data = {"coords": coords, "fois": fois}
        if extra is not None:
            data["extra"] = extra

        # fused-decode operands: flat (M, dims) coords and (n, M, c) targets
        # (loss over flattened spatial points equals loss over the grid)
        if self.use_fused_decode:
            data["flat_coords"] = coords.reshape(-1, coords.shape[-1])
            data["flat_fois"] = fois.reshape(fois.shape[0], -1,
                                             fois.shape[-1])
            w0 = float(self.model.config.w0)

            def fused_decode(nf_params, lat_rows, flat_coords):
                from confild_tpu.ops.siren_decode import (
                    fused_siren_decode_train)
                return fused_siren_decode_train(nf_params, flat_coords,
                                                lat_rows, w0)

            if self.mesh is not None:
                # GSPMD cannot partition a pallas_call: run it under
                # shard_map with the latent-row (batch) axis sharded, params
                # replicated — the broadcast transposes to a psum of the
                # per-device decoder grads (DDP semantics, reference :357)
                from jax.sharding import PartitionSpec as P
                bspec = pmesh.batch_spec(self.mesh)
                fused_decode = jax.shard_map(
                    fused_decode, mesh=self.mesh,
                    in_specs=(P(), bspec, P()),
                    out_specs=bspec,
                    check_vma=False)  # pallas_call declares no vma info

        # latent-noise regularization (beyond-reference, opt-in): decode at
        # z + sigma*eps during training so the decoder is accurate in a
        # NEIGHBORHOOD of each training latent, not only at the point — the
        # auto-decoded latent space otherwise memorizes (measured on the f3
        # demo: train rMAE 0.071 but held-out oracle-fit rMAE 0.43, and DPS
        # guidance gradients through the decoder steer only the sensor
        # points).  sigma is in raw-latent units; 0 = reference parity
        # (scripts/train.py has no such term).
        noise_std = float(hp.get("latent_noise_std", 0.0) or 0.0)
        # latent-code L2 (beyond-reference, opt-in): DeepSDF-style prior
        # pulling codes toward a dense ball around the origin so the space
        # between training codes stays decodable; 0 = reference parity.
        latent_l2 = float(hp.get("latent_l2", 0.0) or 0.0)

        def batch_loss(nf_params, latents, idx, data, nkey=None):
            rows_clean = latents[idx]
            rows0 = rows_clean
            if noise_std and nkey is not None:
                rows0 = rows0 + noise_std * jax.random.normal(
                    nkey, rows0.shape, rows0.dtype)

            def _reg(loss):
                if latent_l2:
                    loss = loss + latent_l2 * jnp.mean(
                        jnp.square(rows_clean))
                return loss

            if extra is not None:
                rows = self.expand_latents(rows0)
                # idx -> (trajectory, extra) pair (reference basic_set :34-38)
                ex = data["extra"][idx % self.n_extra].reshape(
                    (idx.shape[0],) + (1,) * (len(self.spatio_shape) + 1))
                out = self.model(nf_params, (data["coords"], ex), rows)
                return _reg(loss_fn(out, data["fois"][idx]))
            if self.use_fused_decode:
                out = fused_decode(nf_params, rows0, data["flat_coords"])
                return _reg(loss_fn(out, data["flat_fois"][idx]))
            rows = self.expand_latents(rows0)
            out = self.model(nf_params, data["coords"], rows)
            return _reg(loss_fn(out, data["fois"][idx]))

        per_batch_nf = (not fix_nf) and self._per_batch_nf

        def _run_epoch(state: CNFTrainState, perm, epoch_id, data):
            """One epoch = scan over batches.  Under the reference cadence
            the decoder step happens OUTSIDE (once per epoch, reference
            :399-401); under ``nf_optim_cadence: batch`` the decoder steps
            with every batch inside the scan."""
            # per-epoch noise key (deterministic: resume-safe); the batch
            # key folds in the scan position
            ekey = (jax.random.fold_in(jax.random.key(0xC0F1), epoch_id)
                    if noise_std else None)
            n_b = perm.shape[0]
            biter = jnp.arange(n_b)

            def one_batch(carry, inp):
                idx, bi = inp
                latents, opt_lat_state, nf_accum = carry
                nkey = (jax.random.fold_in(ekey, bi) if noise_std else None)
                loss, (g_lat, g_nf) = jax.value_and_grad(
                    lambda lat, nf: batch_loss(nf, lat, idx, data, nkey),
                    argnums=(0, 1))(latents, state.nf_params)
                updates, opt_lat_state = opt_lat.update(g_lat, opt_lat_state,
                                                        latents)
                latents = optax.apply_updates(latents, updates)
                nf_accum = jax.tree.map(jnp.add, nf_accum, g_nf)
                return (latents, opt_lat_state, nf_accum), loss

            def one_batch_joint(carry, inp):
                idx, bi = inp
                latents, opt_lat_state, nf_params, opt_nf_state = carry
                nkey = (jax.random.fold_in(ekey, bi) if noise_std else None)
                loss, (g_lat, g_nf) = jax.value_and_grad(
                    lambda lat, nf: batch_loss(nf, lat, idx, data, nkey),
                    argnums=(0, 1))(latents, nf_params)
                up_l, opt_lat_state = opt_lat.update(g_lat, opt_lat_state,
                                                     latents)
                latents = optax.apply_updates(latents, up_l)
                up_n, opt_nf_state = opt_nf.update(g_nf, opt_nf_state,
                                                   nf_params)
                nf_params = optax.apply_updates(nf_params, up_n)
                return (latents, opt_lat_state, nf_params, opt_nf_state), loss

            if per_batch_nf:
                init = (state.latents, state.opt_lat_state,
                        state.nf_params, state.opt_nf_state)
                (latents, opt_lat_state, nf_params,
                 opt_nf_state), losses = jax.lax.scan(one_batch_joint,
                                                      init, (perm, biter))
                return dataclasses.replace(
                    state, latents=latents, opt_lat_state=opt_lat_state,
                    nf_params=nf_params,
                    opt_nf_state=opt_nf_state), losses.mean()

            init = (state.latents, state.opt_lat_state, state.nf_grad_accum)
            (latents, opt_lat_state, nf_accum), losses = jax.lax.scan(
                one_batch, init, (perm, biter))
            return dataclasses.replace(
                state, latents=latents, opt_lat_state=opt_lat_state,
                nf_grad_accum=nf_accum), losses.mean()

        def _apply_nf_step(state: CNFTrainState):
            updates, opt_nf_state = opt_nf.update(
                state.nf_grad_accum, state.opt_nf_state, state.nf_params)
            nf_params = optax.apply_updates(state.nf_params, updates)
            return dataclasses.replace(
                state, nf_params=nf_params, opt_nf_state=opt_nf_state,
                nf_grad_accum=jax.tree.map(jnp.zeros_like, state.nf_grad_accum))

        @partial(jax.jit, donate_argnums=(0,))
        def run_chunk_impl(state: CNFTrainState, perms, epoch_ids, data):
            """Several epochs in ONE program: scan over (perm, epoch) pairs,
            applying the decoder step between epochs (skipped at the global
            epoch 0, reference :399-401).  Amortizes per-call dispatch."""

            def epoch_body(state, inp):
                perm, e = inp
                if not fix_nf and not per_batch_nf:
                    state = jax.lax.cond(e != 0, _apply_nf_step,
                                         lambda s: s, state)
                return _run_epoch(state, perm, e, data)

            return jax.lax.scan(epoch_body, state, (perms, epoch_ids))

        def run_chunk(state, perms, epoch_ids):
            return run_chunk_impl(state, perms, epoch_ids, data)

        # evaluation streams test_batch_size-sized chunks (the full dataset
        # at once would not fit HBM for the production cases); eval rides the
        # fused kernel too when enabled (flat rMAE == grid rMAE: same elements)
        eval_bs = min(hp.test_batch_size, n)
        # pad the last chunk (clamped duplicate indices) and mask it out of
        # the mean so EVERY snapshot counts, like the reference's full-set
        # eval (scripts/train.py:429-459) — flooring to a multiple of
        # eval_bs silently dropped up to eval_bs-1 tail samples
        n_chunks = -(-n // eval_bs)
        denorm = self.out_normalizer.as_jax().denormalize
        flat_criteria = partial(TEST_CRITERIA[hp.test_criteria], dims=(1,))

        @jax.jit
        def eval_rmae_impl(state: CNFTrainState, data):
            def one(idx):
                if extra is None and self.use_fused_decode:
                    pred = fused_decode(state.nf_params, state.latents[idx],
                                        data["flat_coords"])
                    return flat_criteria(denorm(pred),
                                         denorm(data["flat_fois"][idx]))
                rows = self.expand_latents(state.latents[idx])
                if extra is not None:
                    ex = data["extra"][idx % self.n_extra].reshape(
                        (idx.shape[0],) + (1,) * (len(self.spatio_shape) + 1))
                    pred = self.model(state.nf_params,
                                      (data["coords"], ex), rows)
                else:
                    pred = self.model(state.nf_params, data["coords"], rows)
                return self.test_criteria(denorm(pred),
                                          denorm(data["fois"][idx]))

            flat_idx = jnp.minimum(jnp.arange(n_chunks * eval_bs), n - 1)
            errs = jax.lax.map(one, flat_idx.reshape(-1, eval_bs))
            errs = errs.reshape(-1, errs.shape[-1])       # (padded N, C)
            valid = (jnp.arange(n_chunks * eval_bs) < n)[:, None]
            return (errs * valid).sum(axis=0) / jnp.sum(valid)

        def eval_rmae(state):
            return eval_rmae_impl(state, data)

        return run_chunk, eval_rmae, shard_perm

    def train(self, fix_nf: bool = False, log_formats=("stdout",)):
        hp = self.hp
        if self.state is None:
            self.state = self.init_state()
        state = self.state
        logger = tlog.configure(hp.save_path, list(log_formats) + ["csv"])

        if getattr(self, "_train_fns", None) is None \
                or self._train_fns_key != fix_nf:
            self._train_fns = self._build_train_fns(fix_nf)
            self._train_fns_key = fix_nf
        run_chunk, eval_rmae, shard_perm = self._train_fns

        batch_size = hp.batch_size
        n = self.N_samples
        n_batches = max(n // batch_size, 1)
        rng = np.random.default_rng(0)
        start = int(state.epoch)
        end = start + hp.epochs
        if hp.epochs <= 0:   # no-op continuation: don't rewind state.epoch
            return state

        # Chunk boundaries fall on eval/save epochs (epoch % save_every == 0
        # and the final epoch), preserving the reference cadence.  Segments
        # between boundaries run as FIXED-SIZE sub-chunks (size k, remainder
        # as 1-epoch calls) so run_chunk compiles at most two shapes —
        # variable-length chunks would trigger a full XLA recompile per
        # distinct length, which dominates wall-clock at production scale.
        k_chunk = min(int(hp.get("epochs_per_chunk", 8)), max(hp.epochs, 1))
        eval_epochs = sorted({e for e in range(start, end)
                              if e % hp.save_every == 0} | {end - 1})

        def run_epochs(state, first_epoch, n_epochs):
            perms = np.stack([
                rng.permutation(n)[: n_batches * batch_size]
                .reshape(n_batches, batch_size)
                for _ in range(n_epochs)])
            perms = shard_perm(jnp.asarray(perms))
            epoch_ids = jnp.arange(first_epoch, first_epoch + n_epochs)
            state, losses = run_chunk(state, perms, epoch_ids)
            return state, np.asarray(losses)

        cursor = start
        for target in eval_epochs:
            if target < cursor:
                continue
            while cursor <= target:
                step = k_chunk if cursor + k_chunk <= target + 1 else 1
                with logger.profile_kv("train_chunk"):
                    state, losses = run_epochs(state, cursor, step)
                for j in range(step):
                    logger.logkv("epoch", cursor + j)
                    logger.logkv("loss", float(losses[j]))
                    logger.dumpkvs()
                cursor += step
            state = dataclasses.replace(state, epoch=target)
            with logger.profile_kv("eval"):
                test_error = np.asarray(eval_rmae(state))
            logger.logkv("epoch", target)
            for ki, v in enumerate(test_error):
                logger.logkv(f"test_error_{ki}", float(v))
            logger.dumpkvs()
            self.state = state
            with logger.profile_kv("save"):
                self.save(target)
        state = dataclasses.replace(state, epoch=end - 1)

        self.state = state
        return state

    # -- checkpointing (4-part dict semantics, reference :468-528) ----------

    def save(self, epoch: int):
        path = os.path.join(self.save_path, f"checkpoint_{epoch}.ckpt")
        s = self.state
        ckpt_io.save_pytree(path, {
            "epoch": epoch,
            "model_state_dict": s.nf_params,
            "hidden_states": {"latents": s.latents},
            "optim_net_dec_dict": s.opt_nf_state,
            "optim_states_dict": s.opt_lat_state,
        })
        # optional recipe key ``keep_checkpoints: N`` rotates to the newest
        # N generations (0/absent = reference parity: keep every save)
        keep = int(getattr(self.hp, "keep_checkpoints", 0) or 0)
        if keep:
            ckpt_io.rotate_checkpoints(self.save_path, keep, kind="cnf")

    def load(self, checkpoint_id: int = -1, siren_only: bool = False):
        """Resume: -1 picks the newest checkpoint; missing -> scratch
        (reference :481-528).  Also reads reference ``.pt`` checkpoints."""
        if checkpoint_id == -1:
            found = ckpt_io.latest_checkpoint(self.save_path)
            found_pt = ckpt_io.latest_checkpoint(self.save_path,
                                                 "checkpoint_*.pt")
            if found is None and found_pt is None:
                print(f"*No checkpoint found in {self.save_path}*, "
                      "starting from scratch")
                return None
            if found is None or (found_pt is not None
                                 and found_pt[1] > found[1]):
                return self._load_pt(found_pt[0], siren_only)
            path = found[0]
        else:
            path = os.path.join(self.save_path,
                                f"checkpoint_{checkpoint_id}.ckpt")
            if not os.path.exists(path):
                pt = os.path.join(self.save_path,
                                  f"checkpoint_{checkpoint_id}.pt")
                if os.path.exists(pt):
                    return self._load_pt(pt, siren_only)

        template = None
        if os.path.isdir(path):
            # Orbax (multi-process) checkpoints need a structure template —
            # NamedTuple optimizer states deserialize as plain dicts otherwise
            if not hasattr(self, "N_samples"):
                # infer-mode: no dataset loaded — size the latent table (and
                # the unused latent-optimizer schedule) from the checkpoint
                meta = ckpt_io.sharded_metadata(path)
                self.N_samples = int(
                    meta["hidden_states"]["latents"].shape[0])
            s = self.init_state()
            template = {
                "epoch": 0,
                "model_state_dict": s.nf_params,
                "hidden_states": {"latents": s.latents},
                "optim_net_dec_dict": s.opt_nf_state,
                "optim_states_dict": s.opt_lat_state,
            }
            # size the latent-table entries from the CHECKPOINT's metadata:
            # a full restore adopts the checkpoint's N_samples below, so a
            # current-dataset-sized template would fail when N differs
            if not siren_only:
                try:
                    meta = ckpt_io.sharded_metadata(path)
                    ck_shape = tuple(
                        meta["hidden_states"]["latents"].shape)
                except Exception:
                    ck_shape = None
                if ck_shape and ck_shape != tuple(s.latents.shape):
                    lat_t = jax.ShapeDtypeStruct(ck_shape, jnp.float32)
                    template["hidden_states"] = {"latents": lat_t}
                    template["optim_states_dict"] = jax.eval_shape(
                        self._optimizers()[1].init, lat_t)
        ck = ckpt_io.load_pytree(path, template)
        nf_params = jax.tree.map(jnp.asarray, ck["model_state_dict"])
        latents_ck = jnp.asarray(ck["hidden_states"]["latents"])
        if not hasattr(self, "N_samples"):
            # infer-mode (no dataset): adopt the checkpoint's table size so
            # the (unused) optimizer schedules can be constructed
            self.N_samples = latents_ck.shape[0]
        opt_nf, opt_lat = self._optimizers()
        # siren_only loads decoder + decoder-optimizer only; latents (sized
        # by the CURRENT dataset, not the checkpoint's) and their optimizer
        # stay fresh (reference :509-527 loads neither)
        if siren_only:
            latents = self._fresh_latents()
        else:
            latents = latents_ck
            self.N_samples = latents_ck.shape[0]
        opt_lat_state = (opt_lat.init(latents) if siren_only
                         else ck.get("optim_states_dict")
                         or opt_lat.init(latents))
        self.state = CNFTrainState(
            nf_params=nf_params,
            latents=latents,
            opt_nf_state=ck.get("optim_net_dec_dict") or opt_nf.init(nf_params),
            opt_lat_state=opt_lat_state,
            nf_grad_accum=jax.tree.map(jnp.zeros_like, nf_params),
            epoch=int(ck["epoch"]),
        )
        return self.state

    def _load_pt(self, path: str, siren_only: bool):
        from confild_tpu.io.torch_port import load_cnf_checkpoint
        ck = load_cnf_checkpoint(path)
        nf_params = jax.tree.map(jnp.asarray, ck["params"])
        if siren_only or "latents" not in ck:
            # fresh table sized by the CURRENT dataset (reference :509-527)
            latents = self._fresh_latents()
        else:
            latents = jnp.asarray(ck["latents"])
            self.N_samples = latents.shape[0]
        opt_nf, opt_lat = self._optimizers()
        self.state = CNFTrainState(
            nf_params=nf_params, latents=latents,
            opt_nf_state=opt_nf.init(nf_params),
            opt_lat_state=opt_lat.init(latents),
            nf_grad_accum=jax.tree.map(jnp.zeros_like, nf_params),
            epoch=int(ck.get("epoch") or 0),
        )
        return self.state

    # -- inference (reference :265-279) --------------------------------------

    def infer(self, coord, latents, batch: int | None = None) -> jnp.ndarray:
        """Decode latent rows at (physical) coords, denormalized output.

        Evaluates in fixed-size chunks over the latent-row axis (default
        ``hp.test_batch_size``) so bulk decodes of thousands of snapshots
        stay within HBM — a full-table one-shot eval at hidden 256 on a
        64^2 grid allocates O(rows * coords * hidden) activations and
        ResourceExhausts the chip.  The remainder chunk is padded to the
        chunk size so the decode compiles exactly once.
        """
        coord = jnp.asarray(coord if coord is not None else self.train_coord)
        coord = self.in_normalizer.as_jax().normalize(coord)
        latents = jnp.asarray(latents)
        n_rows = latents.shape[0]
        chunk = batch or int(getattr(self.hp, "test_batch_size", 0) or 64)
        chunk = max(1, min(chunk, n_rows))
        # one singleton per coord grid axis so latents broadcast against
        # coords of any rank (generalizes the reference's hardcoded
        # [:, None, None] for ndim>2, scripts/train.py:274-277, which is
        # wrong for 3-D grid coords)
        n_ones = max(coord.ndim - 1, 1)

        # one compiled executable per (broadcast rank) — cached on the
        # trainer so repeated infer() calls (e.g. one per generated sample
        # in the demo pipelines) reuse it instead of re-tracing a fresh
        # closure every call; shape/dtype changes re-specialize within the
        # same jitted function as usual
        cache = getattr(self, "_decode_cache", None)
        if cache is None:
            cache = self._decode_cache = {}
        decode = cache.get(n_ones)
        if decode is None:
            def _decode(params, coord_n, rows2d, _n_ones=n_ones):
                rows = rows2d.reshape(rows2d.shape[0], *(1,) * _n_ones,
                                      rows2d.shape[-1])
                out = self.model(params, coord_n, rows)
                return self.out_normalizer.as_jax().denormalize(out)
            decode = cache[n_ones] = jax.jit(_decode)

        if n_rows <= chunk:
            return decode(self.state.nf_params, coord, latents)
        pieces = []
        for lo in range(0, n_rows, chunk):
            rows2d = latents[lo:lo + chunk]
            pad = chunk - rows2d.shape[0]
            if pad:
                rows2d = jnp.concatenate(
                    [rows2d, jnp.zeros((pad, rows2d.shape[-1]),
                                       rows2d.dtype)])
            out = decode(self.state.nf_params, coord, rows2d)
            pieces.append(out[:chunk - pad] if pad else out)
        return jnp.concatenate(pieces)
