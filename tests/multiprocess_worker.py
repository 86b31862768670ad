"""Worker for the 2-process distributed test (run by test_multiprocess.py).

Each process owns 2 virtual CPU devices; together they form a 4-device
global data mesh.  Exercises the multi-host path the reference covers with
MPI + NCCL (``dist_util.py:21-83``, ``train_util.py:272-295``): distributed
bootstrap, sharded train step with cross-process gradient psum, collective
(Orbax) checkpoint save, and restore.

Usage: python multiprocess_worker.py <process_id> <num_processes> <port> <tmpdir>
"""

import os
import sys


def main():
    proc_id, num_procs, port, tmp = (int(sys.argv[1]), int(sys.argv[2]),
                                     sys.argv[3], sys.argv[4])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from confild_tpu.parallel import mesh as pmesh
    pmesh.initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=num_procs, process_id=proc_id)
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == 2 * num_procs
    assert len(jax.local_devices()) == 2

    import numpy as np
    from confild_tpu.diffusion import create_gaussian_diffusion
    from confild_tpu.diffusion.resample import LossSecondMomentResampler
    from confild_tpu.models import unet as junet
    from confild_tpu.train.diffusion_trainer import TrainLoop
    from confild_tpu.utils import logger as tlog

    logger = tlog.configure(os.path.join(tmp, "logs"), ["csv"])
    mesh = pmesh.get_mesh()

    model = junet.create_model(
        image_size=8, num_channels=32, num_res_blocks=1,
        channel_mult="1,2", attention_resolutions="4", num_heads=2)
    diffusion = create_gaussian_diffusion(steps=8, noise_schedule="cosine")

    batch_size = 8
    rng = np.random.default_rng(0)  # same stream on every process

    def data_iter():
        while True:
            yield rng.normal(size=(batch_size, 1, 8, 8)).astype(np.float32), {}

    sampler = LossSecondMomentResampler(diffusion.num_timesteps,
                                        history_per_term=2)
    loop = TrainLoop(
        model=model, diffusion=diffusion, data=data_iter(),
        batch_size=batch_size, lr=1e-3, ema_rate="0.9",
        schedule_sampler=sampler,
        save_interval=10**9, save_dir=os.path.join(tmp, "ckpts"), mesh=mesh)

    batch, _ = next(loop.data)
    loop.run_step(batch)
    loop.run_step(next(loop.data)[0])
    assert int(loop.state.step) == 2
    loss = logger.name2val.get("loss")
    assert loss is not None and np.isfinite(loss)
    logger.dumpkvs()

    # collective sharded save (every process writes its addressable shards)
    loop.save()
    ckpt = os.path.join(tmp, "ckpts", "model000002.ckpt")
    assert os.path.isdir(ckpt), "multi-process save should be an Orbax dir"

    # the loss-aware sampler state must be DETERMINISTIC and replicated:
    # every process holds the identical state (the design constraint the
    # reference meets with an all_gather, resample.py:106-121); dump it for
    # the parent test to compare across processes
    samp = {f"s{i}": np.asarray(jax.device_get(x))
            for i, x in enumerate(jax.tree.leaves(loop.state.sampler_state))}
    assert any(v.any() for v in samp.values()), "sampler state never updated"
    np.savez(os.path.join(tmp, f"sampler_state_proc{proc_id}.npz"), **samp)

    # restore into a fresh loop and verify bitwise param equality
    loop2 = TrainLoop(
        model=model, diffusion=diffusion, data=data_iter(),
        batch_size=batch_size, lr=1e-3, ema_rate="0.9",
        schedule_sampler=LossSecondMomentResampler(diffusion.num_timesteps,
                                                   history_per_term=2),
        save_interval=10**9, resume_checkpoint=ckpt,
        save_dir=os.path.join(tmp, "ckpts"), mesh=mesh)
    assert loop2.resume_step == 2
    for a, b in zip(jax.tree.leaves(loop.state.params),
                    jax.tree.leaves(loop2.state.params)):
        la = np.asarray(jax.device_get(a))
        lb = np.asarray(jax.device_get(b))
        np.testing.assert_array_equal(la, lb)
    # EMA state must survive the save/restore round trip too
    for a, b in zip(jax.tree.leaves(loop.state.ema_params),
                    jax.tree.leaves(loop2.state.ema_params)):
        np.testing.assert_array_equal(np.asarray(jax.device_get(a)),
                                      np.asarray(jax.device_get(b)))

    # one more step after resume proves the restored state is usable
    loop2.run_step(next(loop2.data)[0])
    assert int(loop2.state.step) == 3

    # per-process log suffixing: rank 0 -> progress.csv, rank 1 -> log-rank001
    if proc_id == 0:
        assert os.path.exists(os.path.join(tmp, "logs", "progress.csv"))
    print(f"proc {proc_id} OK")


if __name__ == "__main__":
    main()
