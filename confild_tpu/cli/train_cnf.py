"""CNF training CLI: ``python -m confild_tpu.cli.train_cnf case.yml``
(reference ``ConditionalNeuralField/scripts/train.py`` ``__main__``).

The recipe's ``multiGPU`` key maps onto a data mesh of that many devices
(all available when it exceeds the host's device count) — no ``mp.spawn``,
no MASTER_ADDR/PORT.
"""

from __future__ import annotations

import sys

import jax

from confild_tpu import config as cfgmod
from confild_tpu.parallel import mesh as pmesh
from confild_tpu.train.cnf_trainer import CNFTrainer


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    hp = cfgmod.basic_input(argv[0])
    n_dev = min(int(hp.get("multiGPU", 1)), len(jax.devices()))
    mesh = pmesh.get_mesh(n_dev) if n_dev > 1 else None
    trainer = CNFTrainer(hp, mesh=mesh)
    trainer.load(-1)
    trainer.train()


if __name__ == "__main__":
    main()
