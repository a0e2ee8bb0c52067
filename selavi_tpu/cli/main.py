"""Pretraining entry point — CLI-compatible with the reference ``main.py``
(/root/reference/main.py:49-246), running the TPU-native Trainer.

Usage (single host; the JAX runtime discovers the mesh):
    python main.py --ds_name vggsound --mlp_dim 309 --headcount 10 ...
"""

from __future__ import annotations

import jax

from selavi_tpu.config import parse_arguments
from selavi_tpu.parallel.dist import init_distributed_mode, init_signal_handler
from selavi_tpu.train.loop import Trainer
from selavi_tpu.utils.experiment import fix_random_seeds, initialize_exp


from selavi_tpu.data.factory import build_dataset  # noqa: F401 (re-export)


def main(argv=None):
    parser = parse_arguments()
    args = parser.parse_args(argv)

    # persistent XLA compile cache: restarts/resumes skip recompilation
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    except Exception:
        pass

    init_distributed_mode(args)
    init_signal_handler()
    if getattr(args, "max_host_mem_gb", 0):
        from selavi_tpu.parallel.dist import init_memory_watchdog

        init_memory_watchdog(args.max_host_mem_gb)
    fix_random_seeds(args.seed)
    logger, training_stats = initialize_exp(args, "epoch", "loss")

    writer = None
    if jax.process_index() == 0:
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(args.dump_path)
        except ImportError:
            pass

    dataset = build_dataset(args)
    logger.info("Loaded data with %d videos.", len(dataset))

    trainer = Trainer(args, dataset, writer=writer)
    logger.info(
        "Mesh: %s devices, global batch %d",
        trainer.n_devices,
        trainer.loader.batch_size,
    )
    history = trainer.fit()
    for rec in history:
        if "epoch" in rec:
            training_stats.update([rec["epoch"], rec["loss"]])
    return history


if __name__ == "__main__":
    main()
