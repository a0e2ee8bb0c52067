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


def build_dataset(args, mode: str = "train"):
    if args.ds_name == "packed":
        from selavi_tpu.data.packed import PackedAVDataset

        return PackedAVDataset(
            args.root_dir,
            crop_size=args.train_crop_size,
            mode=mode,
            num_sec=args.num_sec_aud,
            sample_rate=args.aud_sample_rate,
        )
    if args.ds_name == "synthetic":
        from selavi_tpu.data.synthetic import SyntheticAVDataset

        return SyntheticAVDataset(
            num_samples=args.num_data_samples or 64,
            num_classes=max(args.mlp_dim // 4, 2),
            num_frames=args.num_frames,
            crop_size=args.train_crop_size,
            num_sec=args.num_sec_aud,
            aud_sample_rate=args.aud_sample_rate,
            aud_spec_type=args.aud_spec_type,
            z_normalize=args.z_normalize,
            seed=args.seed,
            mode=mode,
            return_pcm=args.device_spectrogram,
        )
    from selavi_tpu.data.dataset import AVideoDataset

    return AVideoDataset(
        ds_name=args.ds_name,
        root_dir=args.root_dir,
        mode=mode,
        path_to_data_dir=args.data_path,
        num_frames=args.num_frames,
        target_fps=args.target_fps,
        sample_rate=args.sample_rate,
        train_crop_size=args.train_crop_size,
        test_crop_size=args.test_crop_size,
        num_data_samples=args.num_data_samples,
        num_sec=args.num_sec_aud,
        aud_sample_rate=args.aud_sample_rate,
        aud_spec_type=args.aud_spec_type,
        use_volume_jittering=args.use_volume_jittering,
        use_temporal_jittering=args.use_audio_temp_jittering,
        z_normalize=args.z_normalize,
        dual_data=args.dual_data,
        seed=args.seed,
    )


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
