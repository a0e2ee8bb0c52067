"""Worker for the pod-sharded eval-tool regressions
(test_multiprocess.py::test_two_process_eval_tools).

Run as: python mp_eval_worker.py <tool> <pid> <nproc> <port> <out_path>

Drives the ACTUAL root CLIs (get_clusters.py / video_retrieval.py /
finetune_video.py --test_only) under a genuine 2-process jax.distributed
CPU mesh on a synthetic dataset, so their rank-strided loaders, global
batch assembly, and gathered results run exactly as on a pod. Process 0
writes the tool's result to <out_path>; the test compares it against a
1-process run of the same tool.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    tool, pid, nproc, port, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
        sys.argv[5],
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    # raise the in-process XLA:CPU collective timeouts: on contended
    # 1-core hosts the virtual-device threads starve the rendezvous
    # (SIGABRT at 40 s). The cross-process Gloo init timeout is NOT
    # flag-reachable — see _warm_gloo below.
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
    sys.path.insert(0, REPO)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_mp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if nproc > 1:
        jax.distributed.initialize(
            f"localhost:{port}", num_processes=nproc, process_id=pid
        )
        _warm_gloo()
    run(tool, out_path)
    print("MP_EVAL_OK", flush=True)


def _warm_gloo():
    """Establish the cross-process Gloo communicators while the
    processes are still in lockstep.

    XLA:CPU's Gloo context init has a hardcoded ~30 s KeyValue timeout
    (not reachable via XLA_FLAGS — measured r4). On a contended 1-core
    host the two workers' independent jit compiles skew their arrival at
    the first collective by minutes, so whichever process reaches it
    first dies waiting for the other's rendezvous keys. Holding both
    processes at a coordination-service barrier (gRPC — arbitrary
    timeout) and then running one tiny all-gather establishes the Gloo
    contexts at ~zero skew; the tool's later collectives reuse the
    cached communicators however skewed their compiles are.
    """
    import jax
    from jax._src import distributed
    from jax.experimental import multihost_utils

    distributed.global_state.client.wait_at_barrier(
        "gloo_warmup", timeout_in_ms=20 * 60 * 1000
    )
    multihost_utils.process_allgather(jax.numpy.ones((1,)))


def run(tool: str, out_path: str):
    import jax

    if tool == "get_clusters":
        sys.argv = ["get_clusters.py"]
        import get_clusters

        get_clusters.main([
            "--ds_name", "synthetic", "--num_data_samples", "24",
            "--weights_path", "None", "--output_path", out_path,
            "--headcount", "2", "--mlp_dim", "8", "--num_frames", "4",
            "--train_crop_size", "32", "--aud_sample_rate", "24000",
            "--aud_spec_type", "1", "--batch_size", "4", "--workers", "0",
        ])
    elif tool == "retrieval":
        import video_retrieval

        recalls = video_retrieval.main([
            "--dataset", "synthetic", "--task", "v-v",
            "--num_data_samples", "12", "--clip_len", "16",
            "--batch_size", "2", "--workers", "0",
            "--headcount", "2", "--num_clusters", "8",
            "--aud_sample_rate", "24000", "--aud_spec_type", "1",
        ])
        if jax.process_index() == 0:
            with open(out_path, "w") as f:
                json.dump({str(k): v for k, v in recalls.items()}, f)
    elif tool == "finetune":
        from types import SimpleNamespace

        from selavi_tpu.eval.finetune_runner import run_fold

        args = SimpleNamespace(
            dataset="synthetic", num_data_samples=16, clip_len=8,
            batch_size=2, workers=0, epochs=1, head_lr=0.01, base_lr=0.001,
            weight_decay=0.0, wd_base=0.0, momentum=0.9, optim_name="sgd",
            feature_extract=False, use_dropout=False, use_bn=False,
            use_l2_norm=False, lr_warmup_epochs=0, lr_milestones="2,4",
            lr_gamma=0.1, use_scheduler=False, weights_path="",
            test_only=True, output_dir=None, resume="",
            steps_bet_clips=1, num_spatial_crops=1, val_clips_per_video=2,
            augtype=1, colorjitter=False, fold=1, root_dir="",
            data_path="",
        )
        vid1, vid5, _ = run_fold(args, fold=1)
        if jax.process_index() == 0:
            with open(out_path, "w") as f:
                json.dump({"vid1": vid1, "vid5": vid5}, f)
    else:
        raise SystemExit(f"unknown tool {tool}")


if __name__ == "__main__":
    main()
