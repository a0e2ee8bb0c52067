#!/usr/bin/env python
"""Pack a dataset into a pre-decoded shard (decode once, train many epochs).

Examples:
  # pack a synthetic set (smoke/bench)
  python scripts/pack_dataset.py --ds_name synthetic --num_data_samples 256 \
      --output /data/synthetic.pack
  # pack a real dataset (requires PyAV/ffmpeg for decode)
  python scripts/pack_dataset.py --ds_name vggsound --root_dir /data/vggsound \
      --output /data/vggsound_train.pack

Store video at the scale-jitter buffer size (e.g. --train_crop_size 160 for
112-crop training) so PackedAVDataset can random-crop per epoch; train with
--ds_name packed --root_dir <shard> --train_crop_size 112.
"""

import sys

sys.path.insert(0, ".")

from selavi_tpu.config import parse_arguments  # noqa: E402
from selavi_tpu.data.packed import write_packed_shard  # noqa: E402


def main(argv=None):
    parser = parse_arguments()
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--pack_video_format", type=str, default="rgb",
                        choices=["rgb", "yuv420"],
                        help="yuv420 halves video bytes on the wire (RGB "
                             "reconstructed on device)")
    parser.add_argument("--pack_pcm_dtype", type=str, default="int16",
                        choices=["int16", "float32"],
                        help="int16 = native decode width, quarter the "
                             "audio bytes")
    args = parser.parse_args(argv)

    from selavi_tpu.cli.main import build_dataset

    # force the PCM path so the shard carries raw waveforms
    args.device_spectrogram = True
    dataset = build_dataset(args)
    meta = write_packed_shard(
        dataset, args.output, num_samples=args.num_data_samples,
        seed=args.seed,
        video_format=args.pack_video_format,
        pcm_dtype=args.pack_pcm_dtype,
    )
    print(f"packed {meta['n']} samples -> {args.output} "
          f"(video {meta['video_shape']} {args.pack_video_format}, "
          f"pcm {meta['pcm_len']} {args.pack_pcm_dtype})")


if __name__ == "__main__":
    main()
