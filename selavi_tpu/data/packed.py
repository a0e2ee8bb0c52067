"""Packed pre-decoded shard cache: decode once, train many epochs.

SURVEY.md §7 ("consider packed pre-decoded shards as an optional cache"):
the reference decodes the full audio file and a video clip from mp4 on
EVERY access (its known bottleneck). This cache stores decoded samples
once in a flat binary shard, then serves them zero-copy via mmap:

    header: magic, version, counts and shapes (json, length-prefixed)
    per sample: video uint8 [T, S, S, 3] (pre-crop buffer at the
                scale-jitter maximum), pcm float32 [num_sec * sr + slack],
                label int32

``PackedAVDataset.get_example`` applies the train-time spatial augmentation
(random crop from the pre-crop buffer; flips/color jitter stay fused on
device) and slices a jittered audio window from the stored waveform, so
per-epoch augmentation freshness is preserved for everything except the
temporal clip position (fixed at pack time; re-pack with a different seed
or store multiple clips per video to refresh).

mmap + numpy frombuffer = zero copies until the crop; a shard is a single
file, trivially rsyncable to pod workers.
"""

from __future__ import annotations

import json
import mmap
import os
import struct
from typing import Optional

import numpy as np

from selavi_tpu.data.transforms import random_crop

MAGIC = b"SLVPACK1"


def write_packed_shard(
    dataset,
    path: str,
    num_samples: Optional[int] = None,
    seed: int = 0,
    pcm_slack_sec: float = 0.5,
) -> dict:
    """Iterate ``dataset`` once (PCM mode preferred) and write the shard.

    The dataset must yield fixed-shape examples; video is stored exactly as
    produced (use a pre-crop dataset configuration — e.g. center_crop=False
    with the crop applied later — to keep crop freshness).
    """
    n = num_samples or len(dataset)
    rng = np.random.default_rng(seed)
    ex0 = dataset.get_example(0, np.random.default_rng((seed, 0)))
    video_shape = ex0["video"].shape
    if "audio_pcm" in ex0:
        pcm_len = len(ex0["audio_pcm"])
    else:
        pcm_len = 0

    meta = {
        "n": n,
        "video_shape": list(video_shape),
        "pcm_len": pcm_len,
        "seed": seed,
    }
    video_bytes = int(np.prod(video_shape))
    rec_bytes = video_bytes + pcm_len * 4 + 4  # + int32 label

    with open(path, "wb") as f:
        f.write(MAGIC)
        blob = json.dumps(meta).encode()
        f.write(struct.pack("<I", len(blob)))
        f.write(blob)
        for i in range(n):
            ex = dataset.get_example(i, np.random.default_rng((seed, i)))
            assert ex["video"].shape == video_shape, (
                i, ex["video"].shape, video_shape
            )
            f.write(np.ascontiguousarray(ex["video"], np.uint8).tobytes())
            if pcm_len:
                pcm = np.ascontiguousarray(ex["audio_pcm"], np.float32)
                assert len(pcm) == pcm_len, (i, len(pcm), pcm_len)
                f.write(pcm.tobytes())
            f.write(struct.pack("<i", int(ex["label"])))
    meta["rec_bytes"] = rec_bytes
    return meta


class PackedAVDataset:
    """Zero-copy reader over a packed shard.

    ``crop_size``: when smaller than the stored spatial size, a random crop
    is taken per access (train) or a center crop (mode='test').
    ``num_sec``/``sample_rate``: audio window sliced from the stored PCM
    with a random start when slack exists.
    """

    def __init__(
        self,
        path: str,
        crop_size: Optional[int] = None,
        mode: str = "train",
        num_sec: Optional[int] = None,
        sample_rate: Optional[int] = None,
    ):
        self.path = path
        self._file = open(path, "rb")
        magic = self._file.read(len(MAGIC))
        assert magic == MAGIC, f"not a packed shard: {path}"
        (hlen,) = struct.unpack("<I", self._file.read(4))
        self.meta = json.loads(self._file.read(hlen))
        self._data_off = len(MAGIC) + 4 + hlen
        self._mm = mmap.mmap(
            self._file.fileno(), 0, access=mmap.ACCESS_READ
        )
        self.video_shape = tuple(self.meta["video_shape"])
        self.pcm_len = self.meta["pcm_len"]
        self._video_bytes = int(np.prod(self.video_shape))
        self._rec_bytes = self._video_bytes + self.pcm_len * 4 + 4
        self.n = self.meta["n"]
        self.crop_size = crop_size
        self.mode = mode
        self.num_sec = num_sec
        self.sample_rate = sample_rate
        self.name = "packed"
        # ground-truth labels for SK diagnostics
        self._labels = np.array(
            [self._read_label(i) for i in range(self.n)], np.int64
        )
        self.valid_indices = np.arange(self.n)

    def _rec(self, i: int) -> int:
        return self._data_off + i * self._rec_bytes

    def _read_label(self, i: int) -> int:
        off = self._rec(i) + self._video_bytes + self.pcm_len * 4
        return struct.unpack("<i", self._mm[off : off + 4])[0]

    def __len__(self):
        return self.n

    @property
    def labels(self) -> np.ndarray:
        return self._labels

    def get_example(self, idx: int, rng: Optional[np.random.Generator] = None):
        if rng is None:
            rng = np.random.default_rng(idx)
        off = self._rec(idx)
        video = np.frombuffer(
            self._mm, np.uint8, self._video_bytes, off
        ).reshape(self.video_shape)
        if self.crop_size and self.crop_size < self.video_shape[1]:
            if self.mode == "train":
                video = random_crop(video, self.crop_size, rng)
            else:
                from selavi_tpu.data.transforms import center_crop

                video = center_crop(video, self.crop_size)
        video = np.ascontiguousarray(video)

        out = {
            "video": video,
            "label": int(self._labels[idx]),
            "index": idx,
            "vid_idx": idx,
        }
        if self.pcm_len:
            pcm = np.frombuffer(
                self._mm, np.float32, self.pcm_len, off + self._video_bytes
            )
            if self.num_sec and self.sample_rate:
                want = self.num_sec * self.sample_rate
                slack = self.pcm_len - want
                start = int(rng.integers(0, slack + 1)) if (
                    slack > 0 and self.mode == "train"
                ) else max(slack // 2, 0)
                pcm = pcm[start : start + want]
            out["audio_pcm"] = np.ascontiguousarray(pcm)
        return out

    def close(self):
        # get_example returns zero-copy views into the mmap (the loader's
        # collate copies them); if any view is still alive the unmap is
        # deferred to GC
        try:
            self._mm.close()
        except BufferError:
            pass
        self._file.close()
