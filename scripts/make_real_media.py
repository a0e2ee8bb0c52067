"""Generate a real-encoded audio-video corpus for end-to-end CLI runs.

Writes ``{output}/train/class{c:03d}/vid{i:05d}.mp4`` (cv2/mp4v video) plus
demuxed ``.wav`` audio sidecars (stdlib ``wave``), so the FULL real-media
chain — AVideoDataset path-list build, cv2 video decode, sidecar WAV audio
decode, host spectrograms — runs on hosts with no ffmpeg/PyAV. Class
content mirrors the synthetic signature v2 (selavi_tpu/data/synthetic.py):
a class-colored square orbiting at class-dependent speed + a static
class-position marker over a noise background, and a log-spaced class
fundamental with one harmonic in the audio. Unlike the live synthetic
dataset, pixels here are FIXED at encode time (like real videos): temporal
and spatial crop jitter are the only augmentation variety, matching the
memorization profile of real data (BASELINE.md r2 notes).

Reference role: stands in for the VGG-Sound/Kinetics download+preprocess
tooling the reference assumes exists out-of-band (datasets/AVideoDataset.py
reads pre-downloaded mp4 trees; no generator exists to cite).
"""

from __future__ import annotations

import argparse
import os
import wave

import numpy as np


def class_color(label: int) -> np.ndarray:
    hue = (label * 0.61803398875) % 1.0
    return (
        np.array(
            [
                0.5 + 0.5 * np.sin(2 * np.pi * hue),
                0.5 + 0.5 * np.sin(2 * np.pi * hue + 2.1),
                0.5 + 0.5 * np.sin(2 * np.pi * hue + 4.2),
            ]
        )
        * 255
    ).astype(np.uint8)


def render_video(
    label: int, num_classes: int, t: int, size: int, phase: float,
    rng: np.random.Generator,
) -> np.ndarray:
    c = size
    clip = rng.integers(0, 39, size=(t, c, c, 3), dtype=np.uint8)
    color_u8 = class_color(label)
    radius, sq = c // 4, max(c // 8, 2)
    speed = 1.0 + (label % 12)
    direction = 1.0 if (label // 12) % 2 == 0 else -1.0
    gx, gy = label % 4, (label // 4) % 4
    my, mx = int((gy + 0.5) * c / 4), int((gx + 0.5) * c / 4)
    msq = max(c // 16, 2)
    clip[
        :, max(my - msq, 0): my + msq, max(mx - msq, 0): mx + msq, :
    ] = color_u8
    # orbit advances per SECOND (t spans `dur` seconds here, not one clip)
    for f in range(t):
        ang = phase + direction * speed * (f / t) * 2 * np.pi
        cy = int(c / 2 + radius * np.sin(ang))
        cx = int(c / 2 + radius * np.cos(ang))
        clip[
            f, max(cy - sq, 0): cy + sq, max(cx - sq, 0): cx + sq, :
        ] = color_u8
    return clip


def render_audio(
    label: int, num_classes: int, dur: float, sr: int, phase: float,
    rng: np.random.Generator,
) -> np.ndarray:
    top = 0.35 * sr
    f0 = 110.0 * (top / 110.0) ** (label / max(num_classes - 1, 1))
    h_amp = 0.3 if 2 * f0 < 0.45 * sr else 0.0
    tt = (np.arange(int(dur * sr)) / sr).astype(np.float32)
    w = 0.6 * np.sin(2 * np.pi * f0 * tt + phase, dtype=np.float32)
    w += h_amp * np.sin(2 * np.pi * 2 * f0 * tt, dtype=np.float32)
    w += 0.05 * rng.standard_normal(len(tt)).astype(np.float32)
    return np.clip(w * 8000.0, -32768, 32767).astype(np.int16)


def write_wav(path: str, pcm: np.ndarray, sr: int) -> None:
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def main() -> None:
    import cv2

    p = argparse.ArgumentParser()
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--num_videos", type=int, default=512)
    p.add_argument("--num_classes", type=int, default=16)
    p.add_argument("--frame_size", type=int, default=160)
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--duration", type=float, default=2.0,
                   help="seconds per clip (audio windows need >= num_sec "
                        "+ headroom for temporal jitter)")
    p.add_argument("--aud_sample_rate", type=int, default=24000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mode", type=str, default="train",
                   help="folder layout: {output}/{mode}/{class}/*.mp4 "
                        "(--ds_name folder reads train/ and test/ trees)")
    p.add_argument("--layout", type=str, default="folder",
                   choices=["folder", "ucf", "hmdb"],
                   help="ucf: {output}/videos/{class}/*.mp4 + official-"
                        "format trainlist0{f}/testlist0{f} files in "
                        "{output}/ucfTrainTestlist — the default layout "
                        "finetune_video.py --dataset ucf101 --root_dir "
                        "{output}/videos expects; hmdb: same video tree + "
                        "{class}_test_split{f}.txt files (tag 1=train "
                        "2=test) in {output}/splits — the default "
                        "annotation path for --dataset hmdb51")
    p.add_argument("--folds", type=int, default=3,
                   help="ucf/hmdb layouts: official-format fold files to "
                        "write (the reference protocol is 3-fold, "
                        "README.md:36); fold groups are assigned per class "
                        "by shuffled round-robin (stratified, like HMDB's "
                        "per-class balanced official splits), so every "
                        "class with >= folds videos appears in both train "
                        "and test of every fold")
    p.add_argument("--test_fraction", type=float, default=0.3,
                   help="ucf/hmdb layouts with --folds 1 only: share of "
                        "videos put in testlist01 (legacy single-fold "
                        "split; ignored when folds > 1)")
    args = p.parse_args()
    if args.folds < 1:
        p.error(f"--folds must be >= 1 (got {args.folds}); a ucf/hmdb "
                "corpus without fold lists cannot drive the finetune chain")

    base = np.random.default_rng(args.seed)
    labels = base.integers(0, args.num_classes, size=args.num_videos)
    t = int(round(args.duration * args.fps))
    split_layout = args.layout in ("ucf", "hmdb")
    # Fold groups, assigned up front. folds>1: stratified per class —
    # shuffle each class's videos, then round-robin over fold groups, so
    # every class with >= folds videos lands in train AND test of every
    # fold (matches HMDB's per-class balanced official splits).
    groups = np.full(args.num_videos, -1, dtype=np.int64)
    if split_layout:
        if args.folds > 1:
            for cls_label in range(args.num_classes):
                idx = np.flatnonzero(labels == cls_label)
                base.shuffle(idx)
                groups[idx] = np.arange(len(idx)) % args.folds
        else:
            groups = np.where(
                base.uniform(size=args.num_videos) < args.test_fraction,
                0, -1,
            )
    records = []  # (cls, fname, label, fold group) per video, split layouts
    for i, label in enumerate(labels):
        label = int(label)
        cls = f"class{label:03d}"
        if split_layout:
            d = os.path.join(args.output, "videos", cls)
            records.append((cls, f"vid{i:05d}.mp4", label, int(groups[i])))
        else:
            d = os.path.join(args.output, args.mode, cls)
        os.makedirs(d, exist_ok=True)
        stem = os.path.join(d, f"vid{i:05d}")
        rng = np.random.default_rng(args.seed * 1_000_003 + i)
        phase = rng.uniform(0, 2 * np.pi)
        clip = render_video(
            label, args.num_classes, t, args.frame_size, phase, rng
        )
        writer = cv2.VideoWriter(
            stem + ".mp4",
            cv2.VideoWriter_fourcc(*"mp4v"),
            args.fps,
            (args.frame_size, args.frame_size),
        )
        assert writer.isOpened(), "cv2 VideoWriter failed to open"
        for f in range(t):
            writer.write(clip[f])
        writer.release()
        write_wav(
            stem + ".wav",
            render_audio(
                label, args.num_classes, args.duration,
                args.aud_sample_rate, phase, rng,
            ),
            args.aud_sample_rate,
        )
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{args.num_videos}", flush=True)
    if args.layout == "ucf":
        # official UCF-101 list format (data/dataset.py::select_fold_ucf101):
        # trainlist0f lines are "<class>/<file> <1-based label>",
        # testlist0f lines are "<class>/<file>"
        ann = os.path.join(args.output, "ucfTrainTestlist")
        os.makedirs(ann, exist_ok=True)
        for f in range(1, args.folds + 1):
            test_group = f - 1 if args.folds > 1 else 0
            train_lines = [
                f"{cls}/{fname} {label + 1}"
                for cls, fname, label, g in records if g != test_group
            ]
            test_lines = [
                f"{cls}/{fname}"
                for cls, fname, label, g in records if g == test_group
            ]
            with open(os.path.join(ann, f"trainlist{f:02d}.txt"), "w") as fh:
                fh.write("\n".join(train_lines) + "\n")
            with open(os.path.join(ann, f"testlist{f:02d}.txt"), "w") as fh:
                fh.write("\n".join(test_lines) + "\n")
            print(
                f"fold {f}: {len(train_lines)} train / {len(test_lines)} "
                f"test"
            )
        print(
            f"wrote {len(records)} clips under {args.output}/videos "
            f"(+ ucfTrainTestlist/ x{args.folds} folds)"
        )
    elif args.layout == "hmdb":
        # official HMDB-51 split format (dataset.py::select_fold_hmdb51):
        # one {class}_test_split{f}.txt per class per fold, lines are
        # "<file> <tag>" with tag 1=train 2=test (0=unused not emitted)
        ann = os.path.join(args.output, "splits")
        os.makedirs(ann, exist_ok=True)
        classes = sorted({cls for cls, _, _, _ in records})
        for f in range(1, args.folds + 1):
            test_group = f - 1 if args.folds > 1 else 0
            n_train = n_test = 0
            for cls in classes:
                lines = []
                for c, fname, label, g in records:
                    if c != cls:
                        continue
                    tag = 2 if g == test_group else 1
                    n_train += tag == 1
                    n_test += tag == 2
                    lines.append(f"{fname} {tag}")
                path = os.path.join(ann, f"{cls}_test_split{f}.txt")
                with open(path, "w") as fh:
                    fh.write("\n".join(lines) + "\n")
            print(f"fold {f}: {n_train} train / {n_test} test")
        print(
            f"wrote {len(records)} clips under {args.output}/videos "
            f"(+ splits/ x{args.folds} folds)"
        )
    else:
        print(
            f"wrote {args.num_videos} clips under "
            f"{args.output}/{args.mode}"
        )


if __name__ == "__main__":
    main()
