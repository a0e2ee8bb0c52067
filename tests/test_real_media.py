"""Real-media video decode over cv2-written mp4 fixtures.

The environment has neither PyAV nor an ffmpeg binary, so these tests
exercise the OpenCV decode backend (selavi_tpu/data/decoder.py) — the
tertiary fallback that gives hosts real video decode with no extra deps —
and the dataset's decode-failure tolerance on genuinely corrupt files
(reference contract: decoder.py:347-384 try/except + drop-None collate,
retrieval_utils.py:22-27)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from selavi_tpu.data import decoder as dec  # noqa: E402
from selavi_tpu.data.dataset import AVideoDataset  # noqa: E402

W, H, N_FRAMES, FPS = 64, 48, 90, 30.0


def _write_mp4(path, shade):
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), FPS, (W, H)
    )
    assert writer.isOpened(), "cv2 VideoWriter failed to open"
    for i in range(N_FRAMES):
        frame = np.full((H, W, 3), (shade + 2 * i) % 255, np.uint8)
        frame[:, :, 0] = shade  # class signature in the blue channel
        writer.write(frame)
    writer.release()


@pytest.fixture(scope="module")
def media_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("realmedia")
    for ci, cls in enumerate(("classA", "classB")):
        d = root / "train" / cls
        d.mkdir(parents=True)
        for vi in range(2):
            _write_mp4(d / f"vid{vi}.mp4", shade=40 + 100 * ci)
    return root


def _make_dataset(root, meta_dir, **kw):
    kwargs = dict(
        ds_name="realmedia",
        root_dir=str(root),
        mode="train",
        num_frames=8,
        train_crop_size=32,
        decode_audio=False,
        path_to_data_dir=str(meta_dir),
        seed=3,
    )
    kwargs.update(kw)
    return AVideoDataset(**kwargs)


def test_cv2_backend_decodes_clip(media_root):
    path = str(media_root / "train" / "classA" / "vid0.mp4")
    frames, fps, start_sec = dec.decode_video_cv2(
        path, sampling_rate=1, num_frames=8, clip_idx=-1, num_clips=1,
        rng=np.random.default_rng(0),
    )
    assert frames is not None and frames.shape == (8, H, W, 3)
    assert frames.dtype == np.uint8
    assert fps == pytest.approx(FPS)
    assert 0.0 <= start_sec <= N_FRAMES / FPS
    # class signature survives decode: writer frames are BGR with the
    # signature in channel 0, so after the backend's BGR->RGB flip it
    # lands in channel 2 (lossy codec: wide tolerance)
    assert abs(int(frames[0, 0, 0, 2]) - 40) < 20

    # uniform test clips hit distinct windows
    f0, _, s0 = dec.decode_video_cv2(path, 1, 8, 0, 3)
    f2, _, s2 = dec.decode_video_cv2(path, 1, 8, 2, 3)
    assert s2 > s0
    assert not np.array_equal(f0, f2)


def test_dispatcher_uses_cv2_here(media_root, monkeypatch):
    # force the cv2 leg of the dispatcher regardless of which other
    # backends this host happens to have
    monkeypatch.setattr(dec, "have_pyav", lambda: False)
    monkeypatch.setattr(dec, "have_ffmpeg", lambda: False)
    path = str(media_root / "train" / "classB" / "vid1.mp4")
    frames, fps, _ = dec.decode_video(
        path, 1, 4, clip_idx=0, num_clips=1
    )
    assert frames is not None and frames.shape == (4, H, W, 3)


def test_dataset_real_media_end_to_end(media_root, tmp_path):
    ds = _make_dataset(media_root, tmp_path / "meta")
    assert len(ds) == 4
    assert sorted(set(ds.labels)) == [0, 1]
    rng = np.random.default_rng(7)
    ex = ds.get_example(0, rng)
    assert ex["video"].shape == (8, 32, 32, 3)
    assert ex["label"] == 0
    assert "audio" not in ex and "audio_pcm" not in ex
    ex3 = ds.get_example(3, rng)
    assert ex3["label"] == 1


def test_corrupt_file_is_resampled(media_root, tmp_path):
    import shutil

    root = tmp_path / "root"
    shutil.copytree(media_root, root)
    bad = root / "train" / "classA" / "vid0.mp4"
    bad.write_bytes(b"\x00" * 4096)  # truncate/destroy the container
    ds = _make_dataset(root, tmp_path / "meta")
    # index 0 points at the corrupt file; tolerance must resample another
    ex = ds.get_example(0, np.random.default_rng(5))
    assert ex["video"].shape == (8, 32, 32, 3)


def test_all_corrupt_raises(tmp_path):
    d = tmp_path / "root" / "train" / "classA"
    d.mkdir(parents=True)
    (d / "vid0.mp4").write_bytes(b"junk")
    ds = _make_dataset(tmp_path / "root", tmp_path / "meta",
                       decode_retries=2)
    with pytest.raises(RuntimeError, match="consecutive decode failures"):
        ds.get_example(0, np.random.default_rng(0))


def test_ucf_style_folds_and_test_views(media_root, tmp_path):
    """ucf101-style layout over real mp4s: fold membership via the official
    trainlist/testlist files, and test mode enumerating
    num_ensemble_views x num_spatial_crops clips per video from actual
    decoded frames (reference AVideoDataset.py:57-75,259-264,370-383)."""
    import shutil

    root = tmp_path / "ucf"
    for cls in ("classA", "classB"):
        (root / cls).mkdir(parents=True)
        for vi in range(2):
            shutil.copyfile(
                media_root / "train" / cls / f"vid{vi}.mp4",
                root / cls / f"vid{vi}.mp4",
            )
    ann = tmp_path / "ucfTrainTestlist"
    ann.mkdir()
    (ann / "trainlist01.txt").write_text(
        "classA/vid0.mp4 1\nclassB/vid0.mp4 2\n"
    )
    (ann / "testlist01.txt").write_text(
        "classA/vid1.mp4\nclassB/vid1.mp4\n"
    )

    train_ds = AVideoDataset(
        ds_name="ucf101", root_dir=str(root), mode="train", fold=1,
        num_frames=4, train_crop_size=32, decode_audio=False,
        path_to_data_dir=str(tmp_path / "meta"),
        annotation_path=str(ann),
    )
    assert len(train_ds) == 2  # vid0 of each class

    test_ds = AVideoDataset(
        ds_name="ucf101", root_dir=str(root), mode="test", fold=1,
        num_frames=4, test_crop_size=32, num_spatial_crops=3,
        num_ensemble_views=2, decode_audio=False,
        path_to_data_dir=str(tmp_path / "meta"),
        annotation_path=str(ann),
    )
    # 2 test videos x (2 views x 3 crops) enumerated clips
    assert len(test_ds) == 2 * 2 * 3
    rng = np.random.default_rng(0)
    ex0 = test_ds.get_example(0, rng)
    ex5 = test_ds.get_example(5, rng)
    assert ex0["video"].shape == (4, 32, 32, 3)
    assert ex0["vid_idx"] == ex5["vid_idx"]  # same video, different view
    ex6 = test_ds.get_example(6, rng)
    assert ex6["vid_idx"] != ex0["vid_idx"]


# ---------------------------------------------------------------------------
# stdlib-WAV audio backend + demuxed sidecars (decoder.decode_audio_wav):
# the tertiary audio fallback for hosts with neither ffmpeg nor PyAV
# (reference hard-depends on ffmpeg, audio_utils.py:89-98 — sidecars are a
# documented capability extension, docs/DEVIATIONS.md)
# ---------------------------------------------------------------------------

SR = 24000


def _write_wav(path, pcm, sr=SR, nch=1, sampwidth=2):
    import wave

    with wave.open(str(path), "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(sampwidth)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def _tone(freq, sr=SR, dur=1.0, amp=8000.0):
    tt = np.arange(int(dur * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * tt)).astype(np.int16)


def test_wav_backend_bit_roundtrip(tmp_path):
    pcm = _tone(440.0)
    p = tmp_path / "tone.wav"
    _write_wav(p, pcm)
    got = dec.decode_audio_wav(str(p), SR)
    assert got is not None and got.dtype == np.int16
    np.testing.assert_array_equal(got, pcm)


def test_wav_backend_stereo_downmix(tmp_path):
    pcm = _tone(440.0)
    stereo = np.stack([pcm, pcm], axis=1).reshape(-1)
    p = tmp_path / "st.wav"
    _write_wav(p, stereo, nch=2)
    got = dec.decode_audio_wav(str(p), SR)
    assert got.shape == pcm.shape
    np.testing.assert_allclose(got, pcm, atol=1)


def test_wav_backend_resamples(tmp_path):
    # file at 48 kHz, requested at 24 kHz: length halves, dominant
    # frequency is preserved
    freq = 880.0
    pcm48 = _tone(freq, sr=48000)
    p = tmp_path / "hi.wav"
    _write_wav(p, pcm48, sr=48000)
    got = dec.decode_audio_wav(str(p), SR)
    assert abs(len(got) - SR) <= 2
    spec = np.abs(np.fft.rfft(got.astype(np.float64)))
    peak_hz = np.argmax(spec) * SR / len(got)
    assert abs(peak_hz - freq) < 5.0


def test_sidecar_dispatch(tmp_path, monkeypatch):
    monkeypatch.setattr(dec, "have_ffmpeg", lambda: False)
    monkeypatch.setattr(dec, "have_pyav", lambda: False)
    pcm = _tone(220.0)
    (tmp_path / "vid0.mp4").write_bytes(b"container-not-read")
    _write_wav(tmp_path / "vid0.wav", pcm)
    got = dec.decode_audio(str(tmp_path / "vid0.mp4"), SR)
    np.testing.assert_array_equal(got, pcm)
    # direct .wav input also decodes; missing sidecar stays None
    got2 = dec.decode_audio(str(tmp_path / "vid0.wav"), SR)
    np.testing.assert_array_equal(got2, pcm)
    (tmp_path / "vid1.mp4").write_bytes(b"x")
    assert dec.decode_audio(str(tmp_path / "vid1.mp4"), SR) is None


def test_dataset_real_media_with_sidecar_audio(media_root, tmp_path):
    import shutil

    root = tmp_path / "root"
    shutil.copytree(media_root, root)
    for cls in ("classA", "classB"):
        for vi in range(2):
            stem = root / "train" / cls / f"vid{vi}"
            _write_wav(stem.with_suffix(".wav"),
                       _tone(330.0, dur=N_FRAMES / FPS))
    ds = _make_dataset(root, tmp_path / "meta", decode_audio=True,
                       num_sec=1, aud_sample_rate=SR, aud_spec_type=1)
    # sidecar .wav files are NOT dataset entries of their own
    assert len(ds) == 4
    ex = ds.get_example(0, np.random.default_rng(11))
    assert ex["video"].shape == (8, 32, 32, 3)
    from selavi_tpu.data.audio import spec_num_frames

    assert ex["audio"].shape == (40, spec_num_frames(1, SR))
    assert np.isfinite(ex["audio"]).all()


def test_make_real_media_generator(tmp_path, monkeypatch):
    """The corpus generator (scripts/make_real_media.py) writes decodable
    mp4+wav pairs that run through the dataset with audio on."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    try:
        import make_real_media
    finally:
        sys.path.pop(0)
    out = tmp_path / "corpus"
    monkeypatch.setattr(
        sys, "argv",
        ["make_real_media.py", "--output", str(out), "--num_videos", "6",
         "--num_classes", "3", "--frame_size", "64", "--duration", "1.5",
         "--aud_sample_rate", str(SR), "--seed", "1"],
    )
    make_real_media.main()
    ds = _make_dataset(out, tmp_path / "meta", ds_name="genmedia",
                       decode_audio=True, num_sec=1,
                       aud_sample_rate=SR, aud_spec_type=1)
    assert len(ds) == 6
    labs = set()
    for i in range(6):
        ex = ds.get_example(i, np.random.default_rng(i))
        assert ex["video"].shape == (8, 32, 32, 3)
        assert np.isfinite(ex["audio"]).all()
        labs.add(ex["label"])
    assert len(labs) >= 2


def test_make_real_media_ucf_layout(tmp_path, monkeypatch):
    """ucf layout: {out}/videos/{class}/*.mp4 + official-format fold files
    in {out}/ucfTrainTestlist, loadable as --dataset ucf101 with the
    DEFAULT annotation path (finetune_video.py chain)."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    try:
        import make_real_media
    finally:
        sys.path.pop(0)
    out = tmp_path / "ucf"
    monkeypatch.setattr(
        sys, "argv",
        ["make_real_media.py", "--output", str(out), "--num_videos", "10",
         "--num_classes", "2", "--frame_size", "64", "--duration", "1.5",
         "--layout", "ucf", "--test_fraction", "0.4", "--seed", "3"],
    )
    make_real_media.main()
    train_lines = (
        out / "ucfTrainTestlist" / "trainlist01.txt"
    ).read_text().strip().splitlines()
    test_lines = (
        out / "ucfTrainTestlist" / "testlist01.txt"
    ).read_text().strip().splitlines()
    assert len(train_lines) + len(test_lines) == 10
    assert all(" " in ln for ln in train_lines)  # "path label" format

    train_ds = AVideoDataset(
        ds_name="ucf101", root_dir=str(out / "videos"), mode="train",
        fold=1, num_frames=4, train_crop_size=32, decode_audio=False,
        path_to_data_dir=str(tmp_path / "meta"),
    )
    test_ds = AVideoDataset(
        ds_name="ucf101", root_dir=str(out / "videos"), mode="test",
        fold=1, num_frames=4, test_crop_size=32, num_spatial_crops=2,
        num_ensemble_views=2, decode_audio=False,
        path_to_data_dir=str(tmp_path / "meta"),
    )
    assert len(train_ds) == len(train_lines)
    assert len(test_ds) == len(test_lines) * 4
    ex = train_ds.get_example(0, np.random.default_rng(0))
    assert ex["video"].shape == (4, 32, 32, 3)


def _import_make_real_media():
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    try:
        import make_real_media
    finally:
        sys.path.pop(0)
    return make_real_media


def test_make_real_media_three_folds(tmp_path, monkeypatch):
    """--folds 3 (default) writes the full official 3-fold protocol
    (reference README.md:36): each video tests in exactly ONE fold, every
    fold's train+test partitions the corpus, and folds 2/3 load through
    the dataset exactly like fold 1."""
    import sys

    make_real_media = _import_make_real_media()
    out = tmp_path / "ucf3"
    monkeypatch.setattr(
        sys, "argv",
        ["make_real_media.py", "--output", str(out), "--num_videos", "12",
         "--num_classes", "2", "--frame_size", "64", "--duration", "1.5",
         "--layout", "ucf", "--seed", "3"],
    )
    make_real_media.main()
    ann = out / "ucfTrainTestlist"
    all_tests = []
    for f in (1, 2, 3):
        train = (ann / f"trainlist{f:02d}.txt").read_text().splitlines()
        test = (ann / f"testlist{f:02d}.txt").read_text().splitlines()
        train = [ln for ln in train if ln.strip()]
        test = [ln for ln in test if ln.strip()]
        assert len(train) + len(test) == 12
        assert all(" " in ln for ln in train)
        assert all(" " not in ln for ln in test)
        # per-fold train/test are disjoint over paths
        assert not {ln.split(" ")[0] for ln in train} & set(test)
        all_tests.extend(test)
    # the 3 test lists partition the corpus: every video tests exactly once
    assert len(all_tests) == 12 and len(set(all_tests)) == 12

    for f in (2, 3):
        ds = AVideoDataset(
            ds_name="ucf101", root_dir=str(out / "videos"), mode="train",
            fold=f, num_frames=4, train_crop_size=32, decode_audio=False,
            path_to_data_dir=str(tmp_path / f"meta{f}"),
        )
        n_test = len([ln for ln in (
            ann / f"testlist{f:02d}.txt").read_text().splitlines()
            if ln.strip()])
        assert len(ds) == 12 - n_test


def test_make_real_media_hmdb_layout(tmp_path, monkeypatch):
    """hmdb layout: per-class *_test_split{f}.txt files (tag 1=train
    2=test) in {out}/splits, loadable as --dataset hmdb51 with the
    DEFAULT annotation path (dataset.py::select_fold_hmdb51)."""
    import sys

    make_real_media = _import_make_real_media()
    out = tmp_path / "hmdb"
    monkeypatch.setattr(
        sys, "argv",
        ["make_real_media.py", "--output", str(out), "--num_videos", "12",
         "--num_classes", "2", "--frame_size", "64", "--duration", "1.5",
         "--layout", "hmdb", "--seed", "5"],
    )
    make_real_media.main()
    splits = sorted((out / "splits").glob("*_test_split*.txt"))
    assert len(splits) == 2 * 3  # per class per fold
    seen_test = 0
    for f in (1, 2, 3):
        train_ds = AVideoDataset(
            ds_name="hmdb51", root_dir=str(out / "videos"), mode="train",
            fold=f, num_frames=4, train_crop_size=32, decode_audio=False,
            path_to_data_dir=str(tmp_path / f"meta{f}"),
        )
        test_ds = AVideoDataset(
            ds_name="hmdb51", root_dir=str(out / "videos"), mode="test",
            fold=f, num_frames=4, test_crop_size=32, num_spatial_crops=1,
            num_ensemble_views=1, decode_audio=False,
            path_to_data_dir=str(tmp_path / f"meta{f}t"),
        )
        assert len(train_ds) + len(test_ds) == 12
        seen_test += len(test_ds)
        ex = train_ds.get_example(0, np.random.default_rng(0))
        assert ex["video"].shape == (4, 32, 32, 3)
    assert seen_test == 12  # each video tests in exactly one fold


def test_make_real_media_rejects_bad_folds(tmp_path, monkeypatch):
    """--folds < 1 is an argparse error (ADVICE r4): a ucf/hmdb corpus
    without fold lists would fail the finetune chain much later with a
    confusing empty-dataset error."""
    import sys

    make_real_media = _import_make_real_media()
    monkeypatch.setattr(
        sys, "argv",
        ["make_real_media.py", "--output", str(tmp_path / "x"),
         "--num_videos", "4", "--layout", "ucf", "--folds", "0"],
    )
    with pytest.raises(SystemExit):
        make_real_media.main()
    assert not (tmp_path / "x").exists()  # rejected before any encoding


def test_make_real_media_folds_are_stratified(tmp_path, monkeypatch):
    """Fold groups are assigned per class by shuffled round-robin
    (ADVICE r4): every class with >= folds videos appears in BOTH train
    and test of every fold, like HMDB's per-class balanced splits."""
    import sys

    make_real_media = _import_make_real_media()
    out = tmp_path / "strat"
    monkeypatch.setattr(
        sys, "argv",
        ["make_real_media.py", "--output", str(out), "--num_videos", "12",
         "--num_classes", "2", "--frame_size", "48", "--duration", "1.0",
         "--layout", "ucf", "--seed", "7"],
    )
    make_real_media.main()
    ann = out / "ucfTrainTestlist"
    classes = {f"class{c:03d}" for c in (0, 1)}
    for f in (1, 2, 3):
        train = [ln for ln in (
            ann / f"trainlist{f:02d}.txt").read_text().splitlines()
            if ln.strip()]
        test = [ln for ln in (
            ann / f"testlist{f:02d}.txt").read_text().splitlines()
            if ln.strip()]
        train_cls = {ln.split("/")[0] for ln in train}
        test_cls = {ln.split("/")[0] for ln in test}
        assert train_cls == classes, f"fold {f} train missing a class"
        assert test_cls == classes, f"fold {f} test missing a class"
