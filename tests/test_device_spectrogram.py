"""Device-spectrogram path: PCM batches produce the same model inputs as
host-computed spectrograms, and the Trainer runs end-to-end with
--device_spectrogram."""

import jax
import jax.numpy as jnp
import numpy as np

from selavi_tpu.config import parse_arguments
from selavi_tpu.data.loader import DataLoader
from selavi_tpu.data.synthetic import SyntheticAVDataset
from selavi_tpu.train.step import prepare_audio


def test_prepare_audio_pcm_matches_host_spec():
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal((3, 24000)) * 8000).astype(np.float32)
    from selavi_tpu.data.audio import logfbank

    out = np.asarray(
        prepare_audio(
            jnp.asarray(pcm), jnp.float32,
            {"samplerate": 24000, "nfilt": 40, "z_normalize": False},
        )
    )
    assert out.shape == (3, 40, 99, 1)
    host = logfbank(pcm[0].astype(np.float64), 24000, nfilt=40).T
    np.testing.assert_allclose(out[0, :, :, 0], host, rtol=2e-3, atol=2e-3)
    # spec input passes through unchanged
    spec = jnp.zeros((2, 40, 99, 1))
    assert prepare_audio(spec, jnp.float32).shape == (2, 40, 99, 1)


def test_loader_collates_pcm():
    ds = SyntheticAVDataset(
        num_samples=8, num_frames=2, crop_size=16, aud_sample_rate=16000,
        return_pcm=True,
    )
    batch = next(iter(DataLoader(ds, batch_size=4, shuffle=False)))
    assert "audio_pcm" in batch and "audio" not in batch
    assert batch["audio_pcm"].shape == (4, 16000)
    assert batch["audio_pcm"].dtype == np.float32


def test_trainer_runs_with_device_spectrogram(tmp_path):
    argv = [
        "--ds_name", "synthetic", "--num_data_samples", "16",
        "--num_frames", "2", "--train_crop_size", "32",
        "--aud_sample_rate", "16000", "--aud_spec_type", "1",
        "--epochs", "1", "--batch_size", "1", "--nopts", "1",
        "--headcount", "1", "--mlp_dim", "4", "--match", "false",
        "--workers", "0", "--compute_dtype", "float32",
        "--bn_warmup_batches", "1", "--device_spectrogram", "true",
        "--dump_path", str(tmp_path),
    ]
    args = parse_arguments().parse_args(argv)
    dataset = SyntheticAVDataset(
        num_samples=16, num_classes=2, num_frames=2, crop_size=32,
        aud_sample_rate=16000, return_pcm=True,
    )
    from selavi_tpu.train.loop import Trainer

    trainer = Trainer(args, dataset)
    history = trainer.fit()
    losses = [h["loss"] for h in history if "loss" in h]
    assert losses and np.isfinite(losses).all()
    assert trainer.sl_state.sk_counter >= 1


def test_slice_clip_pcm_matches_get_spec_window():
    """slice_clip_pcm + device spectrogram == get_spec for the same clip."""
    from selavi_tpu.data.audio import get_spec, slice_clip_pcm

    rng = np.random.default_rng(3)
    wav = (rng.standard_normal(3 * 16000) * 8000).astype(np.float64)
    fr_sec = 1.25
    clip = slice_clip_pcm(wav, fr_sec, num_sec=1, sample_rate=16000)
    assert clip.shape == (16000,)
    spec_host = get_spec(wav, fr_sec, num_sec=1, sample_rate=16000,
                         aud_spec_type=1)
    spec_dev = np.asarray(
        prepare_audio(
            jnp.asarray(clip[None]), jnp.float32,
            {"samplerate": 16000, "nfilt": 40},
        )
    )[0, :, :, 0]
    np.testing.assert_allclose(spec_dev, spec_host[0], rtol=3e-3, atol=3e-3)
    # end-of-file clamping matches get_spec
    clip_end = slice_clip_pcm(wav, 10.0, num_sec=1, sample_rate=16000)
    np.testing.assert_allclose(clip_end, wav[-16000:].astype(np.float32))


def test_prepare_audio_dual_pcm_two_channel_spec():
    """dual_data PCM [B,2,S] -> [B,F,T,2], channels matching per-clip
    single-spec computation (reference stacks dual specs on the channel
    axis, AVideoDataset.py:451)."""
    rng = np.random.default_rng(3)
    pcm = (rng.standard_normal((2, 2, 16000)) * 8000).astype(np.float32)
    cfg = {"samplerate": 16000, "nfilt": 40, "z_normalize": False}
    dual = np.asarray(prepare_audio(jnp.asarray(pcm), jnp.float32, cfg))
    assert dual.shape[0] == 2 and dual.shape[-1] == 2
    for c in range(2):
        single = np.asarray(
            prepare_audio(jnp.asarray(pcm[:, c]), jnp.float32, cfg)
        )
        np.testing.assert_allclose(
            dual[..., c], single[..., 0], rtol=1e-5, atol=1e-5
        )
