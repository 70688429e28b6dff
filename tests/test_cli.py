"""End-to-end CLI test: reference YAML schema -> full edit run -> artifacts.

The de-facto correctness check of the reference is the reconstruction config
pattern (first editing prompt == source prompt, SURVEY.md §4); here the gate
is mechanical (artifact layout + finite outputs) since weights are random.
"""
import os

import numpy as np
import pytest
from PIL import Image

from fatezero_tpu.cli.edit import run

CONFIG = os.path.join(os.path.dirname(__file__), os.pardir, "config", "demo_tiny.yaml")


class MarkerPipeline:
    """Target for the instantiate_from_config test: records construction."""

    instantiated_with = None

    def __init__(self, **kwargs):
        type(self).instantiated_with = kwargs
        raise _MarkerStop()


class _MarkerStop(Exception):
    pass


def test_generation_mode_guard():
    """use_invertion_latents: false + use_inversion_attention: true is a
    config error, not a silent clean-latent replay (cli/edit.py guard)."""
    from fatezero_tpu.cli.edit import test as edit_test

    with pytest.raises(ValueError, match="use_inversion_attention"):
        edit_test(
            config="x.yaml",
            editing_config={
                "use_invertion_latents": False,
                "use_inversion_attention": True,
            },
        )


def test_pipeline_config_target_is_honored(tmp_path, monkeypatch):
    """`test_pipeline_config.target` selects the pipeline class via
    instantiate_from_config (reference test_fatezero.py:106-117)."""
    monkeypatch.chdir(tmp_path)
    from fatezero_tpu.cli.edit import test as edit_test

    with pytest.raises(_MarkerStop):
        edit_test(
            config="x.yaml",
            pretrained_model_path="random:tiny",
            dataset_config={
                "path": "/root/reference/data/teaser_car-turn",
                "prompt": "a jeep",
                "n_sample_frame": 2,
                "sampling_rate": 2,
                "image_size": 64,
            },
            editing_config={"num_inference_steps": 2},
            test_pipeline_config={"target": "test_cli.MarkerPipeline"},
        )
    kw = MarkerPipeline.instantiated_with
    assert kw is not None and "unet" in kw and "unet_params" in kw


class MarkerTrainer:
    """Target for the trainer-side instantiate_from_config test."""

    instantiated_with = None

    def __init__(self, **kwargs):
        type(self).instantiated_with = kwargs
        raise _MarkerStop()


def test_trainer_pipeline_config_target_is_honored(tmp_path, monkeypatch):
    """`trainer_pipeline_config.target` selects the trainer class via
    instantiate_from_config (reference train_tune_a_video.py:277-278)."""
    monkeypatch.chdir(tmp_path)
    from fatezero_tpu.cli.train import train as tune_train

    with pytest.raises(_MarkerStop):
        tune_train(
            config="x.yaml",
            pretrained_model_path="random:tiny",
            dataset_config={
                "path": "/root/reference/data/teaser_car-turn",
                "prompt": "a jeep",
                "n_sample_frame": 2,
                "sampling_rate": 2,
                "image_size": 64,
            },
            train_steps=1,
            trainer_pipeline_config={"target": "test_cli.MarkerTrainer"},
        )
    kw = MarkerTrainer.instantiated_with
    assert kw is not None and "unet" in kw and "schedule" in kw


@pytest.mark.slow
def test_cli_sharded_matches_single_device(tmp_path, monkeypatch):
    """The user-reachable sharding path: the same config run through the real
    CLI over the 8-device virtual mesh (--mesh 1,4,2: frame-axis sequence
    parallelism + tensor parallelism) must produce the single-device
    artifacts. Replaces the reference's `accelerate launch` scaffolding
    (test_fatezero.py:69-72)."""
    monkeypatch.chdir(tmp_path)
    _, videos_ref = run(CONFIG)
    _, videos_sh = run(CONFIG, mesh="1,4,2")
    assert len(videos_sh) == len(videos_ref)
    for a, b in zip(videos_ref, videos_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


@pytest.mark.slow
def test_cli_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    logdir, videos = run(CONFIG)
    assert len(videos) == 2  # reconstruction + watercolor edit
    for v in videos:
        assert np.isfinite(v).all()
    files = os.listdir(logdir)
    assert "input.gif" in files
    assert "grid.gif" in files
    assert "config.yml" in files
    # reference artifact naming (p2p_validation_loop.py:148-166): per-prompt
    # step_{step}_{idx}_{seed}.gif + atten sibling, grid step_{step}.gif +
    # vertically-stacked attention grid step_{step}atten.gif
    prompt_gifs = sorted(
        f for f in files
        if f.endswith(".gif") and f.startswith("step_0_") and "atten" not in f
    )
    assert prompt_gifs == ["step_0_0_0.gif", "step_0_1_0.gif"]
    atten_gifs = [f for f in files if f.endswith("atten.gif")]
    assert "step_0_0_0atten.gif" in atten_gifs
    assert "step_0atten.gif" in atten_gifs
    assert "step_0.gif" in files
    # frame folders hold one png per frame at source resolution
    frame_dir = os.path.join(logdir, prompt_gifs[0][:-4])
    frames = sorted(os.listdir(frame_dir))
    assert len(frames) == 4
    img = Image.open(os.path.join(frame_dir, frames[0]))
    assert img.size == (64, 64)
    # the fused default path writes the reference's per-step blend-mask PNGs
    # (spatial_blend.py:43-55): prompt 1 has blend_words + both blends on
    for mask_dir in ("latent_blend_mask", "attention_blend_mask"):
        d = os.path.join(logdir, "prompt_1", mask_dir)
        pngs = [f for f in os.listdir(d) if f.endswith(".png")]
        # one PNG per (step, frame): 4 steps x 4 frames
        assert len(pngs) == 16, (d, pngs)
        m = np.asarray(Image.open(os.path.join(d, sorted(pngs)[0])))
        assert m.ndim == 2 and set(np.unique(m)) <= {0, 255}


@pytest.mark.slow
def test_payload_budget_gate_forces_replay(tmp_path, monkeypatch):
    """FZ_PAYLOAD_BUDGET_GB below the predicted payload must proactively
    route the run through replay rematerialization (no capture attempt) and
    still produce finite artifacts (cli/edit.py payload gate)."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("FZ_PAYLOAD_BUDGET_GB", "0")
    logdir, videos = run(CONFIG)
    assert all(np.isfinite(v).all() for v in videos)
    with open(os.path.join(logdir, "log.log")) as fh:
        assert "replay rematerialization" in fh.read()
