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
    prompt_gifs = [f for f in files if f.endswith(".gif") and f[0].isdigit()]
    assert len(prompt_gifs) == 2
    # frame folders hold one png per frame at source resolution
    frame_dir = os.path.join(logdir, prompt_gifs[0][:-4])
    frames = sorted(os.listdir(frame_dir))
    assert len(frames) == 4
    img = Image.open(os.path.join(frame_dir, frames[0]))
    assert img.size == (64, 64)
