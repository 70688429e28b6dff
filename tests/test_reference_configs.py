"""Schema compatibility: every reference workload YAML parses and wires.

The YAML schema is API (SURVEY.md §2.4). This sweeps all config files of the
reference repo through our config loader, resolves their interpolations, and
builds the edit controller for every p2p_config block — no model compute.
"""
import glob
import os

import pytest

from fatezero_tpu.common.config import load_config
from fatezero_tpu.models.tokenizer import StubTokenizer
from fatezero_tpu.ptp.controller import make_controller

REF_CONFIGS = sorted(glob.glob("/root/reference/config/**/*.yaml", recursive=True))


@pytest.mark.skipif(not REF_CONFIGS, reason="reference configs not mounted")
@pytest.mark.parametrize("path", REF_CONFIGS, ids=lambda p: os.path.relpath(p, "/root/reference/config"))
def test_reference_config_parses_and_wires(path):
    cfg = load_config(path).to_dict()
    assert "pretrained_model_path" in cfg

    ds = cfg.get("dataset_config", {})
    editing = cfg.get("editing_config", {})
    tok = StubTokenizer()

    # interpolations like ${..dataset_config.n_sample_frame} must resolve
    clip_len = editing.get("clip_length")
    if clip_len is not None:
        assert isinstance(clip_len, int), f"unresolved interpolation: {clip_len!r}"

    prompts = editing.get("editing_prompts", [])
    source = editing.get("source_prompt", ds.get("prompt", ""))
    steps = int(editing.get("num_inference_steps", 50))
    p2p = editing.get("p2p_config", {}) or {}
    for idx, prompt in enumerate(prompts):
        block = dict(p2p.get(idx, p2p.get(str(idx), {})) or {})
        cross = block.get("cross_replace_steps", 0.8)
        if isinstance(cross, dict) and set(cross) == {"default_"}:
            cross = cross["default_"]
        ctrl = make_controller(
            tok,
            [source, str(prompt)],
            num_steps=steps,
            is_replace_controller=block.get("is_replace_controller", True),
            cross_replace_steps=cross,
            self_replace_steps=block.get("self_replace_steps", 0.0),
            blend_words=block.get("blend_words"),
            eq_params=block.get("eq_params"),
            blend_th=block.get("blend_th", (0.3, 0.3)),
            blend_latents=block.get("blend_latents", False),
            blend_self_attention=block.get("blend_self_attention", False),
            use_inversion_attention=block.get("use_inversion_attention", True),
        )
        assert ctrl.cross_edit_kind in ("replace", "refine")
        assert ctrl.alpha_time_words.shape[0] == steps + 1

    # model_config keys must map onto UNet3DConfig
    from fatezero_tpu.models.loader import _unet_cfg_overrides
    from fatezero_tpu.models.unet3d import UNet3DConfig

    mc = cfg.get("model_config", {}) or {}
    overrides = _unet_cfg_overrides(mc)
    UNet3DConfig(**overrides)  # must construct
