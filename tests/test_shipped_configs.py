"""The shipped workload recipe book (config/**) parses, wires, and runs.

Layer 1 (always): every shipped YAML parses through our loader and builds its
controllers — mirrors test_reference_configs.py but on the repo's own files,
so the recipe book can never rot.

Layer 2 (e2e): editing/tuning configs run end-to-end under tiny random
weights with the car-turn frames (the only clip shipped with the reference),
2 frames x 2 steps. A representative config per workload family runs by
default; set FZ_ALL_CONFIGS=1 to sweep all of them.
"""
import glob
import os

import pytest

from fatezero_tpu.common.config import load_config

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_DIR = os.path.join(HERE, "config")
WORKLOADS = sorted(
    p
    for p in glob.glob(os.path.join(CONFIG_DIR, "**", "*.yaml"), recursive=True)
    if os.path.relpath(p, CONFIG_DIR).count(os.sep)  # family subdirs only
)
CAR_TURN = "/root/reference/data/teaser_car-turn"

REPRESENTATIVE = {
    "teaser/jeep_watercolor.yaml",          # style + reconstruction + eq_params
    "teaser/jeep_posche_local_latent_blend.yaml",  # local blend workload
    "style/lily_monet.yaml",                # style family
    "attribute/bear_tiger_lion_leopard.yaml",  # attribute family, multi-prompt
    "shape/jeep_posche.yaml",               # shape (tuned-ckpt) family
    "low_resource_teaser/jeep_watercolor_ddim_10_steps_disk_store.yaml",  # disk store
    "tune/jeep.yaml",                       # tuning workload (strength 0.99)
}


def _rel(p):
    return os.path.relpath(p, CONFIG_DIR)


def test_recipe_book_complete():
    """All 27 reference workload YAMLs + the 9-clip bench file are shipped."""
    fams = {}
    for p in WORKLOADS:
        fams.setdefault(_rel(p).split(os.sep)[0], []).append(p)
    assert len(fams.get("teaser", [])) == 3
    assert len(fams.get("style", [])) == 7
    assert len(fams.get("attribute", [])) == 9
    assert len(fams.get("shape", [])) == 3
    assert len(fams.get("tune", [])) == 3
    assert len(fams.get("low_resource_teaser", [])) == 2
    assert os.path.exists(os.path.join(CONFIG_DIR, "bench_clean_prompt.yaml"))


@pytest.mark.parametrize("path", WORKLOADS, ids=_rel)
def test_shipped_config_parses_and_wires(path):
    from fatezero_tpu.models.loader import _unet_cfg_overrides
    from fatezero_tpu.models.tokenizer import StubTokenizer
    from fatezero_tpu.models.unet3d import UNet3DConfig
    from fatezero_tpu.ptp.controller import make_controller

    cfg = load_config(path).to_dict()
    assert "pretrained_model_path" in cfg
    tgt = (cfg.get("test_pipeline_config") or {}).get("target", "")
    assert "video_diffusion" not in tgt
    editing = cfg.get("editing_config", {}) or {}
    ds = cfg.get("dataset_config", {})
    clip_len = editing.get("clip_length")
    if clip_len is not None:
        assert isinstance(clip_len, int), f"unresolved interpolation: {clip_len!r}"
    source = editing.get("source_prompt", ds.get("prompt", ""))
    steps = int(editing.get("num_inference_steps", 50))
    p2p = editing.get("p2p_config", {}) or {}
    for idx, prompt in enumerate(editing.get("editing_prompts", [])):
        block = dict(p2p.get(idx, p2p.get(str(idx), {})) or {})
        cross = block.get("cross_replace_steps", 0.8)
        if isinstance(cross, dict) and set(cross) == {"default_"}:
            cross = cross["default_"]
        ctrl = make_controller(
            StubTokenizer(),
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
        assert ctrl.alpha_time_words.shape[0] == steps + 1
    UNet3DConfig(**_unet_cfg_overrides(cfg.get("model_config", {}) or {}))


E2E = [
    p
    for p in WORKLOADS
    if os.environ.get("FZ_ALL_CONFIGS") or _rel(p) in REPRESENTATIVE
]


@pytest.mark.skipif(not os.path.isdir(CAR_TURN), reason="car-turn frames not mounted")
@pytest.mark.parametrize("path", E2E, ids=_rel)
def test_shipped_config_runs_e2e(path, tmp_path):
    """Each workload runs through its real entry point under tiny random
    weights: 2 frames, 2 DDIM steps, car-turn pixels, full artifact layout."""
    d = load_config(path).to_dict()
    d["config"] = path
    d["pretrained_model_path"] = "random:tiny"
    d["logdir"] = str(tmp_path / "run")
    d["dataset_config"] = dict(d.get("dataset_config") or {})
    d["dataset_config"].update(
        {"path": CAR_TURN, "n_sample_frame": 2, "sampling_rate": 1, "start_sample_frame": 0}
    )
    is_tune = _rel(path).startswith("tune/")
    if not is_tune:
        ed = dict(d.get("editing_config") or {})
        ed["num_inference_steps"] = 2
        ed["clip_length"] = 2
        ed["editing_prompts"] = list(ed.get("editing_prompts", []))[:2]
        d["editing_config"] = ed
        from fatezero_tpu.cli.edit import test as run_edit

        logdir, videos = run_edit(**d)
        assert videos and all(v.shape[0] == 2 for v in videos)
        assert os.path.exists(os.path.join(logdir, "config.yml"))
        assert os.path.exists(os.path.join(logdir, "log.log"))
    else:
        d["dataset_config"].pop("class_data_root", None)  # no class images shipped
        d.update(train_steps=1, validation_steps=0, checkpointing_steps=1)
        ed = dict(d.get("editing_config") or {})
        ed["num_inference_steps"] = 2
        d["editing_config"] = ed
        from fatezero_tpu.cli.train import train as run_train

        logdir, state = run_train(**d)
        assert state["step"] == 1
        assert os.path.isdir(os.path.join(logdir, "checkpoint_1"))
