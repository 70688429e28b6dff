"""CLIP eval metrics mechanics + torch->flax converter parity.

Parity tests follow the reference's own pattern (CLIP/tests/test_consistency.py:
same inputs through two implementations, allclose): a randomly initialized HF
torch CLIP is converted with convert_clip_*_state and must reproduce the torch
activations through the Flax towers.
"""
import numpy as np
import pytest

import jax.numpy as jnp


def test_metrics_mechanics(tmp_path):
    from fatezero_tpu.eval.clip_metrics import load_evaluator

    # no checkpoint -> a loud random-weights warning, and the evaluator
    # carries the flag into every report (no silent plausible-looking values)
    with pytest.warns(UserWarning, match="RANDOM weights"):
        ev = load_evaluator(None, seed=0)
    assert ev.random_weights
    rng = np.random.RandomState(0)
    frame = rng.rand(1, 64, 64, 3).astype(np.float32)
    static = np.repeat(frame, 4, axis=0)
    # identical frames => adjacent cosine similarity exactly 1
    assert ev.temporal_consistency(static) == pytest.approx(1.0, abs=1e-5)
    acc = ev.frame_accuracy(static, "a cat", "a dog")
    assert 0.0 <= acc <= 1.0

    # folder_success drives the file path
    from PIL import Image

    d = tmp_path / "frames"
    d.mkdir()
    for i in range(3):
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(
            d / f"{i:05d}.png"
        )
    acc, con = ev.folder_success(str(d), "a cat", "a dog")
    assert 0.0 <= acc <= 1.0 and -1.0 <= con <= 1.0


def test_evaluate_cli_reference_schema(tmp_path, capsys):
    """cli/evaluate.run must consume the shipped bench_clean_prompt.yaml
    (the reference's {name: {path, source, target}} schema,
    CLIP/frame_acc_tem_con.py:63-76) against a results tree keyed by name."""
    import os

    from PIL import Image

    from fatezero_tpu.cli import evaluate

    rng = np.random.RandomState(0)
    for name in ("swan_cartoon", "car_watercolor"):
        d = tmp_path / name
        d.mkdir()
        for i in range(3):
            Image.fromarray((rng.rand(48, 48, 3) * 255).astype(np.uint8)).save(
                d / f"{i:05d}.png"
            )
    bench = os.path.join(
        os.path.dirname(__file__), os.pardir, "config", "bench_clean_prompt.yaml"
    )
    with pytest.warns(UserWarning):  # random CLIP + missing folders, loudly
        out = evaluate.run(bench, results_root=str(tmp_path))
    assert out["n"] == 2
    assert set(out["per_item"]) == {"swan_cartoon", "car_watercolor"}
    assert np.isfinite(out["frame_acc"]) and np.isfinite(out["tem_con"])
    # the other bench entries have no result folders: reported, not hidden
    assert out["missing"] and "swan_cartoon" not in out["missing"]
    assert out["random_weights"] is True


def test_normalize_bench_both_schemas():
    from fatezero_tpu.cli.evaluate import normalize_bench

    items = normalize_bench(
        {"items": [{"folder": "a", "source_prompt": "s", "target_prompt": "t"}]}
    )
    assert items[0]["folder"] == "a"
    items = normalize_bench(
        {
            "results_root": "r",
            "vid": {"path": "x", "source": "s", "target": "t,"},
        }
    )
    assert items == [
        {"folder": "vid", "source_prompt": "s", "target_prompt": "t,"}
    ]
    with pytest.raises(ValueError):
        normalize_bench({"results_root": "r"})


@pytest.fixture(scope="module")
def hf_clip():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    cfg = transformers.CLIPConfig(
        text_config_dict=dict(
            vocab_size=100, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=77,
            # real CLIP pools at the EOT token = highest id; our flax model
            # uses the argmax convention, so make HF agree for the tiny vocab
            eos_token_id=99,
        ),
        vision_config_dict=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=16,
        ),
        projection_dim=16,
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg).eval()
    return model, cfg


def test_clip_full_parity(hf_clip):
    import torch

    from fatezero_tpu.convert.torch_to_flax import convert_clip_full_state
    from fatezero_tpu.models.clip import (
        CLIPModel,
        CLIPTextConfig,
        CLIPVisionConfig,
    )

    hf, cfg = hf_clip
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    flax_model = CLIPModel(
        text_cfg=CLIPTextConfig(
            vocab_size=100, hidden_size=32, intermediate_size=64, num_layers=2,
            num_heads=2, projection_dim=16,
        ),
        vision_cfg=CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_layers=2, num_heads=2,
            image_size=32, patch_size=16, projection_dim=16,
        ),
    )
    params = {"params": convert_clip_full_state(state)}

    rng = np.random.RandomState(1)
    pixels = rng.rand(2, 32, 32, 3).astype(np.float32)
    ids = np.array([[5, 17, 99, 3, 0, 0], [8, 2, 99, 0, 0, 0]], np.int32)

    with torch.no_grad():
        out = hf(
            input_ids=torch.tensor(ids, dtype=torch.long),
            pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2)),
        )
    logits_torch = out.logits_per_image.numpy()

    logits_flax = np.asarray(flax_model.apply(params, jnp.asarray(pixels), jnp.asarray(ids)))
    np.testing.assert_allclose(logits_flax, logits_torch, atol=2e-4, rtol=2e-4)
