"""Real-checkpoint validation gate: runs only when weights exist on disk.

No SD-1.4 / CLIP weights ship in this image (zero egress), so the whole
semantic chain is otherwise pinned synthetically (converter round-trips,
CLIP-vs-torch parity, reference-golden controller tests). The moment real
weights are available these tests make the end-to-end claim one command away:

    FZ_WEIGHTS=/path/to/sd-1.4 python -m pytest tests/test_real_weights.py -v

where the directory is the diffusers save_pretrained layout the reference
downloads (ckpt/download.sh:1-9: tokenizer/ text_encoder/ vae/ unet/
scheduler/). Optionally FZ_CLIP_WEIGHTS=/path/to/clip-vit-base-patch32 for
the quantitative CLIP metrics with the real evaluator tower.

The reconstruction gate is the reference's own de-facto correctness check:
the first editing prompt equals the source prompt, so a correct framework
reproduces the input video (config/teaser/jeep_watercolor.yaml:22-24,
docs/EditingGuidance.md:32-34, reference test_fatezero.py:194-222).
"""
import os

import numpy as np
import pytest

WEIGHTS = os.environ.get("FZ_WEIGHTS")
CLIP_WEIGHTS = os.environ.get("FZ_CLIP_WEIGHTS")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not (WEIGHTS and os.path.isdir(WEIGHTS)),
        reason="FZ_WEIGHTS not set / not a directory (no SD-1.4 weights in this image)",
    ),
]

CAR_TURN = "/root/reference/data/teaser_car-turn"
SOURCE_PROMPT = "a silver jeep driving down a curvy road in the countryside"
EDIT_PROMPT = (
    "watercolor painting of a silver jeep driving down a curvy road in the countryside"
)
STEPS = int(os.environ.get("FZ_REAL_STEPS", "50"))
FRAMES = int(os.environ.get("FZ_REAL_FRAMES", "8"))
SIZE = int(os.environ.get("FZ_REAL_SIZE", "512"))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB over [0, 1] videos."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


@pytest.fixture(scope="module")
def video():
    from fatezero_tpu.data.dataset import ImageSequenceDataset

    ds = ImageSequenceDataset(
        path=CAR_TURN,
        prompt=SOURCE_PROMPT,
        n_sample_frame=FRAMES,
        sampling_rate=1,
        image_size=SIZE,
    )
    return np.asarray(ds[0]["images"])  # [f, h, w, 3] in [-1, 1]


@pytest.fixture(scope="module")
def pipe():
    import jax
    import jax.numpy as jnp

    from fatezero_tpu.models.loader import load_models
    from fatezero_tpu.pipelines.fatezero_pipeline import FateZeroPipeline

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    # the teaser model config (config/teaser/jeep_watercolor.yaml)
    bundle = load_models(
        WEIGHTS,
        {"SparseCausalAttention_index": ["mid"], "least_sc_channel": 640},
        dtype=dtype,
        seed=0,
    )
    return FateZeroPipeline(
        bundle.unet,
        bundle.unet_params,
        bundle.vae,
        bundle.vae_params,
        bundle.text_encoder,
        bundle.text_params,
        bundle.tokenizer,
        schedule=bundle.schedule,
    )


@pytest.fixture(scope="module")
def trajectory(pipe, video):
    emb_src = pipe.encode_prompt(SOURCE_PROMPT)
    latents = pipe.encode_video(video)
    traj = pipe.invert_fast(latents, emb_src, STEPS)
    traj.block_until_ready()
    return traj, emb_src


def test_vae_roundtrip_psnr(pipe, video):
    """encode->decode alone must be near-lossless (>= ~30 dB for SD's VAE)."""
    latents = pipe.encode_video(video)
    recon = pipe.decode_latents(latents)
    val = psnr(recon, np.asarray(video) / 2 + 0.5)
    assert val >= 28.0, f"VAE round-trip PSNR {val:.2f} dB < 28"


def test_reconstruction_psnr(pipe, video, trajectory):
    """Invert with the source prompt, re-denoise with the same prompt: the
    output must reconstruct the input video (prompt-0 pattern)."""
    import jax.numpy as jnp

    traj, emb_src = trajectory
    latent = pipe.sample(
        jnp.asarray(traj[-1]),
        emb_src,
        num_inference_steps=STEPS,
        guidance_scale=7.5,
    )
    recon = pipe.decode_latents(latent)
    val = psnr(recon, np.asarray(video) / 2 + 0.5)
    assert val >= 25.0, f"DDIM reconstruction PSNR {val:.2f} dB < 25"


def test_style_edit(pipe, video, trajectory, tmp_path_factory):
    """One watercolor style edit through the fused controller path; output
    finite and visibly different from the source (it IS an edit)."""
    from fatezero_tpu.ptp.controller import make_controller

    traj, emb_src = trajectory
    emb_tgt = pipe.encode_prompt(EDIT_PROMPT)
    controller = make_controller(
        pipe.tokenizer,
        [SOURCE_PROMPT, EDIT_PROMPT],
        num_steps=STEPS,
        is_replace_controller=False,
        cross_replace_steps=0.8,
        self_replace_steps=0.8,
        eq_params={"words": ["watercolor"], "values": [10]},
    )
    latent, _ = pipe.edit_fast(
        traj, emb_src, emb_tgt, controller, num_inference_steps=STEPS
    )
    edited = pipe.decode_latents(latent)
    assert np.isfinite(edited).all()
    assert edited.shape[0] == FRAMES
    out = tmp_path_factory.mktemp("real_edit")
    from fatezero_tpu.common.image_util import save_gif_mp4_folder_type

    save_gif_mp4_folder_type(edited, os.path.join(str(out), "edit.gif"))
    # stash for the CLIP metric test
    test_style_edit.edited = edited


def test_clip_metrics(video):
    """Frame-Acc / Tem-Con with the real ViT-B/32 evaluator on the edit."""
    if not (CLIP_WEIGHTS and os.path.isdir(CLIP_WEIGHTS)):
        pytest.skip("FZ_CLIP_WEIGHTS not set (no CLIP ViT-B/32 weights)")
    edited = getattr(test_style_edit, "edited", None)
    if edited is None:
        pytest.skip("style edit did not run")
    from fatezero_tpu.eval.clip_metrics import load_evaluator

    ev = load_evaluator(CLIP_WEIGHTS)
    acc = ev.frame_accuracy(edited, SOURCE_PROMPT, EDIT_PROMPT)
    con = ev.temporal_consistency(edited)
    # the paper's teaser edits land near-1.0 Frame-Acc and >0.9 Tem-Con;
    # gate loosely — this is a sanity floor, not a benchmark claim
    assert acc >= 0.5, f"Frame-Acc {acc:.3f} < 0.5"
    assert con >= 0.8, f"Tem-Con {con:.3f} < 0.8"
