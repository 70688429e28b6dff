"""Verification drive: full FateZero edit flow through the package boundary.

Real car-turn frames -> tiny random-weight SD architecture -> DDIM inversion
with attention capture -> prompt-to-prompt swap edit (replace + self swap +
blends) -> VAE decode -> gif/mp4/frames on disk. Runs on whatever platform
jax picks (TPU under axon).
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()
print("devices:", jax.devices())

from fatezero_tpu.data.dataset import ImageSequenceDataset
from fatezero_tpu.models.unet3d import UNet3DConfig, UNetPseudo3DConditionModel
from fatezero_tpu.models.vae import AutoencoderKL, VAEConfig
from fatezero_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from fatezero_tpu.models.tokenizer import StubTokenizer
from fatezero_tpu.pipelines.fatezero_pipeline import FateZeroPipeline
from fatezero_tpu.ptp.controller import make_controller
from fatezero_tpu.ptp.store import AttentionStore
from fatezero_tpu.common.image_util import save_gif_mp4_folder_type

OUT = "/tmp/fz_verify"
os.makedirs(OUT, exist_ok=True)

# ---- data: real frames, small res for speed
ds = ImageSequenceDataset(
    path="/root/reference/data/teaser_car-turn",
    prompt="a silver jeep driving down a curvy road in the countryside",
    n_sample_frame=4,
    sampling_rate=2,
    image_size=64,
)
sample = ds[0]
video = sample["images"]  # [f, h, w, 3] in [-1, 1]
print("video:", video.shape, video.min(), video.max())

# ---- tiny models, random weights
unet_cfg = UNet3DConfig(
    block_out_channels=(32, 64, 128, 128),
    attention_head_dim=4,
    cross_attention_dim=32,
    norm_num_groups=8,
)
unet = UNetPseudo3DConditionModel(cfg=unet_cfg)
vae_cfg = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_num_groups=8)
vae = AutoencoderKL(cfg=vae_cfg)
txt_cfg = CLIPTextConfig(hidden_size=32, num_layers=2, num_heads=2, vocab_size=1000)
text_encoder = CLIPTextModel(cfg=txt_cfg)
tokenizer = StubTokenizer(vocab_size=1000)

rng = jax.random.PRNGKey(0)
lat = jnp.zeros((1, 4, 8, 8, 4))
txt = jnp.zeros((2, 77), jnp.int32)
unet_params = unet.init(rng, lat, jnp.int32(0), jnp.zeros((1, 77, 32)))
vae_params = vae.init(rng, jnp.zeros((1, 64, 64, 3)))
text_params = text_encoder.init(rng, txt)

pipe = FateZeroPipeline(
    unet, unet_params, vae, vae_params, text_encoder, text_params, tokenizer
)
print(f"[{time.time()-t0:.1f}s] models built")

# ---- encode + invert with capture
source_prompt = "a silver jeep driving down a curvy road in the countryside"
target_prompt = "a silver jeep driving down a curvy road in the watercolor"
emb_src = pipe.encode_prompt(source_prompt)
latents = pipe.encode_video(video)
print("latents:", latents.shape)

store = AttentionStore()
STEPS = 8
traj = pipe.invert(latents, emb_src, num_inference_steps=STEPS, store=store)
print(
    f"[{time.time()-t0:.1f}s] inversion done: {len(traj)} latents, "
    f"{len(store.attention_store_all_step)} stored steps"
)
m0 = store.step_maps(0)
print("stored keys:", {k: len(v) for k, v in m0.items()})

# ---- edit (swap): replace controller + self swap + both blends
controller = make_controller(
    tokenizer,
    [source_prompt, target_prompt],
    num_steps=STEPS,
    is_replace_controller=True,
    cross_replace_steps=0.8,
    self_replace_steps=0.8,
    blend_words=[["countryside"], ["watercolor"]],
    eq_params={"words": ["watercolor"], "values": [10]},
    blend_latents=True,
    blend_self_attention=True,
    save_path=OUT,
)
emb_tgt = pipe.encode_prompt(target_prompt)
edited = pipe.sample(
    jnp.asarray(traj[-1]),
    emb_tgt,
    num_inference_steps=STEPS,
    guidance_scale=7.5,
    controller=controller,
    inv_store=store,
    inverted_latents=traj,
)
print(f"[{time.time()-t0:.1f}s] edit done:", edited.shape, "finite:", bool(jnp.isfinite(edited).all()))

# ---- reconstruction path (controller=None, fused scan)
recon = pipe.sample(jnp.asarray(traj[-1]), emb_src, num_inference_steps=STEPS)
print(f"[{time.time()-t0:.1f}s] recon done:", recon.shape)

# ---- decode + save
out_video = pipe.decode_latents(edited)
save_gif_mp4_folder_type(out_video, os.path.join(OUT, "edit.gif"))
print(f"[{time.time()-t0:.1f}s] saved:", sorted(os.listdir(OUT)))
assert os.path.exists(os.path.join(OUT, "edit.gif"))
assert os.path.exists(os.path.join(OUT, "edit.mp4"))
assert os.path.getsize(os.path.join(OUT, "edit.mp4")) > 0
print("E2E OK")

# ---- PROBE 1: refine controller (unequal word counts) + no blends
ctrl2 = make_controller(
    tokenizer,
    [source_prompt, "a watercolor painting of a silver jeep"],
    num_steps=STEPS,
    is_replace_controller=True,  # must silently fall back to refine
    self_replace_steps=0.4,
)
assert ctrl2.cross_edit_kind == "refine", ctrl2.cross_edit_kind
emb2 = pipe.encode_prompt("a watercolor painting of a silver jeep")
out2 = pipe.sample(
    jnp.asarray(traj[-1]), emb2, num_inference_steps=STEPS,
    controller=ctrl2, inv_store=store, inverted_latents=traj,
)
print("PROBE refine OK:", out2.shape, bool(jnp.isfinite(out2).all()))

# ---- PROBE 2: 'save' edit type (capture during denoise, no controller)
estore = AttentionStore()
out3 = pipe.sample(
    jnp.asarray(traj[-1]), emb_src, num_inference_steps=STEPS, edit_store=estore
)
assert len(estore.attention_store_all_step) == STEPS
print("PROBE save OK:", len(estore.attention_store_all_step), "steps captured")

# ---- PROBE 3: dataset asked for more frames than the folder has
try:
    ImageSequenceDataset(path="/root/reference/data/teaser_car-turn", n_sample_frame=99)
    print("PROBE dataset: NO ERROR (bad)")
except ValueError as e:
    print("PROBE dataset OK:", str(e)[:70])

print("ALL PROBES OK")
