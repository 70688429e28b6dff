"""P2pSampleLogger: drives one edit per editing prompt and logs artifacts.

Parity with the reference orchestration loop
(video_diffusion/pipelines/p2p_validation_loop.py:68-166): per editing prompt
build the controller from its `p2p_config.<i>` block, run the edit, save
gif/mp4/frame-folder (annotated optionally), then a side-by-side grid of all
prompts. The compute path is the fused scan (`edit_fast`) by default; the
streaming store path is used when the caller needs per-step host maps
(disk_store / attention visualization).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from fatezero_tpu.common.image_util import (
    annotate_video,
    concat_videos,
    save_gif_mp4_folder_type,
)
from fatezero_tpu.ptp.controller import make_controller
from fatezero_tpu.ptp.store import AttentionStore


class P2pSampleLogger:
    def __init__(
        self,
        editing_prompts: List[str],
        clip_length: int,
        logdir: str,
        source_prompt: str = "",
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        sample_seeds: Sequence[int] = (0,),
        p2p_config: Optional[Dict] = None,
        use_inversion_attention: bool = True,
        strength: Optional[float] = None,
        annotate: bool = False,
        annotate_size: int = 15,
        use_fused_path: bool = True,
        save_attention_maps: bool = False,
        save_cross_attention: bool = True,
        **kwargs,
    ):
        self.editing_prompts = list(editing_prompts)
        self.clip_length = clip_length
        self.logdir = logdir
        self.source_prompt = source_prompt
        self.num_inference_steps = num_inference_steps
        self.guidance_scale = guidance_scale
        self.sample_seeds = list(sample_seeds)
        self.p2p_config = p2p_config or {}
        self.use_inversion_attention = use_inversion_attention
        # img2img strength (reference p2p_validation_loop.py:29,117): None/1.0
        # runs the full grid; <1 starts from a partially-inverted latent and
        # runs only the matching tail of the timestep grid.
        self.strength = 1.0 if strength is None else float(strength)
        self.annotate = annotate
        self.use_fused_path = use_fused_path
        self.save_attention_maps = save_attention_maps
        # per-edit cross-attention heatmap artifact, as the reference saves
        # after every edit (p2p_ddim_spatial_temporal.py:211-215)
        self.save_cross_attention = save_cross_attention
        os.makedirs(logdir, exist_ok=True)

    def _controller_for(self, pipeline, idx: int, target_prompt: str):
        cfg = dict(self.p2p_config.get(idx, self.p2p_config.get(str(idx), {})) or {})
        cross = cfg.get("cross_replace_steps", 0.8)
        if isinstance(cross, dict) and set(cross) == {"default_"}:
            cross = cross["default_"]
        return make_controller(
            pipeline.tokenizer,
            [self.source_prompt, target_prompt],
            num_steps=self.num_inference_steps,
            is_replace_controller=cfg.get("is_replace_controller", True),
            cross_replace_steps=cross,
            self_replace_steps=cfg.get("self_replace_steps", 0.0),
            blend_words=cfg.get("blend_words"),
            eq_params=cfg.get("eq_params"),
            blend_th=cfg.get("blend_th", (0.3, 0.3)),
            blend_latents=cfg.get("blend_latents", False),
            blend_self_attention=cfg.get("blend_self_attention", False),
            use_inversion_attention=cfg.get(
                "use_inversion_attention", self.use_inversion_attention
            ),
            save_self_attention=cfg.get("save_self_attention", True),
            save_path=os.path.join(self.logdir, f"prompt_{idx}"),
        )

    def max_edit_window(self, pipeline) -> int:
        """Max EditController.edit_window over this run's editing prompts —
        the number of leading edit steps that consume inversion attention.
        Drives the capture planner (FateZeroPipeline.plan_capture): payload
        rows past the widest window are dead weight for every prompt."""
        steps = self.num_inference_steps
        n_used = min(steps, int(steps * self.strength)) if self.strength < 1.0 else steps
        w = 0
        for idx, prompt in enumerate(self.editing_prompts):
            if prompt == self.source_prompt and not self.use_inversion_attention:
                continue
            ctl = self._controller_for(pipeline, idx, prompt)
            if ctl is not None:
                w = max(w, ctl.edit_window(n_used))
        return w

    def log_sample_images(
        self,
        pipeline,
        source_video: np.ndarray,
        traj=None,
        inv_store: Optional[AttentionStore] = None,
        inverted_latents: Optional[List[np.ndarray]] = None,
        emb_source=None,
        stored=None,
        stored_row0: int = 0,
        step: int = 0,
    ) -> List[np.ndarray]:
        """Run every editing prompt; returns the list of decoded videos.

        Artifact naming follows the reference
        (p2p_validation_loop.py:148-166): per prompt
        `step_{step}_{idx}_{seed}.gif` (+ mp4 + frame folder), its
        cross-attention heatmap sibling `step_{step}_{idx}_{seed}atten.gif`,
        the all-prompt grid `step_{step}.gif` (also saved as `grid.gif`), and
        the vertically-stacked attention grid `step_{step}atten.gif`. The
        reference's per-prompt seed LOOP is collapsed to sample_seeds[0]:
        FateZero editing is deterministic given the inversion trajectory (the
        torch generator only feeds DDIM eta-noise, which every FateZero
        config runs at eta=0), so each extra seed would rewrite an identical
        video — documented deviation, not a gap.

        Fused mode consumes `traj` (device trajectory from invert_fast) and
        optionally `stored` (inversion-time attention payloads from
        invert_fast(capture=True) — edits then skip the replay forward);
        streaming mode consumes `inv_store` + `inverted_latents`.
        """
        # when annotating, the source row needs the same text band or the
        # grid concat fails on mismatched heights
        videos = [
            annotate_video(source_video, self.source_prompt)
            if self.annotate
            else source_video
        ]
        attn_videos: List[np.ndarray] = []
        if emb_source is None:
            emb_source = pipeline.encode_prompt(self.source_prompt)
        steps = self.num_inference_steps
        n_used = min(steps, int(steps * self.strength)) if self.strength < 1.0 else steps
        # trajectory entry n_used is the inversion state at the noise level of
        # the first timestep a strength-sliced run will denoise
        init_latent = (
            jnp.asarray(traj[n_used])
            if traj is not None
            else jnp.asarray(inverted_latents[n_used])
        )
        save_store = None  # no-inversion mode: prompt 0's own maps (edit_type 'save')
        for idx, prompt in enumerate(self.editing_prompts):
            edit_aux = None
            is_reconstruction = prompt == self.source_prompt
            controller = None
            if not is_reconstruction or self.use_inversion_attention:
                controller = self._controller_for(pipeline, idx, prompt)
            emb_tgt = pipeline.encode_prompt(prompt)
            if not self.use_inversion_attention:
                # reference p2p_validation_loop.py:88-104: first prompt runs
                # edit_type='save' (captures its own attention), later prompts
                # 'swap' against that store — always the streaming path.
                if idx == 0:
                    save_store = AttentionStore()
                    latent = pipeline.sample(
                        init_latent,
                        emb_tgt,
                        num_inference_steps=self.num_inference_steps,
                        guidance_scale=self.guidance_scale,
                        edit_store=save_store,
                        strength=self.strength,
                    )
                else:
                    latent = pipeline.sample(
                        init_latent,
                        emb_tgt,
                        num_inference_steps=self.num_inference_steps,
                        guidance_scale=self.guidance_scale,
                        controller=controller,
                        inv_store=save_store,
                        inverted_latents=[init_latent] + list(save_store.latents_store),
                        strength=self.strength,
                    )
            elif self.use_fused_path:
                assert traj is not None, "fused path needs the latent trajectory"
                if controller is not None:
                    latent, edit_aux = pipeline.edit_fast(
                        traj,
                        emb_source,
                        emb_tgt,
                        controller,
                        num_inference_steps=self.num_inference_steps,
                        guidance_scale=self.guidance_scale,
                        strength=self.strength,
                        viz=self.save_cross_attention,
                        stored=stored,
                        stored_row0=stored_row0,
                    )
                else:
                    latent = pipeline.sample(
                        init_latent,
                        emb_tgt,
                        num_inference_steps=self.num_inference_steps,
                        guidance_scale=self.guidance_scale,
                        strength=self.strength,
                    )
            else:
                latent = pipeline.sample(
                    init_latent,
                    emb_tgt,
                    num_inference_steps=self.num_inference_steps,
                    guidance_scale=self.guidance_scale,
                    controller=controller,
                    inv_store=inv_store,
                    inverted_latents=inverted_latents,
                    strength=self.strength,
                )
            if edit_aux is not None and controller is not None:
                # the fused scan stacks the per-step blend masks; write the
                # reference's mask PNG artifacts (spatial_blend.py:43-55) just
                # like the streaming path does per step
                for aux_key, blender in (
                    ("attn_mask", controller.attention_blend),
                    ("latent_mask", controller.latent_blend),
                ):
                    if blender is None or aux_key not in edit_aux:
                        continue
                    for step_mask in np.asarray(edit_aux[aux_key], np.float32):
                        blender.counter += 1
                        blender.record(step_mask, f"step{blender.counter - 1:03d}")
            video = pipeline.decode_latents(latent)
            tag = f"step_{step}_{idx}_{self.sample_seeds[0]}"
            save_gif_mp4_folder_type(video, os.path.join(self.logdir, f"{tag}.gif"))
            if edit_aux is not None and "cross_avg" in edit_aux:
                # per-edit cross-attention heatmap gif, aggregated over
                # layers/heads/steps like the reference's
                # show_cross_attention(edit_controller, 16, ["up","down"]),
                # saved as the reference's `...atten.gif` sibling
                from fatezero_tpu.ptp.visualization import show_cross_attention

                avg = np.asarray(edit_aux["cross_avg"], np.float32)  # [1,f,s,77]
                res = int(np.sqrt(avg.shape[2]))
                attn_video = show_cross_attention(
                    pipeline.tokenizer,
                    prompt,
                    {"up_cross": [avg[:, :, None]]},  # [1, f, 1, s, 77]
                    res=res,
                    save_path=os.path.join(self.logdir, f"{tag}atten.gif"),
                )
                attn_videos.append(attn_video)
            if self.annotate:
                video = annotate_video(video, prompt)
            videos.append(video)
        grid = concat_videos(videos, axis=2)
        save_gif_mp4_folder_type(grid, os.path.join(self.logdir, f"step_{step}.gif"))
        save_gif_mp4_folder_type(grid, os.path.join(self.logdir, "grid.gif"))
        if attn_videos:
            # the reference's concatenated attention grid (cols=1 vertical
            # stack, p2p_validation_loop.py:159-166); heatmap widths differ
            # per prompt (token count), so pad to the widest
            wmax = max(v.shape[2] for v in attn_videos)
            padded = [
                np.pad(v, ((0, 0), (0, 0), (0, wmax - v.shape[2]), (0, 0)))
                for v in attn_videos
            ]
            save_gif_mp4_folder_type(
                concat_videos(padded, axis=1),
                os.path.join(self.logdir, f"step_{step}atten.gif"),
            )
        return videos[1:]
