"""Zero-shot video-edit entry point: `python test_fatezero.py --config X.yaml`.

Consumes the reference YAML schema unchanged (SURVEY.md §2.4; reference
test_fatezero.py:46-286): dataset_config / editing_config (with
`use_invertion_latents` [sic], per-prompt `p2p_config.<i>` blocks) /
model_config / seed, and writes the same result layout (input gif, per-prompt
gif+mp4+frame folder, grid, config snapshot) into a timestamped logdir.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fatezero_tpu.common.config import load_config, save_config
from fatezero_tpu.common.image_util import save_gif_mp4_folder_type
from fatezero_tpu.data.dataset import ImageSequenceDataset
from fatezero_tpu.models.loader import load_models
from fatezero_tpu.pipelines.fatezero_pipeline import FateZeroPipeline
from fatezero_tpu.pipelines.p2p_validation_loop import P2pSampleLogger
from fatezero_tpu.ptp.store import AttentionStore


def _logdir_for(config_path: str, logdir: Optional[str]) -> str:
    if logdir:
        return logdir
    stem = os.path.splitext(os.path.basename(config_path))[0]
    stamp = time.strftime("%Y-%m-%dT%H-%M-%S")
    return os.path.join("result", stem, stamp)


def test(
    config: str = "config.yaml",
    pretrained_model_path: str = "random:sd",
    dataset_config: Optional[dict] = None,
    editing_config: Optional[dict] = None,
    model_config: Optional[dict] = None,
    test_pipeline_config: Optional[dict] = None,
    seed: int = 0,
    mixed_precision: str = "bf16",
    logdir: Optional[str] = None,
    disk_store: bool = False,
    profile: bool = False,
    sharding: Optional[dict] = None,
    **kwargs,
):
    """Run one editing workload (reference test(), test_fatezero.py:46-251)."""
    from fatezero_tpu.common.profiling import PhaseTimer, trace

    dataset_config = dict(dataset_config or {})
    editing_config = dict(editing_config or {})
    if not editing_config.get("use_invertion_latents", True) and editing_config.get(
        "use_inversion_attention", True
    ):
        # generation mode has no inversion trajectory: replaying the
        # fabricated clean-latent "trajectory" as inversion attention would
        # silently produce garbage. The reference leaves this combination
        # unguarded; here it is a config error.
        raise ValueError(
            "editing_config: use_invertion_latents: false (generation mode) "
            "requires use_inversion_attention: false — there is no inversion "
            "attention to fuse. Set use_inversion_attention: false for "
            "save/swap-style generation editing."
        )
    logdir = _logdir_for(config, logdir)
    os.makedirs(logdir, exist_ok=True)
    # every run logs to logdir/log.log like the reference
    # (video_diffusion/common/logger.py:5-17)
    logging.basicConfig(
        level=logging.INFO,
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler(os.path.join(logdir, "log.log")),
        ],
        force=True,
    )
    log = logging.getLogger("fatezero_tpu.edit")
    log.info("editing run: config=%s logdir=%s", config, logdir)
    timer = PhaseTimer()

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if (mixed_precision in ("fp16", "bf16") and on_tpu) else jnp.float32

    with timer.phase("load_models", sync=False):
        bundle = load_models(pretrained_model_path, model_config, dtype=dtype, seed=seed)
    # `test_pipeline_config.target` selects the pipeline class, as in the
    # reference (test_fatezero.py:106-117 via instantiate_from_config);
    # the model bundle is passed as the constructor kwargs.
    pipeline_kwargs = dict(
        unet=bundle.unet,
        unet_params=bundle.unet_params,
        vae=bundle.vae,
        vae_params=bundle.vae_params,
        text_encoder=bundle.text_encoder,
        text_params=bundle.text_params,
        tokenizer=bundle.tokenizer,
        schedule=bundle.schedule,
    )
    if test_pipeline_config and test_pipeline_config.get("target"):
        from fatezero_tpu.common.config import instantiate_from_config

        pipe = instantiate_from_config(test_pipeline_config, **pipeline_kwargs)
    else:
        pipe = FateZeroPipeline(**pipeline_kwargs)
    if sharding:
        # sharding: {mesh: [data, seq, tensor] | auto, distributed: bool} —
        # the user-reachable multi-chip path (frame-axis sequence parallelism
        # + megatron TP; replaces the reference's `accelerate launch` DP)
        from fatezero_tpu.parallel.sharding import mesh_from_config

        mesh = mesh_from_config(sharding)
        log.info("sharding over mesh %s", dict(zip(mesh.axis_names, mesh.devices.shape)))
        pipe.shard(mesh)

    dataset = ImageSequenceDataset(**dataset_config)
    video = dataset[0]["images"]  # [f, h, w, 3] in [-1, 1]
    save_gif_mp4_folder_type(
        np.asarray(video) / 2 + 0.5, os.path.join(logdir, "input.gif")
    )

    source_prompt = editing_config.get("source_prompt", dataset_config.get("prompt", ""))
    num_steps = int(editing_config.get("num_inference_steps", 50))
    emb_src = pipe.encode_prompt(source_prompt)
    with timer.phase("vae_encode"):
        latents = pipe.encode_video(video)

    sample_seeds = [int(s) for s in editing_config.get("sample_seeds", [seed])]

    def make_logger(subdir: str = "") -> P2pSampleLogger:
        return P2pSampleLogger(
            editing_prompts=editing_config.get("editing_prompts", [source_prompt]),
            clip_length=int(editing_config.get("clip_length", video.shape[0])),
            logdir=os.path.join(logdir, subdir) if subdir else logdir,
            source_prompt=source_prompt,
            num_inference_steps=num_steps,
            guidance_scale=float(editing_config.get("guidance_scale", 7.5)),
            sample_seeds=sample_seeds,
            p2p_config=editing_config.get("p2p_config", {}),
            use_inversion_attention=bool(
                editing_config.get("use_inversion_attention", True)
            ),
            strength=editing_config.get("strength"),
            annotate=bool(editing_config.get("annotate", False)),
            use_fused_path=use_fused,
        )

    use_fused = not disk_store and not editing_config.get("save_attention_maps", False)
    # capture the controlled sites' payloads during inversion itself (cross
    # probs + self (q,k), HBM-resident): the edit scans then run the bare
    # 2-row CFG forward with no replay row. The payload is ~steps x 150 MB;
    # `stored_attention: false` falls back to replay-rematerialization for
    # workloads whose payload exceeds HBM (many frames / high res).
    use_stored = bool(editing_config.get("stored_attention", True))
    traj = inv_store = traj_host = stored = None
    capture_rows = None
    if editing_config.get("use_invertion_latents", True):
        if use_fused:
            if use_stored:
                # proactive HBM gate (pure eval_shape — no device work,
                # per-device under a mesh): a failed on-device capture costs
                # minutes of runtime OOM-retry and leaves HBM pinned, so trim
                # the capture to the rows that fit — full capture when the
                # budget holds every step, a hybrid (stored prefix + replay
                # middle + identity-gated tail) otherwise, full replay when
                # not even one row fits. FZ_PAYLOAD_BUDGET_GB overrides.
                budget = float(os.environ.get("FZ_PAYLOAD_BUDGET_GB", 8)) * 1e9
                probe = make_logger()
                capture_rows = pipe.plan_capture(
                    latents,
                    num_steps,
                    window=probe.max_edit_window(pipe),
                    budget_bytes=budget,
                    strength=probe.strength,
                    use_inversion_attention=probe.use_inversion_attention,
                )
                if capture_rows is None:
                    log.warning(
                        "predicted attention payload %.1f GB exceeds the "
                        "%.1f GB budget at every trim; using replay "
                        "rematerialization (stored_attention: false). Raise "
                        "FZ_PAYLOAD_BUDGET_GB to force capture.",
                        pipe.capture_payload_bytes(
                            latents, num_steps, per_device=True
                        )
                        / 1e9,
                        budget / 1e9,
                    )
                    use_stored = False
                elif capture_rows[1] < num_steps:
                    log.info(
                        "trimmed attention capture to inversion rows "
                        "[%d, %d) to fit the %.1f GB payload budget",
                        capture_rows[0],
                        capture_rows[0] + capture_rows[1],
                        budget / 1e9,
                    )
            with timer.phase("inversion"):
                if use_stored:
                    try:
                        traj, stored = pipe.invert_fast(
                            latents, emb_src, num_steps, capture=True,
                            capture_rows=capture_rows,
                        )
                        traj.block_until_ready()
                    except Exception as e:  # noqa: BLE001 — HBM fallback
                        from fatezero_tpu.common.errors import is_device_oom

                        if not is_device_oom(e):
                            raise
                        log.warning(
                            "attention payload exceeds device memory at this "
                            "workload; falling back to replay "
                            "rematerialization (stored_attention: false)"
                        )
                        traj = stored = None
                if traj is None:
                    # the except block above has exited, dropping the caught
                    # exception — but its traceback frames can sit in cycles
                    # that pin the failed attempt's device buffers; collect
                    # before retrying or the replay path OOMs on leftovers
                    import gc

                    gc.collect()
                    traj = pipe.invert_fast(latents, emb_src, num_steps)
                traj.block_until_ready()
        else:
            inv_store = AttentionStore(disk_store=disk_store, store_dir=logdir)
            with timer.phase("inversion"):
                traj_host = pipe.invert(latents, emb_src, num_steps, store=inv_store)
            # inversion cross-attention heatmap gif
            # (p2p_ddim_spatial_temporal.py:119-126)
            from fatezero_tpu.ptp.visualization import show_cross_attention

            show_cross_attention(
                pipe.tokenizer,
                source_prompt,
                inv_store.get_average_attention(),
                res=int(latents.shape[2]) // 4,
                save_path=os.path.join(logdir, "cross_attention", "attn.gif"),
            )

    with timer.phase("editing"), trace(os.path.join(logdir, "trace") if profile else None):
        if traj is None and inv_store is None:
            # generation mode (use_invertion_latents: false): one run per
            # sample seed, reference p2p_validation_loop.py seed loop
            videos = []
            for s in sample_seeds:
                noise = jax.random.normal(
                    jax.random.PRNGKey(s), latents.shape, latents.dtype
                )
                seed_traj = jnp.stack([latents] * num_steps + [noise])
                sub = f"seed_{s}" if len(sample_seeds) > 1 else ""
                videos += make_logger(sub).log_sample_images(
                    pipe,
                    np.asarray(video) / 2 + 0.5,
                    traj=seed_traj,
                    emb_source=emb_src,
                )
        else:
            videos = make_logger().log_sample_images(
                pipe,
                np.asarray(video) / 2 + 0.5,
                traj=traj,
                inv_store=inv_store,
                inverted_latents=traj_host,
                emb_source=emb_src,
                stored=stored,
                stored_row0=capture_rows[0]
                if (capture_rows and stored is not None)
                else 0,
            )
    timer.save(os.path.join(logdir, "phase_timings.json"))
    log.info("%s", timer)
    save_config(
        {
            "config": config,
            "pretrained_model_path": pretrained_model_path,
            "dataset_config": dataset_config,
            "editing_config": {
                k: v for k, v in editing_config.items() if k != "p2p_config"
            },
            "seed": seed,
            "logdir": logdir,
        },
        os.path.join(logdir, "config.yml"),
    )
    return logdir, videos


def run(config: str, mesh: Optional[str] = None):
    cfg = load_config(config)
    d = cfg.to_dict()
    d.setdefault("config", config)
    if mesh:
        # --mesh 1,4,2 / --mesh auto overrides the YAML sharding block
        d["sharding"] = {**(d.get("sharding") or {}), "mesh": mesh}
    # reference sweeps checkpoint_* subdirs of a tuned model
    # (test_fatezero.py:260-282)
    pmp = d.get("pretrained_model_path", "random:sd")
    if os.path.isdir(pmp):
        ckpts = sorted(
            p
            for p in os.listdir(pmp)
            if p.startswith("checkpoint_") and os.path.isdir(os.path.join(pmp, p))
        )
        epoch_list = d.get("pretrained_epoch_list")
        if ckpts:
            outs = []
            for ck in ckpts:
                epoch = int(ck.split("_")[-1])
                if epoch_list is not None and epoch not in epoch_list:
                    continue
                sub = dict(d)
                sub["pretrained_model_path"] = os.path.join(pmp, ck)
                outs.append(test(**sub))
            return outs
    return test(**d)


def main():
    import click

    @click.command()
    @click.option("--config", type=str, default="config/demo.yaml")
    @click.option(
        "--mesh",
        type=str,
        default=None,
        help="device mesh shape data,seq,tensor (e.g. 1,4,2) or 'auto'",
    )
    def _run(config, mesh):
        run(config, mesh=mesh)

    _run()


if __name__ == "__main__":
    main()
