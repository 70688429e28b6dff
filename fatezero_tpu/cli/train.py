"""One-shot Tune-A-Video fine-tuning entry: `python train_tune_a_video.py --config X`.

Reference parity (train_tune_a_video.py:49-416): freeze everything except
(attn_temporal, to_q)[, conv_temporal]; AdamW (adafactor as the 8-bit-Adam
memory analog) with the diffusers LR family; train on one video's clips; every
`validation_steps` run inversion + reconstruction sampling; every
`checkpointing_steps` write a `checkpoint_{step}` in save_pretrained layout
that the edit entry can sweep.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fatezero_tpu.common.checkpoint import save_pipeline_checkpoint
from fatezero_tpu.common.config import load_config, save_config
from fatezero_tpu.data.dataset import ImageSequenceDataset
from fatezero_tpu.models.loader import load_models
from fatezero_tpu.pipelines.fatezero_pipeline import FateZeroPipeline
from fatezero_tpu.trainer.ddpm_trainer import DDPMTrainer

log = logging.getLogger("fatezero_tpu.train")


def train(
    config: str = "config.yaml",
    pretrained_model_path: str = "random:sd",
    dataset_config: Optional[dict] = None,
    model_config: Optional[dict] = None,
    train_steps: int = 100,
    validation_steps: int = 100,
    checkpointing_steps: int = 100,
    learning_rate: float = 3e-5,
    scale_lr: bool = False,
    lr_scheduler: str = "constant",
    lr_warmup_steps: int = 0,
    train_temporal_conv: bool = False,
    use_8bit_adam: bool = False,
    optimizer: Optional[str] = None,  # "adamw" | "adamw8bit" | "adafactor"
    gradient_checkpointing: bool = False,
    prior_preservation: Optional[float] = None,
    mixed_precision: str = "bf16",
    seed: int = 0,
    batch_size: int = 1,
    logdir: Optional[str] = None,
    validation_sample_logger_config: Optional[dict] = None,
    editing_config: Optional[dict] = None,
    trainer_pipeline_config: Optional[dict] = None,
    sharding: Optional[dict] = None,
    **kwargs,
):
    dataset_config = dict(dataset_config or {})
    if logdir is None:
        stem = os.path.splitext(os.path.basename(config))[0]
        logdir = os.path.join("result", stem, time.strftime("%Y-%m-%dT%H-%M-%S"))
    os.makedirs(logdir, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler(os.path.join(logdir, "log.log")),
        ],
        force=True,
    )

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if (mixed_precision in ("fp16", "bf16") and on_tpu) else jnp.float32
    if scale_lr:
        learning_rate *= batch_size * jax.process_count()

    model_config = dict(model_config or {})
    if gradient_checkpointing:
        # per-block remat (reference train_tune_a_video.py:162-164)
        model_config["gradient_checkpointing"] = True
    bundle = load_models(pretrained_model_path, model_config, dtype=dtype, seed=seed)
    pipe = FateZeroPipeline(
        bundle.unet,
        bundle.unet_params,
        bundle.vae,
        bundle.vae_params,
        bundle.text_encoder,
        bundle.text_params,
        bundle.tokenizer,
        schedule=bundle.schedule,
    )

    if sharding:
        # sharding: {mesh: [data, seq, tensor] | auto, distributed: bool}.
        # UNet params get megatron TP specs; the trainer state inherits those
        # shardings through init_state, and GSPMD partitions the train step.
        from fatezero_tpu.parallel.sharding import mesh_from_config

        mesh = mesh_from_config(sharding)
        log.info("sharding over mesh %s", dict(zip(mesh.axis_names, mesh.devices.shape)))
        pipe.shard(mesh)

    dataset_config.setdefault("crop", "random")
    dataset = ImageSequenceDataset(**dataset_config)
    prompt = dataset_config.get("prompt", "")
    emb = pipe.encode_prompt(prompt)[-1:]  # cond half only for training
    class_emb = None
    if dataset_config.get("class_data_root"):
        class_emb = pipe.encode_prompt(dataset_config.get("class_data_prompt", ""))[-1:]

    trainer_kwargs = dict(
        unet=bundle.unet,
        vae=bundle.vae,
        vae_params=pipe.vae_params,
        text_encoder=bundle.text_encoder,
        text_params=pipe.text_params,
        schedule=bundle.schedule,
        learning_rate=learning_rate,
        lr_scheduler=lr_scheduler,
        lr_warmup_steps=lr_warmup_steps,
        train_steps=train_steps,
        train_temporal_conv=train_temporal_conv,
        use_8bit_adam=use_8bit_adam,
        optimizer=optimizer,
        prior_preservation=prior_preservation,
    )
    if trainer_pipeline_config and trainer_pipeline_config.get("target"):
        # trainer class selected from config, as the reference instantiates
        # its trainer via instantiate_from_config (train_tune_a_video.py:277-278)
        from fatezero_tpu.common.config import instantiate_from_config

        trainer = instantiate_from_config(trainer_pipeline_config, **trainer_kwargs)
    else:
        trainer = DDPMTrainer(**trainer_kwargs)
    state = trainer.init_state(pipe.unet_params)
    start_step = 0
    resume_from = kwargs.get("resume_from")
    if resume_from:
        from fatezero_tpu.trainer.ddpm_trainer import load_training_state

        state = load_training_state(resume_from, trainer, state)
        start_step = state["step"]
        log.info("resumed optimizer state at step %d from %s", start_step, resume_from)
    rng = jax.random.PRNGKey(seed)

    # Fused training path: the one-shot workload (one clip window, no class
    # stream) keeps its pixels device-resident and runs whole chunks of
    # update steps as ONE lax.scan dispatch (random crop on device) —
    # per-step host round trips are pure overhead (measured 13.1 s wall vs
    # 0.51 s device compute per step at 512^2 x 8f over a remote-TPU link).
    fused = dataset.video_len == 1 and not dataset.class_images_path
    if fused:
        frames_dev = jnp.asarray(dataset.scaled_frames(0))
        crop = (
            (dataset.image_size, dataset.image_size)
            if frames_dev.shape[1:3] != (dataset.image_size, dataset.image_size)
            and dataset.crop == "random"
            else None
        )
        if crop is None and frames_dev.shape[1:3] != (dataset.image_size, dataset.image_size):
            # center crop once on host
            from fatezero_tpu.data import transform as T

            frames_dev = jnp.asarray(
                T.center_crop(
                    np.asarray(frames_dev), dataset.image_size, dataset.image_size
                )
            )
        # each chunk must stop at the NEXT multiple of every active period
        # (validation, checkpointing) — aligning to min() alone skips events
        # whose period is not a multiple of it
        periods = [p for p in (validation_steps, checkpointing_steps) if p]

    losses = []
    step = start_step
    while step < train_steps:
        if fused:
            n = min(
                [p - step % p for p in periods] + [50, train_steps - step]
            )
            rng, sub = jax.random.split(rng)
            state, chunk_losses = trainer.run_steps(
                state, frames_dev, emb, sub, n, crop=crop
            )
            losses.extend(np.asarray(chunk_losses, np.float32).tolist())
            step += n
        else:
            step += 1
            sample = dataset[step % max(len(dataset), 1)]
            images = jnp.asarray(sample["images"])
            class_images = (
                jnp.asarray(sample["class_images"])[None]
                if "class_images" in sample
                else None
            )
            rng, sub = jax.random.split(rng)
            state, loss = trainer.step(
                state, images, emb, sub, class_images, class_emb
            )
            losses.append(float(loss))
        if step % 10 == 0 or step == train_steps or fused:
            log.info("step %d/%d loss %.5f", step, train_steps, np.mean(losses[-10:]))

        if validation_steps and step % validation_steps == 0:
            pipe.unet_params = state["params"]
            n_saved = _validate(
                pipe, dataset, prompt, logdir, step,
                editing_config=editing_config,
                logger_config=validation_sample_logger_config,
            )
            log.info("validation: %d sample videos saved at step %d", n_saved, step)

        if checkpointing_steps and step % checkpointing_steps == 0:
            ck = save_pipeline_checkpoint(
                os.path.join(logdir, f"checkpoint_{step}"),
                bundle.unet.cfg,
                state["params"],
                vae_cfg=bundle.vae.cfg,
                vae_params=pipe.vae_params,
                text_cfg=bundle.text_encoder.cfg,
                text_params=pipe.text_params,
            )
            from fatezero_tpu.trainer.ddpm_trainer import save_training_state

            save_training_state(ck, state)
            log.info("checkpoint written: %s", ck)

    save_config({"config": config, "train_steps": train_steps, "logdir": logdir,
                 "final_loss": float(np.mean(losses[-10:]))},
                os.path.join(logdir, "config.yml"))
    return logdir, state


def _validate(pipe, dataset, prompt, logdir, step,
              editing_config: Optional[dict] = None,
              logger_config: Optional[dict] = None) -> int:
    """Online re-inversion + SampleLogger prompt x seed sweep, the reference's
    tuning validation (train_tune_a_video.py:347-388): the logger is built
    from `editing_config` (as SampleLogger(**editing_config) is there), with
    `validation_sample_logger_config` keys taking precedence."""
    from fatezero_tpu.pipelines.validation_loop import SampleLogger

    lc = {**(editing_config or {}), **(logger_config or {})}
    video = dataset[0]["images"]
    lc.setdefault("editing_prompts", [prompt] + list(lc.pop("prompts", [])))
    lc.setdefault("clip_length", int(video.shape[0]))
    lc.setdefault("num_inference_steps", 10)
    logger = SampleLogger(logdir=logdir, subdir=f"validation_{step}", **lc)

    traj = None
    if lc.get("use_invertion_latents", True):
        # params change every step: invert online with the current UNet
        emb = pipe.encode_prompt(prompt)
        latents = pipe.encode_video(video)
        traj = pipe.invert_fast(latents, emb, logger.num_inference_steps)
    samples = logger.log_sample_images(pipe, step, image=np.asarray(video), traj=traj)
    return len(samples)


def run(config: str, mesh: Optional[str] = None):
    cfg = load_config(config)
    d = cfg.to_dict()
    d.setdefault("config", config)
    if mesh:
        d["sharding"] = {**(d.get("sharding") or {}), "mesh": mesh}
    return train(**d)


def main():
    import click

    @click.command()
    @click.option("--config", type=str, required=True)
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
