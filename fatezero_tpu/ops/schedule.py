"""Pure-JAX diffusion noise schedules: DDIM (denoise + exact inversion) and DDPM.

TPU-native replacement for diffusers' DDIMScheduler/DDPMScheduler as used by the
reference (test_fatezero.py:112-118, train_tune_a_video.py:283-287) and the
closed-form inverse DDIM step (p2p_ddim_spatial_temporal.py:150-161).

Design: a schedule is a frozen pytree of fp32 tables (`DiffusionSchedule`);
every step function is pure, shape-static, fp32, and jit/scan-friendly — the
timestep is a traced int32 scalar, so one compiled step serves all 50 DDIM
steps. No Python state, no set_timesteps mutation: the inference timestep grid
is a static array computed once by `ddim_timesteps`.

Stable-Diffusion 1.x defaults: scaled_linear betas in [0.00085, 0.012],
1000 train steps, steps_offset=1, set_alpha_to_one=False, epsilon prediction.
"""
from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class DiffusionSchedule:
    """Precomputed noise-schedule tables (all fp32, length = num_train_timesteps)."""

    betas: jax.Array
    alphas_cumprod: jax.Array
    final_alpha_cumprod: jax.Array  # scalar: alpha for the "t = -1" boundary
    num_train_timesteps: int = flax.struct.field(pytree_node=False, default=1000)
    prediction_type: str = flax.struct.field(pytree_node=False, default="epsilon")
    clip_sample: bool = flax.struct.field(pytree_node=False, default=False)


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    set_alpha_to_one: bool = False,
    prediction_type: str = "epsilon",
    clip_sample: bool = False,
) -> DiffusionSchedule:
    if beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    elif beta_schedule == "scaled_linear":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
            ** 2
        )
    elif beta_schedule == "squaredcos_cap_v2":
        t = np.arange(num_train_timesteps + 1, dtype=np.float64) / num_train_timesteps
        f = np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        betas = np.clip(1.0 - f[1:] / f[:-1], 0.0, 0.999)
    else:
        raise ValueError(f"unknown beta_schedule {beta_schedule!r}")
    alphas_cumprod = np.cumprod(1.0 - betas)
    final = 1.0 if set_alpha_to_one else float(alphas_cumprod[0])
    return DiffusionSchedule(
        betas=jnp.asarray(betas, jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
        final_alpha_cumprod=jnp.asarray(final, jnp.float32),
        num_train_timesteps=num_train_timesteps,
        prediction_type=prediction_type,
        clip_sample=clip_sample,
    )


def ddim_timesteps(
    schedule: DiffusionSchedule, num_inference_steps: int, steps_offset: int = 1
) -> np.ndarray:
    """Descending inference timestep grid (leading spacing + offset, SD default).

    Matches diffusers 0.11.1 `DDIMScheduler.set_timesteps`: t_i = i * (T // S)
    + offset, returned noisy->clean (descending). Static numpy — the grid is
    config, not data.
    """
    step_ratio = schedule.num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
    ts = ts + steps_offset
    return np.minimum(ts, schedule.num_train_timesteps - 1)


def _alpha_at(schedule: DiffusionSchedule, t: jax.Array) -> jax.Array:
    """alpha_cumprod[t] with the t < 0 boundary mapped to final_alpha_cumprod."""
    t = jnp.asarray(t)
    safe_t = jnp.clip(t, 0, schedule.num_train_timesteps - 1)
    return jnp.where(t >= 0, schedule.alphas_cumprod[safe_t], schedule.final_alpha_cumprod)


def _bcast(alpha: jax.Array, sample: jax.Array) -> jax.Array:
    """Right-pad alpha's shape so a per-batch (or scalar) t broadcasts over sample."""
    return alpha.reshape(alpha.shape + (1,) * (sample.ndim - alpha.ndim))


def pred_original_sample(
    schedule: DiffusionSchedule, model_output: jax.Array, t: jax.Array, sample: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """(pred_x0, pred_epsilon) from a model output under the schedule's prediction type."""
    alpha = _bcast(_alpha_at(schedule, t).astype(sample.dtype), sample)
    beta = 1.0 - alpha
    sqrt_alpha, sqrt_beta = jnp.sqrt(alpha), jnp.sqrt(beta)
    if schedule.prediction_type == "epsilon":
        x0 = (sample - sqrt_beta * model_output) / sqrt_alpha
        eps = model_output
    elif schedule.prediction_type == "v_prediction":
        x0 = sqrt_alpha * sample - sqrt_beta * model_output
        eps = sqrt_alpha * model_output + sqrt_beta * sample
    elif schedule.prediction_type == "sample":
        x0 = model_output
        eps = (sample - sqrt_alpha * x0) / sqrt_beta
    else:
        raise ValueError(schedule.prediction_type)
    if schedule.clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)
    return x0, eps


def ddim_transfer(
    schedule: DiffusionSchedule,
    model_output: jax.Array,
    t_from: jax.Array,
    t_to: jax.Array,
    sample: jax.Array,
) -> jax.Array:
    """Deterministic (eta=0) DDIM move of `sample` from noise level t_from to t_to.

    The single primitive behind both denoising (t_to < t_from) and exact
    inversion (t_to > t_from; reference `next_clean2noise_step`,
    p2p_ddim_spatial_temporal.py:150-161): reconstruct x0 at t_from, then
    re-diffuse it deterministically to t_to.
    """
    x0, eps = pred_original_sample(schedule, model_output, t_from, sample)
    alpha_to = _bcast(_alpha_at(schedule, t_to).astype(sample.dtype), sample)
    return jnp.sqrt(alpha_to) * x0 + jnp.sqrt(1.0 - alpha_to) * eps


def ddim_denoise_step(
    schedule: DiffusionSchedule,
    model_output: jax.Array,
    timestep: jax.Array,
    sample: jax.Array,
    num_inference_steps: int,
) -> jax.Array:
    """One DDIM denoise step t -> t - T/S (diffusers `DDIMScheduler.step`, eta=0)."""
    prev_t = timestep - schedule.num_train_timesteps // num_inference_steps
    return ddim_transfer(schedule, model_output, timestep, prev_t, sample)


def ddim_invert_step(
    schedule: DiffusionSchedule,
    model_output: jax.Array,
    timestep: jax.Array,
    sample: jax.Array,
    num_inference_steps: int,
) -> jax.Array:
    """One exact-inversion step: latent at t - T/S -> latent at t.

    `timestep` is the *target* (noisier) level, matching the reference loop
    which walks `reversed(timesteps)` and passes the current grid point
    (p2p_ddim_spatial_temporal.py:131-148).
    """
    t_from = timestep - schedule.num_train_timesteps // num_inference_steps
    return ddim_transfer(schedule, model_output, t_from, timestep, sample)


def add_noise(
    schedule: DiffusionSchedule, sample: jax.Array, noise: jax.Array, t: jax.Array
) -> jax.Array:
    """Forward diffusion q(x_t | x_0) (diffusers `add_noise`). t broadcasts over batch."""
    alpha = _bcast(_alpha_at(schedule, t).astype(sample.dtype), sample)
    return jnp.sqrt(alpha) * sample + jnp.sqrt(1.0 - alpha) * noise


def get_velocity(
    schedule: DiffusionSchedule, sample: jax.Array, noise: jax.Array, t: jax.Array
) -> jax.Array:
    """v-prediction target: v = sqrt(a) eps - sqrt(1-a) x0 (diffusers `get_velocity`)."""
    alpha = _bcast(_alpha_at(schedule, t).astype(sample.dtype), sample)
    return jnp.sqrt(alpha) * noise - jnp.sqrt(1.0 - alpha) * sample


def ddpm_step(
    schedule: DiffusionSchedule,
    model_output: jax.Array,
    timestep: jax.Array,
    sample: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """One ancestral DDPM step (variance type: fixed_small), for sampling parity."""
    t = jnp.asarray(timestep)
    alpha_prod_t = _alpha_at(schedule, t)
    # diffusers DDPMScheduler uses `one` (exactly 1.0) for the t-1 < 0
    # boundary, unlike DDIM's final_alpha_cumprod
    alpha_prod_prev = jnp.where(t > 0, _alpha_at(schedule, t - 1), 1.0)
    beta_t = schedule.betas[jnp.clip(t, 0, schedule.num_train_timesteps - 1)]
    alpha_t = 1.0 - beta_t
    x0, _ = pred_original_sample(schedule, model_output, t, sample)
    # mu(x_t, x0) coefficients, Ho et al. eq. 7
    coef_x0 = jnp.sqrt(alpha_prod_prev) * beta_t / (1.0 - alpha_prod_t)
    coef_xt = jnp.sqrt(alpha_t) * (1.0 - alpha_prod_prev) / (1.0 - alpha_prod_t)
    mean = coef_x0 * x0 + coef_xt * sample
    var = beta_t * (1.0 - alpha_prod_prev) / (1.0 - alpha_prod_t)
    sigma = jnp.sqrt(jnp.clip(var, 1e-20))
    return mean + jnp.where(t > 0, sigma, 0.0) * noise


def classifier_free_guidance(
    eps_uncond: jax.Array, eps_cond: jax.Array, guidance_scale: jax.Array
) -> jax.Array:
    """CFG combine (stable_diffusion.py:545-549 semantics)."""
    return eps_uncond + guidance_scale * (eps_cond - eps_uncond)
