"""Headline benchmark: car-turn 8-frame 512^2, 50-step DDIM inversion + edit.

Reference baseline (BASELINE.md): 60 s inversion + 40 s editing on an RTX
3090 (fp16, xformers, attention store in RAM) => 100 s end-to-end. This
script runs the same workload — full SD-1.4 architecture (randomly
initialized: weights do not change FLOPs or memory traffic), real attention
semantics, prompt-to-prompt swap edit with CFG — on the available
accelerator and prints ONE JSON line.

Default mode 'fused' is the TPU-native design: inversion is one lax.scan
producing only the latent trajectory; the edit is one lax.scan that replays
each inversion step's UNet forward on-device to rematerialize its attention
maps (identical values to a store, zero host traffic — the reference's
100 GB host store trades away as pure MXU FLOPs). BENCH_MODE=stream runs the
reference-shaped streaming store path instead.

vs_baseline = reference_seconds / ours_seconds (speedup; > 1 means faster
than the A100/3090 reference).

Environment knobs: BENCH_STEPS (default 50), BENCH_FRAMES (8), BENCH_RES
(512), BENCH_MODE (fused|stream), BENCH_SAVE_SELF (1, stream mode only).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

STEPS = int(os.environ.get("BENCH_STEPS", 50))
FRAMES = int(os.environ.get("BENCH_FRAMES", 8))
RES = int(os.environ.get("BENCH_RES", 512))
MODE = os.environ.get("BENCH_MODE", "fused")
SAVE_SELF = bool(int(os.environ.get("BENCH_SAVE_SELF", 1)))
# The reference's published 60s/40s numbers are for the teaser workload,
# whose model_config is ['mid'] sparse-causal + least_sc_channel 640
# (config/teaser/jeep_watercolor.yaml:81-82). BENCH_FULL_SC=1 benchmarks the
# heavier default (-1,'first') gather instead.
FULL_SC = bool(int(os.environ.get("BENCH_FULL_SC", 0)))
# measure the product-default viz-on edit (save_cross_attention: true) next
# to the headline viz-off edit; BENCH_VIZ=0 skips the extra timed run
VIZ = bool(int(os.environ.get("BENCH_VIZ", 1)))
BASELINE_S = 100.0  # 60 s inversion + 40 s edit, docs/EditingGuidance.md:74


def _flash_grad_parity_probe() -> float:
    """Pallas flash fwd+bwd vs explicit softmax, run EVERY bench invocation.

    The driver executes bench.py on real TPU hardware each round, so this is
    the always-on chip-side regression gate: a Mosaic/kernel regression fails
    the bench loudly instead of hiding behind the opt-in FZ_TPU_TESTS suite.
    """
    import jax
    import jax.numpy as jnp

    from fatezero_tpu.ops.flash_attention import fused_attention

    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (4, 256, 64), jnp.float32)
        for i in range(3)
    )

    def loss_fused(q, k, v):
        return fused_attention(q, k, v, 0.125).sum()

    def loss_ref(q, k, v):
        p = jax.nn.softmax((q @ k.transpose(0, 2, 1)) * 0.125, axis=-1)
        return (p @ v).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    err = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(g_fused, g_ref))
    if not err < 5e-2:
        raise AssertionError(
            f"flash-attention backward deviates from reference grad: {err}"
        )
    return err


def main() -> None:
    import jax
    import jax.numpy as jnp

    # persistent compile cache: first-ever run pays full XLA compiles (the
    # remote-compile TPU path is slow), every later run starts warm
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    from fatezero_tpu.common.errors import is_device_oom
    from fatezero_tpu.models.clip import CLIPTextModel
    from fatezero_tpu.models.tokenizer import StubTokenizer
    from fatezero_tpu.models.unet3d import UNet3DConfig, UNetPseudo3DConditionModel
    from fatezero_tpu.pipelines.fatezero_pipeline import FateZeroPipeline
    from fatezero_tpu.ptp.controller import make_controller
    from fatezero_tpu.ptp.store import AttentionStore
    from __graft_entry__ import _fast_params

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    flash_grad_err = _flash_grad_parity_probe()

    # teaser mode is the reference "basic" workload EXACTLY: temporal LoRA
    # rank 160, SparseCausalAttention ['mid'], least_sc_channel 640
    # (config/teaser/jeep_watercolor.yaml:79-82); FULL_SC is the heavier
    # stress variant (full temporal convs, (-1,'first') gather).
    cfg = (
        UNet3DConfig()
        if FULL_SC
        else UNet3DConfig(sparse_causal_indices=("mid",), least_sc_channel=640, lora=160)
    )
    unet = UNetPseudo3DConditionModel(cfg=cfg, dtype=dtype)
    lat = RES // 8
    sample = jnp.zeros((1, FRAMES, lat, lat, 4), jnp.float32)
    text = jnp.zeros((1, 77, 768), jnp.float32)
    unet_params = _fast_params(unet, sample, jnp.int32(0), text)

    text_model = CLIPTextModel(dtype=dtype)
    tokenizer = StubTokenizer()
    ids = jnp.asarray(tokenizer(["x"]).input_ids)
    text_params = _fast_params(text_model, ids)

    # VAE is outside the timed section in the reference numbers (the 60s/40s
    # are the inversion/edit loops); keep the bench on the diffusion loops.
    pipe = FateZeroPipeline(
        unet, unet_params, None, None, text_model, text_params, tokenizer
    )

    source = "a silver jeep driving down a curvy road in the countryside"
    target = "watercolor painting of a silver jeep driving down a curvy road in the countryside"
    emb_src = pipe.encode_prompt(source)
    emb_tgt = pipe.encode_prompt(target)

    latents = jnp.asarray(np.random.RandomState(0).randn(1, FRAMES, lat, lat, 4), jnp.float32)

    def controller():
        # the teaser's prompt-1 block: refine + reweight 'watercolor' x10
        # (config/teaser/jeep_watercolor.yaml:60-68)
        return make_controller(
            tokenizer,
            [source, target],
            num_steps=STEPS,
            is_replace_controller=False,
            cross_replace_steps=0.8,
            self_replace_steps=0.8,
            eq_params={"words": ["watercolor"], "values": [10]},
            save_self_attention=SAVE_SELF,
        )

    stored = None
    t_edit_viz = None
    replay = bool(int(os.environ.get("BENCH_REPLAY", 0)))
    if MODE == "fused":
        # capture=True: the inversion scan also emits the controlled sites'
        # payloads (cross probs + self (q,k)) as HBM-resident stacked arrays;
        # the edit scan then runs the bare 2-row CFG forward per step with no
        # replay row. BENCH_REPLAY=1 benchmarks the replay variant instead.

        # proactive HBM gate: a failed on-device capture costs ~10 min of
        # runtime OOM-retry before raising, so predict the payload size
        # (pure eval_shape, no device work, per-device under a mesh) and trim
        # the capture to the rows that fit — full capture when the budget
        # holds all steps, a window/budget-trimmed hybrid otherwise (stored
        # prefix + replay middle + identity-gated tail), full replay when not
        # even one row fits. FZ_PAYLOAD_BUDGET_GB overrides (v5e: 16 GB HBM -
        # ~2 GB params - workspace/trajectory leaves ~8 GB for the payload).
        budget = float(os.environ.get("FZ_PAYLOAD_BUDGET_GB", 8)) * 1e9
        rows = None
        if not replay:
            rows = pipe.plan_capture(
                latents, STEPS, window=controller().edit_window(STEPS),
                budget_bytes=budget,
            )
            if rows is None:
                replay = True
            print(f"[bench] capture plan: rows={rows}", file=sys.stderr)

        def invert():
            if replay:
                return pipe.invert_fast(latents, emb_src, STEPS), None
            return pipe.invert_fast(
                latents, emb_src, STEPS, capture=True, capture_rows=rows
            )

        try:
            traj, stored = invert()  # warmup compile
            jax.block_until_ready(traj)
            oom = False
        except Exception as e:  # noqa: BLE001 — HBM fallback, never skip the bench
            if not is_device_oom(e) or replay:
                raise
            oom = True
            print(
                f"[bench] invert-capture rows={rows} hit device OOM; falling "
                f"back to replay. Cause: {str(e).splitlines()[0][:200]}",
                file=sys.stderr,
            )
        if oom:
            # payload + workspace exceeded HBM at this workload: fall back to
            # replay-rematerialization (the stored_attention: false path).
            # The OOM usually surfaces at block_until_ready — AFTER the
            # poisoned output arrays were assigned — so they must be dropped
            # explicitly (and traceback cycles collected) or the retry finds
            # HBM still pinned and dies on its first tiny allocation.
            import gc

            traj = stored = None
            gc.collect()
            replay = True
            traj, stored = invert()
            jax.block_until_ready(traj)
        # free the warmup payload before the timed run: two live copies of
        # the ~GB stored capture would exhaust HBM
        traj = stored = None
        t0 = time.time()
        traj, stored = invert()
        jax.block_until_ready((traj, stored))
        t_invert = time.time() - t0

        def edit():
            out, _ = pipe.edit_fast(
                traj, emb_src, emb_tgt, controller(), STEPS, stored=stored,
                stored_row0=rows[0] if (rows and stored is not None) else 0,
            )
            return out

        try:
            jax.block_until_ready(edit())  # warmup compile
            oom = False
        except Exception as e:  # noqa: BLE001 — HBM fallback, never skip the bench
            if not is_device_oom(e) or stored is None:
                raise
            oom = True
            print(
                f"[bench] stored-payload edit hit device OOM; dropping the "
                f"payload (edit replays). Cause: {str(e).splitlines()[0][:200]}",
                file=sys.stderr,
            )
        if oom:  # outside the except: see the inversion fallback above
            import gc

            gc.collect()
            stored = None  # drop the payload; edit replays/rematerializes
            jax.block_until_ready(edit())
        t0 = time.time()
        out = edit()
        jax.block_until_ready(out)
        t_edit = time.time() - t0

        if VIZ:
            # product-default configuration: save_cross_attention=True in
            # P2pSampleLogger -> edit_fast(viz=True), which materializes the
            # five mid-res cross sites and accumulates the heatmap average
            def edit_viz():
                out, aux = pipe.edit_fast(
                    traj, emb_src, emb_tgt, controller(), STEPS,
                    stored=stored, viz=True,
                    stored_row0=rows[0] if (rows and stored is not None) else 0,
                )
                return out, aux["cross_avg"]

            jax.block_until_ready(edit_viz())  # warmup compile
            t0 = time.time()
            jax.block_until_ready(edit_viz())
            t_edit_viz = time.time() - t0
    else:
        # reference-shaped streaming store path
        # warmup: must use a throwaway store — capture/no-capture are
        # different jit keys
        pipe.invert(latents, emb_src, STEPS, store=AttentionStore(), save_self_attention=SAVE_SELF)

        store = AttentionStore()
        t0 = time.time()
        traj = pipe.invert(latents, emb_src, STEPS, store=store, save_self_attention=SAVE_SELF)
        jax.block_until_ready(traj[-1])
        t_invert = time.time() - t0

        def run_edit():
            out = pipe.sample(
                jnp.asarray(traj[-1]),
                emb_tgt,
                num_inference_steps=STEPS,
                guidance_scale=7.5,
                controller=controller(),
                inv_store=store,
                inverted_latents=traj[1:],
            )
            jax.block_until_ready(out)
            return out

        run_edit()  # warmup: compiles the (<=2) edit-step variants
        t0 = time.time()
        run_edit()
        t_edit = time.time() - t0

    total = t_invert + t_edit
    scale = (50 / STEPS) * (8 / FRAMES) * (512 / RES) ** 2  # normalize if reduced
    result = {
        "metric": f"car-turn {FRAMES}f {RES}^2 {STEPS}-step inversion+edit wall-clock",
        "value": round(total, 2),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / (total * scale), 3),
        "detail": {
            "invert_s": round(t_invert, 2),
            "edit_s": round(t_edit, 2),
            "edit_viz_s": round(t_edit_viz, 2)
            if MODE == "fused" and t_edit_viz is not None
            else None,
            "flash_grad_err": round(flash_grad_err, 6),
            "backend": jax.default_backend(),
            "mode": MODE,
            "stored_payload": MODE == "fused" and not replay and stored is not None,
            "stored_rows": list(rows)
            if (MODE == "fused" and not replay and stored is not None and rows)
            else None,
            "model_config": "default (full-SC stress)"
            if FULL_SC
            else "teaser-exact (lora160, ['mid'], least_sc_channel=640, eq x10)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
