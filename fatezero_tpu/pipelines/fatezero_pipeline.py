"""FateZero pipeline: DDIM inversion with attention capture + P2P editing.

The TPU re-architecture of the reference pipeline stack
(video_diffusion/pipelines/{stable_diffusion,ddim_spatial_temporal,
p2p_ddim_spatial_temporal}.py). Differences are structural, not semantic:

  * Each diffusion step is one jitted function; the 50-step loop lives in
    Python so captured attention maps stream device->host every step (the
    reference's CPU/disk offload, attention_store.py:87-108) while the next
    step's compute overlaps the copy (dispatch-before-fetch).
  * Plain sampling (no store/edit) additionally has a fully fused
    `lax.scan` path with zero host round trips.
  * All mutable controller state of the reference (step counters, position
    dicts, running sums) is either trace-time structure (ptp/context.py) or an
    explicit carry (the edit pass's running cross-map sums ride the step
    function as device arrays).

Step functions retrace only on static-flag changes (self-replace window
entry/exit, latent-blend window entry/exit): <= 4 compilations per edit run.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fatezero_tpu.ops import schedule as S
from fatezero_tpu.ptp.context import EditContext, EditParams, StoreContext
from fatezero_tpu.ptp.controller import EditController
from fatezero_tpu.ptp.spatial_blend import apply_latent_blend, blend_mask
from fatezero_tpu.ptp.store import AttentionStore

VAE_SCALE = 0.18215  # reference p2p_ddim_spatial_temporal.py:96


def _physical_bytes(s) -> int:
    """Tile-padded HBM footprint of one array (TPU T(8,128) layout).

    The last two dims pad to (8 * packing) sublanes x 128 lanes, where
    packing = 4 // itemsize for sub-word dtypes (bf16 packs 2 rows per
    sublane, so sublanes pad to 16). Leading dims multiply through.
    """
    itemsize = s.dtype.itemsize
    if len(s.shape) == 0:
        return itemsize
    pack = max(1, 4 // itemsize)
    lane = -(-s.shape[-1] // 128) * 128
    sub = -(-(s.shape[-2] if len(s.shape) >= 2 else 1) // (8 * pack)) * (8 * pack)
    lead = 1
    for d in s.shape[:-2]:
        lead *= d
    return lead * sub * lane * itemsize


def _payload_at_rest(extra):
    """Swap the two minor dims of every captured payload leaf for storage.

    The fused edit's internal layout preference for the stacked payload is
    lanes = s (qk [.., s, hd] wants physical [.., hd, s]; probs [.., s, 77]
    want [.., 77, s]) — measured from an on-chip compile dump: with the
    payload stored row-major in logical orientation, XLA relayouts EVERY
    leaf into a whole-array HLO-temp copy at the edit entry, so the ~8 GB
    payload exists twice and a 17.75 G demand OOMs the 15.75 G chip. Stored
    transposed, the default row-major layout IS the preferred layout: the
    in-body swapaxes back to logical orientation is a free bitcast, no
    copies. Bonus: [.., 77, s] is also physically denser than [.., s, 77]
    (sublanes pad 77->80 instead of lanes 77->128, 1.04x vs 1.66x).
    """
    return jax.tree.map(lambda a: jnp.swapaxes(a, -1, -2), extra)


def _payload_to_logical(extra):
    """Inverse of `_payload_at_rest` (applied per step after row indexing)."""
    return jax.tree.map(lambda a: jnp.swapaxes(a, -1, -2), extra)


def _blend_maps_16(captured: Dict[str, List], latent_hw: int) -> List:
    """The mid-resolution cross maps the blenders aggregate.

    The reference takes down_cross[2:4] + up_cross[:3] (spatial_blend.py:78)
    — which, in full-SD geometry with the <=32^2 store filter, is exactly the
    five maps at resolution latent/4 ("the 16x16 maps"). Select by that
    resolution semantics so every UNet geometry works, not just SD-1.4@512.
    """
    s_target = (latent_hw // 4) ** 2
    maps = [m for m in captured["down_cross"] if m.shape[-2] == s_target]
    maps += [m for m in captured["up_cross"] if m.shape[-2] == s_target]
    return maps


def _build_self_masks(injected: Dict[str, List], attn_alpha, attn_th, latent_hw: int,
                      self_sizes=None):
    """Per-resolution binary masks for the self-attention swap, from the
    inversion step's mid-res cross maps, source prompt only
    (attention_util.py:136-151). Returns ({s_tokens: [f, 1, s, 1]}, viz).

    self_sizes: explicit query-token sizes of the self sites (used when the
    store holds (q, k) pairs rather than probability maps)."""
    maps16 = [m.astype(jnp.float32) for m in _blend_maps_16(injected, latent_hw)]
    f = maps16[0].shape[1]
    self_masks = {}
    s_set = sorted(
        self_sizes
        if self_sizes is not None
        else {
            int(m.shape[-2])
            for k in ("down_self", "mid_self", "up_self")
            for m in injected.get(k, [])
        }
    )
    for s in s_set:
        r = int(np.sqrt(s))
        mask = blend_mask(maps16, attn_alpha, (r, r), attn_th)
        # [1, f, r, r] -> [f, 1, s, 1]
        self_masks[s] = mask[0].reshape(f, 1, s, 1)
    r_max = int(np.sqrt(max(s_set)))
    mask_viz = self_masks[max(s_set)].reshape(1, f, r_max, r_max)
    return self_masks, mask_viz


class FateZeroPipeline:
    """Bundles models + params + schedule; exposes invert / sample / edit."""

    def __init__(
        self,
        unet,
        unet_params,
        vae,
        vae_params,
        text_encoder,
        text_params,
        tokenizer,
        schedule: Optional[S.DiffusionSchedule] = None,
        store_dtype=jnp.bfloat16,
    ):
        def _device(params):
            # params must live on device once: passing host (numpy) pytrees
            # into jitted calls re-uploads them on EVERY invocation — 3.4 GB
            # per UNet call for SD-1.4 over the TPU relay
            return None if params is None else jax.tree.map(jnp.asarray, params)

        self.unet = unet
        self.unet_params = _device(unet_params)
        self.vae = vae
        self.vae_params = _device(vae_params)
        self.text_encoder = text_encoder
        self.text_params = _device(text_params)
        self.tokenizer = tokenizer
        self.schedule = schedule if schedule is not None else S.make_schedule()
        self.store_dtype = store_dtype
        self.mesh = None
        self._jit_cache: Dict = {}

    # ---------------------------------------------------------------- mesh
    def shard(self, mesh) -> "FateZeroPipeline":
        """Distribute the pipeline over a device mesh (axes data/seq/tensor).

        UNet kernels get megatron-style tensor sharding, the frame axis of
        latents/trajectories shards over 'seq' (sequence parallelism — the
        SparseCausalAttention {prev, first} KV gather becomes an ICI
        collective inserted by GSPMD), VAE/text params replicate. The fused
        scan paths pick the shardings up automatically from their inputs.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fatezero_tpu.parallel.sharding import shard_params

        self.mesh = mesh
        self.unet_params = shard_params(self.unet_params, mesh)
        rep = NamedSharding(mesh, P())
        if self.vae_params is not None:
            self.vae_params = jax.device_put(self.vae_params, rep)
        if self.text_params is not None:
            self.text_params = jax.device_put(self.text_params, rep)
        self._jit_cache.clear()
        return self

    def _traced(self, fn):
        """Run `fn` (a jitted program) under the ambient seq-mesh scope.

        Tracing happens on the first call, so wrapping every call makes
        gather_sparse_kv see the mesh at trace time and emit the shard_map
        halo exchange instead of a GSPMD full-KV all-gather. No-op when the
        pipeline is unsharded.
        """
        if self.mesh is None:
            return fn
        from fatezero_tpu.parallel.sharding import seq_mesh_scope

        mesh = self.mesh

        def wrapped(*args, **kwargs):
            with seq_mesh_scope(mesh):
                return fn(*args, **kwargs)

        return wrapped

    def _shard_video(self, x: jax.Array, frame_axis: int = 1) -> jax.Array:
        """Place a [..., F, H, W, C] array with frames over the 'seq' axis."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = [None] * x.ndim
        spec[frame_axis] = "seq"
        return jax.device_put(x, NamedSharding(self.mesh, P(*spec)))

    # ------------------------------------------------------------------ text
    def encode_prompt(self, prompt: str, negative_prompt: str = "") -> jax.Array:
        """[2, 77, C] (uncond, cond) text embeddings (stable_diffusion.py:180-295)."""
        ids = self.tokenizer([negative_prompt, prompt]).input_ids
        # params are explicit jit ARGUMENTS everywhere: closing over them
        # inlines hundreds of MB of weights as HLO constants, which blows up
        # compile requests (the axon remote-compile relay rejects them with
        # HTTP 413) and bloats the executable cache
        fwd = self._jit_cache.setdefault(
            "text",
            jax.jit(lambda params, ids: self.text_encoder.apply(params, ids)),
        )
        return fwd(self.text_params, jnp.asarray(ids))

    # ------------------------------------------------------------------- vae
    def encode_video(self, images, rng: Optional[jax.Array] = None) -> jax.Array:
        """images [f, h, w, 3] in [-1, 1] -> latents [1, f, h/8, w/8, 4] (scaled)."""
        enc = self._jit_cache.setdefault(
            "vae_encode",
            jax.jit(lambda params, px: self.vae.apply(params, px, method="encode")),
        )
        mean, logvar = enc(self.vae_params, jnp.asarray(images))
        z = mean
        if rng is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        # diffusion state is fp32 regardless of model dtype (SURVEY §7.1 #4;
        # the reference keeps fp32 latents under fp16 models too)
        return (z * VAE_SCALE)[None].astype(jnp.float32)

    def decode_latents(self, latents: jax.Array, chunk: int = 16) -> np.ndarray:
        """latents [1, f, h, w, 4] -> video [f, 8h, 8w, 3] in [0, 1], decoded in
        frame chunks (stable_diffusion.py:297-319)."""
        dec = self._jit_cache.setdefault(
            "vae_decode",
            jax.jit(lambda params, z: self.vae.apply(params, z, method="decode")),
        )
        frames = latents[0] / VAE_SCALE
        outs = []
        for i in range(0, frames.shape[0], chunk):
            outs.append(np.asarray(dec(self.vae_params, frames[i : i + chunk])))
        video = np.concatenate(outs, axis=0)
        return np.clip(video / 2.0 + 0.5, 0.0, 1.0)

    # ------------------------------------------------------------- inversion
    def invert(
        self,
        latents: jax.Array,
        cond_embeddings: jax.Array,
        num_inference_steps: int = 50,
        store: Optional[AttentionStore] = None,
        save_self_attention: bool = True,
    ) -> List[np.ndarray]:
        """Clean -> noisy DDIM loop with optional attention capture.

        Matches ddim_clean2noisy_loop (p2p_ddim_spatial_temporal.py:131-148):
        runs the *conditional* embedding only (no CFG during inversion),
        walks the timestep grid in reverse, stores every step's maps+latent.
        Returns the [clean, ...50x noisier] latent trajectory (host copies).
        """
        timesteps = S.ddim_timesteps(self.schedule, num_inference_steps)
        capture = store is not None
        key = ("invert", num_inference_steps, save_self_attention, capture)
        if key not in self._jit_cache:

            @jax.jit
            def step(latent, t, cond_emb, params):
                ctx = (
                    StoreContext(
                        save_self_attention=save_self_attention,
                        store_dtype=self.store_dtype,
                    )
                    if capture
                    else None
                )
                eps = self.unet.apply(params, latent, t, cond_emb, attn_ctx=ctx)
                new_latent = S.ddim_invert_step(
                    self.schedule, eps, t, latent, num_inference_steps
                )
                return new_latent, ctx.captured if capture else {}

            self._jit_cache[key] = self._traced(step)
        step_fn = self._jit_cache[key]

        cond = cond_embeddings[-1:]  # cond half only
        all_latents = [np.asarray(latents)]
        latent = latents.astype(jnp.float32)
        pending = None  # (captured, latent) awaiting host fetch
        for i in range(num_inference_steps):
            t = jnp.int32(timesteps[num_inference_steps - i - 1])
            latent, captured = step_fn(latent, t, cond, self.unet_params)
            # fetch the previous step's results while this one computes
            if pending is not None:
                if store is not None:
                    store.append_step(*pending)
                all_latents.append(np.asarray(pending[1]))
            pending = (captured, latent)
        if pending is not None:
            if store is not None:
                store.append_step(*pending)
            all_latents.append(np.asarray(pending[1]))
        return all_latents

    # ------------------------------------------------------------- sampling
    def sample_fast(
        self,
        latents: jax.Array,
        text_embeddings: jax.Array,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        strength: float = 1.0,
    ) -> jax.Array:
        """Fused lax.scan denoising loop (no store, no edit): the pure-speed
        path for plain generation/reconstruction. strength < 1 runs only the
        last int(steps*strength) timesteps (img2img semantics,
        stable_diffusion.py strength handling)."""
        key = ("scan", num_inference_steps, float(strength))
        if key not in self._jit_cache:
            ts = S.ddim_timesteps(self.schedule, num_inference_steps)
            n_used = min(num_inference_steps, int(num_inference_steps * strength))
            timesteps = jnp.asarray(ts[num_inference_steps - n_used :], jnp.int32)

            @jax.jit
            def run(latent, text_emb, guidance, params):
                def body(lat, t):
                    lat_in = jnp.concatenate([lat, lat], axis=0)
                    eps = self.unet.apply(params, lat_in, t, text_emb)
                    eps = S.classifier_free_guidance(eps[:1], eps[1:], guidance)
                    lat = S.ddim_denoise_step(
                        self.schedule, eps, t, lat, num_inference_steps
                    )
                    return lat, None

                lat, _ = jax.lax.scan(body, latent, timesteps)
                return lat

            self._jit_cache[key] = self._traced(run)
        return self._jit_cache[key](
            latents.astype(jnp.float32), text_embeddings, jnp.float32(guidance_scale), self.unet_params
        )

    def sample(
        self,
        latents: jax.Array,
        text_embeddings: jax.Array,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        controller: Optional[EditController] = None,
        inv_store: Optional[AttentionStore] = None,
        edit_store: Optional[AttentionStore] = None,
        inverted_latents: Optional[List[np.ndarray]] = None,
        strength: float = 1.0,
    ) -> jax.Array:
        """Noisy -> clean CFG denoising (sd_ddim_pipeline,
        p2p_ddim_spatial_temporal.py:260-435).

        controller=None: plain loop; pass edit_store to capture maps (the
        reference's edit_type='save'). controller=EditController: prompt-to-
        prompt editing consuming inv_store (edit_type='swap'). strength < 1
        skips the earliest (noisiest) timesteps, img2img-style: the
        get_timesteps semantics the reference defines
        (p2p_ddim_spatial_temporal.py:163-170) — note the reference's own
        denoise loop leaves the slicing disabled (ddim_spatial_temporal.py:
        237-238 commented out), so the tune/shape configs' `strength: 0.99`
        is inert there; here the documented semantics are implemented, with
        store/replay indices aligned to the *noise level* of each timestep.
        """
        timesteps = S.ddim_timesteps(self.schedule, num_inference_steps)
        n_used = num_inference_steps
        t_start = 0
        if strength < 1.0:
            n_used = min(num_inference_steps, int(num_inference_steps * strength))
            t_start = num_inference_steps - n_used
            timesteps = timesteps[t_start:]
        latent = latents.astype(jnp.float32)

        if controller is None:
            if edit_store is None:
                return self.sample_fast(
                    latents, text_embeddings, num_inference_steps, guidance_scale,
                    strength=strength,
                )
            step_fn = self._save_step(num_inference_steps)
            pending = None
            for i in range(len(timesteps)):
                t = jnp.int32(timesteps[i])
                latent, captured = step_fn(
                    latent, t, text_embeddings, jnp.float32(guidance_scale), self.unet_params
                )
                if pending is not None:
                    edit_store.append_step(*pending)
                pending = (captured, latent)
            if pending is not None:  # strength can slice the grid empty
                edit_store.append_step(*pending)
            return latent

        assert inv_store is not None, "editing requires the inversion attention store"
        num_stored = len(inv_store.attention_store_all_step)
        blend_sums = None  # running cross-map sums carried on device
        attn_alpha = (
            jnp.asarray(controller.attention_blend.alpha_layers[:1])
            if controller.attention_blend is not None
            else None
        )
        latent_alpha = (
            jnp.asarray(controller.latent_blend.alpha_layers)
            if controller.latent_blend is not None
            else None
        )
        for i in range(n_used):
            t = jnp.int32(timesteps[i])
            # inversion stores are full-grid: align by noise level (grid
            # position t_start+i); 'save'-mode stores were captured on the
            # same sliced grid, so the plain step counter lines up.
            store_step = t_start + i if controller.use_inversion_attention else i
            idx = controller.step_in_store(store_step, num_stored)
            injected = jax.tree.map(jnp.asarray, inv_store.step_maps(idx))

            blend_now = (
                controller.latent_blend is not None
                and controller.latent_blend.latent_blend_active(i)
            )
            inv_latent = None
            if controller.latent_blend is not None:
                # True mode matches the reference exactly (latents_store
                # index len - cur_step, attention_util.py:53). For the False
                # ('save') mode the reference reads latents_store[cur_step]
                # with cur_step already incremented — one step AHEAD of the
                # current noise level, and an IndexError on its own final
                # step; we blend at the matching noise level (i+1 into the
                # [clean, ...] trajectory) instead. Deliberate deviation.
                lat_idx = (
                    len(inverted_latents) - 1 - (t_start + i)
                    if controller.use_inversion_attention
                    else i + 1
                )
                inv_latent = jnp.asarray(inverted_latents[lat_idx])
            if blend_sums is None and controller.latent_blend is not None:
                blend_sums = [
                    jnp.zeros(m.shape, jnp.float32)
                    for m in _blend_maps_16(injected, latents.shape[2])
                ]
            step_fn = self._edit_step(
                num_steps=num_inference_steps,
                self_active=controller.self_replace_active(i),
                cross_kind=controller.cross_edit_kind,
                use_attn_blend=controller.attention_blend is not None,
                use_latent_blend=controller.latent_blend is not None,
                blend_now=blend_now,
                save_self=controller.save_self_attention,
                attn_th=controller.attention_blend.th[0]
                if controller.attention_blend is not None
                else 0.3,
                latent_th=controller.latent_blend.th[0]
                if controller.latent_blend is not None
                else 0.3,
            )
            latent, captured, blend_sums, masks = step_fn(
                latent,
                t,
                text_embeddings,
                jnp.float32(guidance_scale),
                injected,
                controller.alpha_words(i),
                None if controller.mapper is None else jnp.asarray(controller.mapper),
                None
                if controller.refine_mapper is None
                else jnp.asarray(controller.refine_mapper),
                None
                if controller.refine_alphas is None
                else jnp.asarray(controller.refine_alphas),
                None if controller.equalizer is None else jnp.asarray(controller.equalizer),
                blend_sums,
                inv_latent,
                attn_alpha,
                latent_alpha,
                self.unet_params,
            )
            if edit_store is not None:
                edit_store.append_step(captured, latent)
            if controller.attention_blend is not None and masks["attention_blend"] is not None:
                controller.attention_blend.counter += 1
                controller.attention_blend.record(
                    np.asarray(masks["attention_blend"]), f"step{i:03d}"
                )
            if controller.latent_blend is not None and masks["latent_blend"] is not None:
                controller.latent_blend.counter += 1
                controller.latent_blend.record(
                    np.asarray(masks["latent_blend"]), f"step{i:03d}"
                )
        return latent

    # ------------------------------------------------- fused scan fast path
    def invert_fast(
        self,
        latents: jax.Array,
        cond_embeddings: jax.Array,
        num_inference_steps: int = 50,
        capture: bool = False,
        capture_rows=None,
    ):
        """Clean -> noisy DDIM inversion as one fused `lax.scan`, returning the
        device-resident latent trajectory [steps+1, 1, f, h, w, 4].

        TPU-native replacement for the reference's capture-everything
        inversion: instead of streaming ~1.5 GB of attention maps to host RAM
        per step (attention_store.py:95-109 — the reason the reference needs
        100 GB RAM), only the ~0.5 MB/step latent trajectory is kept;
        `edit_fast` recomputes each step's maps on the fly (FLOPs are cheap on
        the MXU, HBM<->host bandwidth is not).

        capture=True additionally returns (traj, stored): the controlled
        sites' payloads as HBM-resident scan-stacked arrays — cross
        probabilities per step (`stored['probs']`, at-rest layout
        [steps, 1, f, h, 77, s] — minor dims TRANSPOSED, `_payload_at_rest`)
        and self-site merged (q, k) pairs (`stored['qk']`,
        [steps, 1, f, h*d, s]). The inversion forward IS the
        edit pass's replay forward (same latent, timestep, params — for both
        use_inversion_attention settings the index algebra lines up), so
        `edit_fast(stored=...)` can skip its replay row entirely: the edit
        step becomes the bare 2-row CFG forward. Cost: ~130 MB/step of HBM
        writes (bf16, SD-1.4 8f 64^2 grid), ~6.5 GB total at 50 steps —
        device-resident, never touching the host (the reference's 100 GB host
        store, shrunk (q,k)-wise by kv/2d and kept on-chip).

        capture_rows=(row0, count) trims the capture to inversion-scan rows
        [row0, row0+count) — the rows a budget-bound edit actually consumes
        (`plan_capture`). The scan splits into plain/capture/plain segments;
        `stored` leaves then have leading dim `count`, and `edit_fast` must
        be told `stored_row0=row0`.
        """
        steps = num_inference_steps
        if capture_rows is not None and capture:
            row0, count = int(capture_rows[0]), int(capture_rows[1])
            if (row0, count) == (0, steps):
                capture_rows = None  # full capture: reuse the untrimmed graph
        key = ("invert_scan", steps, bool(capture), capture_rows)
        if key not in self._jit_cache:
            ts_up = jnp.asarray(
                S.ddim_timesteps(self.schedule, steps)[::-1], jnp.int32
            )

            @jax.jit
            def run(latent, cond, params):
                def make_body(cap):
                    def body(lat, t):
                        if cap:
                            sctx = StoreContext(
                                save_self_attention=False,
                                store_dtype=self.store_dtype,
                                self_qk=True,
                            )
                            eps = self.unet.apply(params, lat, t, cond, attn_ctx=sctx)
                            extra = _payload_at_rest(
                                {"probs": sctx.captured, "qk": sctx.captured_qk}
                            )
                        else:
                            eps = self.unet.apply(params, lat, t, cond)
                            extra = {}
                        new = S.ddim_invert_step(self.schedule, eps, t, lat, steps)
                        return new, (new, extra)

                    return body

                if capture and capture_rows is not None:
                    # plain / capture / plain segments over the same carry
                    segs = [
                        (0, row0, False),
                        (row0, row0 + count, True),
                        (row0 + count, steps, False),
                    ]
                    lat, trajs, stored = latent, [latent[None]], None
                    for lo, hi, cap in segs:
                        if hi <= lo:
                            continue
                        lat, (stacked, extra) = jax.lax.scan(
                            make_body(cap), lat, ts_up[lo:hi]
                        )
                        trajs.append(stacked)
                        if cap:
                            stored = extra
                    return jnp.concatenate(trajs, axis=0), stored

                _, (stacked, stored) = jax.lax.scan(make_body(capture), latent, ts_up)
                traj = jnp.concatenate([latent[None], stacked], axis=0)
                return (traj, stored) if capture else traj

            self._jit_cache[key] = self._traced(run)
        latents = self._shard_video(latents.astype(jnp.float32), frame_axis=1)
        return self._jit_cache[key](latents, cond_embeddings[-1:], self.unet_params)

    def capture_payload_bytes(
        self, latents: jax.Array, num_inference_steps: int = 50,
        per_device: bool = False,
    ) -> int:
        """Predict `invert_fast(capture=True)`'s stored-payload HBM footprint
        WITHOUT running anything (pure `jax.eval_shape` abstract trace).

        Counts PHYSICAL bytes, not logical: TPU arrays tile-pad their last
        two dims (sublanes to 8x the dtype packing, lanes to 128). Round 4
        gated on logical bytes and a 16-frame capture OOMed at compile with
        the gate green — the padding was the entire gap. The at-rest
        transpose (`_payload_at_rest`) makes the big leaves lane-dense, so
        physical is now within ~5% of logical, but small leaves (8^2 sites,
        s=64 lanes) still pad 2x — the physical count stays the gate.

        A failed on-device capture is expensive to recover from: the TPU
        runtime spends minutes retrying before raising RESOURCE_EXHAUSTED,
        and the poisoned output arrays keep HBM pinned while they are
        referenced. Callers (bench.py, cli/edit.py) compare this estimate
        against a payload budget and fall back to replay rematerialization
        proactively instead of paying that cost.

        When the pipeline is sharded, the trace runs under the ambient
        seq-mesh scope so the stored shapes match the halo-exchange form the
        real capture takes. `per_device=True` returns the per-chip footprint:
        every payload leaf carries the frame axis (cross probs [1, f, h, s, 77],
        self (q, k) [f*h, s, d]), so the scan-stacked capture inherits the
        frame-axis 'seq' sharding and each device holds global/seq bytes.
        """
        t0 = jnp.int32(0)

        def one_step(lat, cond, params):
            sctx = StoreContext(
                save_self_attention=False,
                store_dtype=self.store_dtype,
                self_qk=True,
            )
            self.unet.apply(params, lat, t0, cond, attn_ctx=sctx)
            return _payload_at_rest({"probs": sctx.captured, "qk": sctx.captured_qk})

        def trace():
            return jax.eval_shape(
                one_step,
                jax.ShapeDtypeStruct(latents.shape, jnp.float32),
                jax.ShapeDtypeStruct(
                    (1, 77, self.unet.cfg.cross_attention_dim), jnp.float32
                ),
                self.unet_params,
            )

        if self.mesh is None:
            shapes = trace()
        else:
            from fatezero_tpu.parallel.sharding import seq_mesh_scope

            with seq_mesh_scope(self.mesh):
                shapes = trace()
        per_step = sum(
            _physical_bytes(s) for s in jax.tree.leaves(shapes)
        )
        total = per_step * num_inference_steps
        if per_device and self.mesh is not None:
            sizes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
            total //= max(1, sizes.get("seq", 1))
        return total

    def plan_capture(
        self,
        latents: jax.Array,
        num_inference_steps: int,
        window: int,
        budget_bytes: float,
        strength: float = 1.0,
        use_inversion_attention: bool = True,
    ):
        """Pick the inversion rows worth capturing: (row0, count) or None.

        `window` is the number of leading edit steps that actually consume
        injected attention (EditController.edit_window) — rows beyond it are
        dead weight at capture time. `budget_bytes` is the PER-DEVICE payload
        budget; the count is clamped so the sharded per-chip footprint fits.
        Returns (0, steps) when everything fits (the untrimmed fast path),
        (row0, k) for a partial capture serving edit steps [0, k) (the rest
        of the edit runs replay rematerialization / identity-gated stored
        steps), or None when not even one step fits.
        """
        steps = num_inference_steps
        strength = 1.0 if strength is None else float(strength)
        n_used = min(steps, int(steps * strength)) if strength < 1.0 else steps
        per_step = self.capture_payload_bytes(latents, 1, per_device=True)
        budget_steps = int(budget_bytes // max(1, per_step))
        if budget_steps >= steps:
            return (0, steps)
        k = max(0, min(n_used, int(window), budget_steps))
        if k == 0:
            return None
        row0 = (n_used - k) if use_inversion_attention else 0
        return (row0, k)

    def edit_fast(
        self,
        traj: jax.Array,
        cond_embeddings: jax.Array,
        text_embeddings: jax.Array,
        controller: EditController,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        strength: float = 1.0,
        viz: bool = False,
        stored=None,
        stored_row0: int = 0,
    ) -> jax.Array:
        """Prompt-to-prompt edit as ONE fused `lax.scan` over all steps.

        Per step the body (a) *replays* the matching inversion step's UNet
        forward from the latent trajectory to rematerialize its attention maps
        (bit-identical to what a store would hold: same latent, timestep,
        params => same maps), (b) runs the CFG edit forward with those maps
        injected, (c) applies windowed self-swap / latent blends via traced
        {0,1} gates so every scan iteration is the same graph. Zero attention
        maps ever leave the device.

        traj: output of `invert_fast`. cond_embeddings: source-prompt pair
        (cond half used for replay). text_embeddings: target pair [2, 77, C].
        Returns (edited_latent, aux) with stacked per-step blend masks; with
        `viz` the aux also carries `cross_avg` [1, f, (hw/4)^2, 77] — the
        live cond-row cross maps at the 16x16 resolution, averaged over
        layers/heads/steps, for the reference's per-edit heatmap artifact
        (p2p_ddim_spatial_temporal.py:211-215). Cost: the 5 mid-res cross
        sites run materialized instead of value-space (they are tiny).

        A partial payload from `invert_fast(capture_rows=(row0, k))` (pass
        `stored_row0=row0`) splits the scan into segments: edit steps served
        by the payload run the bare 2-row stored body, in-window steps beyond
        it fall back to replay rematerialization, and identity-gated tail
        steps (past the controller's edit window) run the stored body against
        a clamped payload row whose values are multiplied away by the zero
        alpha/self gates — capture scales to frame counts whose full payload
        exceeds per-device HBM. Each segment compiles as its own jit dispatch
        (`_build_segment`) so the payload is an argument of only the segments
        that read it — one whole-edit jit keeps the payload live across the
        replay middle too and OOMs the 16-frame hybrid at compile.
        """
        steps = num_inference_steps
        use_stored = stored is not None
        use_attn_blend = controller.attention_blend is not None
        use_latent_blend = controller.latent_blend is not None
        attn_th = controller.attention_blend.th[0] if use_attn_blend else 0.3
        latent_th = controller.latent_blend.th[0] if use_latent_blend else 0.3
        any_self = any(controller.self_replace_active(i) for i in range(steps))
        save_self = any_self or use_attn_blend  # what the replay must capture
        # Single-forward mode: replay rides the CFG batch as row 0 and each
        # attention site edits the cond row against row 0 in place — one UNet
        # application per step instead of two. Requires the replay timestep to
        # equal the edit timestep (use_inversion_attention) and no
        # blend_self_attention (its masks need maps of later layers).
        # stored mode (invert_fast(capture=True)): the replay/capture forward
        # disappears entirely — each step consumes its inversion payload from
        # the scan inputs and runs only the 2-row CFG forward.
        inline = controller.use_inversion_attention and not use_attn_blend and not use_stored

        # strength < 1 runs only the last n_used (least-noisy) grid positions;
        # the start latent and all replay/blend trajectory indices shift by
        # t_start so each edit step consumes the inversion state at ITS noise
        # level. Controller schedules (cross/self windows, alpha words) count
        # executed edit steps, as the reference's cur_step does.
        n_used = min(steps, int(steps * strength)) if strength < 1.0 else steps
        t_start = steps - n_used

        timesteps = np.asarray(S.ddim_timesteps(self.schedule, steps), np.int64)
        idx = np.arange(n_used)
        grid = t_start + idx
        if controller.use_inversion_attention:
            replay_idx = steps - 1 - grid
            blend_idx = steps - grid
            replay_ts = timesteps[grid]
        else:
            replay_idx = idx
            blend_idx = idx + 1
            replay_ts = timesteps[::-1][idx]

        xs = {
            "t": jnp.asarray(timesteps[grid], jnp.int32),
            "replay_t": jnp.asarray(replay_ts, jnp.int32),
            "alpha_words": jnp.asarray(
                controller.alpha_time_words[:n_used, 0], jnp.float32
            ),
            "self_gate": jnp.asarray(
                [1.0 if controller.self_replace_active(i) else 0.0 for i in range(n_used)],
                jnp.float32,
            ),
        }
        if use_latent_blend:
            xs["blend_gate"] = jnp.asarray(
                [
                    1.0 if controller.latent_blend.latent_blend_active(i) else 0.0
                    for i in range(n_used)
                ],
                jnp.float32,
            )
        # scan segments [lo, hi, stored?]: with a full payload, one stored
        # segment (or one replay segment when stored is None). With a partial
        # payload (capture_rows), the served prefix runs stored, in-window
        # unserved steps run replay, and identity tail steps (past the
        # controller's edit window — zero alpha/self gates) run stored against
        # a clamped row.
        if use_stored:
            k_rows = int(jax.tree.leaves(stored)[0].shape[0])
            served = (replay_idx >= stored_row0) & (replay_idx < stored_row0 + k_rows)
            n_stored = int(served.argmin()) if not served.all() else n_used
            assert served[:n_stored].all() and not served[n_stored:].any(), (
                "stored payload rows must serve a contiguous prefix of edit "
                f"steps (rows [{stored_row0}, {stored_row0 + k_rows}) vs "
                f"replay indices {replay_idx.tolist()})"
            )
            if n_stored == n_used:
                segments = ((0, n_used, True),)
            else:
                w_id = max(controller.edit_window(n_used), n_stored)
                segments = (
                    (0, n_stored, True),
                    (n_stored, w_id, False),
                    (w_id, n_used, True),
                )
                segments = tuple(s for s in segments if s[1] > s[0])
        else:
            segments = ((0, n_used, False),)

        if use_stored:
            # edit step j consumes inversion step replay_idx[j]'s payload —
            # indexed per step INSIDE the scan (dynamic_index_in_dim on the
            # loop-invariant stacked arrays): a host-side gather would
            # materialize a second full copy of the ~GB payload in HBM.
            # Steps past the stored prefix clamp to row 0 (their stored
            # segment is identity-gated; the value never contributes).
            xs["replay_pos"] = jnp.asarray(
                np.clip(replay_idx - stored_row0, 0, k_rows - 1), jnp.int32
            )

        ed = {
            "mapper": controller.mapper,
            "refine_mapper": controller.refine_mapper,
            "refine_alphas": controller.refine_alphas,
            "equalizer": controller.equalizer,
            "attn_alpha": controller.attention_blend.alpha_layers[:1]
            if use_attn_blend
            else None,
            "latent_alpha": controller.latent_blend.alpha_layers
            if use_latent_blend
            else None,
        }
        ed = {k: (None if v is None else jnp.asarray(v)) for k, v in ed.items()}

        key = (
            "edit_scan",
            steps,
            n_used,
            controller.cross_edit_kind,
            controller.equalizer is not None,
            use_attn_blend,
            use_latent_blend,
            any_self,
            controller.use_inversion_attention,
            inline,
            use_stored,
            segments,
            int(stored_row0),
            float(attn_th),
            float(latent_th),
            bool(viz),
            traj.shape,
            # per-step schedules are baked into the trace as constants —
            # distinct alpha/gate schedules must not share a compiled graph
            hash(
                np.asarray(xs["alpha_words"]).tobytes()
                + np.asarray(xs["self_gate"]).tobytes()
                + (
                    np.asarray(xs["blend_gate"]).tobytes()
                    if use_latent_blend
                    else b""
                )
            ),
        )
        latent_hw = int(traj.shape[-3])

        def _build_segment(lo, hi, seg_stored, first):
            """One scan segment as its OWN jit dispatch.

            Per-segment jits keep the stored payload an argument of only the
            segments that read it: inside one whole-edit jit the ~8-12 GB
            payload argument stays live across the replay middle segment too,
            and the 16-frame hybrid edit compile OOMs (measured on chip:
            payload arguments + replay-segment temps > 15.75 G). Dispatch
            overhead is a few ms per extra segment; the single-segment
            (full-capture / full-replay) graph is the same program as the
            previous whole-edit jit.
            """
            seg_xs = {k2: v[lo:hi] for k2, v in xs.items()}

            @jax.jit
            def run(traj, cond_src, text_emb, guidance, ed, stored_x, params, carry_in):
                blend_lats = (
                    traj[jnp.asarray(blend_idx[lo:hi])] if use_latent_blend else None
                )

                def capture(lat, t):
                    # self sites capture (q, k) instead of probabilities —
                    # the edit forward rematerializes the swap through the
                    # flash kernel (EditContext.value_space_attention), so
                    # neither pass materializes [*, s, kv] self maps
                    sctx = StoreContext(
                        save_self_attention=False,
                        store_dtype=self.store_dtype,
                        self_qk=save_self,
                    )
                    # capture-only: blocks above the controlled-token threshold
                    # (and the output conv) contribute no stored maps and are
                    # skipped entirely (unet3d.py drop_replay_rows)
                    self.unet.apply(
                        params, lat, t, cond_src, attn_ctx=sctx,
                        drop_replay_rows=lat.shape[0],
                    )
                    return sctx.captured, sctx.captured_qk

                if use_latent_blend and first:
                    # only the first segment builds the blend-sum carry; later
                    # segments inherit it through carry_in (their stored_x may
                    # be None or a 1-row tail view)
                    if use_stored:
                        inj_shapes = _payload_to_logical(
                            jax.tree.map(lambda a: a[0], stored_x["probs"])
                        )
                    else:
                        inj_shapes, _ = jax.eval_shape(
                            capture, traj[0], jnp.int32(timesteps[0])
                        )
                    sums0 = [
                        jnp.zeros(m.shape, jnp.float32)
                        for m in _blend_maps_16(inj_shapes, latent_hw)
                    ]
                else:
                    sums0 = []

                s16 = (latent_hw // 4) ** 2
                vsum0 = (
                    jnp.zeros((1, traj.shape[2], s16, 77), jnp.float32)
                    if viz
                    else jnp.zeros((1,), jnp.float32)
                )

                def _viz16(ctx_maps):
                    """Mean over the 5 mid-res cross sites' layers+heads of the
                    live cond-row maps: [1, f, s16, 77]."""
                    maps16 = _blend_maps_16(ctx_maps, latent_hw)
                    tot = sum(m.astype(jnp.float32).sum(axis=2) for m in maps16)
                    n = sum(int(m.shape[2]) for m in maps16)
                    return tot / n

                def _latent_blend_step(new_latent, sums, live_ctx_maps, inv_maps, blend_lat, bg):
                    live16 = [
                        m.astype(jnp.float32)
                        for m in _blend_maps_16(live_ctx_maps, latent_hw)
                    ]
                    sums = [s + m for s, m in zip(sums, live16)]
                    pair = [
                        jnp.concatenate([im.astype(jnp.float32), sm], axis=0)
                        for im, sm in zip(_blend_maps_16(inv_maps, latent_hw), sums)
                    ]
                    hw = new_latent.shape[2:4]
                    lmask = blend_mask(pair, ed["latent_alpha"], hw, latent_th)
                    lmask = jnp.maximum(lmask[:1], lmask)  # union ('both')
                    blended = apply_latent_blend(new_latent, blend_lat, lmask)
                    return bg * blended + (1.0 - bg) * new_latent, sums, lmask

                text3 = jnp.concatenate([cond_src, text_emb], axis=0)  # [3,77,C]

                def body_inline(carry, x):
                    latent, sums, vsum = carry
                    rep_lat, blend_lat, x = x
                    ep = EditParams(
                        cross_edit_kind=controller.cross_edit_kind,
                        mapper=ed["mapper"],
                        refine_mapper=ed["refine_mapper"],
                        refine_alphas=ed["refine_alphas"],
                        equalizer=ed["equalizer"],
                        self_replace_active=False,
                        self_gate=x["self_gate"] if any_self else None,
                        self_masks=None,
                        save_self_attention=False,
                    )
                    from fatezero_tpu.ptp.context import InlineEditContext

                    ictx = InlineEditContext(
                        ep,
                        x["alpha_words"],
                        store_dtype=self.store_dtype,
                        capture_for_blend=use_latent_blend,
                        viz_size=s16 if viz else None,
                    )
                    lat_in = jnp.concatenate([rep_lat, latent, latent], axis=0)
                    # replay row 0 is dropped from the batch once no stored/
                    # edited attention site remains (unet3d.py drop_replay_rows)
                    eps = self.unet.apply(
                        params, lat_in, x["t"], text3, attn_ctx=ictx,
                        drop_replay_rows=1,
                    )
                    if eps.shape[0] == 3:  # low-res: nothing was droppable
                        eps = eps[1:]
                    eps = S.classifier_free_guidance(eps[:1], eps[1:], guidance)
                    new_latent = S.ddim_denoise_step(
                        self.schedule, eps, x["t"], latent, steps
                    )
                    outs = {}
                    if use_latent_blend:
                        new_latent, sums, lmask = _latent_blend_step(
                            new_latent, sums, ictx.captured, ictx.captured_inv,
                            blend_lat, x["blend_gate"],
                        )
                        outs["latent_mask"] = lmask
                    if viz:
                        vsum = vsum + _viz16(ictx.captured)
                    return (new_latent, sums, vsum), outs

                def make_body(seg_stored):
                    def body(carry, x):
                        latent, sums, vsum = carry
                        rep_lat, blend_lat, x = x
                        if seg_stored:
                            st = jax.tree.map(
                                lambda a: jax.lax.dynamic_index_in_dim(
                                    a, x["replay_pos"], 0, keepdims=False
                                ),
                                stored_x,
                            )
                            st = _payload_to_logical(st)  # at-rest is transposed
                            injected, injected_qk = st["probs"], st["qk"]
                        else:
                            injected, injected_qk = capture(rep_lat, x["replay_t"])
                        self_masks = mask_viz = None
                        if use_attn_blend:
                            self_sizes = {
                                int(q.shape[-2])
                                for lst in injected_qk.values()
                                for (q, _k) in lst
                            }
                            self_masks, mask_viz = _build_self_masks(
                                injected, ed["attn_alpha"], attn_th, latent_hw,
                                self_sizes=self_sizes,
                            )
                        ep = EditParams(
                            cross_edit_kind=controller.cross_edit_kind,
                            mapper=ed["mapper"],
                            refine_mapper=ed["refine_mapper"],
                            refine_alphas=ed["refine_alphas"],
                            equalizer=ed["equalizer"],
                            self_replace_active=False,
                            self_gate=x["self_gate"] if any_self else None,
                            self_masks=self_masks,
                            save_self_attention=False,  # live self maps unused here
                        )
                        ectx = EditContext(
                            injected=injected,
                            params=ep,
                            alpha_words=x["alpha_words"],
                            store_dtype=self.store_dtype,
                            injected_qk=injected_qk,
                            # cross sites run probability-free against the
                            # injected base; only the mid-res sites whose live
                            # maps feed the latent blend / viz stay materialized
                            value_space_cross=True,
                            materialize_cross_size=s16
                            if (use_latent_blend or viz)
                            else None,
                        )
                        lat_in = jnp.concatenate([latent, latent], axis=0)
                        eps = self.unet.apply(
                            params, lat_in, x["t"], text_emb, attn_ctx=ectx
                        )
                        eps = S.classifier_free_guidance(eps[:1], eps[1:], guidance)
                        new_latent = S.ddim_denoise_step(
                            self.schedule, eps, x["t"], latent, steps
                        )

                        outs = {}
                        if use_attn_blend:
                            outs["attn_mask"] = mask_viz
                        if use_latent_blend:
                            new_latent, sums, lmask = _latent_blend_step(
                                new_latent, sums, ectx.captured, injected,
                                blend_lat, x["blend_gate"],
                            )
                            outs["latent_mask"] = lmask
                        if viz:
                            vsum = vsum + _viz16(ectx.captured)
                        return (new_latent, sums, vsum), outs

                    return body

                if first:
                    # noise level of the first used timestep
                    carry = (traj[steps - t_start], sums0, vsum0)
                else:
                    carry = carry_in
                rep = (
                    jnp.zeros((hi - lo,))
                    if seg_stored
                    else traj[jnp.asarray(replay_idx[lo:hi])]
                )
                bl = blend_lats if use_latent_blend else jnp.zeros((hi - lo,))
                scan_body = body_inline if inline else make_body(seg_stored)
                return jax.lax.scan(scan_body, carry, (rep, bl, seg_xs))

            return self._traced(run)

        traj = self._shard_video(traj, frame_axis=2)
        carry = jnp.zeros(())  # dummy: the first segment builds its own carry
        seg_outs = []
        for si, (lo, hi, seg_stored) in enumerate(segments):
            skey = key + (lo, hi, seg_stored, si == 0)
            if skey not in self._jit_cache:
                self._jit_cache[skey] = _build_segment(lo, hi, seg_stored, si == 0)
            if not seg_stored:
                seg_payload = None
            elif use_stored and lo >= n_stored:
                # identity-gated tail: every stored contribution is zeroed by
                # the alpha/self gates (replay_pos is already clamped to 0
                # here), so a 1-row payload view replaces the full stack —
                # the tail dispatch holds ~1 row of payload HBM, not all of it
                seg_payload = jax.tree.map(lambda a: a[:1], stored)
            else:
                seg_payload = stored
            carry, outs = self._jit_cache[skey](
                traj,
                cond_embeddings[-1:],
                text_embeddings,
                jnp.float32(guidance_scale),
                ed,
                seg_payload,
                self.unet_params,
                carry,
            )
            seg_outs.append(outs)
        final, _, vfinal = carry
        outs = (
            seg_outs[0]
            if len(seg_outs) == 1
            else jax.tree.map(lambda *a: jnp.concatenate(a, 0), *seg_outs)
        )
        if viz:
            outs["cross_avg"] = vfinal / n_used
        return final, outs

    # ------------------------------------------------------------ jit steps
    def _save_step(self, num_steps: int):
        key = ("save_step", num_steps)
        if key not in self._jit_cache:

            @jax.jit
            def step(latent, t, text_emb, guidance, params):
                ctx = StoreContext(store_dtype=self.store_dtype)
                lat_in = jnp.concatenate([latent, latent], axis=0)
                eps = self.unet.apply(params, lat_in, t, text_emb, attn_ctx=ctx)
                eps = S.classifier_free_guidance(eps[:1], eps[1:], guidance)
                new_latent = S.ddim_denoise_step(self.schedule, eps, t, latent, num_steps)
                return new_latent, ctx.captured

            self._jit_cache[key] = self._traced(step)
        return self._jit_cache[key]

    def _edit_step(
        self,
        num_steps: int,
        self_active: bool,
        cross_kind: str,
        use_attn_blend: bool,
        use_latent_blend: bool,
        blend_now: bool,
        save_self: bool,
        attn_th: float,
        latent_th: float,
    ):
        key = (
            "edit",
            num_steps,
            self_active,
            cross_kind,
            use_attn_blend,
            use_latent_blend,
            blend_now,
            save_self,
            attn_th,
            latent_th,
        )
        if key not in self._jit_cache:

            @jax.jit
            def step(
                latent,
                t,
                text_emb,
                guidance,
                injected,
                alpha_words,
                mapper,
                refine_mapper,
                refine_alphas,
                equalizer,
                blend_sums,
                inv_latent,
                attn_alpha,
                latent_alpha,
                params,
            ):
                self_masks = None
                mask_viz = None
                if use_attn_blend:
                    self_masks, mask_viz = _build_self_masks(
                        injected, attn_alpha, attn_th, latent.shape[2]
                    )
                ep = EditParams(
                    cross_edit_kind=cross_kind,
                    mapper=mapper,
                    refine_mapper=refine_mapper,
                    refine_alphas=refine_alphas,
                    equalizer=equalizer,
                    self_replace_active=self_active,
                    self_masks=self_masks,
                    save_self_attention=save_self,
                )
                ctx = EditContext(
                    injected=injected,
                    params=ep,
                    alpha_words=alpha_words,
                    store_dtype=self.store_dtype,
                )
                lat_in = jnp.concatenate([latent, latent], axis=0)
                eps = self.unet.apply(params, lat_in, t, text_emb, attn_ctx=ctx)
                eps = S.classifier_free_guidance(eps[:1], eps[1:], guidance)
                new_latent = S.ddim_denoise_step(self.schedule, eps, t, latent, num_steps)

                masks_out = {"attention_blend": mask_viz, "latent_blend": None}
                new_sums = blend_sums
                if use_latent_blend:
                    live16 = [
                        m.astype(jnp.float32)
                        for m in _blend_maps_16(ctx.captured, latent.shape[2])
                    ]
                    new_sums = [s + m for s, m in zip(blend_sums, live16)]
                    # p=2 rows: [inversion-step map; edit-pass running sum]
                    pair = [
                        jnp.concatenate([im.astype(jnp.float32), sm], axis=0)
                        for im, sm in zip(
                            _blend_maps_16(injected, latent.shape[2]), new_sums
                        )
                    ]
                    hw = new_latent.shape[2:4]
                    lmask = blend_mask(pair, latent_alpha, hw, latent_th)
                    lmask = jnp.maximum(lmask[:1], lmask)  # union ('both')
                    masks_out["latent_blend"] = lmask
                    if blend_now:
                        new_latent = apply_latent_blend(new_latent, inv_latent, lmask)
                return new_latent, ctx.captured, new_sums, masks_out

            self._jit_cache[key] = self._traced(step)
        return self._jit_cache[key]
