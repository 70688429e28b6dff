"""Functional attention-controller contexts: the TPU re-architecture of FateZero's hooks.

The reference attaches its attention store/editor by monkey-patching the
forward of all 32 attention modules and mutating Python counters as side
effects of the UNet forward (reference: attention_register.py:235-258,
attention_store.py:38-60, attention_util.py:98-171). Under JAX that control
flow is re-architected as *trace-time* context objects:

  * A context is a plain Python object handed to the UNet's ``__call__``.
    Every controlled attention site calls ``ctx.process(probs, place,
    is_cross)`` with its materialized probability map (fp32 softmax cast to
    the model dtype — the reference's upcast_softmax-then-fp16 behavior). The per-key
    position counters of the reference become trace-time list appends — the
    traced graph is pure; ordering is the static traversal order of the UNet.
  * ``StoreContext`` captures maps (inversion / 'save' edit type): the maps
    come back to the caller as an output pytree ``ctx.captured`` and are
    streamed to the host by the pipeline.
  * ``EditContext`` consumes the inversion maps for the current step
    (``injected``) plus pure edit parameters (``EditParams``) and rewrites the
    conditional half of each map: prompt-to-prompt cross-attention
    replace/refine/reweight and mask-gated self-attention swap
    (reference semantics: attention_util.py:80-158).

Shapes: every controlled map is [b, f, heads, s, kv] where b=1 during
inversion (no CFG, reference LOW_RESOURCE=True) and b=2 (uncond, cond) during
CFG editing; only the cond half is stored/edited (attention_store.py:38-49).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

# Store keying identical to the reference (attention_store.py:71-79).
STORE_KEYS = ("down_cross", "mid_cross", "up_cross", "down_self", "mid_self", "up_self")
CROSS_KEYS = ("down_cross", "mid_cross", "up_cross")

# Maps with more query tokens than this are never stored or edited
# (attention_store.py:83, attention_register.py:112).
MAX_CONTROLLED_TOKENS = 32 * 32


def store_key(place: str, is_cross: bool) -> str:
    return f"{place}_{'cross' if is_cross else 'self'}"


def merge_heads(x: jax.Array) -> jax.Array:
    """[..., H, S, D] -> [..., S, H*D]: the at-rest layout for qk payloads.

    A head-split tensor stores D=40 as its minor dim, which the TPU tiles to
    128 lanes — 3.2x physical HBM for every stored step. Merged, the minor
    dim is H*D (320 for SD-1.4), which is lane-dense; consumers split heads
    per step after indexing (a transient transpose XLA fuses into the read).
    """
    x = jnp.swapaxes(x, -2, -3)
    *lead, s, h, d = x.shape
    return x.reshape(*lead, s, h * d)


def split_heads(x: jax.Array, heads: int) -> jax.Array:
    """[..., S, H*D] -> [..., H, S, D] (inverse of merge_heads)."""
    *lead, s, hd = x.shape
    x = x.reshape(*lead, s, heads, hd // heads)
    return jnp.swapaxes(x, -2, -3)


class AttnContext:
    """Interface each controlled attention site calls. Base = no-op."""

    def process(self, probs: jax.Array, place: str, is_cross: bool) -> jax.Array:
        """probs: [b, f, heads, s, kv] model dtype. Returns edited probs."""
        return probs

    def value_space_attention(
        self, qh, kh, vh, scale, place, is_cross, video_shape, **site_info
    ) -> Optional[jax.Array]:
        """Optional fast path: compute the site's (edited) attention output
        directly from q/k/v without materializing probabilities.

        qh: [b, f, h, s, d]; kh/vh: [b, f, h, kv, d] (self) or
        [b, 1, h, kv, d] (cross, frame-broadcast). Returns the output
        [b, f, h, s, d] or None to request the materialized path.

        site_info: static per-site extras from the attention layer —
        `k_store` (referenced-frame deduped K for stores, see
        ops/video_ops.referenced_frames) and `sparse_meta`
        ((index_spec, f, heads) to re-gather a deduped K at consumption)."""
        return None


NoopContext = AttnContext


class StoreContext(AttnContext):
    """Capture controlled maps in reference order (inversion & 'save' edit type).

    ``captured[key][pos]`` mirrors the reference's ``step_store`` layout
    (attention_store.py:81-93). Arrays are cast to ``store_dtype`` so the
    host offload stream stays small (reference stores fp16 on CPU).

    ``self_qk=True`` switches SELF sites from probability capture to (q, k)
    capture (``captured_qk``): the swap consumer can rematerialize
    softmax(q k^T) through the flash kernel, and [*, s, d] q/k tensors are
    ~kv/2d times smaller than [*, s, kv] probability maps — the capture
    forward then materializes no self probabilities at all (its own output
    runs through the flash kernel). Cross sites always store probabilities
    (they feed blend masks and the cross-edit base, and are tiny: kv=77).
    """

    def __init__(
        self,
        save_self_attention: bool = True,
        store_dtype=jnp.bfloat16,
        self_qk: bool = False,
    ):
        self.save_self_attention = save_self_attention and not self_qk
        self.self_qk = self_qk
        self.store_dtype = store_dtype
        self.captured: Dict[str, List[jax.Array]] = {k: [] for k in STORE_KEYS}
        self.captured_qk: Dict[str, List] = {
            k: [] for k in STORE_KEYS if k.endswith("self")
        }

    def value_space_attention(
        self, qh, kh, vh, scale, place, is_cross, video_shape, **site_info
    ):
        if is_cross or not self.self_qk:
            return None
        from fatezero_tpu.ops.flash_attention import fused_attention

        # store the referenced-frame deduped K when the site provides one
        # (sparse-causal sites: ['mid'] -> 8x smaller than the gathered K)
        k_keep = site_info.get("k_store")
        if k_keep is None:
            k_keep = kh
        # merged at rest (lane-dense [.., s, h*d]); consumers split per step
        self.captured_qk[store_key(place, False)].append(
            (
                merge_heads(qh).astype(self.store_dtype),
                merge_heads(k_keep).astype(self.store_dtype),
            )
        )
        return fused_attention(qh, kh, vh, scale)

    def _maybe_store(self, probs: jax.Array, place: str, is_cross: bool) -> None:
        if probs.shape[-2] <= MAX_CONTROLLED_TOKENS and (
            is_cross or self.save_self_attention
        ):
            # store the conditional batch element only (b is 1 at inversion;
            # under CFG the reference stores the cond half: attention_store.py:46)
            cond = probs[-1:] if probs.shape[0] > 1 else probs
            self.captured[store_key(place, is_cross)].append(
                cond.astype(self.store_dtype)
            )

    def process(self, probs, place, is_cross):
        self._maybe_store(probs, place, is_cross)
        return probs


@dataclasses.dataclass
class EditParams:
    """Pure, per-step parameters of the prompt-to-prompt edit.

    Static python fields select the traced graph (one retrace per variant);
    array fields are traced inputs, so the per-step alpha schedule does NOT
    retrace.
    """

    # one of 'replace' | 'refine' — equal word count chooses replace
    # (p2p_ddim_spatial_temporal.py:176-184)
    cross_edit_kind: str
    # replace: [n_target=1, 77, 77] soft permutation (seq_aligner.py:152-195)
    mapper: Optional[jax.Array] = None
    # refine: int mapper [1, 77] + alphas [1, 77] (seq_aligner.py:107-128)
    refine_mapper: Optional[jax.Array] = None
    refine_alphas: Optional[jax.Array] = None
    # reweight chained on top (attention_util.py:282-286): [1, 77] or None
    equalizer: Optional[jax.Array] = None
    # static: is the self-attention swap active at this step
    # (attention_util.py:124: num_self_replace window)
    self_replace_active: bool = True
    # traced alternative to `self_replace_active` for step-uniform scan
    # bodies: scalar in {0.0, 1.0}; when set, the swap is computed every
    # step and lerped by the gate (same graph at every scan iteration)
    self_gate: Optional[jax.Array] = None
    # per-resolution blend masks for the self swap, {s_tokens: [f, 1, s, 1]}
    # (attention_util.py:136-151); None disables masking
    self_masks: Optional[Dict[int, jax.Array]] = None
    # store the live (pre-edit) cond self maps too (needed for parity with
    # reference edit-pass store; big — configurable)
    save_self_attention: bool = True


def replace_cross(
    attn_base: jax.Array, attn_replace: jax.Array, params: EditParams
) -> jax.Array:
    """Prompt-to-prompt cross-attention rewrite (attention_util.py:211-305).

    attn_base: [f, h, s, 77] inversion map; attn_replace: [b=1, f, h, s, 77].
    """
    dt = attn_base.dtype  # keep edits in the materialized dtype (no silent
    # fp32 re-promotion: the probs tensors are the edit step's HBM traffic)
    if params.cross_edit_kind == "replace":
        new = jnp.einsum("fhsw,bwn->bfhsn", attn_base, params.mapper.astype(dt))
    elif params.cross_edit_kind == "refine":
        gathered = attn_base[..., params.refine_mapper[0]]  # [f, h, s, 77]
        alphas = params.refine_alphas[0].astype(dt)  # [77]
        new = (gathered * alphas + attn_replace[0] * (1.0 - alphas))[None]
    else:
        raise ValueError(params.cross_edit_kind)
    if params.equalizer is not None:
        # Reweight wraps replace/refine output (attention_util.py:282-286):
        # the reference multiplies the *base-derived* map by the equalizer.
        new = new * params.equalizer.astype(dt)[:, None, None, None, :]
    return new


def replace_self(
    attn_base: jax.Array, attn_replace: jax.Array, mask: Optional[jax.Array]
) -> jax.Array:
    """Self-attention swap, optionally gated by the spatial blend mask.

    attn_base: [f, h, s, kv]; attn_replace: [b=1, f, h, s, kv];
    mask: [f, 1, s, 1] with 1 = keep target (live), 0 = use source (inverted)
    (attention_util.py:80-92,134-151).
    """
    base = attn_base[None]
    if mask is None:
        return jnp.broadcast_to(base, attn_replace.shape)
    m = mask[None].astype(attn_replace.dtype)
    return m * attn_replace + (1.0 - m) * base


class InlineEditContext(StoreContext):
    """Single-forward prompt-to-prompt: batch row 0 IS the inversion replay.

    The UNet runs once on [replay(src-cond); edit-uncond; edit-cond]. At every
    controlled attention site the cond row is edited against row 0's probs of
    the same site — the original prompt-to-prompt batching, adapted so row 0
    replays the inversion trajectory latent. Halves the edit step's UNet
    applications vs the two-pass EditContext; not usable when self-masks from
    the *same step's* cross maps are needed (blend_self_attention), because
    those maps aren't complete until the forward finishes.

    Captures row-0 ('inv') and cond-row ('live') cross maps when
    `capture_for_blend` so the latent blend can be computed post-forward.
    """

    def __init__(
        self,
        params: EditParams,
        alpha_words: jax.Array,
        store_dtype=jnp.bfloat16,
        capture_for_blend: bool = False,
        viz_size: Optional[int] = None,
    ):
        super().__init__(save_self_attention=False, store_dtype=store_dtype)
        self.params = params
        self.alpha_words = alpha_words
        self.capture_for_blend = capture_for_blend
        # query-token count whose cross maps are materialized+captured for the
        # edit-pass attention visualization (the reference saves per-edit
        # heatmaps, p2p_ddim_spatial_temporal.py:211-215); only those sites
        # leave the value-space fast path
        self.viz_size = viz_size
        self.captured_inv: Dict[str, List[jax.Array]] = {k: [] for k in STORE_KEYS}

    def _capture_cross(self, s: int) -> bool:
        return self.capture_for_blend or (self.viz_size is not None and s == self.viz_size)

    def value_space_attention(
        self, qh, kh, vh, scale, place, is_cross, video_shape, **site_info
    ):
        """Probability-free edit: every inline edit op (cross replace/refine,
        reweight equalizer, alpha-time-word mix, maskless self swap) acts
        LINEARLY on the probabilities along the kv axis, so it commutes with
        the @V product:

            edited(P_cond) @ V_cond = P_rep @ (M @ V_cond) + P_cond @ (w * V_cond)

        with a tiny [kv, kv] matrix M (gather/mapper x per-token weights) and
        a per-token weight vector w. Both terms are then STANDARD attention
        with value-transformed inputs — they run through the flash kernel
        with fp32 softmax in VMEM, and no [*, s, kv] probability tensor ever
        touches HBM (the dominant HBM traffic of an edit step at the 32^2
        sites). Falls back to the materialized path (returns None) when maps
        must actually be captured (capture_for_blend cross sites) or when a
        spatial self-mask applies (blend_self_attention => two-pass path).

        Derivation for refine (attention_util.py:241-272 + 129-132 of the
        reference; replace analogous):
            new  = (P_rep[:, mapper] * alpha + P_cond * (1-alpha)) * eq
            cond = new * aw + (1-aw) * P_cond
                 = P_rep @ (E @ diag(alpha*eq*aw)) + P_cond * ((1-alpha)*eq*aw + (1-aw))
        with E[i, n] = [mapper[n] == i].
        """
        from fatezero_tpu.ops.flash_attention import fused_attention

        b, f = video_shape
        if b != 3 or qh.shape[0] != 3:
            return None
        p = self.params
        if is_cross and self._capture_cross(qh.shape[-2]):
            return None  # blend masks / viz need the materialized cross maps
        if not is_cross and p.self_masks is not None:
            return None
        d = qh.shape[-1]
        # rows on axis 0: [replay(src-cond), edit-uncond, edit-cond], each
        # [f|1, h, s|kv, d]
        if is_cross:
            kv = kh.shape[-2]
            # alpha_words arrives as [1, 1, kv] (per-scan-step slice) — a
            # per-kv-token weight vector
            aw = jnp.broadcast_to(
                self.alpha_words.astype(jnp.float32).reshape(-1), (kv,)
            )
            eq = (
                p.equalizer[0].astype(jnp.float32)
                if p.equalizer is not None
                else jnp.ones((kv,), jnp.float32)
            )
            v_c = vh[2]  # [1, h, kv, d] frame-broadcast cross values
            if p.cross_edit_kind == "refine":
                al = p.refine_alphas[0].astype(jnp.float32)
                w1 = al * eq * aw
                w2 = (1.0 - al) * eq * aw + (1.0 - aw)
                # E[i, n] = [mapper[n] == i]; term1 = P_rep @ (E @ diag(w1) @ V)
                E = (
                    jnp.arange(kv)[:, None] == p.refine_mapper[0][None, :]
                ).astype(jnp.float32)
                m1 = E * w1[None, :]
            else:  # replace: cond = P_rep @ mapper * eq * aw + (1-aw) * P_cond
                w2 = 1.0 - aw
                m1 = p.mapper[0].astype(jnp.float32) * (eq * aw)[None, :]
            v1 = jnp.einsum("wn,xhnd->xhwd", m1.astype(v_c.dtype), v_c)
            rep2 = fused_attention(
                qh[0], kh[0], jnp.concatenate([vh[0], v1], axis=-1), scale
            )
            out_rep, term1 = rep2[..., :d], rep2[..., d:]
            v2 = v_c * w2[None, None, :, None].astype(v_c.dtype)
            uc = fused_attention(
                qh[1:3], kh[1:3], jnp.concatenate([vh[1:2], v2[None]], axis=0), scale
            )
            out_unc, term2 = uc[0], uc[1]
            out_cond = term1 + term2
        else:
            if p.self_gate is not None:
                g = p.self_gate
            elif p.self_replace_active:
                g = 1.0
            else:  # no swap at this site: three independent plain attentions
                return fused_attention(qh, kh, vh, scale)
            # swap: cond probs replaced by rep probs => P_rep @ V_cond
            rep2 = fused_attention(
                qh[0], kh[0], jnp.concatenate([vh[0], vh[2]], axis=-1), scale
            )
            out_rep, swapped = rep2[..., :d], rep2[..., d:]
            uc = fused_attention(qh[1:3], kh[1:3], vh[1:3], scale)
            out_unc, out_live = uc[0], uc[1]
            g = jnp.asarray(g, jnp.float32).astype(out_live.dtype)
            out_cond = g * swapped + (1.0 - g) * out_live
        return jnp.stack([out_rep, out_unc, out_cond], axis=0)

    def process(self, probs, place, is_cross):
        if probs.shape[-2] > MAX_CONTROLLED_TOKENS or probs.shape[0] < 3:
            return probs
        base = probs[0]  # [f, h, s, kv] — the replay row's probs
        if is_cross and self._capture_cross(probs.shape[-2]):
            key = store_key(place, True)
            self.captured_inv[key].append(probs[:1].astype(self.store_dtype))
            self.captured[key].append(probs[-1:].astype(self.store_dtype))
        rep, uncond, cond = probs[:1], probs[1:2], probs[2:]
        if is_cross:
            new = replace_cross(base, cond, self.params)
            aw = self.alpha_words.astype(cond.dtype)
            cond = new * aw + (1.0 - aw) * cond
        elif self.params.self_gate is not None:
            mask = None
            if self.params.self_masks is not None:
                mask = self.params.self_masks.get(probs.shape[-2])
            swapped = replace_self(base, cond, mask)
            g = self.params.self_gate.astype(cond.dtype)
            cond = g * swapped + (1.0 - g) * cond
        elif self.params.self_replace_active:
            mask = None
            if self.params.self_masks is not None:
                mask = self.params.self_masks.get(probs.shape[-2])
            cond = replace_self(base, cond, mask)
        return jnp.concatenate([rep, uncond, cond], axis=0)


class EditContext(StoreContext):
    """Consume inversion maps + edit params; rewrite the cond half of each map.

    ``injected[key][pos]`` are the inversion-step maps (shape [1, f, h, s, kv])
    in the same layout StoreContext produced them. Position counters are
    trace-time (the reference's attention_position_counter_dict,
    attention_util.py:98-120, resolved statically).
    """

    def __init__(
        self,
        injected: Dict[str, List[jax.Array]],
        params: EditParams,
        alpha_words: jax.Array,
        store_dtype=jnp.bfloat16,
        injected_qk: Optional[Dict[str, List]] = None,
        value_space_cross: bool = False,
        materialize_cross_size: Optional[int] = None,
    ):
        super().__init__(
            save_self_attention=params.save_self_attention, store_dtype=store_dtype
        )
        self.injected = injected
        self.injected_qk = injected_qk
        self.params = params
        self.alpha_words = alpha_words
        # cross sites run probability-free against the injected base
        # (_cross_value_space); sites whose query count equals
        # `materialize_cross_size` still materialize — blend masks / viz
        # consume their live cond maps (they are the tiny mid-res sites)
        self.value_space_cross = value_space_cross
        self.materialize_cross_size = materialize_cross_size
        self._pos = {k: 0 for k in STORE_KEYS}
        self._pos_qk = {k: 0 for k in STORE_KEYS}

    def _cross_value_space(self, qh, kh, vh, scale, place, video_shape):
        """Probability-free cross edit against the INJECTED base probs.

        The live cond probabilities enter the edit only through linear ops
        along the kv axis (replace/refine mix, reweight equalizer, alpha-
        time-word mix), so — exactly as in InlineEditContext — they commute
        with @V:

            out_cond = base @ (m1 @ V_cond) + flash(q_c, k_c, V_cond * w2)

        with m1 a [kv, kv] matrix and w2 a per-token weight (derivation at
        InlineEditContext.value_space_attention). The stored base tensor is
        read once from HBM (unavoidable — it IS the edit payload) but no
        live probability tensor is ever written: the dominant controlled-
        site HBM traffic of an edit step disappears.
        """
        from fatezero_tpu.ops.flash_attention import fused_attention

        p = self.params
        key = store_key(place, True)
        pos = self._pos[key]
        self._pos[key] = pos + 1
        base = self.injected[key][pos][0]  # [f, h, s, kv] store layout

        kv = kh.shape[-2]
        aw = jnp.broadcast_to(self.alpha_words.astype(jnp.float32).reshape(-1), (kv,))
        eq = (
            p.equalizer[0].astype(jnp.float32)
            if p.equalizer is not None
            else jnp.ones((kv,), jnp.float32)
        )
        v_c = vh[-1]  # cond row's frame-broadcast values, [1, h, kv, d]
        if p.cross_edit_kind == "refine":
            al = p.refine_alphas[0].astype(jnp.float32)
            w1 = al * eq * aw
            w2 = (1.0 - al) * eq * aw + (1.0 - aw)
            E = (
                jnp.arange(kv)[:, None] == p.refine_mapper[0][None, :]
            ).astype(jnp.float32)
            m1 = E * w1[None, :]
        else:  # replace: cond = base @ mapper * eq * aw + (1-aw) * P_cond
            w2 = 1.0 - aw
            m1 = p.mapper[0].astype(jnp.float32) * (eq * aw)[None, :]
        v1 = jnp.einsum("wn,xhnd->xhwd", m1.astype(v_c.dtype), v_c)  # [1, h, kv, d]
        term1 = jnp.einsum(
            "fhsw,xhwd->fhsd", base.astype(v_c.dtype), v1
        )  # [f, h, s, d]
        v2 = v_c * w2[None, None, :, None].astype(v_c.dtype)
        out = fused_attention(
            qh, kh, jnp.concatenate([vh[:-1], v2[None]], axis=0), scale
        )
        out_rest, term2 = out[:-1], out[-1]
        cond = term1 + term2
        if out_rest.shape[0] == 0:
            return cond[None]
        return jnp.concatenate([out_rest, cond[None]], axis=0)

    def value_space_attention(
        self, qh, kh, vh, scale, place, is_cross, video_shape, **site_info
    ):
        """Self-attention swap without materialized probabilities, from (q, k)
        captured by a ``self_qk`` StoreContext. Both the swap and its spatial
        mask are linear along rows/kv of the probabilities, so they commute
        with @V:

            cond = g*(m*P_cond + (1-m)*P_base) + (1-g)*P_cond   (probs)
            out  = (g*m + 1-g) * (P_cond@V) + g*(1-m) * (P_base@V)

        with the mask m a per-(frame, query-row) weight. P_base@V is one
        flash attention over the injected q/k and the live cond values.
        Cross sites run probability-free too (_cross_value_space) except the
        mid-res sites whose live maps feed blend masks / viz.
        """
        if is_cross:
            if not self.value_space_cross or self.injected is None:
                return None
            if (
                self.materialize_cross_size is not None
                and qh.shape[-2] == self.materialize_cross_size
            ):
                return None  # blend/viz consumers need these materialized
            return self._cross_value_space(qh, kh, vh, scale, place, video_shape)
        if self.injected_qk is None:
            return None
        if self.save_self_attention:
            return None  # pre-edit live self capture needs materialized maps
        from fatezero_tpu.ops.flash_attention import fused_attention

        p = self.params
        key = store_key(place, False)
        pos = self._pos_qk[key]
        self._pos_qk[key] = pos + 1

        live = fused_attention(qh, kh, vh, scale)
        if p.self_gate is None and not p.self_replace_active:
            return live
        v_cond = vh[-1:]  # [1, f, h, kv, d]
        # stored lane-dense [1, f|n_ref, s, h*d]; split to head layout here
        q_inj, k_inj = self.injected_qk[key][pos]
        heads = qh.shape[-3]
        q_inj = split_heads(q_inj, heads)
        k_inj = split_heads(k_inj, heads)
        if site_info.get("sparse_meta") is not None:
            # referenced-frame deduped K (StoreContext + Attention k_store):
            # re-gather to the full sparse-causal layout using this site's
            # own static index spec. Triggered by sparse_meta presence, not a
            # shape comparison: for specs that reference every frame the
            # deduped K has the same frame count as q but is still the
            # PRE-gather per-frame K.
            from fatezero_tpu.ops.video_ops import regather_headsplit_kv

            index_spec, f_meta, heads = site_info["sparse_meta"]
            k_inj = regather_headsplit_kv(k_inj, index_spec, f_meta, heads)
        base_out = fused_attention(
            q_inj.astype(vh.dtype), k_inj.astype(vh.dtype), v_cond, scale
        )  # [1, f, h, s, d]
        g = p.self_gate if p.self_gate is not None else 1.0
        g = jnp.asarray(g, jnp.float32).astype(live.dtype)
        live_u, live_c = live[:-1], live[-1:]
        mask = p.self_masks.get(qh.shape[-2]) if p.self_masks is not None else None
        if mask is None:
            cond = g * base_out + (1.0 - g) * live_c
        else:
            # mask [f, 1, s, 1] broadcasts against [1, f, h, s, d] as
            # [1, f, 1, s, 1]: per-(frame, query-row) weight
            m = mask[None].astype(live.dtype)
            cond = (g * m + (1.0 - g)) * live_c + g * (1.0 - m) * base_out
        if live_u.shape[0] == 0:
            return cond
        return jnp.concatenate([live_u, cond], axis=0)

    def process(self, probs, place, is_cross):
        # Pre-edit capture of the cond half, as the reference does
        # (attention_util.py:103 calls AttentionStore.forward first).
        self._maybe_store(probs, place, is_cross)
        if probs.shape[-2] > MAX_CONTROLLED_TOKENS:
            return probs
        key = store_key(place, is_cross)
        pos = self._pos[key]
        self._pos[key] = pos + 1

        def base():
            # [1, f, h, s, kv] stored layout -> [f, h, s, kv]; looked up
            # lazily so an edit that never touches this map class works with
            # an injected dict that omits it (e.g. replayed stores without
            # self maps when the swap window is empty).
            return self.injected[key][pos][0].astype(probs.dtype)

        uncond, cond = probs[:-1], probs[-1:]  # cond half under CFG
        if is_cross:
            new = replace_cross(base(), cond, self.params)
            # time/word schedule mix (attention_util.py:129-132)
            aw = self.alpha_words.astype(cond.dtype)  # broadcasts over [1,f,h,s,77]
            cond = new * aw + (1.0 - aw) * cond
        elif self.params.self_gate is not None:
            mask = None
            if self.params.self_masks is not None:
                mask = self.params.self_masks.get(probs.shape[-2])
            swapped = replace_self(base(), cond, mask)
            g = self.params.self_gate.astype(cond.dtype)
            cond = g * swapped + (1.0 - g) * cond
        elif self.params.self_replace_active:
            mask = None
            if self.params.self_masks is not None:
                mask = self.params.self_masks.get(probs.shape[-2])
            cond = replace_self(base(), cond, mask)
        if uncond.shape[0] == 0:
            return cond
        return jnp.concatenate([uncond, cond], axis=0)
