"""Spatio-temporal transformer with SparseCausalAttention (Flax, TPU-native).

Re-design of the reference's attention stack (video_diffusion/models/
attention.py:31-422) around two statically-chosen execution paths:

  * fused path — Pallas flash attention (TPU) / XLA einsum, used whenever the
    map is neither stored nor edited (query tokens > 32^2, temporal attention,
    or no controller attached); the xformers analog of the reference
    (attention_register.py:112-116).
  * materialized path — explicit fp32 softmax probabilities in
    [b, f, heads, s, kv] layout routed through the attention-controller
    context (ptp/context.py), the functional replacement of the reference's
    monkey-patched `_attention` (attention_register.py:23-59).

SparseCausalAttention gathers K/V from a static set of frames per query frame
(default [-1, 'first']) by trace-time index lists (ops/video_ops.py), and the
per-pixel temporal attention is zero-initialized to the identity
(attention.py:216-227 of the reference).

Layout: video activations stay 5-D — [b, f, s, c] through the transformer and
[b, f, heads, s, d] through attention — with NO (b f) batch fold anywhere.
The reference folds frames into batch ('b c f h w -> (b f) c h w',
attention.py:103); under frame-axis sequence parallelism that fold merges a
replicated row axis over the seq-sharded frame axis, which GSPMD cannot
represent — it answers by replicating the whole transformer interior
(measured: the B=2 CFG forward ran fully replicated, zero parallelism).
Keeping b and f separate keeps every interior op shardable; leading dims fold
to kernel rows only at the single-chip Pallas boundary
(ops/flash_attention.fused_attention).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from fatezero_tpu.ops.flash_attention import fused_attention
from fatezero_tpu.models.layers import FusedGroupNorm, FusedLayerNorm
from fatezero_tpu.ops.video_ops import gather_sparse_kv
from fatezero_tpu.ptp.context import MAX_CONTROLLED_TOKENS, AttnContext


def _split_heads5(x: jax.Array, heads: int) -> jax.Array:
    """[..., S, H*D] -> [..., H, S, D] (no leading-dim fold)."""
    *lead, s, hd = x.shape
    x = x.reshape(*lead, s, heads, hd // heads)
    return jnp.swapaxes(x, -2, -3)


def _merge_heads5(x: jax.Array) -> jax.Array:
    """[..., H, S, D] -> [..., S, H*D]."""
    x = jnp.swapaxes(x, -2, -3)
    *lead, s, h, d = x.shape
    return x.reshape(*lead, s, h * d)


class Attention(nn.Module):
    """Multi-head attention with an optional controller on materialized probs.

    Mirrors diffusers' CrossAttention module parameters (to_q/to_k/to_v/to_out)
    so 2-D SD checkpoints port 1:1. Self-attention input is [b, f, s, c];
    cross-attention context is [b, kv, c_cross] with K/V computed once per
    batch row and frame-broadcast (the reference recomputes them per frame on
    the tiled context — same values, f x the FLOPs).
    """

    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None  # None => self-attention widths
    upcast_softmax: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, F, S, C]
        context: Optional[jax.Array] = None,  # [B, KV, C_cross] for cross
        *,
        attn_ctx: Optional[AttnContext] = None,
        place: Optional[str] = None,
        sparse_indices: Optional[Sequence[Union[int, str]]] = None,
    ) -> jax.Array:
        inner = self.heads * self.dim_head
        scale = self.dim_head**-0.5
        is_cross = context is not None
        b, f = x.shape[0], x.shape[1]

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv_src = context if is_cross else x
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(kv_src)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(kv_src)
        if is_cross:
            k = k[:, None]  # [B, 1, KV, inner] — frame-broadcast
            v = v[:, None]

        k_store = sparse_meta = None
        if sparse_indices is not None and not is_cross:
            if len(sparse_indices) > 0 and f > 1:
                if attn_ctx is not None:
                    # sparse-causal K dedup for the attention store: only the
                    # statically-referenced source frames need storing
                    # (['mid'] -> 1 frame, 8x smaller than the gathered K);
                    # consumers re-gather via regather_headsplit_kv
                    from fatezero_tpu.ops.video_ops import referenced_frames

                    refs = referenced_frames(f, sparse_indices)
                    # identity shortcut: when every frame is referenced the
                    # "gather" is the tensor itself — an index-gather here
                    # would make GSPMD all-gather the full K across a
                    # seq-sharded mesh for nothing
                    k_sel = k if refs == list(range(f)) else k[:, refs]
                    k_store = _split_heads5(k_sel, self.heads)
                    sparse_meta = (tuple(sparse_indices), f, self.heads)
                k = gather_sparse_kv(k, sparse_indices, f)
                v = gather_sparse_kv(v, sparse_indices, f)

        qh = _split_heads5(q, self.heads)  # [B, F, H, S, D]
        kh = _split_heads5(k, self.heads)  # [B, F|1, H, KV, D]
        vh = _split_heads5(v, self.heads)

        s_q = qh.shape[-2]
        controlled = (
            attn_ctx is not None
            and place is not None
            and s_q <= MAX_CONTROLLED_TOKENS
        )
        if controlled:
            # probability-free fast path (InlineEditContext.value_space_attention):
            # linear edit ops are pushed into the values so the whole site runs
            # through the flash kernel — None falls back to materialization
            fast = attn_ctx.value_space_attention(
                qh, kh, vh, scale, place, is_cross, (b, f),
                k_store=k_store, sparse_meta=sparse_meta,
            )
        if controlled and fast is not None:
            out = fast.astype(self.dtype)
        elif controlled:
            # materialized probabilities — the semantic payload the
            # store/editor operates on (attention_register.py:28-51).
            # upcast_softmax semantics (attention_register.py:24-41): the
            # logits matmul runs in the model dtype (bf16 on the MXU), only
            # the softmax is computed in fp32.
            kb = kh if kh.shape[1] == f else jnp.broadcast_to(kh, (b, f) + kh.shape[2:])
            vb = vh if vh.shape[1] == f else jnp.broadcast_to(vh, (b, f) + vh.shape[2:])
            logits = jnp.einsum(
                "bfhsd,bfhtd->bfhst",
                qh.astype(self.dtype),
                kb.astype(self.dtype),
                preferred_element_type=jnp.float32,
            ) * scale
            # fp32 softmax, then materialize in the model dtype — exactly the
            # reference's upcast_softmax path, which casts the probabilities
            # back to the value dtype (fp16) before storing/editing/bmm
            # (attention_register.py:39-45). In bf16 the probs tensors (the
            # dominant HBM traffic of an edit step: [b, f, h, 1024, kv] per
            # controlled site) cost half the bandwidth of fp32.
            probs5 = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
                self.dtype
            )
            probs5 = attn_ctx.process(probs5, place, is_cross)
            # V-product in model dtype (the reference's half-precision bmm)
            out = jnp.einsum(
                "bfhst,bfhtd->bfhsd",
                probs5.astype(self.dtype),
                vb.astype(self.dtype),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
        else:
            out = fused_attention(qh, kh, vh, scale)

        out = _merge_heads5(out)  # [B, F, S, inner]
        return nn.Dense(inner, dtype=self.dtype, name="to_out")(out)


class SpatioTemporalTransformerBlock(nn.Module):
    """attn1 (sparse-causal self) -> attn2 (text cross) -> FF -> temporal attn.

    Mirrors reference attention.py:147-337: LayerNorms (no AdaLN in SD-1.x),
    temporal attention applied after the feed-forward over the frame axis
    per pixel, with zero-initialized output projection (residual identity at
    init). Operates on [b, f, s, c] — no batch fold.
    """

    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: int = 768
    sparse_indices: Tuple[Union[int, str], ...] = (-1, "first")
    use_sparse_causal: bool = True
    temporal_attention: bool = True
    upcast_softmax: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [b, f, s, c]
        context: jax.Array,  # [b, 77, cross_dim]
        video_shape: Tuple[int, int],
        attn_ctx: Optional[AttnContext] = None,
        place: Optional[str] = None,
    ) -> jax.Array:
        b, f = video_shape
        h = FusedLayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + Attention(
            heads=self.heads,
            dim_head=self.dim_head,
            upcast_softmax=self.upcast_softmax,
            dtype=self.dtype,
            name="attn1",
        )(
            h,
            attn_ctx=attn_ctx,
            place=place,
            sparse_indices=self.sparse_indices if self.use_sparse_causal else None,
        )

        h = FusedLayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + Attention(
            heads=self.heads,
            dim_head=self.dim_head,
            cross_attention_dim=self.cross_attention_dim,
            upcast_softmax=self.upcast_softmax,
            dtype=self.dtype,
            name="attn2",
        )(h, context, attn_ctx=attn_ctx, place=place)

        from fatezero_tpu.models.layers import FeedForward

        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(
            FusedLayerNorm(dtype=self.dtype, name="norm3")(x)
        )

        if self.temporal_attention and f > 1:
            # per-pixel attention over the frame axis (attention.py:327-337).
            # Only q/k/v are regrouped per pixel inside TemporalAttention —
            # the residual stream keeps its [b, f, s, c] layout, so XLA does
            # not propagate a frames-minor layout into the (large) residual
            # adds of the whole block (measured: an explicit transpose here
            # forced ~2 ms relayout fusions per residual add at the 64^2
            # level on a v5e).
            ht = FusedLayerNorm(dtype=self.dtype, name="norm_temporal")(x)
            x = x + TemporalAttention(
                heads=self.heads,
                dim_head=self.dim_head,
                dtype=self.dtype,
                name="attn_temporal",
            )(ht)
        return x


class TemporalAttention(nn.Module):
    """Per-pixel self-attention over frames with zero-init output projection
    (reference zeroes attn_temporal.to_out: attention.py:224).

    Input/output [b, f, d, c] — the projections contract channels (layout
    neutral) and the frame regrouping happens only on q/k/v inside the
    attention einsums ([b, d, h, f, f] scores, f ~ 8), never on the residual
    stream. fp32 softmax as in `xla_attention`. Under frame-axis sharding
    this is the one genuinely all-to-all site (every pixel attends over all
    frames, SURVEY §2.3) — GSPMD inserts the frame-axis collective here.
    """

    heads: int
    dim_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, f, d, c = x.shape
        inner = self.heads * self.dim_head
        scale = self.dim_head**-0.5
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(x)

        def heads5(t):  # [b, f, d, h*e] -> [b, f, d, h, e]
            return t.reshape(b, f, d, self.heads, self.dim_head)

        q5 = heads5(q).astype(jnp.float32)
        k5 = heads5(k).astype(jnp.float32)
        s = jnp.einsum("bfdhe,bgdhe->bdhfg", q5, k5) * scale
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum(
            "bdhfg,bgdhe->bfdhe", p, heads5(v).astype(jnp.float32)
        ).astype(self.dtype)
        out = out.reshape(b, f, d, inner)
        return nn.Dense(
            inner, dtype=self.dtype, kernel_init=nn.initializers.zeros, name="to_out"
        )(out)


class SpatioTemporalTransformerModel(nn.Module):
    """GN -> 1x1 proj_in -> blocks -> 1x1 proj_out + residual, on video tensors
    (reference attention.py:31-144). Input/output [B, F, H, W, C]."""

    heads: int
    dim_head: int
    num_layers: int = 1
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    sparse_indices: Tuple[Union[int, str], ...] = (-1, "first")
    use_sparse_causal: bool = True
    temporal_attention: bool = True
    upcast_softmax: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, F, H, W, C]
        context: jax.Array,  # [B, 77, cross_dim]
        attn_ctx: Optional[AttnContext] = None,
        place: Optional[str] = None,
    ) -> jax.Array:
        b, f, hh, ww, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        # batch_dims=2: GroupNorm statistics stay per (batch row, frame), as
        # in the reference which folds frames into batch before its norm
        # (attention.py:103 rearranges 'b c f h w -> (b f) c h w' before
        # :112's norm) — without the fold itself, which would break frame-axis
        # sharding (module docstring).
        h = FusedGroupNorm(
            num_groups=self.norm_num_groups, epsilon=1e-6, batch_dims=2,
            dtype=self.dtype, name="norm",
        )(x)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)  # 1x1 conv == dense
        h = h.reshape(b, f, hh * ww, inner)
        for i in range(self.num_layers):
            h = SpatioTemporalTransformerBlock(
                dim=inner,
                heads=self.heads,
                dim_head=self.dim_head,
                cross_attention_dim=self.cross_attention_dim,
                sparse_indices=self.sparse_indices,
                use_sparse_causal=self.use_sparse_causal,
                temporal_attention=self.temporal_attention,
                upcast_softmax=self.upcast_softmax,
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(h, context, (b, f), attn_ctx=attn_ctx, place=place)
        h = h.reshape(b, f, hh, ww, inner)
        h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
        return h + residual
