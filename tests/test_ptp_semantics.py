"""Golden tests for the prompt-to-prompt tensor programs.

These are the pure functions SURVEY.md §7.3 ranks as 'easy to get subtly
wrong': cross-attention replace/refine/reweight, the time-word alpha
schedule, self-swap masking, and blend-mask thresholding — all pinned on
hand-computed small tensors.
"""
import jax.numpy as jnp
import numpy as np

from fatezero_tpu.models.tokenizer import StubTokenizer
from fatezero_tpu.ptp.context import EditParams, replace_cross, replace_self
from fatezero_tpu.ptp.schedules import (
    get_equalizer,
    get_time_words_attention_alpha,
    update_alpha_time_word,
)
from fatezero_tpu.ptp.spatial_blend import blend_mask


def test_replace_cross_einsum():
    # attn_base [f=1, h=1, s=2, w=3]; mapper permutes tokens 0<->1
    base = jnp.asarray([[[[0.1, 0.2, 0.7], [0.5, 0.3, 0.2]]]])
    mapper = jnp.zeros((1, 3, 3)).at[0, 0, 1].set(1.0).at[0, 1, 0].set(1.0).at[0, 2, 2].set(1.0)
    ep = EditParams(cross_edit_kind="replace", mapper=mapper)
    out = replace_cross(base, base[None], ep)
    np.testing.assert_allclose(
        np.asarray(out[0, 0, 0]), [[0.2, 0.1, 0.7], [0.3, 0.5, 0.2]], atol=1e-6
    )


def test_refine_alpha_mix():
    base = jnp.asarray([[[[1.0, 2.0, 3.0]]]])  # [1,1,1,3]
    live = jnp.asarray([[[[[10.0, 20.0, 30.0]]]]])  # [1,1,1,1,3]
    # mapper gathers base token 2 into slot 0; alphas keep base only at slot 0
    ep = EditParams(
        cross_edit_kind="refine",
        refine_mapper=jnp.asarray([[2, 1, 0]]),
        refine_alphas=jnp.asarray([[1.0, 0.0, 0.0]]),
    )
    out = replace_cross(base, live, ep)
    # slot 0: base[...,2]=3; slots 1,2: live values
    np.testing.assert_allclose(np.asarray(out[0, 0, 0, 0]), [3.0, 20.0, 30.0], atol=1e-6)


def test_reweight_wraps_replace():
    base = jnp.asarray([[[[0.5, 0.5]]]])
    eye = jnp.eye(2)[None]
    ep = EditParams(
        cross_edit_kind="replace", mapper=eye, equalizer=jnp.asarray([[1.0, 10.0]])
    )
    out = replace_cross(base, base[None], ep)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0, 0]), [0.5, 5.0], atol=1e-6)


def test_replace_self_mask_semantics():
    base = jnp.zeros((1, 1, 2, 2))  # inversion map (source)
    live = jnp.ones((1, 1, 1, 2, 2))  # current map (target)
    # mask 1 = keep target, 0 = use source (attention_util.py:80-92)
    mask = jnp.asarray([[[1.0], [0.0]]]).reshape(1, 1, 2, 1)
    out = replace_self(base, live, mask)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), [[1.0, 1.0], [0.0, 0.0]])
    # no mask: full swap to source
    np.testing.assert_allclose(np.asarray(replace_self(base, live, None)), 0.0)


def test_alpha_time_word_window():
    alpha = np.zeros((11, 1, 5), np.float32)
    update_alpha_time_word(alpha, (0.2, 0.6), 0)
    # steps [2, 6) active — int truncation of 0.2*11=2.2 and 0.6*11=6.6
    assert alpha[:2].sum() == 0 and alpha[6:].sum() == 0
    assert alpha[2:6].sum() == 4 * 5


def test_word_level_schedule():
    tok = StubTokenizer()
    prompts = ["a cat", "a dog"]
    alphas = get_time_words_attention_alpha(prompts, 10, {"default_": 0.5, "dog": 0.9}, tok)
    assert alphas.shape == (11, 1, 1, 1, 77)
    # find the token positions of 'dog' in the target prompt
    from fatezero_tpu.ptp.seq_aligner import get_word_inds

    dog = get_word_inds("a dog", "dog", tok)
    # at step 6 (0.5*11=5.5 -> default off at >=5), dog tokens still active
    step = 6
    assert alphas[step, 0, 0, 0, dog].max() == 1.0
    other = [i for i in range(1, 4) if i not in dog]
    assert alphas[step, 0, 0, 0, other].max() == 0.0


def test_equalizer_tokens():
    tok = StubTokenizer()
    eq = get_equalizer("a shiny dog", ("dog",), [10.0], tok)
    from fatezero_tpu.ptp.seq_aligner import get_word_inds

    inds = get_word_inds("a shiny dog", "dog", tok)
    assert (eq[0, inds] == 10.0).all()
    assert eq.sum() == 77 - len(inds) + 10.0 * len(inds)


def test_blend_mask_threshold_semantics():
    # one map [p=1, f=1, heads=1, s=4, w=2]; word 0 selected
    m = jnp.asarray([0.1, 0.9, 0.2, 0.05]).reshape(1, 1, 1, 4, 1)
    maps = [jnp.concatenate([m, jnp.zeros_like(m)], axis=-1)]
    alpha = jnp.asarray([[1.0, 0.0]])
    mask = blend_mask(maps, alpha, (2, 2), th=0.3, use_pool=False)
    # normalized by max (0.9): [0.111, 1.0, 0.222, 0.055] > 0.3
    np.testing.assert_allclose(np.asarray(mask[0, 0]), [[0.0, 1.0], [0.0, 0.0]])
    # th > 1 disables the mask entirely (blend_th: [2, 2] -> full swap)
    mask2 = blend_mask(maps, alpha, (2, 2), th=2.0, use_pool=False)
    assert np.asarray(mask2).sum() == 0.0


def test_substruct_words_carve_out():
    """SpatialBlender(substruct_words=...): the substruct words' un-pooled
    th[1] mask is subtracted from the main mask
    (reference spatial_blend.py:108-113,152-163)."""
    from fatezero_tpu.models.tokenizer import StubTokenizer
    from fatezero_tpu.ptp.seq_aligner import get_word_inds
    from fatezero_tpu.ptp.spatial_blend import SpatialBlender

    tok = StubTokenizer()
    prompts = ["cat on mat", "dog on mat"]
    # word 0 ("cat") is the blend word, word 2 ("mat") is subtracted
    b_plain = SpatialBlender.create(prompts, ["cat", "dog"], tok, num_steps=10)
    b_sub = SpatialBlender.create(
        prompts, ["cat", "dog"], tok, num_steps=10, substruct_words=["mat", "mat"]
    )
    assert b_plain.substruct_layers is None
    assert b_sub.substruct_layers is not None
    # synthetic 2x2 cross maps: token of "cat" hot in the left column,
    # token of "mat" hot everywhere
    m = np.zeros((1, 1, 1, 4, 77), np.float32)
    cat_tok = int(get_word_inds(prompts[0], "cat", tok)[0])
    mat_tok = int(get_word_inds(prompts[0], "mat", tok)[0])
    m[..., [0, 2], cat_tok] = 1.0
    m[..., :, mat_tok] = 1.0
    maps = [jnp.asarray(m)]
    full = np.asarray(b_plain.mask_for(maps, (2, 2)))
    carved = np.asarray(b_sub.mask_for(maps, (2, 2)))
    assert full.sum() > 0
    # mat covers everything at th[1]=0.3 -> carve-out kills the whole mask
    assert carved.sum() == 0.0
    assert (carved <= full).all()
