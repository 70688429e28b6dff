"""Checkpoint round trip: save_pipeline_checkpoint -> load_models identity."""
import jax
import jax.numpy as jnp
import numpy as np

from fatezero_tpu.common.checkpoint import save_pipeline_checkpoint
from fatezero_tpu.models.loader import load_models


def test_roundtrip(tmp_path):
    b = load_models("random:tiny", {"SparseCausalAttention_index": ["mid", -1]}, seed=3)
    path = save_pipeline_checkpoint(
        str(tmp_path / "ck"),
        b.unet.cfg,
        b.unet_params,
        vae_cfg=b.vae.cfg,
        vae_params=b.vae_params,
        text_cfg=b.text_encoder.cfg,
        text_params=b.text_params,
    )
    b2 = load_models(path, {})
    assert b2.pretrained
    # configs survive (tuples, mixed-type sparse indices)
    assert b2.unet.cfg.sparse_causal_indices == ("mid", -1)
    assert b2.unet.cfg.block_out_channels == b.unet.cfg.block_out_channels
    # params bit-identical
    for a, c in zip(jax.tree.leaves(b.unet_params), jax.tree.leaves(b2.unet_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    # loaded model runs
    out = b2.unet.apply(
        b2.unet_params,
        jnp.zeros((1, 2, 8, 8, 4)),
        jnp.int32(5),
        jnp.zeros((1, 77, b2.unet.cfg.cross_attention_dim)),
    )
    assert out.shape == (1, 2, 8, 8, 4)
