"""VAE converter round trip on a synthetic diffusers-layout checkpoint."""
import numpy as np
import jax
import jax.numpy as jnp

from fatezero_tpu.common.checkpoint import _flatten
from fatezero_tpu.convert.torch_to_flax import convert_vae_state, merge_into_params
from fatezero_tpu.models.vae import AutoencoderKL, VAEConfig

TINY = VAEConfig(block_out_channels=(16, 32, 32, 32), norm_num_groups=8)


def _synthesize(flat):
    """Invert the flax tree into diffusers AutoencoderKL key layout.

    Flax module names like encoder/down_blocks_0_resnets_1/conv1 map to
    encoder.down_blocks.0.resnets.1.conv1 etc.
    """
    import re

    torch_state = {}
    for path, v in flat.items():
        segs = path.split("/")
        leaf = segs[-1]
        mods = segs[:-1]
        dotted = []
        for seg in mods:
            seg = re.sub(r"(down_blocks|up_blocks)_(\d+)_", r"\1.\2.", seg)
            seg = re.sub(r"(resnets|downsamplers|upsamplers|attentions)_(\d+)", r"\1.\2", seg)
            seg = seg.replace("mid_block_", "mid_block.")
            seg = re.sub(r"downsamplers\.(\d+)_conv", r"downsamplers.\1.conv", seg)
            seg = re.sub(r"upsamplers\.(\d+)_conv", r"upsamplers.\1.conv", seg)
            dotted.append(seg)
        name = ".".join(dotted)
        v = np.asarray(v)
        if leaf == "kernel":
            if v.ndim == 4:  # conv [kh,kw,in,out] -> [out,in,kh,kw]
                torch_state[f"{name}.weight"] = v.transpose(3, 2, 0, 1)
            else:  # dense
                torch_state[f"{name}.weight"] = v.T
        elif leaf == "scale":
            torch_state[f"{name}.weight"] = v
        elif leaf == "bias":
            torch_state[f"{name}.bias"] = v
        else:
            raise AssertionError(path)
    return torch_state


def test_vae_converter_roundtrip():
    model = AutoencoderKL(cfg=TINY)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    flat = _flatten(params["params"])
    torch_state = _synthesize(flat)
    assert len(torch_state) > 50

    converted = convert_vae_state(torch_state)
    merged = merge_into_params(params, converted, strict=True)
    new_flat = _flatten(merged["params"])
    assert sorted(new_flat) == sorted(flat)
    for path in flat:
        np.testing.assert_array_equal(
            np.asarray(flat[path]), np.asarray(new_flat[path]), err_msg=path
        )
