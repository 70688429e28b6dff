"""UNet converter round trip on a synthetic diffusers-layout checkpoint.

No diffusers/weights exist in this image, so the torch state dict is
synthesized by inverting the documented key mapping from a real flax tree:
the converter must consume every key (its own leftover check), cover every
non-temporal flax param (merge strict mode), and land every value unchanged.
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fatezero_tpu.convert.torch_to_flax import convert_unet_state, merge_into_params
from fatezero_tpu.models.unet3d import UNet3DConfig, UNetPseudo3DConditionModel

TINY = UNet3DConfig(
    block_out_channels=(32, 64, 128, 128),
    attention_head_dim=4,
    cross_attention_dim=16,
    norm_num_groups=8,
)

_INDEXED = {
    "down_blocks", "up_blocks", "resnets", "attentions",
    "transformer_blocks", "downsamplers", "upsamplers", "net",
}


def _torch_name(segments):
    """flax path segments -> diffusers dotted module name."""
    out = []
    for seg in segments:
        m = re.fullmatch(r"([a-z_]+)_(\d+)", seg)
        if m and m.group(1) in _INDEXED:
            out += [m.group(1), m.group(2)]
        else:
            out.append(seg)
    return ".".join(out)


def _synthesize(flat, include_temporal=False):
    """flax flat {path: value} -> torch-layout state dict.

    include_temporal adds the FateZero 3-D tuned-checkpoint keys
    (conv_temporal / attn_temporal / norm_temporal)."""
    torch_state = {}
    for path, v in flat.items():
        if "lora" in path:
            continue
        if "temporal" in path:
            if not include_temporal:
                continue
            v = np.asarray(v)
            segs = path.split("/")
            if segs[-1] in ("conv_temporal_kernel", "conv_temporal_bias"):
                name = _torch_name(segs[:-1]) + ".conv_temporal"
                if segs[-1].endswith("kernel"):  # [k, in, out] -> [out, in, k]
                    torch_state[f"{name}.weight"] = v.transpose(2, 1, 0)
                else:
                    torch_state[f"{name}.bias"] = v
                continue
            # attn_temporal / norm_temporal follow the standard rules below
        segs = path.split("/")
        leaf = segs[-1]
        mods = segs[:-1]
        is_spatial_conv = len(mods) >= 1 and mods[-1] == "spatial"
        if is_spatial_conv:
            mods = mods[:-1]
        name = _torch_name(mods)
        if mods and mods[-1] == "to_out":
            name += ".0"  # diffusers wraps to_out in a ModuleList
        v = np.asarray(v)
        if leaf == "kernel":
            if is_spatial_conv:  # [kh,kw,in,out] -> [out,in,kh,kw]
                torch_state[f"{name}.weight"] = v.transpose(3, 2, 0, 1)
            elif mods[-1] in ("proj_in", "proj_out"):  # dense -> 1x1 conv
                torch_state[f"{name}.weight"] = v.T[:, :, None, None]
            else:  # dense
                torch_state[f"{name}.weight"] = v.T
        elif leaf == "scale":
            torch_state[f"{name}.weight"] = v
        elif leaf == "bias":
            torch_state[f"{name}.bias"] = v
        else:
            raise AssertionError(f"unexpected leaf {path}")
    return torch_state


@pytest.mark.parametrize("include_temporal", [False, True])
def test_unet_converter_roundtrip(param_init, include_temporal):
    """include_temporal=False: 2-D SD checkpoint (inflation keeps temporal
    identity init); True: FateZero 3-D tuned checkpoint (temporal keys
    present and converted, unet_3d_condition.py:485-501)."""
    model = UNetPseudo3DConditionModel(cfg=TINY)
    sample = jnp.zeros((1, 2, 16, 16, 4))
    text = jnp.zeros((1, 7, 16))
    params = param_init(model, sample, jnp.int32(1), text)

    from fatezero_tpu.common.checkpoint import _flatten

    flat = _flatten(params["params"] if "params" in params else params)
    torch_state = _synthesize(flat, include_temporal=include_temporal)
    assert len(torch_state) > 100

    converted = convert_unet_state(torch_state)  # raises on leftover keys
    merged = merge_into_params(params, converted, strict=True)  # full coverage

    for (path, orig), new in zip(
        sorted(flat.items()), (v for _, v in sorted(_flatten(
            merged["params"] if "params" in merged else merged).items())),
    ):
        np.testing.assert_array_equal(
            np.asarray(orig), np.asarray(new), err_msg=path
        )
