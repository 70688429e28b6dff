"""Profile the fused edit/invert scan on the real chip and print an op-kind
time breakdown.

Runs the bench workload (teaser-exact by default, env knobs as bench.py) for
a reduced step count, traces ONE dispatch with jax.profiler, then parses the
trace with tensorflow's ProfileData:

- only "XLA Ops" line events are summed (device time);
- `%while...` umbrella events double-count their children and are excluded;
- categories match on the HLO op KIND (the token before " = " in the event
  name), not substrings — fusion names embed operand names.

Usage (TPU):
    PROFILE_STEPS=3 PROFILE_MODE=stored python scripts/profile_edit_step.py
    PROFILE_MODE=replay|invert|invert_capture  # other dispatches

The wall numbers of a reduced-step scan are meaningless over the axon relay
(per-dispatch overhead); the per-op *composition* is what this reports.
"""
from __future__ import annotations

import glob
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(os.environ.get("PROFILE_STEPS", 3))
FRAMES = int(os.environ.get("BENCH_FRAMES", 8))
RES = int(os.environ.get("BENCH_RES", 512))
MODE = os.environ.get("PROFILE_MODE", "stored")  # stored|replay|invert|invert_capture
FULL_SC = bool(int(os.environ.get("BENCH_FULL_SC", 0)))
TRACE_DIR = os.environ.get("PROFILE_DIR", "/tmp/fz_profile")
TOP_N = int(os.environ.get("PROFILE_TOP", 25))


def build():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    from fatezero_tpu.models.clip import CLIPTextModel
    from fatezero_tpu.models.tokenizer import StubTokenizer
    from fatezero_tpu.models.unet3d import UNet3DConfig, UNetPseudo3DConditionModel
    from fatezero_tpu.pipelines.fatezero_pipeline import FateZeroPipeline
    from fatezero_tpu.ptp.controller import make_controller
    from __graft_entry__ import _fast_params

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
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
    pipe = FateZeroPipeline(
        unet, unet_params, None, None, text_model, text_params, tokenizer
    )
    source = "a silver jeep driving down a curvy road in the countryside"
    target = "watercolor painting of a silver jeep driving down a curvy road in the countryside"
    emb_src = pipe.encode_prompt(source)
    emb_tgt = pipe.encode_prompt(target)
    latents = jnp.asarray(
        np.random.RandomState(0).randn(1, FRAMES, lat, lat, 4), jnp.float32
    )
    controller = make_controller(
        tokenizer,
        [source, target],
        num_steps=STEPS,
        is_replace_controller=False,
        cross_replace_steps=0.8,
        self_replace_steps=0.8,
        eq_params={"words": ["watercolor"], "values": [10]},
    )
    return pipe, latents, emb_src, emb_tgt, controller


def traced_dispatch():
    import jax

    pipe, latents, emb_src, emb_tgt, controller = build()
    stored = None
    if MODE in ("stored",):
        traj, stored = pipe.invert_fast(latents, emb_src, STEPS, capture=True)
    else:
        traj = pipe.invert_fast(latents, emb_src, STEPS)
    jax.block_until_ready(traj)

    def dispatch():
        if MODE == "invert":
            return pipe.invert_fast(latents, emb_src, STEPS)
        if MODE == "invert_capture":
            return pipe.invert_fast(latents, emb_src, STEPS, capture=True)
        out, _ = pipe.edit_fast(
            traj, emb_src, emb_tgt, controller, STEPS, stored=stored
        )
        return out

    jax.block_until_ready(dispatch())  # warmup compile outside the trace
    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        jax.block_until_ready(dispatch())


def parse():
    from jax.profiler import ProfileData  # type: ignore

    files = sorted(
        glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        print(json.dumps({"error": f"no xplane.pb under {TRACE_DIR}"}))
        return
    pd = ProfileData.from_file(files[-1])
    by_kind = defaultdict(float)
    by_name = defaultdict(float)
    total = 0.0
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev.name
                if name.startswith("%while"):
                    continue  # umbrella: double-counts children
                dur = ev.duration_ns / 1e6
                # HLO text: "%opname.123 = <type> kind(...)"; tuple types and
                # layout tile specs contain parens/spaces — use the shared
                # robust extractor
                from parse_profile import opcode_of

                by_kind[opcode_of(name)] += dur
                by_name[name.split(" = ", 1)[0]] += dur
                total += dur
    print(f"\n== device time by HLO kind (total {total:.1f} ms, {STEPS} steps, mode={MODE}) ==")
    for k, v in sorted(by_kind.items(), key=lambda kv: -kv[1]):
        print(f"  {k:<32s} {v:9.2f} ms  {100*v/max(total,1e-9):5.1f}%  {v/STEPS:8.3f} ms/step")
    print(f"\n== top {TOP_N} ops ==")
    for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:TOP_N]:
        print(f"  {v:9.2f} ms  {k[:110]}")


if __name__ == "__main__":
    traced_dispatch()
    parse()
