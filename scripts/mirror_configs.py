"""Mirror the reference workload YAMLs into config/ with our class paths.

The 27 YAMLs under /root/reference/config/** are the product's recipe book
(reference test_fatezero.py:254-286 is driven entirely by them). They are
config *data*, mirrored byte-for-byte except:
  * `target:` dotted class paths point at fatezero_tpu classes;
  * the CUDA_VISIBLE_DEVICES launch comments drop the CUDA prefix.
The 9-clip CLIP benchmark prompt list (CLIP/bench_clean_prompt.yaml) is
copied verbatim for `python -m fatezero_tpu.cli.evaluate`.
"""
import os
import re
import shutil

SRC = "/root/reference/config"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "config")

TARGET_MAP = {
    "video_diffusion.pipelines.p2p_ddim_spatial_temporal.P2pDDIMSpatioTemporalPipeline":
        "fatezero_tpu.pipelines.fatezero_pipeline.FateZeroPipeline",
    "video_diffusion.pipelines.ddim_spatial_temporal.DDIMSpatioTemporalStableDiffusionPipeline":
        "fatezero_tpu.pipelines.fatezero_pipeline.FateZeroPipeline",
    "video_diffusion.pipelines.stable_diffusion.SpatioTemporalStableDiffusionPipeline":
        "fatezero_tpu.pipelines.fatezero_pipeline.FateZeroPipeline",
    "video_diffusion.trainer.ddpm_trainer.DDPMTrainer":
        "fatezero_tpu.trainer.ddpm_trainer.DDPMTrainer",
}


def mirror():
    n = 0
    for root, _, files in os.walk(SRC):
        rel = os.path.relpath(root, SRC)
        for fn in sorted(files):
            if not fn.endswith(".yaml"):
                continue
            text = open(os.path.join(root, fn)).read()
            for old, new in TARGET_MAP.items():
                text = text.replace(old, new)
            text = re.sub(r"CUDA_VISIBLE_DEVICES=\d+ ", "", text)
            out = os.path.join(DST, rel, fn)
            os.makedirs(os.path.dirname(out), exist_ok=True)
            with open(out, "w") as f:
                f.write(text)
            n += 1
    shutil.copyfile(
        "/root/reference/CLIP/bench_clean_prompt.yaml",
        os.path.join(DST, "bench_clean_prompt.yaml"),
    )
    print(f"mirrored {n} workload YAMLs + bench_clean_prompt.yaml into {DST}")


if __name__ == "__main__":
    mirror()
