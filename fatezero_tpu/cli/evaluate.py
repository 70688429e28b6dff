"""Benchmark evaluation entry: CLIP Frame-Acc / Tem-Con over result folders.

Reference: CLIP/frame_acc_tem_con.py:56-89 driven by
CLIP/bench_clean_prompt.yaml. Two bench YAML schemas are accepted:

1. the reference's own (CLIP/bench_clean_prompt.yaml — what
   config/bench_clean_prompt.yaml ships): a mapping of result-folder
   basenames to prompt pairs. The reference sweeps `results_root/*` and
   looks each folder's basename up in the YAML
   (frame_acc_tem_con.py:63-76); here every named entry under
   `results_root` is evaluated the same way:

    swan_cartoon:
      path: result/paper/...          # provenance only, not read
      source: a black swan ...
      target: cartoon photo of a black swan ...

2. an explicit item list:

    clip_checkpoint: null            # dir with HF CLIPModel weights (optional)
    results_root: results/
    items:
      - folder: jeep_watercolor/0_...
        source_prompt: a silver jeep ...
        target_prompt: watercolor painting of ...

Prints one JSON dict with dataset means and per-item metrics.
"""
from __future__ import annotations

import json

from fatezero_tpu.common.config import load_config
from fatezero_tpu.eval.clip_metrics import load_evaluator

_META_KEYS = ("clip_checkpoint", "results_root")


def normalize_bench(cfg: dict) -> list:
    """Either bench schema -> list of {folder, source_prompt, target_prompt}.

    Reference-schema prompts are passed through verbatim (including the
    trailing commas present in CLIP/bench_clean_prompt.yaml — the reference
    tokenizes them as-is, frame_acc_tem_con.py:72)."""
    if "items" in cfg:
        return list(cfg["items"])
    items = []
    for name, v in cfg.items():
        if name in _META_KEYS or not isinstance(v, dict):
            continue
        if "source" in v and "target" in v:
            items.append(
                {
                    "folder": name,
                    "source_prompt": v["source"],
                    "target_prompt": v["target"],
                }
            )
    if not items:
        raise ValueError(
            "bench config has neither an `items` list nor any "
            "`name: {source, target}` entries (reference schema)"
        )
    return items


def run(config: str, results_root: str = None):
    cfg = load_config(config).to_dict()
    ev = load_evaluator(cfg.get("clip_checkpoint"))
    out = ev.evaluate_benchmark(
        normalize_bench(cfg), results_root or cfg.get("results_root", ".")
    )
    print(json.dumps(out, indent=2))
    return out


def main():
    import click

    @click.command()
    @click.option("--config", type=str, required=True)
    @click.option("--results-root", type=str, default=None)
    def _run(config, results_root):
        run(config, results_root)

    _run()


if __name__ == "__main__":
    main()
