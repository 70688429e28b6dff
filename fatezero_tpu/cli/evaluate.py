"""Benchmark evaluation entry: CLIP Frame-Acc / Tem-Con over result folders.

Reference: CLIP/frame_acc_tem_con.py:56-89 driven by
CLIP/bench_clean_prompt.yaml. Bench YAML schema (list under `items`):

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


def run(config: str, results_root: str = None):
    cfg = load_config(config).to_dict()
    ev = load_evaluator(cfg.get("clip_checkpoint"))
    out = ev.evaluate_benchmark(
        cfg["items"], results_root or cfg.get("results_root", ".")
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
