#!/usr/bin/env python
"""Batch-dataset eval driver: loop a dataset-of-videos YAML x p2p-config grid.

Reference parity (test_fatezero_dataset.py:7-48): the config lists multiple
videos (each with its own dataset/editing block) under `datasets:` and a grid
of p2p hyperparameter variants under `p2p_grid:`; every (video, variant)
combination runs one edit via fatezero_tpu.cli.edit.test.

    python test_fatezero_dataset.py --config config/dataset_sweep.yaml
"""
from fatezero_tpu.cli.edit import test
from fatezero_tpu.common.config import load_config


def run(config: str):
    cfg = load_config(config).to_dict()
    base = {k: v for k, v in cfg.items() if k not in ("datasets", "p2p_grid")}
    grid = cfg.get("p2p_grid") or [{}]
    results = []
    for ds in cfg.get("datasets", []):
        for gi, variant in enumerate(grid):
            sub = dict(base)
            sub["config"] = config
            sub["dataset_config"] = ds["dataset_config"]
            editing = dict(ds.get("editing_config", {}))
            p2p = {
                k: {**dict(v), **variant}
                for k, v in dict(editing.get("p2p_config", {0: {}})).items()
            }
            editing["p2p_config"] = p2p
            sub["editing_config"] = editing
            sub["logdir"] = None
            results.append(test(**sub))
    return results


def main():
    import click

    @click.command()
    @click.option("--config", type=str, required=True)
    def _run(config):
        run(config)

    _run()


if __name__ == "__main__":
    main()
