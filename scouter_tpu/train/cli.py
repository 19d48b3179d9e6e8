"""Training CLI — train.py parity (argparse schema, sweep driver, cost profiling).

``python -m scouter_tpu.train.cli --model resnet18 --dataset MNIST ...`` accepts
the reference's flags (core/config.py). The sweep driver mirrors
``param_translation`` (``train.py:207-230``): a comma list in num_classes /
lambda_value / power / slots_per_class triggers a grid, each cell trained
``iterated_evaluation_num`` times, results collected in a dict and printed.

``--thop`` parity (``train.py:91-137``): prints trainable-param count (M) and
GFLOPs at (1, 3, 260, 260) — computed by XLA cost analysis instead of the thop
library — then exits without training.
"""

from __future__ import annotations

import argparse
from typing import Dict, List

from ..core.config import config_from_args, expand_sweep, get_args_parser
from .loop import run_training

__all__ = ["main", "param_translation", "model_cost"]


def model_cost(cfg) -> List[float]:
    """[params_M, GFLOPs] via jit cost analysis (replaces thop, train.py:126-137)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models import build_slot_model

    model = build_slot_model(cfg)
    chans = 1 if cfg.dataset == "MNIST" else 3
    x = jnp.zeros((1, 260, 260, chans), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))

    def fwd(v, img):
        return model.apply(v, img)["logits"]

    lowered = jax.jit(fwd).lower(variables, x)
    cost = lowered.compile().cost_analysis()
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    params_m = n_params / 1e6
    gflops = flops / 1e9
    print(params_m, "M", f"{gflops:.3f} GFLOPs @ (1,{chans},260,260)")
    return [params_m, gflops]


def param_translation(ns: argparse.Namespace):
    """Sweep expansion + training (train.py:207-230 semantics)."""
    record: Dict[str, List] = {}
    singles = list(expand_sweep(ns))
    if len(singles) == 1 and singles[0][0] is None:
        cfg = singles[0][1]
        if cfg.thop:
            return model_cost(cfg)
        return run_training(cfg)

    for key, cfg in singles:
        record.setdefault(key, [])
        for _turn in range(cfg.iterated_evaluation_num):
            record[key].append(run_training(cfg))
            print(record)
    return record


def main(argv=None):
    from ..core.cache import setup_compilation_cache

    setup_compilation_cache()
    parser = argparse.ArgumentParser(
        "SCOUTER-TPU training and evaluation script", parents=[get_args_parser()]
    )
    ns = parser.parse_args(argv)
    if ns.output_dir:
        import pathlib

        pathlib.Path(ns.output_dir).mkdir(parents=True, exist_ok=True)
    return param_translation(ns)


if __name__ == "__main__":
    main()
