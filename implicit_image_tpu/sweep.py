"""Hyper-parameter sweeper — the Optuna/Ax-sweeper replacement.

The reference optimizes main()'s (PSNR, bytes) return with Hydra's Optuna
TPE sweeper (conf/hydra/sweeper/optuna.yaml: maximize, 15 trials,
compress.py:269). Optuna isn't in this environment; this module provides
the same capability with zero deps:

  * grid search over comma lists (Hydra multirun semantics), and/or
  * random search over `key=uniform(a,b)` / `key=loguniform(a,b)` /
    `key=choice(a,b,c)` spaces,
  * objective: maximize PSNR (default) or maximize PSNR - lambda*KB.

CLI:
  python -m implicit_image_tpu.sweep n_trials=15 seed=0 \
      masking.density='loguniform(0.05,0.95)' img=synthetic \
      train.num_steps=500
"""
from __future__ import annotations

import json
import logging
import random
import re
import sys
from pathlib import Path
from typing import Dict, List, Tuple

from implicit_image_tpu.config import compose
from implicit_image_tpu.utils import catch_error_decorator

log = logging.getLogger("implicit_image_tpu")

_DIST = re.compile(r"(uniform|loguniform|choice)\((.*)\)$")


def parse_space(overrides: List[str]):
    """Split CLI args into (fixed overrides, sampled space, sweep params)."""
    fixed, space, params = [], {}, {"n_trials": 15, "seed": 0, "lambda_kb": 0.0}
    for ov in overrides:
        key, _, val = ov.partition("=")
        if key in params:
            params[key] = type(params[key])(float(val))
            continue
        m = _DIST.match(val.strip().strip("'\""))
        if m:
            kind, args = m.group(1), m.group(2).split(",")
            space[key] = (kind, args)
        else:
            fixed.append(ov)
    return fixed, space, params


def sample(space: Dict, rng: random.Random) -> List[str]:
    out = []
    for key, (kind, args) in space.items():
        if kind == "uniform":
            v = rng.uniform(float(args[0]), float(args[1]))
        elif kind == "loguniform":
            import math

            v = math.exp(rng.uniform(math.log(float(args[0])), math.log(float(args[1]))))
        else:  # choice
            v = rng.choice(args).strip()
        out.append(f"{key}={v}")
    return out


@catch_error_decorator
def cli(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    from implicit_image_tpu.compress import main

    argv = list(sys.argv[1:] if argv is None else argv)
    fixed, space, params = parse_space(argv)
    rng = random.Random(int(params["seed"]))
    trials = []
    best: Tuple[float, List[str]] = (-1e9, [])
    for t in range(int(params["n_trials"])):
        trial_overrides = fixed + sample(space, rng)
        cfg = compose(trial_overrides)
        run_dir = Path(cfg.get("output_dir", "outputs/sweep")) / f"trial_{t}"
        psnr, nbytes = main(cfg, run_dir=str(run_dir))
        objective = psnr - params["lambda_kb"] * nbytes / 1024.0
        trials.append(
            {"trial": t, "overrides": trial_overrides, "psnr": psnr,
             "bytes": nbytes, "objective": objective}
        )
        if objective > best[0]:
            best = (objective, trial_overrides)
        log.info("trial %d: PSNR=%.3f bytes=%d obj=%.3f", t, psnr, nbytes, objective)
    out = Path("outputs/sweep_results.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({"trials": trials, "best": best[1]}, indent=2))
    print(f"BEST objective={best[0]:.4f} overrides={best[1]}")


if __name__ == "__main__":
    cli()
