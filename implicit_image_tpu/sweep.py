"""Hyper-parameter sweeper — the Optuna/Ax-sweeper replacement.

The reference optimizes main()'s (PSNR, bytes) return with Hydra's Optuna
TPE sweeper (conf/hydra/sweeper/optuna.yaml: maximize, 15 trials,
compress.py:269). Optuna isn't in this environment; this module provides
the same capability with zero deps:

  * grid search over comma lists (Hydra multirun semantics), and/or
  * random search over `key=uniform(a,b)` / `key=loguniform(a,b)` /
    `key=choice(a,b,c)` spaces,
  * `sampler=tpe` (default after n_startup random trials): a
    Tree-structured Parzen Estimator per dimension — split history at the
    gamma objective quantile, model good/bad sets as Parzen windows
    (Gaussian KDE in the transformed space; weighted counts for choice),
    propose the candidate maximizing l(x)/g(x). The same model-based
    sample efficiency class as the reference's Optuna TPE sweeper.
  * objective: maximize PSNR (default) or maximize PSNR - lambda*KB.

CLI:
  python -m implicit_image_tpu.sweep n_trials=15 seed=0 sampler=tpe \
      masking.density='loguniform(0.05,0.95)' img=synthetic \
      train.num_steps=500
"""
from __future__ import annotations

import json
import logging
import math
import random
import re
import sys
from pathlib import Path
from typing import Dict, List, Sequence, Tuple

from implicit_image_tpu.config import compose
from implicit_image_tpu.utils import catch_error_decorator

log = logging.getLogger("implicit_image_tpu")

_DIST = re.compile(r"(uniform|loguniform|choice)\((.*)\)$")


def parse_space(overrides: List[str]):
    """Split CLI args into (fixed overrides, sampled space, sweep params)."""
    fixed, space = [], {}
    params = {
        "n_trials": 15,
        "seed": 0,
        "lambda_kb": 0.0,
        "sampler": "tpe",
        "n_startup": 5,
        "gamma": 0.25,
    }
    for ov in overrides:
        key, _, val = ov.partition("=")
        if key in params:
            if isinstance(params[key], str):
                params[key] = val.strip()
            else:
                params[key] = type(params[key])(float(val))
            continue
        m = _DIST.match(val.strip().strip("'\""))
        if m:
            kind, args = m.group(1), m.group(2).split(",")
            space[key] = (kind, args)
        else:
            fixed.append(ov)
    return fixed, space, params


def _to_unit(kind, args, v: float) -> float:
    lo, hi = float(args[0]), float(args[1])
    if kind == "loguniform":
        return (math.log(v) - math.log(lo)) / (math.log(hi) - math.log(lo))
    return (v - lo) / (hi - lo)


def _from_unit(kind, args, u: float):
    lo, hi = float(args[0]), float(args[1])
    u = min(max(u, 0.0), 1.0)
    if kind == "loguniform":
        return math.exp(math.log(lo) + u * (math.log(hi) - math.log(lo)))
    return lo + u * (hi - lo)


def _parzen_logpdf(x: float, centers: Sequence[float], bw: float) -> float:
    """log of a uniform-mixture-of-Gaussians Parzen window on [0,1]
    (plus one prior component centered at 0.5 with unit-range bandwidth)."""
    cs = list(centers) + [0.5]
    bws = [bw] * len(centers) + [1.0]
    acc = 0.0
    for c, b in zip(cs, bws):
        acc += math.exp(-0.5 * ((x - c) / b) ** 2) / (b * math.sqrt(2 * math.pi))
    return math.log(acc / len(cs) + 1e-300)


def ask_tpe(
    space: Dict,
    history: List[Tuple[Dict[str, object], float]],
    rng: random.Random,
    gamma: float = 0.25,
    n_candidates: int = 24,
) -> Dict[str, object]:
    """Propose the next point: per-dimension TPE over `history` =
    [(values dict, objective)], maximizing objective."""
    n_good = max(1, int(math.ceil(gamma * len(history))))
    ranked = sorted(history, key=lambda t: -t[1])
    good, bad = ranked[:n_good], ranked[n_good:] or ranked[:1]

    out: Dict[str, object] = {}
    for key, (kind, args) in space.items():
        if kind == "choice":
            options = [a.strip() for a in args]
            # weighted counts with add-one smoothing
            gw = {o: 1.0 for o in options}
            bw_ = {o: 1.0 for o in options}
            for vals, _ in good:
                gw[str(vals[key])] += 1.0
            for vals, _ in bad:
                bw_[str(vals[key])] += 1.0
            gs, bs = sum(gw.values()), sum(bw_.values())
            out[key] = max(options, key=lambda o: (gw[o] / gs) / (bw_[o] / bs))
            continue
        g_pts = [_to_unit(kind, args, float(v[key])) for v, _ in good]
        b_pts = [_to_unit(kind, args, float(v[key])) for v, _ in bad]
        bw_g = max(1.0 / max(len(g_pts), 1) ** 0.5 * 0.5, 0.05)
        bw_b = max(1.0 / max(len(b_pts), 1) ** 0.5 * 0.5, 0.05)
        best_u, best_score = 0.5, -1e18
        for _ in range(n_candidates):
            # draw from l(x): pick a good center, jitter by its bandwidth
            c = rng.choice(g_pts) if g_pts else 0.5
            u = min(max(rng.gauss(c, bw_g), 0.0), 1.0)
            score = _parzen_logpdf(u, g_pts, bw_g) - _parzen_logpdf(
                u, b_pts, bw_b
            )
            if score > best_score:
                best_u, best_score = u, score
        out[key] = _from_unit(kind, args, best_u)
    return out


def sample_random(space: Dict, rng: random.Random) -> Dict[str, object]:
    out: Dict[str, object] = {}
    for key, (kind, args) in space.items():
        if kind == "uniform":
            out[key] = rng.uniform(float(args[0]), float(args[1]))
        elif kind == "loguniform":
            out[key] = math.exp(
                rng.uniform(math.log(float(args[0])), math.log(float(args[1])))
            )
        else:  # choice
            out[key] = rng.choice(args).strip()
    return out


def ask(space, history, rng, sampler="tpe", n_startup=5, gamma=0.25):
    """Next point to evaluate: random during startup (or sampler=random),
    TPE afterwards."""
    if sampler == "random" or len(history) < n_startup or not space:
        return sample_random(space, rng)
    return ask_tpe(space, history, rng, gamma)


def sample(space: Dict, rng: random.Random) -> List[str]:
    """Back-compat: one random draw as override strings."""
    return [f"{k}={v}" for k, v in sample_random(space, rng).items()]


@catch_error_decorator
def cli(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    from implicit_image_tpu.compress import main

    argv = list(sys.argv[1:] if argv is None else argv)
    fixed, space, params = parse_space(argv)
    rng = random.Random(int(params["seed"]))
    trials = []
    history: List[Tuple[Dict[str, object], float]] = []
    best: Tuple[float, List[str]] = (-1e9, [])
    for t in range(int(params["n_trials"])):
        values = ask(
            space, history, rng,
            sampler=str(params["sampler"]),
            n_startup=int(params["n_startup"]),
            gamma=float(params["gamma"]),
        )
        trial_overrides = fixed + [f"{k}={v}" for k, v in values.items()]
        cfg = compose(trial_overrides)
        run_dir = Path(cfg.get("output_dir", "outputs/sweep")) / f"trial_{t}"
        psnr, nbytes = main(cfg, run_dir=str(run_dir))
        objective = psnr - params["lambda_kb"] * nbytes / 1024.0
        history.append((values, objective))
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
