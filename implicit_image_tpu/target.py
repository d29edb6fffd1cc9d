"""Target-rate / target-quality compression — `target.bytes=` / `target.db=`.

Beyond-reference capability: the reference can only run a FIXED density
and report whatever (PSNR, bytes) falls out (compress.py:269 returns the
pair for a sweeper to optimize OFFLINE over many processes). Real codecs
are driven the other way around — "fit this image into ≤ N bytes" or
"reach ≥ X dB at minimum rate". This module answers those queries
directly, using the one-compile density ladder (parallel/ladder.py) as
the search engine: B candidate densities fit CONCURRENTLY as one vmapped
XLA program, so a whole bracket costs one compile + one fused fit, and an
optional refinement pass re-brackets around the incumbent.

Selection is on the honest end metrics — DECODED PSNR from the written
bitstream vs real container bytes:

  * target.bytes=N  -> among members with bytes ≤ N, maximize decoded
    PSNR; if none fit, return the smallest member and report the miss.
  * target.db=X     -> among members with decoded PSNR ≥ X, minimize
    bytes; if none reach it, return the best-PSNR member and the miss.
  * both            -> members must satisfy bytes ≤ N, maximize PSNR,
    and the result additionally reports whether X was reached.

CLI (same overrides as compress.py; density list, if given, seeds the
initial bracket):

    python -m implicit_image_tpu.target img=flower target.bytes=60000
    python -m implicit_image_tpu.target img=flower target.db=48 \
        target.refine=1 mlp=coordx
"""
from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax

from implicit_image_tpu.parallel.ladder import build_ladder_args, ladder_compress
from implicit_image_tpu.parallel.pipeline import PipelineResult

__all__ = ["compress_to_target", "TargetResult"]

log = logging.getLogger("implicit_image_tpu")


class TargetResult(dict):
    """Plain dict result with attribute access for the chosen member."""

    __getattr__ = dict.__getitem__


def _meets(r: PipelineResult, tb: Optional[int], tdb: Optional[float]) -> bool:
    ok = True
    if tb is not None:
        ok &= r.compressed_bytes <= tb
    if tdb is not None:
        ok &= r.decoded_psnr >= tdb
    return ok


def _pick(
    members: List[Tuple[float, PipelineResult]],
    tb: Optional[int],
    tdb: Optional[float],
) -> Tuple[float, PipelineResult, bool]:
    """Best (density, member) under the target; False when it's a miss."""
    feasible = [(d, r) for d, r in members if _meets(r, tb, tdb)]
    if feasible:
        if tb is not None:
            # rate-constrained: maximize quality inside the budget
            d, r = max(feasible, key=lambda dr: dr[1].decoded_psnr)
        else:
            # quality-constrained: minimize rate at/above the bar
            d, r = min(feasible, key=lambda dr: dr[1].compressed_bytes)
        return d, r, True
    # miss: return the nearest side of the constraint
    if tb is not None:
        d, r = min(members, key=lambda dr: dr[1].compressed_bytes)
    else:
        d, r = max(members, key=lambda dr: dr[1].decoded_psnr)
    return d, r, False


def _bracket(
    members: List[Tuple[float, PipelineResult]],
    tb: Optional[int],
    tdb: Optional[float],
) -> Tuple[float, float]:
    """Density interval to refine: between the incumbent and its nearest
    neighbor on the other side of the binding constraint. Rate and (to a
    good approximation) decoded PSNR are monotone in density, so the
    optimum lies between the last member inside the constraint and the
    first outside it."""
    ms = sorted(members, key=lambda dr: dr[0])
    dens = [d for d, _ in ms]
    inside = [i for i, (_, r) in enumerate(ms) if _meets(r, tb, tdb)]
    if not inside:  # everything misses: refine around the nearest member
        if tb is not None:
            i = min(range(len(ms)), key=lambda i: ms[i][1].compressed_bytes)
            lo, hi = (dens[max(i - 1, 0)], dens[i])
        else:
            i = max(range(len(ms)), key=lambda i: ms[i][1].decoded_psnr)
            lo, hi = (dens[i], dens[min(i + 1, len(ms) - 1)])
        return min(lo, hi), max(lo, hi)
    if tb is not None:
        # feasible = small densities; push toward the first infeasible one
        i = max(inside)
        j = min(i + 1, len(ms) - 1)
    else:
        # feasible = large densities; push toward the first infeasible one
        i = min(inside)
        j = max(i - 1, 0)
    lo, hi = sorted((dens[i], dens[j]))
    return lo, hi


def compress_to_target(
    cfg,
    target_bytes: Optional[int] = None,
    target_db: Optional[float] = None,
    densities: Optional[Sequence[float]] = None,
    ladder_size: int = 5,
    refine: int = 1,
    out_root: Optional[str] = None,
) -> TargetResult:
    """Search the density axis for the cheapest config meeting the target.

    One coarse one-compile ladder, then `refine` bracketed ladders of 3
    members each around the incumbent. Every probed member is a complete
    protocol run (fit -> quant -> code -> decode) with its own run dir, so
    the winner's bitstream is already on disk when the search returns.
    """
    if target_bytes is None and target_db is None:
        raise ValueError("need target_bytes and/or target_db")
    args = build_ladder_args(cfg)
    root = Path(out_root or "outputs/target") / cfg.img.name
    if densities is None:
        densities = list(np.round(np.geomspace(0.02, 0.9, ladder_size), 4))

    t0 = time.perf_counter()
    members: List[Tuple[float, PipelineResult]] = []

    def run_ladder(dens: Sequence[float], tag: str):
        results = ladder_compress(
            jax.random.PRNGKey(int(cfg.seed)),
            args["mdef"], args["mcfg"], args["grid"], args["img"],
            args["train_cfg"], args["optim_cfg"], args["masking"],
            list(dens),
            quant_cfg=args["quant_cfg"], stream_name=args["stream_name"],
            stream_root=str(root / tag), half=args["half"],
            coding_kwargs=args["coding_kwargs"],
            init_params=args["init_params"], delta_info=args["delta_info"],
        )
        for d, r in zip(dens, results):
            members.append((float(d), r))
            log.info(
                "target probe d=%.4g: decoded %.2f dB @ %d B",
                d, r.decoded_psnr, r.compressed_bytes,
            )

    run_ladder(densities, "coarse")
    for k in range(refine):
        d_inc, _, hit = _pick(members, target_bytes, target_db)
        lo, hi = _bracket(members, target_bytes, target_db)
        if hi - lo < 1e-3:
            break
        probed = {round(d, 4) for d, _ in members}
        new = [
            d for d in np.round(np.linspace(lo, hi, 5)[1:-1], 4)
            if d not in probed and 0.0 < d < 1.0
        ]
        if not new:
            break
        run_ladder(new, f"refine{k}")

    d, r, hit = _pick(members, target_bytes, target_db)
    wall = time.perf_counter() - t0
    return TargetResult(
        density=d,
        decoded_psnr=r.decoded_psnr,
        compressed_bytes=r.compressed_bytes,
        target_met=hit,
        stream_dir=r.stream_dir,
        probes=[
            {"density": dd, "decoded_psnr": rr.decoded_psnr,
             "bytes": rr.compressed_bytes}
            for dd, rr in sorted(members)
        ],
        wall_s=round(wall, 2),
    )


def cli(argv=None) -> None:
    import sys

    from implicit_image_tpu.config import compose

    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )
    argv = list(sys.argv[1:] if argv is None else argv)
    tb, tdb, refine, ladder_size = None, None, 1, 5
    densities = None
    kept = []
    for a in argv:
        if a.startswith("target.bytes="):
            tb = int(float(a.split("=", 1)[1]))
        elif a.startswith("target.db="):
            tdb = float(a.split("=", 1)[1])
        elif a.startswith("target.refine="):
            refine = int(a.split("=", 1)[1])
        elif a.startswith("target.ladder="):
            ladder_size = int(a.split("=", 1)[1])
        elif a.startswith("masking.density="):
            densities = [float(x) for x in a.split("=", 1)[1].split(",")]
        else:
            kept.append(a)
    cfg = compose(kept)
    if not cfg.get("masking") or cfg.masking.get("dense", False):
        kept = [a for a in kept if not a.startswith("masking=")]
        cfg = compose(kept + ["masking=RigL"])

    res = compress_to_target(
        cfg, target_bytes=tb, target_db=tdb, densities=densities,
        ladder_size=ladder_size, refine=refine,
    )
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    cli()
