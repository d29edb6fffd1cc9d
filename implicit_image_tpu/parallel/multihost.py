"""Multi-host (DCN) fleet path — `jax.distributed.initialize` + fleets of
independent fits.

SURVEY.md §2.8/§5 scope: ICI (single-host mesh) carries pixel-sharded and
image-batched programs (parallel/{sharded,batched}.py); DCN carries
*fleets of independent fits* — the TPU-native replacement for the
reference's SLURM array jobs (reference slurm_scripts/finals.sh:68-80,
one process per config). Each process fits its shard of the image list on
its LOCAL devices (no cross-host traffic in the hot loop — the fits are
independent, exactly like SLURM members), then the per-image results are
exchanged once over DCN (allgather of final PSNRs + a global-mesh psum),
so every process returns the fleet-wide result.

Real multi-host usage (TPU pod slice):

    # same program on every host; the TPU runtime supplies the topology
    from implicit_image_tpu.parallel.multihost import init_multihost, fleet_fit
    init_multihost()        # no args: auto-detected on Cloud TPU
    results = fleet_fit(key, mdef, mcfg, grid, imgs, train_cfg, optim_cfg)

Hardware-free validation (this repo's CI path): `launch_dryrun(n)` spawns
n local worker processes, each a real `jax.distributed.initialize`
process with 4 virtual CPU devices (gloo collectives over localhost —
the same code path DCN takes, minus the wire). Run via
`python -m implicit_image_tpu.parallel.multihost --dryrun 2` or
`benchmarks/multichip.py --multihost`.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
from typing import Optional, Sequence

__all__ = ["init_multihost", "fleet_fit", "launch_dryrun"]


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime (idempotent wrapper).

    With no arguments, Cloud TPU auto-detection applies (the standard
    pod-slice path). Explicit arguments support CPU dryruns and
    non-TPU fleets.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def _shard_bounds(n_items: int, num_procs: int, pid: int):
    """Contiguous near-even split of n_items across processes."""
    base, extra = divmod(n_items, num_procs)
    start = pid * base + min(pid, extra)
    return start, start + base + (1 if pid < extra else 0)


def fleet_fit(
    key,
    mdef,
    mcfg,
    grid,
    imgs,
    train_cfg,
    optim_cfg,
    masking_cfg=None,
):
    """Fit a fleet of images across all processes; every process returns
    the fleet-wide PSNR vector (allgathered once over DCN).

    imgs: (B_global, H, W, C). Process p fits its contiguous shard with
    ONE compiled fit program reused across the shard. Per-image RNG keys
    are split GLOBALLY so the fleet result is identical to a
    single-process run over the same list.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    nproc = jax.process_count()
    pid = jax.process_index()
    b_global = imgs.shape[0]
    lo, hi = _shard_bounds(b_global, nproc, pid)

    # global key split -> per-image keys; shard like the images
    keys = jax.random.split(key, b_global)
    local_imgs = jnp.asarray(imgs[lo:hi])

    local_psnrs = []
    local_params = []
    if hi > lo:
        from implicit_image_tpu.training.fit import make_fit_fn

        # fits in the fleet share one compiled program (pure in
        # (key, img)); each image keeps its GLOBAL key so fleet results
        # equal a single-process run over the same list
        fit_fn = jax.jit(make_fit_fn(
            mdef, mcfg, grid, train_cfg, optim_cfg, masking_cfg,
        ))
        for i in range(hi - lo):
            params, _, _, metrics = fit_fn(keys[lo + i], local_imgs[i])
            p = np.asarray(metrics["psnr"]).reshape(-1)
            p = p[np.isfinite(p)]
            local_psnrs.append(float(p[-1]) if p.size else float("nan"))
            local_params.append(params)

    # one DCN exchange: fixed-size per-process slot vector, summed
    # globally (absent slots are zero) -> every process sees every PSNR
    slot = np.zeros((b_global,), np.float32)
    for i, v in enumerate(local_psnrs):
        slot[lo + i] = v
    gathered = multihost_utils.process_allgather(jnp.asarray(slot))
    fleet_psnrs = np.asarray(gathered).reshape(jax.process_count(), b_global)
    fleet_psnrs = fleet_psnrs.sum(axis=0)
    return fleet_psnrs, local_params


def _worker_main(argv: Sequence[str]) -> None:
    """Dryrun worker: initialize the distributed runtime, build the GLOBAL
    mesh, run a tiny fleet, print one JSON line with what was validated."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--force-cpu", action="store_true")
    ap.add_argument("--fleet-size", type=int, default=3)
    ap.add_argument("--steps", type=int, default=20)
    # report file: gloo/absl chatter can interleave with stdout mid-line,
    # so the machine-readable report goes to its own file when given
    ap.add_argument("--report", default=None)
    # fault injection (tests/test_parallel.py dead-worker path): this
    # process exits uncleanly right after distributed init, leaving its
    # peers blocked in the allgather — the supervisor must detect it and
    # tear the fleet down instead of hanging
    ap.add_argument("--die", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    init_multihost(args.coordinator, args.num_processes, args.process_id)
    if args.die:
        # hard exit, like a real crash: sys.exit would run jax's
        # distributed atexit shutdown, which BLOCKS waiting for the peers
        # (who in turn wait for us in the allgather) — exactly the
        # deadlock the supervisor exists to break
        os._exit(17)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from implicit_image_tpu.data import get_grid, synthetic_image
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig

    # 1) global mesh construction over ALL processes' devices
    mesh = Mesh(np.asarray(jax.devices()), ("fleet",))

    # 2) a jitted global collective over that mesh (the DCN path): each
    # process contributes its local slice; psum must see every device
    nd = jax.device_count()
    local = jnp.arange(jax.local_device_count(), dtype=jnp.float32) + (
        args.process_id * jax.local_device_count()
    )
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("fleet")), np.asarray(local), (nd,)
    )
    total = jax.jit(
        lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
    )(garr)
    expect = nd * (nd - 1) / 2.0
    assert float(total) == expect, (float(total), expect)

    # 3) fleet of independent fits, results allgathered
    hw = 16
    imgs = np.stack(
        [np.asarray(synthetic_image(hw, hw, seed=s)) for s in range(args.fleet_size)]
    )
    grid = get_grid(hw, hw)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=8)
    fleet_psnrs, _ = fleet_fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, imgs,
        TrainConfig(num_steps=args.steps, log_steps=args.steps),
        OptimConfig(lr=1e-3),
    )
    report = json.dumps({
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "global_devices": nd,
        "local_devices": jax.local_device_count(),
        "psum_ok": True,
        "fleet_psnrs": [round(float(x), 4) for x in fleet_psnrs],
    })
    if args.report:
        with open(args.report, "w") as f:
            f.write(report + "\n")
    print(report, flush=True)


def launch_dryrun(
    num_processes: int = 2,
    devices_per_process: int = 4,
    fleet_size: int = 3,
    steps: int = 20,
    port: int = 0,
    timeout: float = 300.0,
    die_process: Optional[int] = None,
):
    """Spawn a local multi-process dryrun; returns the workers' parsed
    JSON reports. Validates init/global-mesh/collective/fleet paths
    without multi-host hardware (gloo over localhost).

    Failure detection: the supervisor POLLS the fleet — the moment any
    worker exits non-zero (e.g. `die_process=p` fault injection, or a
    real crash) the survivors, which would otherwise block in the
    allgather until the gloo timeout, are killed and a RuntimeError
    reports which worker died. A fleet that makes no progress past
    `timeout` seconds is torn down the same way (TimeoutError). Worker
    stdout/stderr go to files, not pipes, so a chatty worker can never
    deadlock against a full pipe buffer."""
    import socket
    import tempfile
    import time as _time

    if port == 0:
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devices_per_process}"
    ).strip()
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    tmp = tempfile.mkdtemp(prefix="multihost_dryrun_")
    report_files = [os.path.join(tmp, f"report_{i}.json") for i in range(num_processes)]
    out_files = [open(os.path.join(tmp, f"worker_{i}.log"), "w+")
                 for i in range(num_processes)]
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "implicit_image_tpu.parallel.multihost",
                "--coordinator", f"127.0.0.1:{port}",
                "--num-processes", str(num_processes),
                "--process-id", str(i),
                "--force-cpu",
                "--fleet-size", str(fleet_size),
                "--steps", str(steps),
                "--report", report_files[i],
            ]
            + (["--die"] if die_process == i else []),
            env=env,
            stdout=out_files[i],
            stderr=subprocess.STDOUT,
        )
        for i in range(num_processes)
    ]

    def _worker_log(i, limit=2000):
        out_files[i].flush()
        out_files[i].seek(0)
        return out_files[i].read()[-limit:]

    deadline = _time.monotonic() + timeout
    try:
        while True:
            codes = [p.poll() for p in procs]
            dead = [i for i, rc in enumerate(codes)
                    if rc is not None and rc != 0]
            if dead:
                raise RuntimeError(
                    f"worker(s) {dead} exited "
                    f"{[codes[i] for i in dead]}; fleet torn down\n"
                    f"worker {dead[0]} log:\n{_worker_log(dead[0])}"
                )
            if all(rc == 0 for rc in codes):
                break
            if _time.monotonic() > deadline:
                alive = [i for i, rc in enumerate(codes) if rc is None]
                raise TimeoutError(
                    f"dryrun made no progress in {timeout}s; worker(s) "
                    f"{alive} still running — fleet torn down"
                )
            _time.sleep(0.2)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for p in procs:
            if p.poll() is None:
                try:
                    p.wait(timeout=10)
                except subprocess.TimeoutExpired:
                    pass
        for f in out_files:
            f.close()

    reports = []
    for i, rf in enumerate(report_files):
        with open(rf) as f:
            reports.append(json.loads(f.read()))
    return reports


if __name__ == "__main__":
    if "--dryrun" in sys.argv:
        n = int(sys.argv[sys.argv.index("--dryrun") + 1])
        for r in launch_dryrun(num_processes=n):
            print(json.dumps(r))
    else:
        _worker_main(sys.argv[1:])
