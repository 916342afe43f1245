"""Multi-host (multi-process) distributed runtime — the DCN story.

The reference is strictly single-process single-GPU (SURVEY.md §2.10:
no NCCL/Gloo/MPI anywhere; main_train.py:43-45 pins one CUDA id). This
module spans a training run across processes the TPU way:

* ``maybe_initialize_distributed`` brings up ``jax.distributed`` from env
  vars (each TPU-VM host of a pod slice runs the same command); after it,
  ``jax.devices()`` is the GLOBAL device list and a single ``Mesh`` spans
  hosts — XLA routes collectives over ICI within a slice and DCN across
  hosts, no application-level comm code.
* the data axis shards the global batch: every process feeds its LOCAL
  shard via ``global_batch_from_local`` (``cfg.batch_size`` is per-process;
  global batch = batch_size × process_count).
* dataset records are striped per process with ``process_shard`` (padded
  by wrapping to equal length so all processes take the same number of
  lock-step steps per epoch and no record is ever dropped).
* artifacts (config.yaml, logfile, TensorBoard, checkpoints, reports) are
  written by process 0 only (``is_primary``).

Validated by a real 2-process × 4-virtual-device CPU run (gloo-backed
collectives): tests/test_multihost.py trains lock-step to bit-identical
parameters across processes.
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

COORD_ENV = "BRATS21_COORDINATOR"
NPROC_ENV = "BRATS21_NUM_PROCESSES"
PID_ENV = "BRATS21_PROCESS_ID"


_initialized: Optional[bool] = None


def maybe_initialize_distributed() -> bool:
    """Initialize ``jax.distributed`` when the env asks for it.

    Env contract (same on every host):
      BRATS21_COORDINATOR=host:port  BRATS21_NUM_PROCESSES=N
      BRATS21_PROCESS_ID=i
    Returns True when running multi-process. Must be called before any
    other jax API touches the backend. Idempotent — both CLI modules call
    it at import time and main_inference imports main_train."""
    global _initialized
    if _initialized is not None:
        return _initialized
    coord = os.environ.get(COORD_ENV)
    if not coord:
        _initialized = False
        return False
    import jax
    num = int(os.environ[NPROC_ENV])
    pid = int(os.environ[PID_ENV])
    # BRATS21_SHUTDOWN_TIMEOUT: the coordination service's shutdown
    # barrier (default 300 s) must exceed the worst process SKEW — each
    # process compiles independently, so on starved hosts one worker can
    # lag by whole compile durations while another already exits
    shutdown = int(os.environ.get("BRATS21_SHUTDOWN_TIMEOUT", "300"))
    init_to = int(os.environ.get("BRATS21_INIT_TIMEOUT", "300"))
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=num, process_id=pid,
                               initialization_timeout=init_to,
                               shutdown_timeout_seconds=shutdown)
    _initialized = num > 1
    return _initialized


def is_primary() -> bool:
    import jax
    return jax.process_index() == 0


def process_count() -> int:
    import jax
    return jax.process_count()


def process_shard(records: Sequence[Any],
                  index: Optional[int] = None,
                  count: Optional[int] = None) -> List[Any]:
    """This process's stripe of a record list, PADDED (by wrapping around
    the full list) so every process gets the same ceil(len/count) length —
    lock-step epochs need equal step counts, and trimming instead would
    permanently exclude up to count-1 records from training (a fixed
    stripe never reshuffles across processes). Same policy as torch's
    DistributedSampler: ≤ count-1 records are duplicated per epoch, none
    are dropped."""
    import jax
    index = jax.process_index() if index is None else index
    count = jax.process_count() if count is None else count
    if count <= 1:
        return list(records)
    records = list(records)
    per = -(-len(records) // count)
    stripe = records[index::count]
    k = index
    while len(stripe) < per:
        stripe.append(records[k % len(records)])
        k += count + 1  # decorrelate the wrap picks across processes
    return stripe


def shard_eval_records(records: Sequence[Any],
                       index: Optional[int] = None,
                       count: Optional[int] = None) -> List[Any]:
    """This process's stripe of the EVAL cases — unlike
    :func:`process_shard` there is NO trimming: every case must be scored
    exactly once, and the per-process eval loop runs no cross-process
    collectives, so unequal stripe lengths cannot deadlock."""
    import jax
    index = jax.process_index() if index is None else index
    count = jax.process_count() if count is None else count
    if count <= 1:
        return list(records)
    return list(records[index::count])


def warmup_collectives(mesh) -> None:
    """Establish the cross-process collective context EARLY.

    On the CPU backend the gloo context performs its rendezvous at the
    FIRST collective execution with a hardcoded ~30 s key-value timeout
    (`Gloo context initialization failed: GetKeyValue() timed out`). Each
    process compiles its model independently, so by the time the first
    real collective runs the inter-process skew can be minutes on starved
    hosts. Running a trivial sharded reduction here — seconds after
    ``jax.distributed.initialize`` synchronized everyone, with a
    sub-second compile — performs the rendezvous while the skew is small;
    the established context is reused by every later collective."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    if jax.process_count() == 1:
        return
    n_local = sum(1 for d in mesh.devices.flat
                  if d.process_index == jax.process_index())
    if n_local == 0:
        return
    sharding = NamedSharding(mesh, P("data"))
    x = jax.make_array_from_process_local_data(
        sharding, np.ones((n_local,), np.float32))
    total = float(jax.jit(lambda a: a.sum(),
                          out_shardings=NamedSharding(mesh, P()))(x))
    assert total == float(mesh.devices.size), total


def gather_objects(obj: Any) -> List[Any]:
    """All-gather one JSON-able object per process (ordered by process id).

    Built on two ``process_allgather`` rounds (length, then padded uint8
    payload) since the collective itself needs equal shapes everywhere.
    This is a COLLECTIVE: every process must call it the same number of
    times or the run deadlocks."""
    import json

    import jax
    from jax.experimental import multihost_utils
    if jax.process_count() == 1:
        return [obj]
    data = np.frombuffer(json.dumps(obj).encode("utf-8"), np.uint8)
    lens = multihost_utils.process_allgather(
        np.array(data.size, np.int64))
    padded = np.zeros(int(lens.max()), np.uint8)
    padded[:data.size] = data
    stacked = multihost_utils.process_allgather(padded)
    return [json.loads(bytes(stacked[i, :int(lens[i])]).decode("utf-8"))
            for i in range(stacked.shape[0])]


def merge_meters(meters: Dict[str, Any]) -> Dict[str, Any]:
    """Merge per-process AverageMeter (sum, count) state into GLOBAL
    averages, in place, on every process (the reduction is exact: the
    merged avg equals the serial single-process run's).

    Collective — call from all processes. Meter keys are unioned across
    processes (a process whose stripe was empty contributes count 0)."""
    import jax

    from ..utils.meter import AverageMeter
    if jax.process_count() == 1:
        return meters
    payload = {
        name: {"sum": np.asarray(m.sum, np.float64).tolist(),
               "count": int(m.count)}
        for name, m in meters.items()
    }
    gathered = gather_objects(payload)
    names: List[str] = []
    for g in gathered:
        names.extend(k for k in g if k not in names)
    for name in names:
        total: Any = 0.0
        count = 0
        for g in gathered:
            ent = g.get(name)
            if not ent or ent["count"] == 0:
                continue
            total = total + np.asarray(ent["sum"], np.float64)
            count += ent["count"]
        m = meters.setdefault(name, AverageMeter(name, ":.4f"))
        m.sum, m.count = total, count
        m.avg = total / count if count else 0.0
    return meters


def merge_report_rows(report) -> None:
    """Gather every process's EvaluationReport rows into this process's
    report (collective; primary then writes the merged xlsx/CSV)."""
    import jax
    if jax.process_count() == 1:
        return
    for rows in gather_objects(report.rows):
        for pid, row in rows.items():
            report.rows.setdefault(pid, {}).update(row)


def global_batch_from_local(mesh, local_arr: np.ndarray, axis: str = "data"):
    """Assemble the global batch array from this process's local shard,
    sharded over ``axis`` of the (possibly multi-host) mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding,
                                                  np.asarray(local_arr))


def replicate_tree(mesh, tree):
    """Replicate a pytree of (identical-on-every-process) arrays over a
    possibly multi-host mesh as GLOBAL arrays.

    ``jax.device_put`` would run one blocking cross-process assert-equal
    collective per leaf (hundreds for a train state) and stalls when the
    processes' compile times skew; ``host_local_array_to_global_array``
    assembles the global arrays from the local copies without collectives."""
    import jax
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P
    if jax.process_count() == 1:
        return jax.device_put(tree, NamedSharding(mesh, P()))
    host_tree = jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
    return multihost_utils.host_local_array_to_global_array(
        host_tree, mesh, jax.tree_util.tree_map(lambda _: P(), host_tree))


# ---------------------------------------------------------------------------
# multiprocess dryrun (driver-callable; see __graft_entry__.dryrun_multihost)
# ---------------------------------------------------------------------------


def _dryrun_worker(pid: int, nproc: int, port: int, ndev: int,
                   out_dir: str) -> None:
    """One worker of the multiprocess dryrun: initialize the coordination
    service, build a global mesh over all processes' devices, run lock-step
    sharded train steps, dump a parameter checksum."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    # raised rendezvous deadlines: XLA:CPU's stuck-collective watchdog
    # aborts the process under scheduler starvation (see tests/conftest.py)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={ndev}"
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=60"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=1200").strip()
    os.environ[COORD_ENV] = f"127.0.0.1:{port}"
    os.environ[NPROC_ENV] = str(nproc)
    os.environ[PID_ENV] = str(pid)
    assert maybe_initialize_distributed()

    import jax
    import jax.numpy as jnp

    from ..config import TrainConfig
    from ..learning.losses import make_criterion
    from ..learning.optimizers import make_optimizer
    from ..learning.train_state import create_train_state, make_train_step
    from .mesh import make_mesh

    n_global = len(jax.devices())
    assert n_global == nproc * ndev, (n_global, nproc, ndev)
    mesh = make_mesh(jax.devices(), data=n_global, space=1)
    warmup_collectives(mesh)  # gloo rendezvous before the skewed compiles

    cfg = TrainConfig(model="equiunet_assp_evo", width=4, optimizer="ranger",
                      criterion="dice", use_gc=True, batch_size=ndev)
    from ..models import get_model
    model = get_model(cfg)
    criterion = make_criterion(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=3)

    rng = jax.random.PRNGKey(0)
    local_shape = (ndev, 16, 16, 16, 4)
    state = create_train_state(model, tx, rng,
                               jnp.zeros((1, 16, 16, 16, 4), jnp.float32))
    state = replicate_tree(mesh, state)
    step = make_train_step(criterion, use_amp=True)

    global_rng = np.random.default_rng(0)
    losses = []
    for it in range(3):
        # the GLOBAL batch is generated identically everywhere; each
        # process feeds only its local stripe
        gb = global_rng.random((n_global, 16, 16, 16, 4)).astype(np.float32)
        gs = (global_rng.random((n_global, 16, 16, 16, 3)) > 0.5
              ).astype(np.float32)
        lo = pid * ndev
        img = global_batch_from_local(mesh, gb[lo:lo + ndev])
        seg = global_batch_from_local(mesh, gs[lo:lo + ndev])
        state, metrics = step(state, img, seg, rng)
        losses.append(float(metrics["loss"]))

    leaves = jax.tree_util.tree_leaves(state.params)
    checksum = float(sum(np.float64(np.asarray(l).astype(np.float64).sum())
                         for l in leaves))
    with open(os.path.join(out_dir, f"proc_{pid}.txt"), "w") as f:
        f.write(f"{checksum:.10e} " + " ".join(f"{l:.8e}" for l in losses))
    print(f"[proc {pid}] losses={losses} checksum={checksum:.6e}", flush=True)


def free_port() -> int:
    """An OS-assigned free TCP port (bind-to-0) — fixed coordinator ports
    collide across concurrent runs (parallel CI, dryrun next to tests)."""
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_multiprocess_dryrun(nproc: int = 2, ndev: int = 4,
                            port: Optional[int] = None) -> None:
    """Spawn ``nproc`` worker processes (each with ``ndev`` virtual CPU
    devices), train lock-step over the spanning mesh, and assert all
    processes hold bit-identical parameters."""
    import tempfile
    port = free_port() if port is None else port
    out_dir = tempfile.mkdtemp(prefix="brats21_mh_")
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    procs = []
    for pid in range(nproc):
        env = {k: v for k, v in os.environ.items()
               if k not in ("JAX_PLATFORMS", "XLA_FLAGS",
                            COORD_ENV, NPROC_ENV, PID_ENV)}
        env["PYTHONPATH"] = repo
        # starved hosts serialize the workers' compiles; the shutdown
        # barrier must cover the resulting skew
        env.setdefault("BRATS21_SHUTDOWN_TIMEOUT", "1500")
        code = (f"from brats21_tpu.parallel.multihost import _dryrun_worker; "
                f"_dryrun_worker({pid}, {nproc}, {port}, {ndev}, {out_dir!r})")
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, o) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(f"multihost worker {pid} failed "
                               f"(rc={p.returncode}):\n{o[-3000:]}")
    results = []
    for pid in range(nproc):
        with open(os.path.join(out_dir, f"proc_{pid}.txt")) as f:
            results.append(f.read().split())
    for r in results[1:]:
        assert r == results[0], \
            f"processes diverged: {results[0][:2]} vs {r[:2]}"
    print(f"multihost dryrun: {nproc} procs x {ndev} devices trained "
          f"lock-step, params identical (checksum {results[0][0]})")
