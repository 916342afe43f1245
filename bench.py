"""Benchmark: end-to-end volumes/min per chip on a 240×240×155 BraTS case.

Measures the flagship path — EquiUnetASSPEvo width-48 full-volume inference
(host preprocess → H2D → bf16 forward → sigmoid+threshold → D2H labels) —
and prints JSON result lines:

    {"metric": ..., "value": V, "unit": "volumes/min", "vs_baseline": R}

The LAST line printed is the definitive result. Provisional lines tagged
``"partial": true`` are streamed the moment the first measurement exists
(after warmup, then after every timed chunk), so a timeout at ANY depth —
the per-attempt timeout, the total budget, or an external driver kill —
still leaves a parseable result on stdout (VERDICT r4 #1).

``vs_baseline`` is measured against the reference's execution model: the
same architecture in PyTorch on CPU (the reference publishes no throughput,
BASELINE.md — the torch-CPU number is measured once and cached in
``.bench_baseline.json``).

Env knobs: BENCH_VOLUMES (default 12 timed volumes), BENCH_SKIP_BASELINE=1,
BENCH_WIRE=dense (default: sparse int16 — the proven-fastest wire),
BENCH_WIRE_BITS=N (opt-in lossless narrow bitstream, 0/unset = off),
BENCH_WARMUP_S (steady-state warm-up budget, default 75), BENCH_WIDTH.
BENCH_TRAIN=1 measures the TRAINING step instead (dice+Ranger on a
BENCH_TRAIN_PATCH³ patch, BENCH_TRAIN_STEPS timed steps, steps/min vs a
torch-CPU train-step baseline cached in .bench_baseline_train.json).

Budget envelope (VERDICT r4 #1): the whole run fits BENCH_TOTAL_BUDGET
seconds (default 1500) — per-attempt timeouts and the retry count are sized
so the envelope can never exceed it. The measurement runs in a CHILD
process (a failed axon backend init is cached in-process, so retries must
be cross-process), each child gets a soft deadline (BENCH_CHILD_DEADLINE)
after which it stops measuring and emits its final line with whatever
chunks it has. The parent streams child stdout and echoes every result
line immediately. On total failure the parent still prints ONE structured
JSON line naming the failing stage and exits 1; if any attempt produced a
partial measurement, the parent exits 0 with that value.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# persistent XLA compile cache (the full-volume graph costs 2-8 min through
# the axon remote-compile service) is enabled INSIDE the measurement
# functions via profiling.enable_compilation_cache(), which keys CPU caches
# by host-CPU fingerprint (the snapshot-restore SIGILL hazard, STATUS r4)

CASE_SHAPE = tuple(int(s) for s in os.environ.get(
    "BENCH_CASE_SHAPE", "240,240,155").split(","))
WIDTH = int(os.environ.get("BENCH_WIDTH", "48"))
N_VOLUMES = int(os.environ.get("BENCH_VOLUMES", "12"))
BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")
TRAIN_BASELINE_CACHE = os.path.join(REPO, ".bench_baseline_train.json")

# soft deadline for a child attempt (absolute epoch seconds, set by the
# parent): stop measuring and emit the final line with what we have
_CHILD_DEADLINE = float(os.environ.get("BENCH_CHILD_DEADLINE", "inf"))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_case() -> np.ndarray:
    from brats21_tpu.data.synthetic import make_case as synth
    img, _ = synth(CASE_SHAPE, seed=0)
    return img


def preprocess(img: np.ndarray):
    from brats21_tpu.data import transforms as T
    cropped, _, start, end = T.crop_foreground(img)
    norm = T.normalize_intensity(cropped, nonzero=True, channel_wise=True)
    padded, p_b, p_a = T.shape_to_divisible(norm, k=8)
    return padded


def preprocess_raw(img: np.ndarray):
    """Crop only; normalization happens on-device (ops/preprocess.py).
    Raw BraTS voxels are int16 — half the wire bytes of fp32."""
    from brats21_tpu.data import transforms as T
    cropped, _, _, _ = T.crop_foreground(img)
    padded, _, _ = T.shape_to_divisible(cropped, k=8)
    return np.round(padded).astype(np.int16)


def _baseline_key() -> str:
    """Baselines are only comparable at the same shape/width/patch — key
    cache entries so a BENCH_WIDTH/BENCH_CASE_SHAPE override never reuses
    the flagship baseline for its ratio."""
    if os.environ.get("BENCH_TRAIN") == "1":
        return f"train_p{os.environ.get('BENCH_TRAIN_PATCH', '128')}_w{WIDTH}"
    return f"infer_{'x'.join(map(str, CASE_SHAPE))}_w{WIDTH}"


_DEFAULT_KEYS = {"infer_240x240x155_w48", "train_p128_w48"}


def _read_cached_baseline(path: str, key: str):
    """Cached torch-CPU baseline, or None (used for provisional ratios)."""
    try:
        with open(path) as f:
            rec = json.load(f)
    except Exception:  # noqa: BLE001
        return None
    bkey = _baseline_key()
    if "by_key" in rec:
        entry = rec["by_key"].get(bkey)
        return entry[key] if entry else None
    # legacy flat record = the flagship default configuration only
    return rec.get(key) if bkey in _DEFAULT_KEYS else None


def _write_cached_baseline(path: str, key: str, value: float,
                           n_iter: int) -> None:
    try:
        with open(path) as f:
            rec = json.load(f)
    except Exception:  # noqa: BLE001
        rec = {}
    by_key = rec.get("by_key", {})
    if "by_key" not in rec and key in rec:   # migrate legacy flat record
        legacy = "train_p128_w48" if "steps" in key else \
            "infer_240x240x155_w48"
        by_key[legacy] = {key: rec[key], "n_iter": rec.get("n_iter", 1)}
    by_key[_baseline_key()] = {key: value, "n_iter": n_iter}
    with open(path, "w") as f:
        json.dump({"by_key": by_key}, f)


def _marker_records(path: str) -> list:
    """Parity-marker records: list of {shape, wire}. Accepts the legacy
    single-record schema."""
    try:
        with open(path) as f:
            rec = json.load(f)
    except Exception:  # noqa: BLE001
        return []
    if isinstance(rec, dict) and "records" in rec:
        return list(rec["records"])
    if isinstance(rec, dict) and "shape" in rec:   # legacy single record
        return [{"shape": rec["shape"], "wire": rec.get("wire", "int16")}]
    return []


def bench_tpu(emit=None) -> float:
    """volumes/min for the jitted full pipeline on the available accelerator.

    Transfer-lean end-to-end (the host link is the bottleneck on this relay):

    * **in**: brain-masked SPARSE wire — a packbits mask (1 bit/voxel) +
      the nonzero voxels as packed int16 rows; a BraTS bbox-cropped volume
      is ~50% background zeros, so this halves H2D bytes. The volume is
      reconstructed exactly on device (cumsum-gather scatter), then
      z-scored on device (ops/preprocess.py).
    * **out**: BraTS labels are 4 symbols {0,1,2,4} → packed 2 bits/voxel
      on device, unpacked by numpy on host.
    * two volumes kept in flight so H2D/compute/D2H pipeline (the reference
      synchronizes per TTA member, engine.py:234-239).

    Dense-vs-sparse label equality is asserted at warmup (once per wire
    format — marker-cached); BENCH_WIRE=dense falls back to the round-1
    dense int16 wire; BENCH_WIRE_BITS=N opts into the v5 narrow bitstream.

    ``emit(vpm, chunks_done)`` is called after warmup and after every timed
    chunk with the best current estimate (median of chunks so far, or the
    last warmup rate when chunks_done == 0).
    """
    import jax
    import jax.numpy as jnp

    from brats21_tpu.config import TrainConfig
    from brats21_tpu.models import get_model
    from brats21_tpu.ops.postprocess import (change_label_3_to_4,
                                             multichannel_to_brats,
                                             threshold_probs)
    from brats21_tpu.ops.preprocess import normalize_intensity_device
    from brats21_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    cfg = TrainConfig(model="equiunet_assp_evo", width=WIDTH)
    model = get_model(cfg)
    use_tta = os.environ.get("BENCH_TTA") == "1"   # 16-combo TTA fusion

    img = make_case()
    padded = preprocess_raw(img)
    shape = padded.shape                   # [X, Y, Z, 4]
    n_vox = shape[0] * shape[1] * shape[2]
    log(f"devices={jax.devices()} padded_shape={shape}")

    x_init = jnp.zeros((1, *shape), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x_init)

    def label_map(vars_, x):
        if use_tta:
            # BENCH_TTA=1: the full 16-combo TTA fusion (ops/tta.py scan
            # path) — the reference's --tta eval mode (engine.py:229-249)
            from brats21_tpu.ops.tta import tta_mean_probs
            probs, _ = tta_mean_probs(
                lambda v: model.apply(vars_, v, deterministic=True), x)
            probs = probs.astype(jnp.float32)
        else:
            out, _ = model.apply(vars_, x, deterministic=True)
            probs = jax.nn.sigmoid(out.astype(jnp.float32))
        return change_label_3_to_4(
            multichannel_to_brats(threshold_probs(probs))).astype(jnp.uint8)

    @jax.jit
    def infer_dense(vars_, vol):
        x = normalize_intensity_device(vol).astype(jnp.bfloat16)
        return label_map(vars_, x)

    from brats21_tpu.ops import wire

    @jax.jit
    def infer_sparse(vars_, bits, vals):
        vol = wire.unpack_volume_device(bits, vals, shape[:3])
        x = normalize_intensity_device(vol).astype(jnp.bfloat16)
        return wire.pack_labels_device(label_map(vars_, x))

    def pack_case(vol):
        return wire.pack_volume(vol.reshape(*shape))

    def unpack_labels(packed):
        return wire.unpack_labels(packed, shape[:3])[None]

    # distinct per-volume host buffers so no transfer caching can hide IO
    # (perturb the NONZERO voxels only — the brain mask must stay put)
    vols = [np.where(padded != 0, padded + np.int16(i + 1), np.int16(0)
                     ).astype(np.int16)[None]
            for i in range(max(N_VOLUMES, 2))]

    # v5 lossless narrow bitstream (ops/wire.py) is OPT-IN via
    # BENCH_WIRE_BITS: it has never beaten sparse-int16 in a like-for-like
    # phase (docs/BENCHMARKS.md "Tunnel phase variance"), so the headline
    # default stays the proven wire (VERDICT r4 #1d).
    narrow_b = int(os.environ.get("BENCH_WIRE_BITS", "0"))
    if narrow_b:
        widths = [wire.narrow_bits_for(v) for v in vols]
        # 0 means "this volume cannot be narrow-encoded losslessly"
        # (negatives / full 16-bit range) — ANY such volume disables the
        # wire; max() alone would let an encodable sibling mask it
        need = 0 if any(w == 0 for w in widths) else max(widths)
        if need == 0 or need > narrow_b:
            log(f"BENCH_WIRE_BITS={narrow_b} cannot encode these volumes "
                f"(need {need}); disabling narrow wire")
            narrow_b = 0
    wire_desc = f"narrow{narrow_b}" if narrow_b else "int16"

    if narrow_b:
        cap0 = pack_case(vols[0])[1].shape[0]

        @jax.jit
        def infer_narrow(vars_, bits, stream):
            vol = wire.unpack_volume_narrow_device(
                bits, stream, shape[:3], channels=shape[-1], cap=cap0,
                bits_per_value=narrow_b)
            x = normalize_intensity_device(vol).astype(jnp.bfloat16)
            return wire.pack_labels_device(label_map(vars_, x))

        def pack_case_narrow(vol):
            bits, stream, cap = wire.pack_volume_narrow(
                vol.reshape(*shape), narrow_b)
            assert cap == cap0, "nonzero-count drift across volumes"
            return bits, stream

    sparse = os.environ.get("BENCH_WIRE", "sparse") != "dense"
    # the dense-vs-sparse parity assert costs a SECOND full-volume compile
    # (2-8 min through the axon remote-compile service); once verified on
    # this host, a marker file skips it (BENCH_VERIFY=1 forces it). The
    # marker accumulates one record per (shape, wire format), so switching
    # wire formats never re-pays an already-verified one.
    verify_marker = os.path.join(REPO, ".bench_sparse_verified.json")
    records = _marker_records(verify_marker)
    marker_ok = any(r.get("shape") == list(shape)
                    and r.get("wire", "int16") == wire_desc for r in records)
    want_verify = os.environ.get("BENCH_VERIFY") == "1" or not marker_ok
    if sparse:
        try:
            t0 = time.time()
            if narrow_b:
                bits0, vals0 = pack_case_narrow(vols[0])
                got = unpack_labels(infer_narrow(
                    variables, jnp.asarray(bits0), jnp.asarray(vals0)))
            else:
                bits0, vals0 = pack_case(vols[0])
                got = unpack_labels(infer_sparse(
                    variables, jnp.asarray(bits0), jnp.asarray(vals0)))
            log(f"sparse({wire_desc}) compile+first run: "
                f"{time.time() - t0:.1f}s "
                f"(wire {bits0.nbytes / 1e6:.1f}+{vals0.nbytes / 1e6:.1f} MB"
                f" vs dense {vols[0].nbytes / 1e6:.1f} MB)")
            if want_verify:
                want = np.asarray(infer_dense(variables,
                                              jnp.asarray(vols[0])))
                np.testing.assert_array_equal(got, want)
                log("sparse/dense label parity OK")
                records = [r for r in records
                           if not (r.get("shape") == list(shape)
                                   and r.get("wire", "int16") == wire_desc)]
                records.append({"shape": list(shape), "wire": wire_desc})
                with open(verify_marker, "w") as f:
                    json.dump({"verified": True, "records": records}, f)
            else:
                log("sparse/dense parity previously verified (marker)")
        except Exception as e:  # noqa: BLE001 — bench must survive
            log(f"sparse wire failed ({e}); falling back to dense")
            sparse = False

    if sparse:
        packer = pack_case_narrow if narrow_b else pack_case
        infer = infer_narrow if narrow_b else infer_sparse
        packed = [packer(v) for v in vols]
        caps = {v.shape for _, v in packed}
        log(f"sparse value-buffer caps: {caps}")

        def submit(i):
            bits, vals = packed[i % len(packed)]
            return infer(variables, jnp.asarray(bits), jnp.asarray(vals))
        collect = unpack_labels
    else:
        t0 = time.time()
        np.asarray(infer_dense(variables, jnp.asarray(vols[0])))
        log(f"dense compile+first run: {time.time() - t0:.1f}s")

        def submit(i):
            return infer_dense(variables, jnp.asarray(vols[i % len(vols)]))
        collect = np.asarray

    # steady-state warm-up: the relay tunnel has multi-minute slow/fast
    # phases (docs/BENCHMARKS.md) and a cold edge right after backend
    # bring-up — push volume pairs until the pair rate stops improving
    # (≤10% over the best so far) or BENCH_WARMUP_S expires, so the timed
    # chunks measure the current steady state, not the cold edge.
    warm_s = float(os.environ.get("BENCH_WARMUP_S", "75"))
    deadline = min(time.time() + warm_s, _CHILD_DEADLINE - 30.0)
    best = 0.0
    pairs = 0
    rate = 0.0
    while time.time() < deadline or pairs == 0:
        t0 = time.time()
        collect(submit(2 * pairs))
        collect(submit(2 * pairs + 1))
        rate = 2.0 / (time.time() - t0) * 60.0
        pairs += 1
        if pairs >= 3 and rate <= best * 1.10:
            break
        best = max(best, rate)
    log(f"warmup: {pairs} pairs, last {rate:.1f} volumes/min")
    if emit is not None:
        emit(rate, 0)   # first provisional value the moment warmup ends

    # the relay's transfer bandwidth fluctuates heavily between runs;
    # measure per 4-volume chunk and report the median chunk throughput
    chunk = 4
    n_chunks = max(N_VOLUMES // chunk, 1)
    rates = []
    for ci in range(n_chunks):
        if rates and time.time() > _CHILD_DEADLINE:
            log(f"child deadline reached after {ci} chunks — stopping early")
            break
        t0 = time.time()
        inflight = []
        for i in range(chunk):
            inflight.append(submit(ci * chunk + i))
            if len(inflight) > 2:
                collect(inflight.pop(0))
        for r in inflight:
            collect(r)
        dt = time.time() - t0
        rates.append(chunk / dt * 60.0)
        log(f"chunk {ci}: {dt:.2f}s -> {rates[-1]:.2f} volumes/min")
        if emit is not None:
            emit(float(np.median(rates)), len(rates))
    vpm = float(np.median(rates)) if rates else rate
    log(f"tpu: median over {len(rates)} chunks -> {vpm:.2f} volumes/min")
    return vpm


def bench_train(emit=None) -> float:
    """BENCH_TRAIN=1: steps/min of the jitted flagship TRAIN step —
    equiunet_assp_evo width-48, 128³ patch, dice loss, Ranger, bf16
    activations, remat_mode=norm (the measured-best default) — the
    reference training recipe (README.md:103-121; engine.py:105-130).

    Device-resident batches: on a real TPU VM the ~19 MB/step H2D is
    ~2 ms over PCIe and the engine's double-buffered train wire hides it
    anyway (learning/engine.py); through this host's relay tunnel it
    would only measure tunnel weather (docs/BENCHMARKS.md)."""
    import jax
    import jax.numpy as jnp

    from brats21_tpu.config import TrainConfig
    from brats21_tpu.learning.losses import make_criterion
    from brats21_tpu.learning.optimizers import make_optimizer
    from brats21_tpu.learning.train_state import (create_train_state,
                                                  make_train_step)
    from brats21_tpu.models import get_model
    from brats21_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    patch = int(os.environ.get("BENCH_TRAIN_PATCH", "128"))
    cfg = TrainConfig(model="equiunet_assp_evo", width=WIDTH,
                      criterion="dice", optimizer="ranger",
                      remat_mode="norm")
    model = get_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=100)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, patch, patch, patch, 4), jnp.float32)
    log(f"devices={jax.devices()} train patch={patch}^3 width={WIDTH}")
    state = create_train_state(model, tx, rng, sample)
    step = make_train_step(make_criterion(cfg), use_amp=True)

    # a few distinct device-resident batches so nothing is result-cached
    host = np.random.default_rng(0)
    imgs = [jnp.asarray(host.standard_normal(
        (1, patch, patch, patch, 4)).astype(np.float32)) for _ in range(3)]
    segs = [jnp.asarray((host.random(
        (1, patch, patch, patch, 3)) < 0.2).astype(np.float32))
        for _ in range(3)]

    t0 = time.time()
    state, m = step(state, imgs[0], segs[0], rng)
    loss0 = float(m["loss"])   # D2H forces execution (relay gotcha)
    log(f"train compile+first step: {time.time() - t0:.1f}s loss={loss0:.4f}")
    for i in range(1, 4):      # warm-up steps
        state, m = step(state, imgs[i % 3], segs[i % 3], rng)
    float(m["loss"])

    n = int(os.environ.get("BENCH_TRAIN_STEPS", "24"))
    # steps chain on device like an epoch; sync every `sync_every` steps so
    # a provisional rate exists long before the full run completes
    sync_every = 8
    done = 0
    t_all = time.time()
    while done < n:
        k = min(sync_every, n - done)
        for i in range(done, done + k):
            state, m = step(state, imgs[i % 3], segs[i % 3], rng)
        final = float(m["loss"])   # one sync per group
        done += k
        spm = done / (time.time() - t_all) * 60.0
        if emit is not None:
            emit(spm, done)
        if done < n and time.time() > _CHILD_DEADLINE:
            log(f"child deadline reached after {done} steps — stopping early")
            break
    dt = time.time() - t_all
    spm = done / dt * 60.0
    log(f"train: {done} steps in {dt:.2f}s -> {spm:.2f} steps/min "
        f"({dt / done * 1e3:.0f} ms/step, loss={final:.4f})")
    return spm


def bench_torch_cpu_train_baseline() -> float:
    """Reference execution model for training: same-architecture torch-CPU
    forward+backward+optimizer step on a 128³ patch (engine.py:105-130).
    Adam stands in for Ranger — optimizer arithmetic is noise next to the
    conv backward at this scale. Cached like the inference baseline."""
    cached = _read_cached_baseline(TRAIN_BASELINE_CACHE, "steps_per_min")
    if cached is not None:
        log(f"train baseline (cached): {cached:.4f} steps/min")
        return cached
    if os.environ.get("BENCH_SKIP_BASELINE"):
        return float("nan")

    import torch

    patch = int(os.environ.get("BENCH_TRAIN_PATCH", "128"))
    net = _torch_net()
    opt = torch.optim.Adam(net.parameters(), lr=1e-4)
    x = torch.randn(1, 4, patch, patch, patch)
    seg = (torch.rand(1, 3, patch, patch, patch) < 0.2).float()

    def dice(logits, target):
        p = torch.sigmoid(logits)
        num = 2 * (p * target).sum() + 1e-5
        den = (p * p).sum() + (target * target).sum() + 1e-5
        return 1 - num / den

    t0 = time.time()
    opt.zero_grad()
    dice(net(x), seg).backward()
    opt.step()
    dt = time.time() - t0
    spm = 60.0 / dt
    log(f"torch-cpu train baseline: 1 step in {dt:.1f}s -> {spm:.4f} steps/min")
    _write_cached_baseline(TRAIN_BASELINE_CACHE, "steps_per_min", spm, 1)
    return spm


def _torch_net():
    """Compute-equivalent torch EquiUnetASSPEvo (width WIDTH) for the
    CPU baselines."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class EvoNorm3d(nn.Module):
        def __init__(self, c, groups=8):
            super().__init__()
            self.g = min(groups, c)
            self.gamma = nn.Parameter(torch.ones(1, c, 1, 1, 1))
            self.beta = nn.Parameter(torch.zeros(1, c, 1, 1, 1))

        def forward(self, x):
            n, c, d, h, w = x.shape
            xg = x.reshape(n, self.g, c // self.g, d, h, w)
            var = xg.var(dim=(2, 3, 4, 5), keepdim=True)
            std = (var + 1e-5).sqrt().expand_as(xg).reshape(x.shape)
            return x * torch.sigmoid(x) / std * self.gamma + self.beta

    class Block(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.c1 = nn.Conv3d(cin, cout, 3, padding=1)
            self.e1 = EvoNorm3d(cout)
            self.c2 = nn.Conv3d(cout, cout, 3, padding=1)
            self.e2 = EvoNorm3d(cout)
            self.fc1 = nn.Linear(cout, cout // 2)
            self.fc2 = nn.Linear(cout // 2, cout)

        def forward(self, x):
            x = self.e2(self.c2(self.e1(self.c1(x))))
            s = x.mean(dim=(2, 3, 4))
            s = torch.sigmoid(self.fc2(F.relu(self.fc1(s))))
            return x + x * s[:, :, None, None, None]

    class ASPP(nn.Module):
        def __init__(self, c):
            super().__init__()
            q = c // 4
            self.convs = nn.ModuleList(
                [nn.Conv3d(c, q, 1)]
                + [nn.Conv3d(c, q, 3, padding=d, dilation=d) for d in (2, 4, 6)])
            self.out = nn.Conv3d(c, c, 1)
            self.evo = EvoNorm3d(c)

        def forward(self, x):
            y = torch.cat([m(x) for m in self.convs], dim=1)
            return self.evo(self.out(y))

    class Net(nn.Module):
        """Compute-equivalent EquiUnetASSPEvo (width 48)."""

        def __init__(self, w=WIDTH):
            super().__init__()
            f = [w * 2 ** i for i in range(4)]
            self.enc1 = Block(4, f[0])
            self.enc2 = Block(2 * f[0], f[1])
            self.enc3 = Block(2 * f[1], f[2])
            self.enc4 = Block(2 * f[2], f[3])
            self.aspp = ASPP(f[3])
            self.b1 = nn.Conv3d(f[0], f[0] // 2, 1)
            self.b2 = nn.Conv3d(f[1], f[1] // 2, 1)
            self.b3 = nn.Conv3d(f[2], f[2] // 2, 1)
            self.u3 = nn.Conv3d(f[3], f[3] // 4, 1)
            self.d3 = Block(f[2], f[2])
            self.u2 = nn.Conv3d(f[2], f[2] // 4, 1)
            self.d2 = Block(f[1], f[1])
            self.u1 = nn.Conv3d(f[1], f[1] // 4, 1)
            self.d1 = Block(f[0], f[0])
            self.out = nn.Conv3d(f[0], 3, 1)

        @staticmethod
        def down(x):
            return torch.cat([F.max_pool3d(x, 2), F.avg_pool3d(x, 2)], dim=1)

        @staticmethod
        def up(x):
            return F.interpolate(x, scale_factor=2, mode="trilinear",
                                 align_corners=True)

        def forward(self, x):
            d1 = self.enc1(x)
            d2 = self.enc2(self.down(d1))
            d3 = self.enc3(self.down(d2))
            d4 = self.enc4(self.down(d3))
            a = self.aspp(d4)
            u3 = self.d3(torch.cat([self.b3(d3), self.up(self.u3(a))], 1))
            u2 = self.d2(torch.cat([self.b2(d2), self.up(self.u2(u3))], 1))
            u1 = self.d1(torch.cat([self.b1(d1), self.up(self.u1(u2))], 1))
            return self.out(u1)

    return Net()


def bench_torch_cpu_baseline() -> float:
    """The reference's execution model: same-architecture PyTorch forward on
    CPU (torch-cpu is what ships in this image; reference asserts CUDA but
    publishes no throughput — BASELINE.md)."""
    cached = _read_cached_baseline(BASELINE_CACHE, "volumes_per_min")
    if cached is not None:
        log(f"baseline (cached): {cached:.3f} volumes/min")
        return cached
    if os.environ.get("BENCH_SKIP_BASELINE"):
        return float("nan")

    import torch

    img = make_case()
    padded = preprocess(img)
    x = torch.from_numpy(np.moveaxis(padded, -1, 0)[None]).float()
    net = _torch_net().eval()
    n_iter = max(int(os.environ.get("BENCH_BASELINE_VOLUMES", "2")), 1)
    with torch.no_grad():
        t0 = time.time()
        net(x)  # warmup
        warm = time.time() - t0
        log(f"torch-cpu warmup: {warm:.1f}s")
        t0 = time.time()
        for _ in range(n_iter):
            torch.sigmoid(net(x)).ge(0.5)
        dt = time.time() - t0
    vpm = n_iter / dt * 60.0
    log(f"torch-cpu baseline: {n_iter} volumes in {dt:.2f}s -> {vpm:.3f} volumes/min")
    _write_cached_baseline(BASELINE_CACHE, "volumes_per_min", vpm, n_iter)
    return vpm


_TRAIN = os.environ.get("BENCH_TRAIN") == "1"
# every mode knob is part of the metric name so no artifact row can
# mislabel its configuration (ADVICE r4: a w64 row shipped labeled w48)
_TTA_TAG = "_tta16" if os.environ.get("BENCH_TTA") == "1" else ""
_METRIC = (f"equiunet_assp_evo_w{WIDTH}_train_step_"
           f"{os.environ.get('BENCH_TRAIN_PATCH', '128')}cube" if _TRAIN
           else f"equiunet_assp_evo_w{WIDTH}_full_volume_inference{_TTA_TAG}")
_UNIT = "steps/min" if _TRAIN else "volumes/min"
_STAGE = "import"          # coarse progress marker for failure reporting


def _set_stage(s: str) -> None:
    global _STAGE
    _STAGE = s
    log(f"[bench stage] {s}")


def _result_line(value, ratio, partial=False, chunks=None, error=None,
                 stage=None) -> str:
    rec = {"metric": _METRIC,
           "value": round(value, 3) if value is not None else None,
           "unit": _UNIT,
           "vs_baseline": round(ratio, 2) if ratio else None}
    if partial:
        rec["partial"] = True
        rec["chunks"] = chunks
    if error:
        rec["error"] = error[:500]
        rec["stage"] = stage
    return json.dumps(rec)


def _child_main() -> None:
    """One measurement attempt (runs in a subprocess of main())."""
    # cached baseline FIRST so provisional lines carry vs_baseline
    cached_base = _read_cached_baseline(
        TRAIN_BASELINE_CACHE if _TRAIN else BASELINE_CACHE,
        "steps_per_min" if _TRAIN else "volumes_per_min")

    def emit(vpm: float, chunks: int) -> None:
        ratio = vpm / cached_base if cached_base else None
        print(_result_line(vpm, ratio, partial=True, chunks=chunks),
              flush=True)

    _set_stage("tpu_backend_init")
    tpu_vpm = bench_train(emit) if _TRAIN else bench_tpu(emit)
    _set_stage("baseline")
    try:
        base_vpm = (bench_torch_cpu_train_baseline() if _TRAIN
                    else bench_torch_cpu_baseline())
    except Exception as e:  # baseline failure must not kill the bench
        log(f"baseline failed: {e}")
        base_vpm = float("nan")
    ratio = tpu_vpm / base_vpm if base_vpm == base_vpm and base_vpm > 0 else None
    print(_result_line(tpu_vpm, ratio), flush=True)


def _parse_result(line: str):
    """A result line = JSON dict with a 'metric' key, else None."""
    try:
        rec = json.loads(line)
        return rec if isinstance(rec, dict) and "metric" in rec else None
    except Exception:  # noqa: BLE001
        return None


def _better(a, b):
    """Preference order between two result records: a real measurement
    (non-None value) ALWAYS beats a value-less error line — a child that
    streams good partials and then crashes emits a final error record,
    which must not shadow the measurements that preceded it (the r3/r4
    red-artifact class). Among measurements: final beats partial, then
    more chunks beats fewer."""
    if a is None:
        return b
    if b is None:
        return a
    a_val = a.get("value") is not None
    b_val = b.get("value") is not None
    if a_val != b_val:
        return a if a_val else b
    a_final = not a.get("partial")
    b_final = not b.get("partial")
    if a_final != b_final:
        return a if a_final else b
    return b if (b.get("chunks") or 0) >= (a.get("chunks") or 0) else a


def _run_attempt(attempt_timeout: float):
    """Run one child attempt, STREAMING its stdout: every result line is
    echoed to our stdout immediately (so an external driver kill still
    leaves a parseable line), other stdout lines pass through to stderr.
    Returns (rc, last_result_dict_or_None)."""
    import subprocess

    env = dict(os.environ)
    env["BENCH_CHILD"] = "1"
    env["PYTHONUNBUFFERED"] = "1"
    # soft deadline: leave margin for the final-line + baseline bookkeeping
    env["BENCH_CHILD_DEADLINE"] = str(time.time() + attempt_timeout - 45.0)
    import queue
    import threading

    proc = subprocess.Popen(
        [sys.executable, "-u", os.path.abspath(__file__)], env=env,
        stdout=subprocess.PIPE, text=True)
    lines: queue.Queue = queue.Queue()

    def _reader():
        for ln in proc.stdout:
            lines.put(ln)
        lines.put(None)       # EOF sentinel

    threading.Thread(target=_reader, daemon=True).start()
    last = None
    deadline = time.time() + attempt_timeout
    rc = None
    eof = False
    while True:
        if not eof:
            try:
                item = lines.get(timeout=max(
                    min(deadline - time.time(), 5.0), 0.1))
            except queue.Empty:
                item = ""
            if item is None:
                eof = True
                continue
            if item:
                buf = item.rstrip("\n")
                rec = _parse_result(buf)
                if rec is not None:
                    last = _better(last, rec)
                    print(buf, flush=True)   # echo result lines IMMEDIATELY
                elif buf:
                    log(f"[child] {buf}")
                continue
        if proc.poll() is not None and eof:
            rc = proc.returncode
            break
        if time.time() >= deadline:
            proc.kill()
            proc.wait()
            rc = 124
            log(f"attempt timed out after {attempt_timeout:.0f}s")
            break
        if eof:
            # stdout closed but process alive — wait for exit, bounded
            try:
                rc = proc.wait(timeout=max(deadline - time.time(), 0.1))
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
                rc = 124
            break
    # drain anything the reader queued before the kill — a result line
    # emitted moments before a timeout still counts
    while True:
        try:
            item = lines.get_nowait()
        except queue.Empty:
            break
        if item:
            rec = _parse_result(item.rstrip("\n"))
            if rec is not None:
                last = _better(last, rec)
                print(item.rstrip("\n"), flush=True)
    return rc, last


def main() -> None:
    if os.environ.get("BENCH_CHILD") == "1":
        try:
            _child_main()
        except BaseException as e:  # noqa: BLE001 — stage goes to parent
            log(f"[bench failed at stage={_STAGE}] {type(e).__name__}: {e}")
            print(_result_line(None, None, error=f"{type(e).__name__}: {e}",
                               stage=_STAGE), flush=True)
            sys.exit(1)
        return

    # budget envelope: attempts + backoffs always fit BENCH_TOTAL_BUDGET
    total_budget = float(os.environ.get("BENCH_TOTAL_BUDGET", "1500"))
    hard_deadline = time.time() + total_budget
    retries = max(int(os.environ.get("BENCH_RETRIES", "3")), 1)
    backoff = float(os.environ.get("BENCH_RETRY_BACKOFF", "45"))
    cap = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "1200"))
    best = None     # best result seen across attempts (_better ordering)

    for attempt in range(1, retries + 1):
        remaining = hard_deadline - time.time()
        if remaining < 180.0:
            log(f"total budget exhausted ({remaining:.0f}s left) — "
                "no further attempts")
            break
        attempt_timeout = min(cap, remaining - 10.0)
        log(f"bench attempt {attempt}/{retries} "
            f"(timeout {attempt_timeout:.0f}s, "
            f"budget left {remaining:.0f}s)")
        rc, last = _run_attempt(attempt_timeout)
        best = _better(best, last)
        if rc == 0 and last is not None and not last.get("partial") \
                and last.get("value") is not None:
            return      # success — final line already echoed
        log(f"bench attempt {attempt}/{retries} ended rc={rc} "
            f"(best so far: {best and best.get('value')})")
        if best is not None and best.get("value") is not None:
            # a real measurement exists — don't burn budget re-compiling
            # for a marginally better one; report it (VERDICT r4 #1b)
            break
        if attempt < retries and hard_deadline - time.time() > 180.0 + backoff:
            log(f"retrying in {backoff:.0f}s (relay weather)")
            time.sleep(backoff)

    if best is not None and best.get("value") is not None:
        # records are self-describing: a child's final line has no
        # 'partial' key and must NOT be relabeled partial just because
        # the attempt's rc was dirty (e.g. a timeout during teardown
        # AFTER the complete measurement was printed)
        print(json.dumps(best), flush=True)   # definitive LAST line
        return
    rec = best or {}
    print(_result_line(None, None,
                       error=rec.get("error", "no child measurement"),
                       stage=rec.get("stage", "timeout_or_crash")),
          flush=True)
    sys.exit(1)


if __name__ == "__main__":
    main()
