"""Benchmark: end-to-end volumes/min per chip on a 240×240×155 BraTS case.

Measures the flagship path — EquiUnetASSPEvo width-48 full-volume inference
(host preprocess → H2D → bf16 forward → sigmoid+threshold → D2H labels) —
and prints ONE JSON line:

    {"metric": ..., "value": V, "unit": "volumes/min", "vs_baseline": R}

``vs_baseline`` is measured against the reference's execution model: the
same architecture in PyTorch on CPU (the reference publishes no throughput,
BASELINE.md — the torch-CPU number is measured here once and cached in
``.bench_baseline.json``).

Env knobs: BENCH_VOLUMES (default 12 timed volumes), BENCH_SKIP_BASELINE=1,
BENCH_WIRE=dense, BENCH_WIRE_BITS (0 disables the narrow bitstream, N
forces width N), BENCH_WARMUP_S (steady-state warm-up budget, default 75).
BENCH_TRAIN=1 measures the TRAINING step instead (dice+Ranger on a
BENCH_TRAIN_PATCH³ patch, BENCH_TRAIN_STEPS timed steps, steps/min vs a
torch-CPU train-step baseline cached in .bench_baseline_train.json).

Relay-weather hardening (VERDICT r3 #1/#3): the measurement runs in a CHILD
process retried up to BENCH_RETRIES times (default 3, BENCH_RETRY_BACKOFF s
apart) — a failed axon backend init is cached within a process, so retries
must be cross-process. Each attempt is bounded by BENCH_ATTEMPT_TIMEOUT s.
On final failure the parent still prints ONE structured JSON line naming
the failing stage and exits 1.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# persistent XLA compile cache: the full-volume graph costs 2-8 min through
# the axon remote-compile service; cache it across bench runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/brats21_jax_cache")

CASE_SHAPE = tuple(int(s) for s in os.environ.get(
    "BENCH_CASE_SHAPE", "240,240,155").split(","))
WIDTH = int(os.environ.get("BENCH_WIDTH", "48"))
N_VOLUMES = int(os.environ.get("BENCH_VOLUMES", "12"))
BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")


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


def bench_tpu() -> float:
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

    Dense-vs-sparse label equality is asserted at warmup; BENCH_WIRE=dense
    falls back to the round-1 dense int16 wire.
    """
    import jax
    import jax.numpy as jnp

    from brats21_tpu.config import TrainConfig
    from brats21_tpu.models import get_model
    from brats21_tpu.ops.postprocess import (change_label_3_to_4,
                                             multichannel_to_brats,
                                             threshold_probs)
    from brats21_tpu.ops.preprocess import normalize_intensity_device

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

    # lossless narrow bitstream (ops/wire.py): raw MRI int16 rarely uses
    # 16 bits — pick ONE width that covers every volume (one executable)
    widths = [wire.narrow_bits_for(v) for v in vols]
    narrow_b = max(widths) if all(widths) else 0
    if os.environ.get("BENCH_WIRE_BITS"):      # 0 disables, N forces
        narrow_b = int(os.environ["BENCH_WIRE_BITS"])
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
    # marker is keyed on (shape, wire format) so a wire change re-verifies.
    verify_marker = os.path.join(REPO, ".bench_sparse_verified.json")
    marker_ok = False
    if os.path.exists(verify_marker):
        try:
            with open(verify_marker) as f:
                rec = json.load(f)
            marker_ok = (rec.get("shape") == list(shape)
                         and rec.get("wire", "int16") == wire_desc)
        except Exception:  # noqa: BLE001
            marker_ok = False
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
                with open(verify_marker, "w") as f:
                    json.dump({"verified": True, "shape": list(shape),
                               "wire": wire_desc}, f)
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
    deadline = time.time() + warm_s
    best = 0.0
    pairs = 0
    rate = 0.0
    while time.time() < deadline:
        t0 = time.time()
        collect(submit(2 * pairs))
        collect(submit(2 * pairs + 1))
        rate = 2.0 / (time.time() - t0) * 60.0
        pairs += 1
        if pairs >= 3 and rate <= best * 1.10:
            break
        best = max(best, rate)
    log(f"warmup: {pairs} pairs, last {rate:.1f} volumes/min")

    # the relay's transfer bandwidth fluctuates heavily between runs;
    # measure per 4-volume chunk and report the median chunk throughput
    chunk = 4
    n_chunks = max(N_VOLUMES // chunk, 1)
    rates = []
    for ci in range(n_chunks):
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
    vpm = float(np.median(rates))
    log(f"tpu: median over {n_chunks} chunks -> {vpm:.2f} volumes/min")
    return vpm


def bench_train() -> float:
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
    t0 = time.time()
    for i in range(n):
        state, m = step(state, imgs[i % 3], segs[i % 3], rng)
    final = float(m["loss"])   # one sync: steps chain on device like an epoch
    dt = time.time() - t0
    spm = n / dt * 60.0
    log(f"train: {n} steps in {dt:.2f}s -> {spm:.2f} steps/min "
        f"({dt / n * 1e3:.0f} ms/step, loss={final:.4f})")
    return spm


def bench_torch_cpu_train_baseline() -> float:
    """Reference execution model for training: same-architecture torch-CPU
    forward+backward+optimizer step on a 128³ patch (engine.py:105-130).
    Adam stands in for Ranger — optimizer arithmetic is noise next to the
    conv backward at this scale. Cached like the inference baseline."""
    cache = os.path.join(REPO, ".bench_baseline_train.json")
    if os.path.exists(cache):
        with open(cache) as f:
            v = json.load(f)["steps_per_min"]
        log(f"train baseline (cached): {v:.4f} steps/min")
        return v
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
    with open(cache, "w") as f:
        json.dump({"steps_per_min": spm, "n_iter": 1}, f)
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
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            v = json.load(f)["volumes_per_min"]
        log(f"baseline (cached): {v:.3f} volumes/min")
        return v
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
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"volumes_per_min": vpm, "n_iter": n_iter}, f)
    return vpm


_TRAIN = os.environ.get("BENCH_TRAIN") == "1"
_METRIC = (f"equiunet_assp_evo_w{WIDTH}_train_step_"
           f"{os.environ.get('BENCH_TRAIN_PATCH', '128')}cube" if _TRAIN
           else "equiunet_assp_evo_w48_full_volume_inference")
_UNIT = "steps/min" if _TRAIN else "volumes/min"
_STAGE = "import"          # coarse progress marker for failure reporting


def _set_stage(s: str) -> None:
    global _STAGE
    _STAGE = s
    log(f"[bench stage] {s}")


def _child_main() -> None:
    """One measurement attempt (runs in a subprocess of main())."""
    _set_stage("tpu_backend_init")
    tpu_vpm = bench_train() if _TRAIN else bench_tpu()
    _set_stage("baseline")
    try:
        base_vpm = (bench_torch_cpu_train_baseline() if _TRAIN
                    else bench_torch_cpu_baseline())
    except Exception as e:  # baseline failure must not kill the bench
        log(f"baseline failed: {e}")
        base_vpm = float("nan")
    ratio = tpu_vpm / base_vpm if base_vpm == base_vpm and base_vpm > 0 else None
    print(json.dumps({
        "metric": _METRIC,
        "value": round(tpu_vpm, 3),
        "unit": _UNIT,
        "vs_baseline": round(ratio, 2) if ratio else None,
    }), flush=True)


def main() -> None:
    if os.environ.get("BENCH_CHILD") == "1":
        try:
            _child_main()
        except BaseException as e:  # noqa: BLE001 — stage goes to parent
            log(f"[bench failed at stage={_STAGE}] {type(e).__name__}: {e}")
            print(json.dumps({"metric": _METRIC, "value": None,
                              "unit": _UNIT, "vs_baseline": None,
                              "error": f"{type(e).__name__}: {e}"[:500],
                              "stage": _STAGE}), flush=True)
            sys.exit(1)
        return

    import subprocess
    retries = max(int(os.environ.get("BENCH_RETRIES", "3")), 1)
    backoff = float(os.environ.get("BENCH_RETRY_BACKOFF", "60"))
    attempt_timeout = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "1200"))
    env = dict(os.environ)
    env["BENCH_CHILD"] = "1"
    env["PYTHONUNBUFFERED"] = "1"
    last_line = ""
    for attempt in range(1, retries + 1):
        log(f"bench attempt {attempt}/{retries} "
            f"(timeout {attempt_timeout:.0f}s)")
        try:
            proc = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__)], env=env,
                stdout=subprocess.PIPE, text=True, timeout=attempt_timeout)
            rc, out = proc.returncode, proc.stdout
        except subprocess.TimeoutExpired as e:
            rc = 124
            out = (e.stdout.decode() if isinstance(e.stdout, bytes)
                   else e.stdout) or ""
            log(f"attempt {attempt} timed out after {attempt_timeout:.0f}s")
        lines = [ln for ln in out.strip().splitlines() if ln.strip()]
        last_line = lines[-1] if lines else last_line
        if rc == 0 and lines:
            print(lines[-1], flush=True)     # the ONE JSON line
            return
        log(f"bench attempt {attempt}/{retries} failed rc={rc}")
        if attempt < retries:
            log(f"retrying in {backoff:.0f}s (relay weather)")
            time.sleep(backoff)
    # final failure: still emit ONE structured JSON line naming the stage
    try:
        rec = json.loads(last_line)
        assert isinstance(rec, dict) and "metric" in rec
    except Exception:  # noqa: BLE001
        rec = {"metric": _METRIC, "value": None, "unit": _UNIT,
               "vs_baseline": None, "error": "no child diagnostics",
               "stage": "timeout_or_crash"}
    rec["attempts"] = retries
    print(json.dumps(rec), flush=True)
    sys.exit(1)


if __name__ == "__main__":
    main()
