"""Interleaved same-phase A/B of the H2D wire formats (VERDICT r4 #4).

The axon relay tunnel has multi-minute slow/fast bandwidth phases
(docs/BENCHMARKS.md "Tunnel phase variance"), so cross-run comparisons of
wire formats measure tunnel weather, not the wire. This script settles
v4-sparse-int16 vs v5-narrow-bitstream (and optionally dense) the only
valid way: ONE process, all pipelines compiled up front, then timed chunks
interleaved A/B/A/B round-robin so every format samples every phase.

Per round r and wire w: one pipelined chunk of AB_CHUNK volumes (depth-2
in flight, D2H forced per volume — the bench.py measurement discipline).
Reports the per-wire MEDIAN across rounds plus the full per-round matrix,
and streams a provisional JSON line after every completed round.

Output: one JSON line per round (partial) and a final line
  {"metric": "wire_ab", "rounds": R, "chunk": C, "shape": [...],
   "median_vpm": {"int16": ..., "narrow9": ...}, "winner": "...",
   "per_round_vpm": {...}}

Knobs: AB_WIRES (default "int16,narrow9"; "dense" adds the round-1 dense
wire), AB_ROUNDS (default 6), AB_CHUNK (default 4), BENCH_CASE_SHAPE,
BENCH_WIDTH (shared with bench.py).

The reference has no wire layer at all — it moves fp32 tensors with
`.cuda()`/`.cpu()` per TTA member (reference engine.py:234-239).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402 — reuse case synthesis + preprocess

WIRES = [w.strip() for w in os.environ.get(
    "AB_WIRES", "int16,narrow9").split(",") if w.strip()]
ROUNDS = int(os.environ.get("AB_ROUNDS", "6"))
CHUNK = int(os.environ.get("AB_CHUNK", "4"))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_pipelines():
    """Compile one end-to-end (pack → H2D → infer → pack → D2H → unpack)
    pipeline per requested wire; returns {name: (submit, collect)}."""
    import jax
    import jax.numpy as jnp

    from brats21_tpu.config import TrainConfig
    from brats21_tpu.models import get_model
    from brats21_tpu.ops import wire
    from brats21_tpu.ops.postprocess import (change_label_3_to_4,
                                             multichannel_to_brats,
                                             threshold_probs)
    from brats21_tpu.ops.preprocess import normalize_intensity_device
    from brats21_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    cfg = TrainConfig(model="equiunet_assp_evo", width=bench.WIDTH)
    model = get_model(cfg)

    img = bench.make_case()
    padded = bench.preprocess_raw(img)
    shape = padded.shape
    log(f"devices={jax.devices()} padded_shape={shape}")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *shape), jnp.bfloat16))

    def label_map(x):
        out, _ = model.apply(variables, x, deterministic=True)
        probs = jax.nn.sigmoid(out.astype(jnp.float32))
        return change_label_3_to_4(
            multichannel_to_brats(threshold_probs(probs))).astype(jnp.uint8)

    # distinct per-volume host buffers (perturb nonzero voxels only, so the
    # brain mask — and therefore the sparse cap — stays put)
    n_bufs = max(CHUNK + 2, 4)
    vols = [np.where(padded != 0, padded + np.int16(i + 1), np.int16(0)
                     ).astype(np.int16)[None] for i in range(n_bufs)]

    pipelines = {}

    if "dense" in WIRES:
        @jax.jit
        def infer_dense(vol):
            x = normalize_intensity_device(vol).astype(jnp.bfloat16)
            return label_map(x)

        pipelines["dense"] = (
            lambda i: infer_dense(jnp.asarray(vols[i % n_bufs])),
            np.asarray)

    if "int16" in WIRES:
        @jax.jit
        def infer_sparse(bits, vals):
            vol = wire.unpack_volume_device(bits, vals, shape[:3])
            x = normalize_intensity_device(vol).astype(jnp.bfloat16)
            return wire.pack_labels_device(label_map(x))

        packed16 = [wire.pack_volume(v.reshape(*shape)) for v in vols]
        pipelines["int16"] = (
            lambda i: infer_sparse(*map(jnp.asarray, packed16[i % n_bufs])),
            lambda r: wire.unpack_labels(np.asarray(r), shape[:3]))

    narrow = [w for w in WIRES if w.startswith("narrow")]
    if narrow:
        b = int(narrow[0][len("narrow"):] or 0) or \
            max(wire.narrow_bits_for(v) for v in vols)
        name = f"narrow{b}"
        cap0 = wire.pack_volume(vols[0].reshape(*shape))[1].shape[0]

        @jax.jit
        def infer_narrow(bits, stream):
            vol = wire.unpack_volume_narrow_device(
                bits, stream, shape[:3], channels=shape[-1], cap=cap0,
                bits_per_value=b)
            x = normalize_intensity_device(vol).astype(jnp.bfloat16)
            return wire.pack_labels_device(label_map(x))

        packedN = []
        for v in vols:
            bits, stream, cap = wire.pack_volume_narrow(v.reshape(*shape), b)
            assert cap == cap0, "cap drift across volumes"
            packedN.append((bits, stream))
        pipelines[name] = (
            lambda i: infer_narrow(*map(jnp.asarray, packedN[i % n_bufs])),
            lambda r: wire.unpack_labels(np.asarray(r), shape[:3]))

    # compile + first run each pipeline (remote-compile is the dominant
    # setup cost; do it all up front so timed rounds only measure transfer)
    for name, (submit, collect) in pipelines.items():
        t0 = time.time()
        collect(submit(0))
        log(f"{name}: compile+first run {time.time() - t0:.1f}s")
    return shape, pipelines


def main() -> None:
    shape, pipelines = build_pipelines()
    order = list(pipelines)
    per_round: dict = {name: [] for name in order}

    # one alternating warm pass so no wire pays the post-compile cold edge
    # inside its first timed chunk
    for name in order:
        submit, collect = pipelines[name]
        t0 = time.time()
        collect(submit(1))
        log(f"warm {name}: {time.time() - t0:.2f}s")

    for r in range(ROUNDS):
        for name in order:
            submit, collect = pipelines[name]
            t0 = time.time()
            inflight = []
            for i in range(CHUNK):
                inflight.append(submit(r * CHUNK + i))
                if len(inflight) > 2:
                    collect(inflight.pop(0))
            for x in inflight:
                collect(x)
            dt = time.time() - t0
            vpm = CHUNK / dt * 60.0
            per_round[name].append(round(vpm, 2))
            log(f"round {r} {name}: {dt:.2f}s -> {vpm:.2f} volumes/min")
        medians = {n: round(float(np.median(v)), 2)
                   for n, v in per_round.items() if v}
        print(json.dumps({"metric": "wire_ab", "partial": True,
                          "rounds_done": r + 1, "median_vpm": medians}),
              flush=True)

    medians = {n: round(float(np.median(v)), 2) for n, v in per_round.items()}
    winner = max(medians, key=medians.get)
    rec = {"metric": "wire_ab", "rounds": ROUNDS, "chunk": CHUNK,
           "shape": list(shape), "median_vpm": medians, "winner": winner,
           "per_round_vpm": per_round}
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
