"""Persist per-round TPU evidence: compiled-Pallas kernel smoke +
duty-cycle + kernel timings, written to TPU_EVIDENCE.json.

The 170+ CPU tests run both Pallas kernels in interpreter mode only;
this script is the artifact proving the compiled Mosaic path works on
real TPU hardware and that the >95% duty-cycle north star holds
(BASELINE.md targets). Run:  python tpu_evidence.py

Relay caveats (see .claude/skills/verify/SKILL.md): timed dispatches
use fresh on-device content (PRNG-keyed) so the relay's content
memoization can't fake the numbers, and kernel applications are
amortized K-per-dispatch with lax.scan.
"""

import json
import os
import time

import numpy as np

# per-invocation nonce folded into every timed PRNG key: the axon
# relay content-memoizes whole dispatches ACROSS runs, so constant
# keys would replay a previous invocation's results in ~0 device time
# and record fake timings (CLAUDE.md: never trust repeated-identical-
# input timings)
_NONCE = int.from_bytes(os.urandom(3), "little") * 1000


def kernel_smoke():
    """Compile + run both Pallas kernels on the TPU; checksum outputs
    against the jnp oracles."""
    import jax
    import jax.numpy as jnp

    from dl_image_segmentation_tpu.ops.compositing import (
        masked_median, masked_median_pallas)
    from dl_image_segmentation_tpu.ops.rasterize import (
        _rasterize_jnp, _rasterize_pallas, pack_features)

    out = {"backend": jax.default_backend()}
    rng = np.random.RandomState(0)

    # masked median
    stack = jnp.asarray(rng.randint(0, 4096, (10, 260, 260, 13))
                        .astype(np.float32))
    valid = jnp.asarray(rng.rand(10, 260, 260) > 0.3)
    m_p, a_p = masked_median_pallas(stack, valid,
                                    interpret=jax.default_backend() != "tpu")
    m_j, a_j = masked_median(stack, valid)
    out["median_pallas_checksum"] = float(jnp.sum(m_p))
    out["median_matches_jnp"] = bool(
        jnp.max(jnp.abs(m_p - m_j)) == 0 and jnp.all(a_p == a_j))

    # rasterize burn
    ring = np.array([[10.3, 12.7], [200.2, 30.5], [150.9, 220.1],
                     [30.4, 180.8], [10.3, 12.7]])
    edges, values, _win = pack_features([([ring], 3.0)])
    interp = jax.default_backend() != "tpu"
    r_p = _rasterize_pallas(jnp.asarray(edges), jnp.asarray(values),
                            jnp.float32(255), 260, 260, True,
                            interpret=interp)
    r_j = _rasterize_jnp(jnp.asarray(edges), jnp.asarray(values),
                         jnp.float32(255), 260, 260, True)
    out["rasterize_pallas_checksum"] = int(np.asarray(r_p).sum())
    out["rasterize_matches_jnp"] = bool((np.asarray(r_p)
                                         == np.asarray(r_j)).all())
    return out


def median_timing(K: int = 16, reps: int = 3):
    """jnp vs Pallas masked median, fresh on-device inputs."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dl_image_segmentation_tpu.ops.compositing import (
        masked_median, masked_median_pallas)

    S, H, W, B = 10, 260, 260, 13

    def scanned(fn):
        @jax.jit
        def run(key):
            def body(c, k):
                k1, k2 = jax.random.split(k)
                x = jax.random.uniform(k1, (S, H, W, B), jnp.float32,
                                       0, 4096)
                v = jax.random.uniform(k2, (S, H, W)) > 0.3
                m, a = fn(x, v)
                return c + jnp.sum(m) + jnp.sum(a), None
            o, _ = lax.scan(body, jnp.float32(0), jax.random.split(key, K))
            return o
        return run

    out = {}
    for name, fn in [("jnp", lambda x, v: masked_median(x, v)),
                     ("pallas", lambda x, v: masked_median_pallas(x, v))]:
        run = scanned(fn)
        float(run(jax.random.PRNGKey(_NONCE + 999)))  # warm compile
        best = min(
            _timed(lambda r=r: float(run(jax.random.PRNGKey(_NONCE + r))))
            for r in range(reps))
        out[f"median_{name}_ms_per_composite"] = round(best / K * 1e3, 2)
    out["median_pallas_speedup"] = round(
        out["median_jnp_ms_per_composite"]
        / out["median_pallas_ms_per_composite"], 1)
    return out


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def rasterize_timing(K: int = 32, reps: int = 3):
    """jnp vs Pallas label burn at the padded-tile size, fresh
    per-iteration polygon geometry generated on device."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dl_image_segmentation_tpu.ops.rasterize import (_rasterize_jnp,
                                                         _rasterize_pallas,
                                                         pack_features)

    ring = np.array([[10.3, 12.7], [200.2, 30.5], [150.9, 220.1],
                     [30.4, 180.8], [10.3, 12.7]])
    edges0, values0, _w0 = pack_features([([ring], 3.0)])
    interp = jax.default_backend() != "tpu"

    def scanned(fn):
        @jax.jit
        def run(key):
            def body(c, k):
                jitter = jax.random.uniform(k, (1,), jnp.float32, 0, 4)
                e = jnp.asarray(edges0) + jitter[0]  # fresh geometry
                out = fn(e, jnp.asarray(values0))
                return c + jnp.sum(out.astype(jnp.int32)), None
            o, _ = lax.scan(body, jnp.int32(0), jax.random.split(key, K))
            return o
        return run

    runs = {
        "jnp": scanned(lambda e, v: _rasterize_jnp(
            e, v, jnp.float32(255), 260, 260, True)),
        "pallas": scanned(lambda e, v: _rasterize_pallas(
            e, v, jnp.float32(255), 260, 260, True, interpret=interp)),
    }
    out = {}
    for name, run in runs.items():
        int(run(jax.random.PRNGKey(_NONCE + 99)))  # warm compile, force exec
        best = min(_timed(lambda r=r: int(run(jax.random.PRNGKey(_NONCE + r))))
                   for r in range(reps))
        out[f"rasterize_{name}_ms_per_burn"] = round(best / K * 1e3, 2)
    out["rasterize_pallas_speedup"] = round(
        out["rasterize_jnp_ms_per_burn"]
        / out["rasterize_pallas_ms_per_burn"], 1)
    return out


def rasterize_at_scale(F: int = 1024, E: int = 256, size: int = 1024,
                       reps: int = 2):
    """Pallas (bbox-block-culled) vs jnp label burn at production
    scale: F features x E edges on a size^2 canvas, features scattered
    so most (feature, block) pairs are culled. Fresh geometry per
    iteration (relay memoization)."""
    import jax
    import jax.numpy as jnp

    from dl_image_segmentation_tpu.ops.rasterize import (_rasterize_jnp,
                                                         _rasterize_pallas)

    rng = np.random.RandomState(7)
    # star polygons: E vertices around scattered centres, radius ~2.5%
    # of the canvas -- the realistic "many small buildings" label case
    theta = np.linspace(0, 2 * np.pi, E, endpoint=False)
    cx = rng.uniform(40, size - 40, F)
    cy = rng.uniform(40, size - 40, F)
    rad = rng.uniform(8, size * 0.025, (F, 1)) \
        * (1 + 0.3 * rng.rand(F, E))
    px = cx[:, None] + rad * np.cos(theta)[None, :]
    py = cy[:, None] + rad * np.sin(theta)[None, :]
    a = np.stack([px, py], -1).astype(np.float32)            # (F,E,2)
    b = np.roll(a, -1, axis=1)
    edges0 = np.concatenate([a, b], axis=-1)                 # (F,E,4)
    values0 = (rng.randint(1, 255, F)).astype(np.float32)
    interp = jax.default_backend() != "tpu"

    # bins precomputed ONCE with a margin covering the per-iteration
    # jitter (<= 4 px), so the timed path stays fully on-device with
    # fresh geometry (relay memoization) -- matching production, where
    # binning cost is amortized over a whole label layer
    from dl_image_segmentation_tpu.ops.rasterize import (_bin_features,
                                                         _binned_burn)
    windows0 = np.broadcast_to(
        np.asarray([-1.0e9, 1.0e9], np.float32), (F, 2)).copy()
    # (32, 256) blocks: full 128-lane rows but 8x less wasted VPU work
    # per (feature, block) pair for the ~50 px features
    count, table = _bin_features(edges0, windows0, size, size, 32, 256,
                                 dilate=6.0)

    def pallas_binned(e, v):
        canvas = jnp.full((size, size), jnp.float32(255), jnp.float32)
        return _binned_burn(v, jnp.asarray(windows0), count, table, e,
                            canvas, size, size, True, (32, 256), interp)

    def once(fn, key):
        jitter = jax.random.uniform(key, (1,), jnp.float32, 0, 4)
        e = jnp.asarray(edges0) + jitter[0]
        out = fn(e, jnp.asarray(values0))
        return int(jnp.sum(out.astype(jnp.int32)))

    runs = {
        "jnp": lambda e, v: _rasterize_jnp(
            e, v, jnp.float32(255), size, size, True),
        "pallas": pallas_binned,
    }
    out = {}
    for name, fn in runs.items():
        once(fn, jax.random.PRNGKey(_NONCE + 5))  # warm compile
        best = min(_timed(
            lambda r=r: once(fn, jax.random.PRNGKey(_NONCE + 6 + r)))
            for r in range(reps))
        out[f"rasterize_scale_{name}_ms_per_burn"] = round(best * 1e3, 1)
    out["rasterize_scale_speedup"] = round(
        out["rasterize_scale_jnp_ms_per_burn"]
        / out["rasterize_scale_pallas_ms_per_burn"], 1)
    out["rasterize_scale_shape"] = f"{F}x{E}edges_on_{size}sq"
    return out


def _fit_step_time(trainer, pool, k_small: int, k_long: int):
    """Device seconds/step s and per-dispatch relay overhead h from
    synced wall times of two scanned dispatches (T = h + K*s)."""
    def t_of(k, reps=2):
        t0 = time.perf_counter()
        trainer.train_scanned(pool, total_steps=k,
                              steps_per_dispatch=k)  # compile warmup
        print(f"[fit] warmup k={k}: {time.perf_counter() - t0:.0f}s",
              flush=True)
        return min(_timed(lambda: trainer.train_scanned(
            pool, total_steps=k, steps_per_dispatch=k))
            for _ in range(reps))

    t1 = t_of(k_small)
    print(f"[fit] t({k_small})={t1:.1f}s", flush=True)
    t_long = t_of(k_long, reps=1)
    print(f"[fit] t({k_long})={t_long:.1f}s", flush=True)
    s = (t_long - t1) / (k_long - k_small)
    h = max(t1 - k_small * s, 0.0)
    return s, h, t_long


def _mfu_one(precision: str, base_features: int = 32,
             k_small: int = 50, k_long: int = 1500,
             batch_size: int = 8, s2d: int = 1):
    # K values must be FAR apart: the ~15 s relay overhead varies by
    # seconds run-to-run, and the step-time slope error is
    # dh / (k_long - k_small) -- at 40/400 that was +-11 ms/step of
    # noise on a ~26 ms step; at 50/1500 it is +-3 ms
    """Model FLOP utilisation of one train-step configuration (256^2,
    batch 8 U-Net). FLOPs come from XLA's own cost analysis of the
    compiled step; step time from the K-vs-2K scanned-dispatch fit
    (relay-overhead-free). Peak is the v5e MXU bf16 number
    (197 TFLOP/s) for EVERY configuration so MFU figures are directly
    comparable; derived cross-precision numbers
    (bf16_speedup_over_fp32) are computed in main() from the merged
    JSON.

    base_features=32, batch_size=8 is the judge shape (keys
    ``train_{precision}_*``); wider widths (keys
    ``train_{precision}_w{bf}_*``) and bigger batches (keys
    ``train_{precision}_b{n}_*``) isolate shape-bound from
    framework-bound utilisation -- bf=32 underfills the 128-lane MXU
    in its first two levels (Cout 32/64), capping MFU regardless of
    software quality, and batch 8 leaves the conv GEMMs' M dimension
    small."""
    import jax
    import jax.numpy as jnp

    from dl_image_segmentation_tpu.train.pool import DeviceDataPool
    from dl_image_segmentation_tpu.train.trainer import (TrainConfig,
                                                         Trainer)

    PEAK = 197e12
    HBM_BW = 819e9  # v5e HBM bandwidth, bytes/s
    rng = np.random.RandomState(_NONCE % (2 ** 31))
    imgs = rng.randint(0, 255, (64, 256, 256, 3), np.uint8)
    lbls = (imgs[:, :, :, 0] > 128).astype(np.uint8)
    out = {}
    cfg = TrainConfig(num_classes=2, in_channels=3,
                      base_features=base_features,
                      levels=4, image_size=256, batch_size=batch_size,
                      precision=precision, s2d=s2d)
    trainer = Trainer(cfg)
    key = f"train_{precision}"
    if s2d == 0:
        key += f"_auto"
        out[f"{key}_s2d_resolved"] = trainer.s2d
    elif s2d != 1:
        key += f"_s2d{s2d}"
    if base_features != 32:
        key += f"_w{base_features}"
    if batch_size != 8:
        key += f"_b{batch_size}"
    # FLOPs of ONE optimizer step from the compiled module
    x = jnp.zeros((batch_size, 256, 256, 3), jnp.float32)
    y = jnp.zeros((batch_size, 256, 256), jnp.int32)
    flops = None
    hbm_bytes = None
    try:
        ca = trainer._step_fn.lower(trainer.state, x, y) \
            .compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca["flops"])
        hbm_bytes = float(ca.get("bytes accessed", 0.0)) or None
    except Exception as e:  # noqa: BLE001 -- relay may not expose it
        out[f"{key}_cost_analysis_error"] = str(e)[:120]
    pool = DeviceDataPool(imgs, lbls)
    s, h, _ = _fit_step_time(trainer, pool, k_small, k_long)
    out[f"{key}_ms_per_step"] = round(s * 1e3, 2)
    if flops is not None:
        out[f"{key}_gflops_per_step"] = round(flops / 1e9, 1)
        out[f"{key}_tflops_per_sec"] = round(flops / s / 1e12, 1)
        out[f"{key}_mfu_vs_bf16_peak"] = round(flops / s / PEAK, 3)
    if hbm_bytes is not None:
        # two-resource roofline: the step can finish no faster than
        # max(FLOPs at MXU peak, XLA-counted HBM bytes at peak BW).
        # roofline_util near 1 means the shape runs at its hardware
        # speed of light -- for narrow widths (Cout 32/64 underfilling
        # the 128-lane MXU) a low MFU alongside a high roofline_util
        # is the HARDWARE's shape penalty, not framework overhead.
        # (XLA's bytes-accessed is an upper-ish proxy: it counts
        # fusion-boundary traffic, not reuse inside fusions.)
        mem_s = hbm_bytes / HBM_BW
        bound_s = max(mem_s, (flops or 0.0) / PEAK)
        out[f"{key}_hbm_gbytes_per_step"] = round(hbm_bytes / 1e9, 2)
        out[f"{key}_hbm_bound_ms"] = round(mem_s * 1e3, 2)
        out[f"{key}_roofline_bound_ms"] = round(bound_s * 1e3, 2)
        out[f"{key}_roofline_util"] = round(bound_s / s, 3)
        out[f"{key}_arith_intensity_flops_per_byte"] = round(
            (flops or 0.0) / hbm_bytes, 1)
    return out


def mfu_bf16():
    return _mfu_one("bf16")


def mfu_fp32():
    return _mfu_one("fp32")


def mfu_w64():
    # wider steps amortise less relay noise per K, so fewer steps keep
    # the section's wall time comparable to the bf=32 runs
    return _mfu_one("bf16", base_features=64, k_small=30, k_long=600)


def mfu_w128():
    return _mfu_one("bf16", base_features=128, k_small=30, k_long=600)


def mfu_b32():
    # batch ladder at the judge width: 4x the per-step GEMM M dim
    return _mfu_one("bf16", batch_size=32, k_small=30, k_long=600)


def mfu_w128_b16():
    """Production width at batch 16: doubles the GEMM M dim over the
    w128/b8 row, amortising the per-step non-MXU work (GroupNorm,
    ConvTranspose, scheduling gaps) that holds b8 at 77.5% MFU — the
    'how to actually run this chip at peak' guidance row."""
    return _mfu_one("bf16", base_features=128, batch_size=16,
                    k_small=20, k_long=400)


def mfu_auto():
    """The OUT-OF-THE-BOX judge shape (bf=32, 256^2, batch 8) under
    the round-4 default s2d=0 (auto): the trainer must pick the
    equal-FLOPs s2d=2 packing and train <= ~19 ms/step (VERDICT r3
    #3 acceptance)."""
    return _mfu_one("bf16", s2d=0, k_small=50, k_long=1500)


def mfu_s2d():
    """Space-to-depth variant at the judge widths (s2d=2, bf=32):
    same-width trunk at half the spatial size = 1/4 the FLOPs and
    ~11.3 GB/step vs the baseline's 18.1 -- a cheaper model, so read
    ms/step and imgs/s, not MFU."""
    return _mfu_one("bf16", s2d=2, k_small=50, k_long=1500)


def mfu_s2d_w64():
    """The EQUAL-FLOPs space-to-depth config (s2d=2, bf=64): ~570
    GFLOP/step vs the judge shape's 583, but channels >=64 halve the
    MXU lane-padding tax (13.8 vs 18.1 GB/step compiled). This is the
    apples-to-apples 'same compute, TPU-friendly shape' row."""
    return _mfu_one("bf16", s2d=2, base_features=64,
                    k_small=30, k_long=600)


def layout_probe():
    """Why the judge shape is HBM-bound: XLA-counted bytes of a single
    3x3 bf16 conv at the outer U-Net level's shape. C=32 at 256^2
    moves ~9x its ideal in+out bytes (channel dim padded to the MXU's
    128 lanes); the same conv at C=128 runs at the normal ~2x ratio.
    Compile-only (no device execution)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    def conv_bytes(c, hw):
        m = nn.Conv(c, (3, 3), padding="SAME", dtype=jnp.bfloat16,
                    param_dtype=jnp.float32)
        x = jnp.zeros((8, hw, hw, c), jnp.bfloat16)
        p = m.init(jax.random.PRNGKey(0), x)
        ca = jax.jit(lambda pp, xx: m.apply(pp, xx)) \
            .lower(p, x).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("bytes accessed", 0.0))

    out = {}
    for c, hw in ((32, 256), (128, 256), (128, 128)):
        got = conv_bytes(c, hw)
        ideal = 2 * 8 * hw * hw * c * 2  # in+out, bf16
        out[f"conv3x3_{hw}sq_c{c}_mbytes"] = round(got / 1e6, 1)
        out[f"conv3x3_{hw}sq_c{c}_bytes_vs_ideal"] = round(got / ideal, 1)
    return out


def inference_throughput(k_small: int = 100, k_long: int = 3000,
                         quantize: str = "none", tag: str = "bf16",
                         base_features: int = 32):
    """Forward-only serving throughput at the judge shape (bf16 U-Net
    bf=32, 256^2, batch 8): lax.scan over K predict passes on a
    device-resident image pool, per-batch time from the same K-vs-2K
    two-dispatch fit the train sections use (relay-overhead-free).
    Each dispatch's pool is perturbed by a fresh key so the relay's
    content-memoization cannot fake the timing. Also records the
    forward pass's XLA-counted FLOPs and MFU vs the v5e bf16 peak.
    quantize="int8" times the serving-time PTQ path (models/quant.py)
    on the same float params — keys prefixed infer_int8_*."""
    import functools

    import jax
    import jax.numpy as jnp

    from dl_image_segmentation_tpu.train.trainer import (
        TrainConfig, Trainer, normalize_images)

    PEAK = 197e12
    rng = np.random.RandomState(_NONCE % (2 ** 31))
    base_pool = jnp.asarray(rng.rand(64, 256, 256, 3).astype(np.float32))
    cfg = TrainConfig(num_classes=2, in_channels=3,
                      base_features=base_features,
                      levels=4, image_size=256, batch_size=8,
                      quantize=quantize)
    trainer = Trainer(cfg)
    model = trainer.infer_model
    params = trainer.state.params
    out = {}
    qv = {}
    if quantize == "int8-static":
        # calibrate the constant activation scales once (8 pool
        # batches); they then become jit-closure CONSTANTS below --
        # serving pays zero data-dependent quantization work
        trainer.calibrate(
            [np.asarray(base_pool[i * 8:(i + 1) * 8])
             for i in range(8)], max_batches=8)
        qv = trainer.quant_vars

    def apply_vars(p):
        return {"params": p, "quant": qv} if qv else {"params": p}

    @functools.partial(jax.jit, static_argnums=(2,))
    def scan_predict(params, pool, k, key):
        # fresh content per dispatch (key-dependent perturbation) so
        # no two dispatches are memoizable; checksum forces execution
        pool = pool + jax.random.uniform(key, (), jnp.float32) * 1e-3

        def body(c, i):
            batch = jax.lax.dynamic_slice_in_dim(pool, (i * 8) % 56, 8)
            logits = model.apply(apply_vars(params),
                                 normalize_images(batch))
            preds = jnp.argmax(logits, axis=-1)
            return c + jnp.sum(preds, dtype=jnp.int32), None

        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                              jnp.arange(k))
        return tot

    flops = None
    try:
        ca = jax.jit(lambda p, b: model.apply(
            apply_vars(p), normalize_images(b))).lower(
            params, base_pool[:8]).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca["flops"])
    except Exception as e:  # noqa: BLE001
        out["infer_cost_analysis_error"] = str(e)[:120]

    def t_of(k, reps=2):
        int(scan_predict(params, base_pool, k,
                         jax.random.PRNGKey(_NONCE + k)))  # warm compile
        return min(_timed(lambda r=r: int(scan_predict(
            params, base_pool, k,
            jax.random.PRNGKey(_NONCE + k + 7 * r + 1))))
            for r in range(reps))

    t1 = t_of(k_small)
    print(f"[infer:{tag}] t({k_small})={t1:.1f}s", flush=True)
    t2 = t_of(k_long, reps=1)
    print(f"[infer:{tag}] t({k_long})={t2:.1f}s", flush=True)
    s = (t2 - t1) / (k_long - k_small)
    out[f"infer_{tag}_ms_per_batch"] = round(s * 1e3, 2)
    out[f"infer_{tag}_images_per_sec_device"] = round(8 / s, 1)
    if flops is not None:
        out[f"infer_{tag}_gflops_per_batch"] = round(flops / 1e9, 1)
        out[f"infer_{tag}_tflops_per_sec"] = round(flops / s / 1e12, 1)
        out[f"infer_{tag}_mfu_vs_bf16_peak"] = round(flops / s / PEAK, 3)
    return out


def inference_int8(k_small: int = 100, k_long: int = 3000):
    """Serving throughput of the int8 PTQ path (s8 x s8 -> s32 MXU
    convolutions, models/quant.py) at the judge shape, on the SAME
    float param tree as the bf16 section. The v5e's int8 MXU runs 2x
    the bf16 rate (394 vs 197 TOPS peak); a standalone conv probe
    measured 1.67x at a 9.7-GFLOP U-Net stage shape. XLA counts int8
    conv FLOPs identically, so the MFU key stays vs the bf16 peak for
    comparability. NOTE the judge shape (bf=32) is HBM-bound: dynamic
    quantization's extra activation passes make int8 a net LOSS here
    (measured 0.59x) -- the compute-bound w128 sections below are
    where it pays (measured 1.31x)."""
    return inference_throughput(k_small, k_long, quantize="int8",
                                tag="int8")


def inference_w128():
    """bf16 serving at bf=128 (compute-bound): the crossover partner
    for the int8 sections."""
    return inference_throughput(30, 600, tag="bf16w128",
                                base_features=128)


def inference_int8_w128():
    """int8 PTQ serving at bf=128: compute-bound, where the 2x-rate
    int8 MXU beats the dynamic-quant bandwidth tax."""
    return inference_throughput(30, 600, quantize="int8",
                                tag="int8w128", base_features=128)


def inference_int8_static():
    """int8-static PTQ at the judge shape (VERDICT r4 item 6): the
    dynamic path LOSES at bf=32 (0.94x) because its per-layer
    activation max-abs reductions re-read every activation; static
    calibrated scales are jit constants, so the s8 convs keep their
    halved input reads with zero reduction passes. Expectation:
    >= 1.0x bf16 here, else the committed number documents why."""
    return inference_throughput(quantize="int8-static",
                                tag="int8static")



def _overlap_fraction(events):
    """events: list of (name, ts_us, dur_us). Fraction of total
    feed.parse time that lies inside ANY train.dispatch window (the
    windows are merged first)."""
    wins = sorted((e[1], e[1] + e[2]) for e in events
                  if e[0].startswith("train.dispatch"))
    merged = []
    for a, b in wins:
        if merged and a <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], b))
        else:
            merged.append((a, b))
    tot = 0.0
    inside = 0.0
    for name, ts, dur in events:
        if name != "feed.parse":
            continue
        tot += dur
        e0, e1 = ts, ts + dur
        for a, b in merged:
            lo, hi = max(e0, a), min(e1, b)
            if hi > lo:
                inside += hi - lo
    return (inside / tot if tot else 0.0), tot, merged


def _load_trace_events(logdir):
    """All complete ('X') events from the chrome-trace files a
    jax.profiler.trace run writes under logdir."""
    import glob as _glob
    import gzip
    import json as _json
    evs = []
    for path in _glob.glob(os.path.join(
            logdir, "**", "*.trace.json.gz"), recursive=True):
        with gzip.open(path, "rt") as f:
            doc = _json.load(f)
        for e in doc.get("traceEvents", []):
            if e.get("ph") == "X" and "ts" in e and "dur" in e:
                evs.append((e.get("name", ""), float(e["ts"]),
                            float(e["dur"])))
    return evs


def trace_overlap(steps: int = 6):
    """VERDICT r3 weak #3: a COMMITTED jax.profiler timeline showing
    host feed decode overlapping device dispatch windows -- turning
    the derived feed_duty_attached_bound into an observed trace.
    Artifact: artifacts/trace_overlap/**.trace.json.gz (chrome trace,
    open in perfetto/chrome://tracing); this section also parses it
    and reports the measured overlap fraction."""
    import glob
    import shutil
    import tempfile

    import jax

    from dl_image_segmentation_tpu.pipeline.input import (
        DevicePrefetcher, TFRecordFeed)
    from dl_image_segmentation_tpu.raster.image import encode_png
    from dl_image_segmentation_tpu.records.writers import (
        images_to_tfrecords_mt)
    from dl_image_segmentation_tpu.train.trainer import (TrainConfig,
                                                         Trainer)

    work = tempfile.mkdtemp(dir="/dev/shm" if os.path.isdir("/dev/shm")
                            else None, prefix="dlseg_trace_")
    logdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "artifacts", "trace_overlap")
    try:
        root = os.path.join(work, "chips")
        os.makedirs(os.path.join(root, "images"))
        os.makedirs(os.path.join(root, "labels"))
        rng = np.random.RandomState(_NONCE % (2 ** 31))
        for i in range(96):
            key = f"256:0:10.0:43:{i}:1"
            fn = key.replace(":", "#") + ".png"
            img = rng.randint(0, 255, (256, 256, 3), np.uint8)
            lbl = (img[:, :, 0] > 128).astype(np.uint8)
            with open(os.path.join(root, "images", fn), "wb") as f:
                f.write(encode_png(img))
            with open(os.path.join(root, "labels", fn), "wb") as f:
                f.write(encode_png(lbl[:, :, None]))
        out_dir = os.path.join(work, "recs")
        images_to_tfrecords_mt("d", root, out_dir, num_shards=2,
                               num_threads=2, store_as_array=False)
        pattern = os.path.join(out_dir, "d-*")
        cfg = TrainConfig(num_classes=2, in_channels=3,
                          base_features=32, levels=4, image_size=256,
                          batch_size=8)
        trainer = Trainer(cfg)
        feed = TFRecordFeed(pattern, "rgbraw", batch_size=8,
                            image_size=256, shuffle_buffer=16,
                            num_workers=max(os.cpu_count() or 1, 1),
                            repeat=True, scale="raw")
        shutil.rmtree(logdir, ignore_errors=True)
        os.makedirs(logdir, exist_ok=True)
        with DevicePrefetcher(feed.batches(), trainer.place_batch) as pf:
            it = iter(pf)
            images, labels = next(it)
            float(trainer.train_step_async(images, labels)["loss"])
            with jax.profiler.trace(logdir):
                for k in range(steps):
                    images, labels = next(it)
                    with jax.profiler.TraceAnnotation(
                            f"train.dispatch_{k}"):
                        m = trainer.train_step_async(images, labels)
                        # the value fetch forces execution through the
                        # relay INSIDE the annotation window
                        float(m["loss"])
        evs = _load_trace_events(logdir)
        frac, feed_us, wins = _overlap_fraction(evs)
        n_parse = sum(1 for e in evs if e[0] == "feed.parse")
        files = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                          recursive=True)
        return {
            "feed_overlap_observed": round(frac, 3),
            "trace_feed_parse_events": n_parse,
            "trace_feed_parse_total_s": round(feed_us / 1e6, 2),
            "trace_dispatch_windows": len(wins),
            "trace_dispatch_total_s": round(
                sum(b - a for a, b in wins) / 1e6, 2),
            "trace_steps": steps,
            "trace_files": [os.path.relpath(
                f, os.path.dirname(os.path.abspath(__file__)))
                for f in files],
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

def feed_duty(steps: int = 10):
    """Duty cycle of the HOST-FEED path (TFRecordFeed ->
    DevicePrefetcher -> train_step_async), the BASELINE.md ">95% TPU
    duty" input pipeline. Through the relay every per-step dispatch
    re-uploads ~90 MB of state (~15 s fixed), so the via-relay duty is
    reported honestly alongside the numbers that matter for an
    attached chip: the host feed's standalone production rate vs the
    device step time. If the feed produces batches faster than the
    device consumes them, an attached chip never starves
    (duty_attached_bound ~ 1)."""
    import glob
    import shutil
    import tempfile

    from dl_image_segmentation_tpu.pipeline.input import (DevicePrefetcher,
                                                          TFRecordFeed)
    from dl_image_segmentation_tpu.records.writers import (
        images_to_tfrecords_mt)
    from dl_image_segmentation_tpu.raster.image import encode_png
    from dl_image_segmentation_tpu.train.trainer import (TrainConfig,
                                                         Trainer)

    work = tempfile.mkdtemp(prefix="feed_duty_", dir="/dev/shm")
    try:
        root = os.path.join(work, "chips")
        os.makedirs(os.path.join(root, "images"))
        os.makedirs(os.path.join(root, "labels"))
        rng = np.random.RandomState(0)
        for i in range(96):
            key = f"256:0:10.0:43:{i}:1"
            fn = key.replace(":", "#") + ".png"
            img = rng.randint(0, 255, (256, 256, 3), np.uint8)
            lbl = (img[:, :, 0] > 128).astype(np.uint8)
            with open(os.path.join(root, "images", fn), "wb") as f:
                f.write(encode_png(img))
            with open(os.path.join(root, "labels", fn), "wb") as f:
                f.write(encode_png(lbl[:, :, None]))
        out_dir = os.path.join(work, "recs")
        images_to_tfrecords_mt("d", root, out_dir, num_shards=2,
                               num_threads=2, store_as_array=False)
        pattern = os.path.join(out_dir, "d-*")
        assert glob.glob(pattern)
        cfg = TrainConfig(num_classes=2, in_channels=3, base_features=32,
                          levels=4, image_size=256, batch_size=8)

        # (a) host feed standalone: batches/s of parse+decode+batch
        def feed_rate(pat, mode):
            # scale="raw" is the production train/eval CLI path: source
            # dtype ships to the device, normalize_images scales there
            feed = TFRecordFeed(pat, mode, batch_size=8,
                                image_size=256, shuffle_buffer=16,
                                num_workers=max(os.cpu_count() or 1, 1),
                                repeat=True, scale="raw")
            it = feed.batches()
            next(it)  # warm the worker pool
            n_meas = 24
            t0 = time.perf_counter()
            for _ in range(n_meas):
                next(it)
            return (time.perf_counter() - t0) / n_meas

        feed_s_per_batch = feed_rate(pattern, "rgbraw")

        # the native-decode GeoTIFF lane (tifarr): same pixels as LZW
        # GeoTIFF chips through the C++ TIFF decoder -- the lane that
        # must outrun the device on a 1-core host
        from dl_image_segmentation_tpu.raster.geotiff import write_geotiff
        from dl_image_segmentation_tpu.records.writers import (
            images_to_tfrecords_mp)
        troot = os.path.join(work, "chips_tif")
        os.makedirs(os.path.join(troot, "images"))
        os.makedirs(os.path.join(troot, "labels"))
        rng2 = np.random.RandomState(1)
        gt = (272696.0, 10.0, 0.0, 2115548.0, 0.0, -10.0)
        for i in range(96):
            key = f"256:0:10.0:43:{i}:2"
            fn = key.replace(":", "#") + ".tif"
            # uint16 so the promotion rule stores FloatLists (tifarr);
            # uint8 arrays would become BytesList (rgbarr wire mode)
            img = rng2.randint(0, 4000, (256, 256, 3)).astype(np.uint16)
            lbl = (img[:, :, 0] > 2000).astype(np.uint8)
            write_geotiff(os.path.join(troot, "images", fn), img,
                          geotransform=gt, epsg=32643)
            write_geotiff(os.path.join(troot, "labels", fn), lbl,
                          geotransform=gt, epsg=32643, nodata=255)
        tif_out = os.path.join(work, "recs_tif")
        images_to_tfrecords_mp("t", troot, tif_out, num_shards=2,
                               num_proc=2, store_as_array=True)
        tifarr_s_per_batch = feed_rate(os.path.join(tif_out, "t-*"),
                                       "tifarr")

        # (b) the real loop: prefetcher + async steps through the relay
        trainer = Trainer(cfg)
        feed2 = TFRecordFeed(pattern, "rgbraw", batch_size=8,
                             image_size=256, shuffle_buffer=16,
                             num_workers=max(os.cpu_count() or 1, 1),
                             repeat=True, scale="raw")
        with DevicePrefetcher(feed2.batches(),
                              trainer.place_batch) as pf:
            it2 = iter(pf)
            images, labels = next(it2)
            m = trainer.train_step_async(images, labels)  # compile
            float(m["loss"])
            t0 = time.perf_counter()
            for _ in range(steps):
                images, labels = next(it2)
                m = trainer.train_step_async(images, labels)
            # block_until_ready does not block through the relay --
            # fetching a value forces the final step to execute
            float(m["loss"])
            wall = time.perf_counter() - t0

        return {"feed_host_s_per_batch": round(feed_s_per_batch, 4),
                "feed_host_batches_per_sec": round(
                    1.0 / feed_s_per_batch, 2),
                "feed_tifarr_host_s_per_batch": round(
                    tifarr_s_per_batch, 4),
                "feed_tifarr_host_batches_per_sec": round(
                    1.0 / tifarr_s_per_batch, 2),
                "feed_via_relay_wall_s": round(wall, 1),
                "feed_via_relay_s_per_step": round(wall / steps, 2),
                "feed_steps_measured": steps}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def duty_cycle(k_small: int = 50, k_long: int = 1500):
    """Scanned U-Net training on a device-resident pool: duty cycle +
    imgs/s (north star: >95% duty).

    Two relay realities shape this measurement: (a) dispatch is
    asynchronous, so per-step host timers lie -- each T(K) below is a
    fully-synced wall time around a whole K-step dispatch; (b) the
    relay re-uploads the ~90 MB of params+optimizer state through a
    ~25-40 MB/s tunnel on EVERY dispatch (content changes each step),
    a fixed per-dispatch cost h that no host-side design can remove.
    Fitting T(K) = h + K*s over two K values separates the tunnel
    cost h from the true device step time s. Reported:

      * duty measured at a long K=1500 dispatch (real, through-tunnel)
      * s and h themselves
      * projected duty with a directly-attached chip (h ~= 5 ms), the
        deployment the >95% north star describes
    """
    from dl_image_segmentation_tpu.train.pool import DeviceDataPool
    from dl_image_segmentation_tpu.train.trainer import (TrainConfig,
                                                         Trainer)

    # nonce-seeded pool: with a fixed seed the whole dispatch SEQUENCE
    # (deterministic params + pool + keys) replays a previous script
    # run byte-for-byte and the relay memoizes every timed dispatch
    rng = np.random.RandomState(_NONCE % (2 ** 31))
    imgs = rng.randint(0, 255, (128, 256, 256, 3), np.uint8)
    lbls = (imgs[:, :, :, 0] > 128).astype(np.uint8)
    pool = DeviceDataPool(imgs, lbls)
    cfg = TrainConfig(num_classes=2, in_channels=3, base_features=32,
                      levels=4, image_size=256, batch_size=8)
    trainer = Trainer(cfg)

    # shared K-vs-2K slope fit (T = h + K*s): the long dispatch
    # dominates the slope so transient host noise in the small run
    # cannot flip the estimate
    s, h, t_long = _fit_step_time(trainer, pool, k_small, k_long)
    duty_long = min(k_long * s / t_long, 1.0)
    duty_native = k_long * s / (0.005 + k_long * s)
    return {"train_ms_per_step_device": round(s * 1e3, 2),
            "relay_overhead_s_per_dispatch": round(h, 2),
            "train_duty_cycle_k1500_via_relay": round(duty_long, 3),
            "train_duty_cycle_projected_attached": round(duty_native, 4),
            "train_images_per_sec_device": round(cfg.batch_size / s, 1),
            "train_images_per_sec_via_relay": round(
                k_long * cfg.batch_size / t_long, 1),
            "unet_base_features": 32, "image_size": 256, "batch_size": 8}


SECTIONS = {
    "smoke": kernel_smoke,
    "median": median_timing,
    "rasterize": rasterize_timing,
    "rasterize_scale": rasterize_at_scale,
    "mfu_bf16": mfu_bf16,
    "mfu_fp32": mfu_fp32,
    "mfu_w64": mfu_w64,
    "mfu_w128": mfu_w128,
    "mfu_b32": mfu_b32,
    "mfu_w128_b16": mfu_w128_b16,
    "feed": feed_duty,
    "trace": trace_overlap,
    "duty": duty_cycle,
    "mfu_s2d": mfu_s2d,
    "mfu_auto": mfu_auto,
    "mfu_s2d_w64": mfu_s2d_w64,
    "layout_probe": layout_probe,
    "inference": inference_throughput,
    "inference_int8": inference_int8,
    "inference_w128": inference_w128,
    "inference_int8_w128": inference_int8_w128,
    "inference_int8_static": inference_int8_static,
}


def main():
    """Run all sections, or a subset: python tpu_evidence.py mfu feed.
    Section results MERGE into an existing TPU_EVIDENCE.json so the
    slow sections can be refreshed independently (each full section
    run still uses fresh nonce-keyed inputs)."""
    import sys

    import jax

    aliases = {"mfu": ["mfu_bf16", "mfu_fp32"],
               "mfu_width": ["mfu_w64", "mfu_w128"],
               "mfu_shape": ["mfu_w64", "mfu_w128", "mfu_b32"]}
    wanted = []
    for w in sys.argv[1:] or list(SECTIONS):
        wanted.extend(aliases.get(w, [w]))
    unknown = [w for w in wanted if w not in SECTIONS]
    if unknown:
        raise SystemExit(f"unknown section(s) {unknown}; "
                         f"choose from {list(SECTIONS)}")
    evidence = {}
    if os.path.exists("TPU_EVIDENCE.json") and len(wanted) < len(SECTIONS):
        with open("TPU_EVIDENCE.json") as f:
            evidence = json.load(f)
    evidence.update({"jax_backend": jax.default_backend(),
                     "device": str(jax.devices()[0])})
    for name in wanted:
        evidence.update(SECTIONS[name]())
        print(f"[tpu_evidence] section {name} done", flush=True)
        # persist after EVERY section: a later section's crash (or the
        # round clock) must not discard minutes of TPU measurement
        with open("TPU_EVIDENCE.json", "w") as f:
            json.dump(evidence, f, indent=1)
    if ("infer_bf16_ms_per_batch" in evidence
            and "infer_int8_ms_per_batch" in evidence):
        evidence["int8_speedup_over_bf16_serving"] = round(
            evidence["infer_bf16_ms_per_batch"]
            / evidence["infer_int8_ms_per_batch"], 2)
    if ("infer_bf16w128_ms_per_batch" in evidence
            and "infer_int8w128_ms_per_batch" in evidence):
        evidence["int8_speedup_over_bf16_serving_w128"] = round(
            evidence["infer_bf16w128_ms_per_batch"]
            / evidence["infer_int8w128_ms_per_batch"], 2)
    if ("train_bf16_ms_per_step" in evidence
            and "train_fp32_ms_per_step" in evidence):
        evidence["bf16_speedup_over_fp32"] = round(
            evidence["train_fp32_ms_per_step"]
            / evidence["train_bf16_ms_per_step"], 2)
    # duty of the host-FEED path, derived from its measured wall time
    # and the relay-free device step time (BASELINE.md's ">95% duty"
    # row): via-relay is honest-but-tunnel-bound; the attached bound
    # asks whether the host feed can outrun the device at all
    s_step = evidence.get("train_bf16_ms_per_step",
                          evidence.get("train_ms_per_step_device"))
    if s_step and "feed_via_relay_s_per_step" in evidence:
        s_step = s_step / 1e3
        evidence["feed_duty_via_relay"] = round(
            s_step / evidence["feed_via_relay_s_per_step"], 4)
        evidence["feed_duty_attached_bound"] = round(
            min(1.0, s_step / max(s_step,
                                  evidence["feed_host_s_per_batch"])), 4)
        if "feed_tifarr_host_s_per_batch" in evidence:
            evidence["feed_tifarr_duty_attached_bound"] = round(
                min(1.0, s_step / max(
                    s_step, evidence["feed_tifarr_host_s_per_batch"])), 4)
    with open("TPU_EVIDENCE.json", "w") as f:
        json.dump(evidence, f, indent=1)
    print(json.dumps(evidence, indent=1))


if __name__ == "__main__":
    main()
