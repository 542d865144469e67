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

    def t_of(k, reps=2):
        trainer.train_scanned(pool, total_steps=k,
                              steps_per_dispatch=k)  # compile warmup
        return min(_timed(lambda: trainer.train_scanned(
            pool, total_steps=k, steps_per_dispatch=k))
            for _ in range(reps))

    t1 = t_of(k_small)
    t_long = t_of(k_long, reps=1)
    # fit over the two most-separated points (T = h + K*s); the long
    # dispatch dominates the slope so transient host noise in the
    # small run cannot flip the estimate
    s = (t_long - t1) / (k_long - k_small)  # device seconds / step
    h = max(t1 - k_small * s, 0.0)          # tunnel overhead / dispatch
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


def main():
    import jax

    evidence = {"jax_backend": jax.default_backend(),
                "device": str(jax.devices()[0])}
    evidence.update(kernel_smoke())
    evidence.update(median_timing())
    evidence.update(rasterize_timing())
    evidence.update(duty_cycle())
    with open("TPU_EVIDENCE.json", "w") as f:
        json.dump(evidence, f, indent=1)
    print(json.dumps(evidence, indent=1))


if __name__ == "__main__":
    main()
