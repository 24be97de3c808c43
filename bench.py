"""Headline benchmark: FN-SSL forward throughput in T-F frames/s/chip.

Prints ONE JSON line. A "T-F frame" is one time-frequency bin of the
(nb, nt, nf=256) grid the network processes; throughput = nb·nt·nf / step
wall time at the reference training scale (batch 16, 298 frames = 4.79 s
@16 kHz, FN-SSL/Train.py:46-55).

Baseline: the reference PyTorch FN_SSL forward on this container's CPU
(torch 1 thread, same tensor sizes) measures 13,061 T-F frames/s; the
BASELINE.md target is ≥10× that (and ≥2× A100).
"""
import json
import time

import numpy as np

TORCH_CPU_BASELINE = 13061.0  # T-F frames/s, measured in-container


def main():
    import jax

    # persistent compilation cache: survives the flaky remote-compile
    # helper by reusing programs compiled in earlier runs
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/fnssl_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from fnssl_tpu.models.fnssl import (
        FNSSLConfig, fnssl_apply, init_fnssl_params)

    platform = jax.devices()[0].platform
    nb, nt, nf = (16, 298, 256) if platform == "tpu" else (2, 298, 256)
    iters = 20 if platform == "tpu" else 2

    cfg = FNSSLConfig()
    params = init_fnssl_params(jax.random.PRNGKey(0), cfg)
    if platform == "tpu":
        params = jax.tree.map(lambda x: x.astype(jax.numpy.bfloat16), params)
    x = np.random.default_rng(0).standard_normal(
        (nb, 4, nf, nt)).astype(np.float32)
    if platform == "tpu":
        x = x.astype(jax.numpy.bfloat16)
    x = jax.device_put(x)

    # compile + warmup; a value fetch (not just block_until_ready) is
    # required on the axon-tunneled platform to guarantee completion.
    # The remote compile helper is flaky — retry, then fall back to the
    # (numerically identical) lax.scan LSTM path if Mosaic kernels
    # cannot be built.
    import os as _os
    import time as _time
    fwd = None
    for attempt in range(6):
        fwd = jax.jit(lambda p, x: fnssl_apply(p, x, cfg=cfg))
        try:
            np.asarray(fwd(params, x)[0, 0, 0], np.float32)
            break
        except Exception:
            if attempt == 5:
                raise
            if attempt >= 2:
                _os.environ["FNSSL_TPU_DISABLE_PALLAS"] = "1"
            _time.sleep(20)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, x)
    np.asarray(out[0, 0, 0], np.float32)  # sync
    dt = (time.perf_counter() - t0) / iters

    value = nb * nt * nf / dt
    print(json.dumps({
        "metric": "fnssl_fwd_tf_frames_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "T-F frames/s",
        "vs_baseline": round(value / TORCH_CPU_BASELINE, 2),
    }))


if __name__ == "__main__":
    main()
