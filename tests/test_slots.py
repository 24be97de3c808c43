"""Slot-batched streaming pool (runtime/slots.py): concurrent streams
through ONE static-shape device program must be bit-equal to dedicated
per-stream steppers, across interleaved rates and slot reuse."""
import threading

import jax
import numpy as np
import pytest

from fnssl_tpu.models.fnssl import (FNSSLConfig, fnssl_apply,
                                    init_fnssl_params, init_fnssl_state)
from fnssl_tpu.runtime.slots import BatchedStreamPool


@pytest.fixture(scope="module")
def pool_setup():
    cfg = FNSSLConfig()
    params = init_fnssl_params(jax.random.PRNGKey(0), cfg)

    def apply_fn(p, x, state=None, return_state=False):
        return fnssl_apply(p, x, cfg=cfg, state=state,
                           return_state=return_state)

    def init_state(nb):
        return init_fnssl_state(nb, 256, cfg)

    pool = BatchedStreamPool(apply_fn, params, init_state,
                             feats_shape=(1, 4, 256, 12), slots=3)
    yield params, cfg, apply_fn, init_state, pool
    pool.close()


def _reference_stream(apply_fn, params, init_state, chunks):
    state = init_state(1)
    outs = []
    for c in chunks:
        o, state = apply_fn(params, c, state=state, return_state=True)
        outs.append(np.asarray(o))
    return outs


def test_pool_matches_dedicated_streams(pool_setup):
    params, cfg, apply_fn, init_state, pool = pool_setup
    rng = np.random.default_rng(0)
    streams = [[rng.standard_normal((1, 4, 256, 12)).astype(np.float32)
                for _ in range(3)] for _ in range(2)]

    results = [[] for _ in streams]

    def run(i):
        s = pool.session()
        try:
            for c in streams[i]:
                results[i].append(np.asarray(s(c)))
        finally:
            s.close()

    threads = [threading.Thread(target=run, args=(i,))
               for i in range(len(streams))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for i, chunks in enumerate(streams):
        want = _reference_stream(apply_fn, params, init_state, chunks)
        for got, w in zip(results[i], want):
            np.testing.assert_allclose(got, w, rtol=1e-5, atol=1e-6)


def test_pool_slot_reuse_resets_state(pool_setup):
    """Release + re-lease a slot: the new stream must start from fresh
    state, not the previous lease's carry."""
    params, cfg, apply_fn, init_state, pool = pool_setup
    rng = np.random.default_rng(1)
    c1 = rng.standard_normal((1, 4, 256, 12)).astype(np.float32)
    c2 = rng.standard_normal((1, 4, 256, 12)).astype(np.float32)

    s = pool.session()
    s(c1); s(c1)                      # advance state, then release
    s.close()
    s2 = pool.session()
    got = np.asarray(s2(c2))
    s2.close()
    want = _reference_stream(apply_fn, params, init_state, [c2])[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pool_idle_slots_keep_state(pool_setup):
    """A slow stream's state must not advance while other streams tick:
    interleave a fast stream (3 chunks) between a slow stream's two
    chunks and check the slow stream is unaffected."""
    params, cfg, apply_fn, init_state, pool = pool_setup
    rng = np.random.default_rng(2)
    slow = [rng.standard_normal((1, 4, 256, 12)).astype(np.float32)
            for _ in range(2)]
    fast = [rng.standard_normal((1, 4, 256, 12)).astype(np.float32)
            for _ in range(3)]

    ss, sf = pool.session(), pool.session()
    got = [np.asarray(ss(slow[0]))]
    for c in fast:                    # slow stream idles across these
        sf(c)
    got.append(np.asarray(ss(slow[1])))
    ss.close(); sf.close()

    want = _reference_stream(apply_fn, params, init_state, slow)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)


def _toy_model():
    """Tiny stateful chunk model: state (nb, 2) running sum; the output
    depends on BOTH feats and carried state, so any gather/scatter/
    reset mix-up between slots shows up exactly."""
    import jax.numpy as jnp

    def apply_fn(p, x, state=None, return_state=False):
        upd = x.reshape(x.shape[0], -1)[:, :2]
        new = state + upd
        out = new * p["w"]
        return (out, new) if return_state else out

    init_state = lambda nb: jnp.zeros((nb, 2))  # noqa: E731
    return apply_fn, {"w": 3.0}, init_state


def test_tiered_programs_single_stream_runs_smallest_tier():
    """One active connection on a 16-slot pool must run the 1-slot
    program (the r4 single-conn TCP RTT was the full-S step at
    occupancy 1), and results must still be exact across slot counts."""
    apply_fn, params, init_state = _toy_model()
    pool = BatchedStreamPool(apply_fn, params, init_state,
                             feats_shape=(1, 4), slots=16)
    assert pool.stepper.tier_sizes == [1, 4, 16]
    rng = np.random.default_rng(3)
    chunks = [rng.standard_normal((1, 4)).astype(np.float32)
              for _ in range(4)]
    s = pool.session()
    got = [np.asarray(s(c)) for c in chunks]
    s.close()
    assert set(pool.stepper._tiers) == {1}, "padded past tier 1"
    run = np.zeros((1, 2), np.float32)
    for g, c in zip(got, chunks):
        run = run + c.reshape(1, -1)[:, :2]
        np.testing.assert_allclose(g, run * 3.0, rtol=1e-6)
    pool.close()


def test_tiered_programs_mixed_occupancy_exact():
    """Streams joining/leaving cross tier boundaries (1 → 4 → 1 on a
    16-slot pool); every stream's running state must stay exact through
    the gather/scatter round trips and padded-row carries."""
    apply_fn, params, init_state = _toy_model()
    pool = BatchedStreamPool(apply_fn, params, init_state,
                             feats_shape=(1, 4), slots=16,
                             batch_window_s=0.01)
    rng = np.random.default_rng(4)
    n_streams, n_chunks = 6, 5
    chunks = [[rng.standard_normal((1, 4)).astype(np.float32)
               for _ in range(n_chunks)] for _ in range(n_streams)]
    results = [[] for _ in range(n_streams)]

    def run(i):
        s = pool.session()
        try:
            for c in chunks[i]:
                results[i].append(np.asarray(s(c)))
        finally:
            s.close()

    # stream 0 runs alone first (tier 1), then 5 more join (tier ≥ 4)
    t0 = threading.Thread(target=run, args=(0,))
    t0.start(); t0.join()
    rest = [threading.Thread(target=run, args=(i,))
            for i in range(1, n_streams)]
    for t in rest:
        t.start()
    for t in rest:
        t.join()
    for i in range(n_streams):
        run_sum = np.zeros((1, 2), np.float32)
        for g, c in zip(results[i], chunks[i]):
            run_sum = run_sum + c.reshape(1, -1)[:, :2]
            np.testing.assert_allclose(g, run_sum * 3.0, rtol=1e-6,
                                       err_msg=f"stream {i}")
    assert 1 in pool.stepper._tiers and len(pool.stepper._tiers) >= 2
    pool.close()


def test_pool_exhaustion_raises(pool_setup):
    *_, pool = pool_setup
    leases = [pool.session() for _ in range(3)]
    with pytest.raises(RuntimeError, match="slots leased"):
        pool.session()
    for s in leases:
        s.close()


def test_feat_upload_dtype_follows_params():
    """bf16-served params upload features as bf16 (half the host→device
    payload per tick — train/precision.py casts inputs to bf16 around
    apply anyway, so the numerics are the established bf16 policy);
    float32 and non-array (python scalar) params keep float32 feats."""
    import jax
    import jax.numpy as jnp

    from fnssl_tpu.runtime.slots import SlotBatchedStepper

    apply_fn, params, init_state = _toy_model()
    st = SlotBatchedStepper(apply_fn, params, init_state, slots=2)
    assert st._feat_dtype == np.float32          # python-scalar params

    arr_params = {"w": jnp.asarray(3.0, jnp.float32)}
    st = SlotBatchedStepper(apply_fn, arr_params, init_state, slots=2)
    assert st._feat_dtype == np.float32

    bf_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), arr_params)
    st = SlotBatchedStepper(apply_fn, bf_params, init_state, slots=2)
    assert st._feat_dtype == jnp.bfloat16
    out = st.step_slots(np.arange(1, dtype=np.int32),
                        np.ones((1, 4), np.float32), np.zeros(1, bool))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               [[3.0, 3.0]], rtol=1e-2)
