"""Hermetic serving artifacts: jax.export (StableHLO) + weight bundle.

The reference has no model-export story at all — deploying any of its
models means shipping the full Python source tree and a torch install
(FN-SSL/Predict.py, IPDnet2/run_IPDnet2.py both import the model
classes to rebuild them before loading a state_dict). Here a trained
model serializes to a self-contained directory:

    model.hlo    serialized ``jax.export.Exported`` — portable StableHLO
                 of the jitted forward (or streaming chunk step), lowered
                 for one or more platforms
    params.npz   flat parameter arrays, path-keyed (bf16 stored as a
                 tagged uint16 view — npz has no bfloat16)
    meta.json    manifest: model name, mode, input spec, platforms,
                 fnssl_tpu/jax versions

``load_artifact()`` returns a callable that needs **no model code** —
only jax and this loader. The artifact is the TPU-native analogue of a
TorchScript/ONNX bundle: the compiler IR *is* the interchange format,
so there is no tracer-fidelity gap between training and serving graphs.

Platform notes: lowering is trace-time, so exporting for platforms
other than the current backend (or for several at once) traces the
lax.scan LSTM path instead of the TPU Pallas kernel — numerically
identical (the kernel is bit-exact vs the scan; tests/test_lstm.py),
just slower on TPU. Exporting on a TPU process for TPU only keeps the
Pallas custom call.
"""
from __future__ import annotations

import json
import os
from typing import Any, Callable, Sequence

import numpy as np

_SENTINEL = "__fnssl_leaf__"


def _register_state_types():
    """Register every streaming-state NamedTuple with jax.export so the
    stream-mode pytree (in/out avals contain them) serializes. Safe to
    call repeatedly (duplicate registration raises — swallowed)."""
    from jax import export as jex

    from fnssl_tpu.core.norm import ForgettingNormState
    from fnssl_tpu.models.attention import MHSAState
    from fnssl_tpu.models.fnssl import FNSSLState
    from fnssl_tpu.models.ipdnet import ConvState, IPDnetState
    from fnssl_tpu.models.lstm import LSTMState
    from fnssl_tpu.models.mamba import MambaState
    from fnssl_tpu.models.spatialnet import RetentionState, SpatialNetState
    for cls in (ForgettingNormState, MHSAState, FNSSLState, ConvState,
                IPDnetState, LSTMState, MambaState, RetentionState,
                SpatialNetState):
        try:
            jex.register_namedtuple_serialization(
                cls, serialized_name=f"{cls.__module__}.{cls.__name__}")
        except ValueError:
            pass                                   # already registered


# ---------------------------------------------------------------- params IO

def _encode_tree(tree: Any, flat: dict, prefix: str):
    """Nested dict/list/tuple/NamedTuple of arrays → JSON skeleton +
    flat arrays. NamedTuples record their class path so decoding
    rebuilds the exact pytree type (the exported call's treedef needs
    the real state classes, not plain tuples)."""
    if isinstance(tree, dict):
        return {k: _encode_tree(v, flat, f"{prefix}/{k}")
                for k, v in tree.items()}
    if isinstance(tree, tuple) and hasattr(tree, "_fields"):
        enc = [_encode_tree(v, flat, f"{prefix}/{i}")
               for i, v in enumerate(tree)]
        cls = type(tree)
        return {"__namedtuple__": f"{cls.__module__}.{cls.__name__}",
                "items": enc}
    if isinstance(tree, (list, tuple)):
        enc = [_encode_tree(v, flat, f"{prefix}/{i}")
               for i, v in enumerate(tree)]
        return {"__tuple__": enc} if isinstance(tree, tuple) else enc
    key = prefix or "root"
    arr = np.asarray(tree)
    if arr.dtype.name == "bfloat16":        # npz cannot store bf16
        flat[key] = arr.view(np.uint16)
        return {_SENTINEL: key, "dtype": "bfloat16"}
    flat[key] = arr
    return {_SENTINEL: key, "dtype": arr.dtype.name}


def _decode_tree(skel: Any, flat: dict):
    if isinstance(skel, dict):
        if _SENTINEL in skel:
            arr = flat[skel[_SENTINEL]]
            if skel["dtype"] == "bfloat16":
                import ml_dtypes
                arr = arr.view(ml_dtypes.bfloat16)
            return arr
        if "__namedtuple__" in skel:
            import importlib
            mod, _, name = skel["__namedtuple__"].rpartition(".")
            cls = getattr(importlib.import_module(mod), name)
            return cls(*(_decode_tree(v, flat) for v in skel["items"]))
        if "__tuple__" in skel:
            return tuple(_decode_tree(v, flat) for v in skel["__tuple__"])
        return {k: _decode_tree(v, flat) for k, v in skel.items()}
    if isinstance(skel, list):
        return [_decode_tree(v, flat) for v in skel]
    raise ValueError(f"bad params skeleton node: {skel!r}")


def save_params_npz(path: str, params) -> dict:
    """Write a pytree of arrays as npz + JSON skeleton; returns skeleton."""
    flat: dict[str, np.ndarray] = {}
    skel = _encode_tree(params, flat, "")
    np.savez(path, **flat)
    return skel


def load_params_npz(path: str, skel) -> Any:
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return _decode_tree(skel, flat)


# ---------------------------------------------------------------- exporting

def export_fn(fn: Callable, example_args: Sequence,
              platforms: Sequence[str] | None = None):
    """jit + export ``fn`` at the shapes/dtypes of ``example_args``.

    ``platforms=None`` lowers for the current backend (keeps the Pallas
    LSTM custom call on TPU); an explicit list cross-lowers — the caller
    should disable trace-time Pallas dispatch first (see export_model).
    """
    import jax
    from jax import export as jex

    _register_state_types()
    specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        tuple(example_args))
    kw = {"platforms": list(platforms)} if platforms else {}
    return jex.export(jax.jit(fn), **kw)(*specs)


def export_model(model: str, params, example_feats: np.ndarray,
                 out_dir: str, *, mode: str = "forward",
                 platforms: Sequence[str] | None = None,
                 cfg=None) -> dict:
    """Build + save a serving artifact for one of the model families.

    mode='forward': exports ``f(params, feats) -> pred``.
    mode='stream':  exports ``f(params, state, feats) -> (pred, state)``
      (the pure chunk step behind runtime.streaming) plus the initial
      state bundled into params.npz as ``__init_state__``.
    """
    import jax

    apply_fn, init_state = _resolve(model, cfg)
    cross = platforms is not None and (
        len(platforms) > 1
        or platforms[0] != jax.default_backend())
    prev = os.environ.get("FNSSL_TPU_DISABLE_PALLAS")
    if cross:
        os.environ["FNSSL_TPU_DISABLE_PALLAS"] = "1"
    try:
        state0 = None
        if mode == "stream":
            if init_state is None:
                raise ValueError(f"{model} has no causal streaming "
                                 "state; export with mode='forward'")
            state0 = init_state(int(np.shape(example_feats)[0]))

            def fn(p, s, x):
                return apply_fn(p, x, state=s, return_state=True)

            exported = export_fn(fn, (params, state0, example_feats),
                                 platforms)
        else:
            def fn(p, x):
                return apply_fn(p, x)

            exported = export_fn(fn, (params, example_feats), platforms)
    finally:
        if cross:
            if prev is None:
                os.environ.pop("FNSSL_TPU_DISABLE_PALLAS", None)
            else:
                os.environ["FNSSL_TPU_DISABLE_PALLAS"] = prev

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "model.hlo"), "wb") as f:
        f.write(exported.serialize())
    bundle = {"params": params}
    if state0 is not None:
        bundle["__init_state__"] = state0
    skel = save_params_npz(os.path.join(out_dir, "params.npz"), bundle)
    meta = {
        "model": model, "mode": mode,
        "input_shape": list(np.shape(example_feats)),
        "input_dtype": np.asarray(example_feats).dtype.name,
        "platforms": list(exported.platforms),
        "params_skeleton": skel,
        "fnssl_tpu": _pkg_version(), "jax": jax.__version__,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def _resolve(model: str, cfg=None):
    """Model name → (pure apply with optional state, init_state(nb)).
    ``cfg`` overrides the family default (e.g. the fnssl_doa head)."""
    if model.startswith("fnssl"):
        from fnssl_tpu.models.fnssl import (
            FNSSLConfig, fnssl_apply, init_fnssl_state)
        cfg = cfg or FNSSLConfig()

        def apply_fn(p, x, state=None, return_state=False):
            return fnssl_apply(p, x, cfg=cfg, state=state,
                               return_state=return_state)

        return apply_fn, lambda nb: init_fnssl_state(nb, 256, cfg)
    if model in ("ipdnet", "ipdnet_offline"):
        from fnssl_tpu.models.ipdnet import (
            IPDnetConfig, init_ipdnet_state, ipdnet_apply)
        cfg = cfg or IPDnetConfig()

        def apply_fn(p, x, state=None, return_state=False):
            return ipdnet_apply(p, x, cfg=cfg, state=state,
                                return_state=return_state)

        # the offline variant's bidirectional LSTMs have no causal
        # streaming state — forward-only (chunked offline inference
        # happens at the caller, data/segments.py)
        init = (None if model == "ipdnet_offline"
                else lambda nb: init_ipdnet_state(nb, 256, cfg))
        return apply_fn, init
    if model == "variable_ipdnet":
        from fnssl_tpu.models.ipdnet import (
            VariableIPDnetConfig, variable_ipdnet_apply)
        vcfg = cfg or VariableIPDnetConfig()

        def apply_fn(p, x, state=None, return_state=False):
            return variable_ipdnet_apply(p, x, cfg=vcfg)

        return apply_fn, None            # forward-only
    if model == "ipdnet2":
        from fnssl_tpu.models.spatialnet import (
            SpatialNetConfig, init_spatialnet_state, spatialnet_apply)
        cfg = cfg or SpatialNetConfig()

        def apply_fn(p, x, state=None, return_state=False):
            return spatialnet_apply(p, x, cfg=cfg, state=state,
                                    return_state=return_state)

        return apply_fn, lambda nb: init_spatialnet_state(nb, cfg)
    raise ValueError(f"export: unknown model {model!r}")


def _pkg_version() -> str:
    try:
        import fnssl_tpu
        return getattr(fnssl_tpu, "__version__", "0")
    except Exception:
        return "0"


# ------------------------------------------------------------------ loading

class ServingModel:
    """A loaded artifact: callable without any model code.

    forward mode: ``m(feats) -> pred``.
    stream mode:  ``m(feats) -> pred`` carrying the streaming state
      across calls internally; ``m.reset()`` restarts the stream.
    """

    def __init__(self, call: Callable, params, meta: dict,
                 init_state=None):
        self._call = call
        self._params = params
        self.meta = meta
        self._init_state = init_state
        self._state = init_state

    def __call__(self, feats):
        if self.meta["mode"] == "stream":
            out, self._state = self._call(self._params, self._state, feats)
            return out
        return self._call(self._params, feats)

    def reset(self):
        self._state = self._init_state

    def clone(self) -> "ServingModel":
        """Independent stream over the same compiled call + weights
        (fresh state) — one per served connection."""
        return ServingModel(self._call, self._params, self.meta,
                            self._init_state)


def load_artifact(path: str) -> ServingModel:
    """Deserialize a directory written by export_model."""
    from jax import export as jex

    _register_state_types()
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    with open(os.path.join(path, "model.hlo"), "rb") as f:
        exported = jex.deserialize(f.read())
    bundle = load_params_npz(os.path.join(path, "params.npz"),
                             meta["params_skeleton"])
    import jax
    return ServingModel(jax.jit(exported.call), bundle["params"], meta,
                        bundle.get("__init_state__"))
