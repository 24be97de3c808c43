"""bf16 mixed-precision training policy (the reference's AMP analogue).

The reference trains with torch AMP — autocast fp16 + GradScaler
(FN-SSL/Learner.py:109-115, Opt.py 'use_amp'). The idiomatic TPU policy is
bfloat16 compute: bf16 shares fp32's exponent range, so no loss scaling /
GradScaler state is needed.

Policy (params fp32, compute bf16, loss/grads/update fp32):
  * master params stay float32 in the TrainState;
  * params and activations are cast to bfloat16 around the model apply —
    matmuls/convs/scans hit the MXU at 2× fp32 throughput and half the
    HBM traffic;
  * outputs are cast back to float32 so the loss and its gradient
    accumulate in fp32 (gradients w.r.t. the fp32 master params come out
    fp32 automatically because the cast happens inside the
    differentiated function);
  * the optimizer update is pure fp32.

Front-end STFT/target synthesis stays fp32 (phase templates are
precision-sensitive; they are bandwidth-, not FLOP-, bound anyway).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

PRECISIONS = ("fp32", "bf16")


def cast_floats(tree, dtype):
    """Cast every floating leaf of a pytree to ``dtype`` (ints, bools and
    complex leaves pass through)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


def wrap_apply(apply_fn, precision: str = "fp32"):
    """Wrap ``apply_fn(params, x, **kw)`` in the compute-precision policy.

    'fp32' returns apply_fn unchanged; 'bf16' casts params and inputs to
    bfloat16 for the call and the outputs back to float32.
    """
    if precision in ("fp32", "float32", None):
        return apply_fn
    if precision not in ("bf16", "bfloat16"):
        raise ValueError(f"unknown precision {precision!r}; "
                         f"choose from {PRECISIONS}")

    def wrapped(params, x, **kw):
        out = apply_fn(cast_floats(params, jnp.bfloat16),
                       cast_floats(x, jnp.bfloat16), **kw)
        return cast_floats(out, jnp.float32)

    return wrapped
