"""SphericPad / causal-conv parity vs reference torch."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fnssl_tpu.core.convs import (
    caus_conv1d, caus_conv2d, caus_conv3d, spheric_pad)
from tests.reference_oracle import load_reference_module


@pytest.fixture(scope="module")
def ref_mod():
    return load_reference_module("FN-SSL/Module.py", "ref_module_convs",
                                 extra_sys_path="/root/reference/FN-SSL")


@pytest.mark.parametrize("pad", [(2, 2, 1, 1), (1, 2, 1, 2, 1, 1)])
def test_spheric_pad_matches(ref_mod, rng, pad):
    x = rng.standard_normal((2, 3, 5, 6, 8)).astype(np.float32)
    ref = ref_mod.SphericPad(pad)
    with torch.no_grad():
        r = ref(torch.from_numpy(x.copy())).numpy()
    m = np.asarray(spheric_pad(jnp.asarray(x), pad))
    np.testing.assert_allclose(m, r, rtol=1e-6, atol=1e-7)


def test_caus_convs_match(ref_mod, rng):
    # 1d
    ref1 = ref_mod.CausConv1d(3, 4, kernel_size=5, dilation=2).eval()
    p1 = {"weight": jnp.asarray(ref1.conv.weight.detach().numpy()),
          "bias": jnp.asarray(ref1.conv.bias.detach().numpy())}
    x = rng.standard_normal((2, 3, 20)).astype(np.float32)
    with torch.no_grad():
        r = ref1(torch.from_numpy(x.copy())).numpy()
    np.testing.assert_allclose(
        np.asarray(caus_conv1d(p1, jnp.asarray(x), dilation=2)), r,
        rtol=1e-4, atol=1e-5)
    # 2d
    ref2 = ref_mod.CausConv2d(3, 4, kernel_size=(3, 5)).eval()
    p2 = {"weight": jnp.asarray(ref2.conv.weight.detach().numpy()),
          "bias": jnp.asarray(ref2.conv.bias.detach().numpy())}
    x = rng.standard_normal((2, 3, 12, 9)).astype(np.float32)
    with torch.no_grad():
        r = ref2(torch.from_numpy(x.copy())).numpy()
    np.testing.assert_allclose(
        np.asarray(caus_conv2d(p2, jnp.asarray(x))), r,
        rtol=1e-4, atol=1e-5)
    # 3d
    ref3 = ref_mod.CausConv3d(2, 3, kernel_size=(3, 3, 3)).eval()
    p3 = {"weight": jnp.asarray(ref3.conv.weight.detach().numpy()),
          "bias": jnp.asarray(ref3.conv.bias.detach().numpy())}
    x = rng.standard_normal((1, 2, 8, 6, 7)).astype(np.float32)
    with torch.no_grad():
        r = ref3(torch.from_numpy(x.copy())).numpy()
    np.testing.assert_allclose(
        np.asarray(caus_conv3d(p3, jnp.asarray(x))), r,
        rtol=1e-4, atol=1e-5)
