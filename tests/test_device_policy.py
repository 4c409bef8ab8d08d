"""utils/device policy units: dtype resolution and platform routing."""

import numpy as np
import pytest

from grid_tpu.utils.device import AUTO_CPU_THRESHOLD, resolve_dtype, step_device


def test_resolve_dtype():
    assert resolve_dtype(None) is None
    assert resolve_dtype({"device": {"dtype": "auto"}}) is None
    assert resolve_dtype({"device": {"dtype": "float32"}}) == np.float32
    assert resolve_dtype({"device": {"dtype": "f64"}}) == np.float64
    import jax.numpy as jnp

    assert resolve_dtype({"device": {"dtype": "bf16"}}) == jnp.bfloat16
    with pytest.raises(ValueError, match="unknown device.dtype"):
        resolve_dtype({"device": {"dtype": "int7"}})


def test_step_device_routing():
    import jax

    # on the CPU test backend, both branches yield cpu, but the chosen label
    # must follow the policy
    with step_device({"device": {"platform": "cpu"}}, 10**9) as plat:
        assert plat == "cpu"
    with step_device(None, 1) as plat:
        # auto + tiny workload: cpu when an accelerator is default, else the
        # backend name (cpu in tests)
        assert plat == jax.default_backend()
    with step_device({"device": {"platform": "tpu"}}, 1) as plat:
        assert plat == jax.default_backend()


def test_auto_threshold_positive():
    assert AUTO_CPU_THRESHOLD > 0
